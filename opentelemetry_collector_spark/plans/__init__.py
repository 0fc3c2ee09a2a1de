"""Pipeline plans — SURVEY.md §3 (query lifecycle) and §7 (build plan).

``pipeline``  — the flagship parse→enrich→route→aggregate composition,
                the Spark reading of YAML config → receiver → processor
                chain → fanout → exporters (service/builder ~approx).
``ledger``    — resumable execution over committed snapshot groups (K7).
``metrics``   — per-partition lineage + per-stage throughput (obsreport).
"""

from .pipeline import PipelineSpec, run_pipeline
from .ledger import run_with_resume
from .metrics import StageMetrics, partition_lineage

__all__ = ["PipelineSpec", "run_pipeline", "run_with_resume", "StageMetrics", "partition_lineage"]
