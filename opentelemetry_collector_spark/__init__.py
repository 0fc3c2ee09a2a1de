"""opentelemetry_collector_spark — a PySpark-native log/telemetry pipeline engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the OpenTelemetry Collector (reference: vmingchen/opentelemetry-collector):
its receiver → processor → exporter pipeline re-expressed as idiomatic Spark
DataFrame transformations over tables of pre-tokenized training sequences
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Layout (mirrors SURVEY.md §2 operator inventory):

- ``session``     — SparkSession builder (AQE, Arrow, tuned shuffles).
- ``sources``     — scans/receivers: testdata loader, deterministic synthetic
                    generators, TableIO snapshot seam (Iceberg-or-parquet).
- ``functions``   — scalar surface: grok/regex planner, FNV-1a & portable
                    hashes, id/timestamp conversions.
- ``operators``   — processors: attraction actions, filters, samplers,
                    router/fanout, broadcast enrich, aggregates, windows,
                    dedup, similarity search, text stats, multimodal plumbing.
- ``plans``       — pipeline composition (parse→enrich→route→aggregate),
                    resume ledger, lineage metrics.
- ``streaming``   — Structured Streaming variants of the pipeline stages.
"""

__version__ = "0.1.0"
