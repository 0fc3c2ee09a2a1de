"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship parse→enrich→route→aggregate pipeline over the
                     sf0.001 documents table (treated as the pre-tokenized
                     sequences input: tokens derived vectorized from text).
``queries()``      — one key per implemented operator (SURVEY.md §2), defined
                     in opentelemetry_collector_spark.queries.
``oracle_sql()``   — DuckDB-ANSI equivalents for the driver's value-hash gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from opentelemetry_collector_spark.plans.pipeline import PipelineSpec, run_pipeline  # noqa: E402
from opentelemetry_collector_spark.operators.router import Route  # noqa: E402
from opentelemetry_collector_spark.queries import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full pipeline.

    documents → sequences shape (tokens = vectorized word hashes, all
    JVM-side) → grok-ish parse of the text head → broadcast lookup enrich on
    source → first-match-wins route → per-sink obsreport counts.
    """
    docs = spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
    records = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(
            F.split("text", " "), lambda w: F.pmod(F.xxhash64(w), F.lit(50257)).cast("int")
        ).alias("tokens"),
        F.col("source"),
        F.col("text").alias("raw"),
        F.col("lang"),
    ).withColumn("n_tok", F.size("tokens").cast("int"))

    lookup = spark.createDataFrame(
        [(f"src{k}", "prod" if k % 2 == 0 else "staging", f"team{k % 3}") for k in range(9)],
        "source string, env string, team string",
    )
    spec = PipelineSpec(
        routes=[
            Route("sink_hot", "source = 'src0'", 0),
            Route("sink_warm", "source IN ('src1','src2','src3')", 1),
            Route("sink_intl", "lang IN ('zh','de')", 2),
            Route("sink_default", "TRUE", 9),
        ],
        raw_col="_no_raw_grok_",  # parse handled above; text has no log structure
    )
    out = run_pipeline(spark, records, lookup, spec=spec)
    return out["sink_counts"].orderBy("sink")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle for each SQL-expressible key; keys absent here get
    the driver's weaker rows-only check (stateful/partition-introspective ops)."""
    return dict(ORACLES)
