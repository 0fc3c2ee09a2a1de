"""Bucketed co-located joins (SURVEY §4 — partitioning/shuffle story).

The single biggest shuffle in any repeated big⋈big join pipeline is
re-hashing both sides on the join key every run.  Spark's answer is
bucketing: write both tables ``bucketBy(n, key)`` once, and every
subsequent equi-join on that key reads co-located buckets — the physical
plan has NO Exchange on either side (asserted in tests/test_plans.py).

At 100 TB this is the difference between "shuffle 100 TB per join" and
"shuffle it once at write time, never again" — the batch analog of the
collector keeping a record on one pipeline thread for its whole life.
Bucket counts must match (or divide evenly, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) and joins must be
on the bucket key prefix.  ``sortBy`` additionally removes the sort from
sort-merge joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog-managed parquet table bucketed (and
    optionally sorted) by ``key`` — the one-time shuffle that all later
    joins on ``key`` skip."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
