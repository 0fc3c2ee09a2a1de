"""Resumable execution over committed snapshot groups (SURVEY.md §2.2 K7).

Collector parity target: exporterhelper's queued retry
(exporter/exporterhelper/queued_retry.go ~approx) gives at-least-once
delivery; the batch-engine equivalent demanded by the north_rule is
"resumable from Iceberg snapshot checkpoints": split the input into named
partition groups, commit each group's output atomically, and on re-run skip
groups whose manifests already exist.  Crash between groups → the re-run
completes exactly the missing groups; crash mid-group → the partial
(manifest-less, hence invisible) group is overwritten.  Net effect:
exactly-once per group without any coordination service.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tableio import TableIO
from .metrics import StageMetrics


def group_of(id_col: str, n_groups: int, mode: str = "native"):
    """Deterministic group assignment — content-addressed (not
    partition-index-addressed) so the grouping is stable across cluster
    sizes and re-runs.

    ``native``   pmod(xxhash64(id), n_groups) — the scale path (JVM intrinsic).
    ``portable`` Knuth-multiplicative integer arithmetic any engine
                 recomputes bit-identically (numeric ids only; the inner
                 pmod keeps the product inside int64 under ANSI mode).
    """
    if mode == "native":
        return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
    if mode == "portable":
        return F.pmod(
            F.pmod(F.col(id_col).cast("bigint"), F.lit(100_003)) * F.lit(2_654_435_761),
            F.lit(n_groups),
        )
    raise ValueError(f"unknown group mode {mode!r}")


def run_with_resume(
    spark: SparkSession,
    df: DataFrame,
    io: TableIO,
    table: str,
    id_col: str = "doc_id",
    n_groups: int = 8,
    run_id: str = "run0",
    metrics: StageMetrics | None = None,
    fail_after: int | None = None,
    mode: str = "native",
) -> list[str]:
    """Process ``df`` into ``table`` in ``n_groups`` resumable chunks.

    Returns the group ids committed **by this invocation**.  ``fail_after``
    injects a crash after N commits (used by the kill-and-rerun test).
    """
    metrics = metrics or StageMetrics(run_id=run_id)
    if mode == "portable":
        # portable group arithmetic silently NULLs (→ drops) non-numeric
        # ids; fail at plan time instead of losing rows
        dtype = dict(df.dtypes).get(id_col, "")
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"portable group mode requires an integer id column; {id_col!r} is {dtype!r}"
            )
    done = io.committed_groups(table)
    committed: list[str] = []
    grouped = df.withColumn("_grp", group_of(id_col, n_groups, mode))
    for g in range(n_groups):
        gid = f"g{g:04d}"
        if gid in done:
            continue
        branch = grouped.filter(F.col("_grp") == g).drop("_grp")
        snap = io.append_group(branch, table, gid)
        metrics.rows.append((run_id, f"resume:{table}:{gid}", -1, None, None, None, snap))
        committed.append(gid)
        if fail_after is not None and len(committed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} groups")
    return committed
