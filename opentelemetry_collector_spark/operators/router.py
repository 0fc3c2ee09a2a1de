"""Router / fan-out / fan-in (SURVEY.md §2.3 F1-F4, §2.10).

Collector parity targets:

- fanoutconnector (processor/fanoutconnector.go ~approx): deliver one stream
  to N exporters.  DataFrames are immutable, so the reference's cloning
  variant (cloningfanoutconnector.go, used when a downstream mutates) is
  structurally unnecessary — one ``persist()`` of the pre-route frame is the
  whole story, and every branch write reuses the cached columnar batches.
- routing-by-attribute (contrib routingprocessor analog; in-core users build
  it as N pipelines × filter): a routes table of (sink, predicate, priority)
  evaluated **first-match-wins** — one single-pass ``CASE WHEN`` tag column,
  so the input is scanned once no matter how many sinks exist.  At 100 TB
  this matters: N filter-branches = N scans; one tag + partitionBy = 1 scan.
- receiver sharing / fan-in (service/builder/receivers_builder.go ~approx):
  ``unionByName`` (UNION ALL — the collector never dedups on merge).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.storagelevel import StorageLevel

from ..sources.tableio import TableIO


@dataclass
class Route:
    """One routing rule: predicate string → sink name, ordered by priority.

    ``predicate`` is a SQL boolean expression by default; with ``ottl=True``
    it is an OTTL condition (routing-connector table syntax) compiled through
    :func:`..functions.ottl.compile_condition` instead — both collapse into
    the same single CASE chain, so mixing dialects costs nothing."""

    sink: str
    predicate: str  # SQL boolean expression (or OTTL condition if ottl=True)
    priority: int = 0
    ottl: bool = False


def route_tag(df: DataFrame, routes: list[Route], tag_col: str = "sink") -> DataFrame:
    """Single-pass first-match-wins tagging (ascending priority).

    Compiles to one CASE WHEN chain — evaluated once per row inside
    whole-stage codegen; no per-sink rescan of the input.
    """
    ordered = sorted(routes, key=lambda r: r.priority)
    expr: Column = F.lit(None).cast("string")
    for r in reversed(ordered):
        if r.ottl:
            from ..functions.ottl import compile_condition

            # OTTL semantics: a NULL-valued condition does not match
            pred = F.coalesce(compile_condition(df, r.predicate), F.lit(False))
        else:
            pred = F.expr(r.predicate)
        expr = F.when(pred, F.lit(r.sink)).otherwise(expr)
    return df.withColumn(tag_col, expr)


def routes_from_df(routes_df: DataFrame) -> list[Route]:
    """Load routes from a config table (sink, predicate, priority) — the
    YAML-pipelines analog of the collector's service config."""
    return [Route(r["sink"], r["predicate"], r["priority"]) for r in routes_df.collect()]


def fanout(
    df: DataFrame,
    routes: list[Route],
    io: TableIO | None = None,
    run_id: str = "run0",
    tag_col: str = "sink",
) -> dict[str, DataFrame]:
    """Route and fan out to per-sink frames (and optionally write each).

    The tagged frame is persisted once (MEMORY_AND_DISK — the F1 shared,
    non-cloning path); each sink branch is a filter over the cache.  When
    ``io`` is given, each sink is appended as one committed snapshot group
    (idempotent — see tableio), mirroring exporterhelper's per-batch send.
    """
    tagged = route_tag(df, routes, tag_col).persist(StorageLevel.MEMORY_AND_DISK)
    out: dict[str, DataFrame] = {}
    for r in sorted(routes, key=lambda x: x.priority):
        branch = tagged.filter(F.col(tag_col) == r.sink).drop(tag_col)
        if io is not None:
            io.append_group(branch, r.sink, f"{run_id}-{r.sink}")
        out[r.sink] = branch
    return out


def union_sources(frames: list[DataFrame]) -> DataFrame:
    """Fan-in: multiple receivers → one pipeline (UNION ALL, no dedup)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def exhaustiveness_check(df: DataFrame, routed: dict[str, DataFrame], tag_col: str = "sink") -> DataFrame:
    """Verification op: input EXCEPT ALL union-of-sinks must be empty
    (routed-row equality — the fanout unit tests' every-consumer-sees-every-
    batch assertion, fanoutconnector_test.go ~approx)."""
    union = union_sources(list(routed.values()))
    return df.exceptAll(union.select(*df.columns))


def route_tag_ottl(
    df: DataFrame,
    ottl_routes: list[tuple[str, str]],
    default_sink: str | None = None,
    tag_col: str = "sink",
) -> DataFrame:
    """Routing-connector parity: first-match-wins tagging from OTTL
    condition statements (the modern routing config uses OTTL, not SQL).
    ``ottl_routes`` is an ordered [(sink, ottl_condition), ...]; unmatched
    rows get ``default_sink`` (the connector's default_pipelines) or NULL.
    Compiles to the same single CASE chain as ``route_tag`` — one codegen
    pass, no per-sink rescan."""
    from ..functions.ottl import compile_condition

    expr: Column = F.lit(default_sink).cast("string")
    for sink, cond_text in reversed(ottl_routes):
        expr = F.when(
            F.coalesce(compile_condition(df, cond_text), F.lit(False)),
            F.lit(sink),
        ).otherwise(expr)
    return df.withColumn(tag_col, expr)


def group_by_attrs(
    df: DataFrame,
    keys: list[str],
    id_col: str = "resource_id",
    compact: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """groupbyattrs parity (contrib groupbyattrsprocessor): reassociate
    records under a synthetic resource keyed by the given attribute columns
    — the processor's "promote these attrs to resource and merge batches
    that share them".

    Returns (resources, records): ``resources`` is one row per distinct key
    tuple with a deterministic ``id_col`` (md5 over NULL-tagged key values —
    stable across runs/engines, unlike a dense rank); ``records`` is the
    input with ``id_col`` attached as a pure projection (NO shuffle, no
    join — the hash is computed from the row itself).  Only the distinct on
    ``resources`` exchanges data, and it carries #resources rows.

    ``compact=True`` additionally repartitions records by the resource id —
    the batch analog of the processor's compaction, co-locating each
    resource's records for downstream per-resource work (one extra shuffle,
    opt-in)."""
    # Length-prefixed encoding: each part is 'n:' for NULL or
    # 'v<len>:<value>' otherwise, so no attribute VALUE can forge a part
    # boundary (a delimiter scheme is collidable — a value containing the
    # separator bytes hashes like a different key tuple; a length prefix
    # is a proper injective frame)
    parts = [
        F.when(F.col(k).isNull(), F.lit("n:")).otherwise(
            F.concat(
                F.lit("v"),
                F.length(F.col(k).cast("string")).cast("string"),
                F.lit(":"),
                F.col(k).cast("string"),
            )
        )
        for k in keys
    ]
    rid = F.md5(F.concat(*parts))
    records = df.withColumn(id_col, rid)
    resources = records.select(id_col, *keys).distinct()
    if compact:
        records = records.repartition(F.col(id_col))
    return resources, records
