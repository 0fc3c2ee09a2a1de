"""Attraction engine: attribute actions (SURVEY.md §2.4 P1-P7).

Collector parity target: internal/processor/attraction/attraction.go ~approx
(AttrProc.Run) — the shared action interpreter behind the attributes and
resource processors.  Reference semantics per action:

- insert   set attr only if the key is absent
- update   set attr only if the key is present
- upsert   unconditional set
- delete   remove the key
- hash     digest the value in place (PII scrub; reference uses SHA-1)
- extract  regex named groups → new attributes (see functions.grok)
- convert  cast string↔int↔double

The reference mutates a ``map<string, AnyValue>`` in place.  Our data model
prefers **top-level columns** (columnar, prunable — SURVEY.md §1.2), so each
action is a column transform; ``insert`` on a missing *column* adds it, on a
present column it only fills NULLs (the columnar reading of "key absent").
All pure built-in expressions — one ``select`` per action chain, fused by
Catalyst into a single projection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.grok import GrokPattern

VALID_ACTIONS = ("insert", "update", "upsert", "delete", "hash", "extract", "convert")


@dataclass
class AttrAction:
    """One attraction action (mirrors the reference's ActionKeyValue config)."""

    action: str
    key: str
    value: object | None = None          # literal for insert/update/upsert
    from_attribute: str | None = None    # copy source column (reference FromAttribute)
    pattern: str | None = None           # extract: grok/regex with named groups
    converted_type: str | None = None    # convert: target spark type name
    types: dict[str, str] = field(default_factory=dict)  # extract: per-group casts

    def __post_init__(self) -> None:
        if self.action not in VALID_ACTIONS:
            raise ValueError(f"unknown action {self.action!r}")


def _source(df: DataFrame, a: AttrAction) -> Column:
    if a.from_attribute is not None:
        return F.col(a.from_attribute)
    return F.lit(a.value)


def apply_actions(df: DataFrame, actions: list[AttrAction]) -> DataFrame:
    """Run an action list in order (reference executes declared order, no
    reordering — attraction.go Run loops the compiled action slice)."""
    for a in actions:
        present = a.key in df.columns
        if a.action == "insert":
            src = _source(df, a)
            if present:
                df = df.withColumn(a.key, F.coalesce(F.col(a.key), src))
            else:
                df = df.withColumn(a.key, src)
        elif a.action == "update":
            if present:
                src = _source(df, a)
                df = df.withColumn(a.key, F.when(F.col(a.key).isNotNull(), src).otherwise(F.col(a.key)))
            # key absent → no-op (reference: update requires existing key)
        elif a.action == "upsert":
            df = df.withColumn(a.key, _source(df, a))
        elif a.action == "delete":
            if present:
                df = df.drop(a.key)
        elif a.action == "hash":
            if present:
                # Reference uses SHA-1 (attraction.go hash case / sha1Hasher);
                # sha2-256 offered alongside for modern PII policy — pick via value.
                digest = F.sha2(F.col(a.key).cast("string"), 256) if a.value == "sha256" \
                    else F.sha1(F.col(a.key).cast("string"))
                df = df.withColumn(a.key, F.when(F.col(a.key).isNotNull(), digest))
        elif a.action == "extract":
            if a.pattern is None:
                raise ValueError("extract action requires pattern")
            plan = GrokPattern(a.pattern, a.types)
            for name, col in plan.columns(F.col(a.key)).items():
                df = df.withColumn(name, col)
        elif a.action == "convert":
            if present:
                df = df.withColumn(a.key, F.col(a.key).cast(a.converted_type or "string"))
    return df


def _map_source(m: Column, a: AttrAction) -> Column:
    """Action value in map mode: literal, or a copy of another map entry
    (reference FromAttribute reads the same AttributeMap)."""
    if a.from_attribute is not None:
        return F.element_at(m, F.lit(a.from_attribute))
    return F.lit(None).cast("string") if a.value is None else F.lit(str(a.value))


def apply_actions_map(df: DataFrame, attrs_col: str, actions: list[AttrAction]) -> DataFrame:
    """Attraction over a genuine ``map<string,string>`` attrs column — the
    reference's native reading (attraction.go mutates an AttributeMap in
    place).  Same action list/order contract as the column-mode
    ``apply_actions``; every action is a map expression (`map_concat` /
    `map_filter` / `transform_values` / `map_contains_key`), all codegen.

    Use this path when telemetry attrs genuinely arrive as maps; prefer
    top-level columns (SURVEY §1.2) when the key set is known — columnar,
    prunable, and ~the same action semantics via ``apply_actions``."""
    m = F.col(attrs_col)
    for a in actions:
        key = F.lit(a.key)
        has = F.map_contains_key(m, key)
        src = _map_source(m, a)
        entry = F.create_map(key, src)
        # FromAttribute on an ABSENT source key skips the action entirely
        # (reference: attraction.go only acts when the source attribute
        # exists) — without this guard a missing source writes a phantom
        # NULL-valued entry that flips later presence checks.
        src_ok = (
            F.map_contains_key(m, F.lit(a.from_attribute))
            if a.from_attribute is not None
            else F.lit(True)
        )
        if a.action == "insert":
            new_m = F.when(has | ~src_ok, m).otherwise(F.map_concat(m, entry))
        elif a.action == "update":
            new_m = F.when(
                has & src_ok,
                F.transform_values(m, lambda k, v: F.when(k == key, src).otherwise(v)),
            ).otherwise(m)
        elif a.action == "upsert":
            new_m = F.when(
                src_ok, F.map_concat(F.map_filter(m, lambda k, v: k != key), entry)
            ).otherwise(m)
        elif a.action == "delete":
            new_m = F.map_filter(m, lambda k, v: k != key)
        elif a.action == "hash":
            digest = (
                (lambda v: F.sha2(v, 256)) if a.value == "sha256" else (lambda v: F.sha1(v))
            )
            new_m = F.transform_values(
                m, lambda k, v: F.when((k == key) & v.isNotNull(), digest(v)).otherwise(v)
            )
        elif a.action == "convert":
            t = a.converted_type or "string"
            new_m = F.transform_values(
                m, lambda k, v: F.when(k == key, v.cast(t).cast("string")).otherwise(v)
            )
        elif a.action == "extract":
            raise ValueError("extract in map mode: project the entry to a column and use grok")
        else:  # pragma: no cover - guarded by AttrAction.__post_init__
            raise ValueError(f"unknown action {a.action!r}")
        df = df.withColumn(attrs_col, new_m)
        m = F.col(attrs_col)
    return df


def span_rename(df: DataFrame, out_col: str, from_attributes: list[str], separator: str = "::") -> DataFrame:
    """Span processor name-from-attributes (processor/spanprocessor/span.go
    ~approx, processFromAttributes): name := join(attr values, sep).  The
    reference skips the rename when any attribute is missing — mirrored with
    a NULL-propagating concat guard."""
    any_null = None
    for c in from_attributes:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    joined = F.concat_ws(separator, *[F.col(c).cast("string") for c in from_attributes])
    prev = F.col(out_col) if out_col in df.columns else F.lit(None).cast("string")
    return df.withColumn(out_col, F.when(any_null, prev).otherwise(joined))


# --- redaction (contrib redactionprocessor analog) ---------------------------

# Patterns restricted to the syntax subset shared by Java regex (Spark) and
# RE2 (DuckDB/collector): no lookaround, no backreferences.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{13,16}\b", "[CARD]"),
]


def redact(col: Column, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Value redaction (contrib processor/redactionprocessor ~approx,
    `blocked_values` regexes): mask every match of each pattern, applied in
    declaration order so earlier masks can shadow later ones (an email's
    digits are gone before the card pattern runs).  Pure codegen
    `regexp_replace` chain — no UDF, fully pushable."""
    out = col
    for pat, repl in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redaction_count(col: Column, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Redacted-value count (the processor's `redacted_keys` summary attr):
    total matches across all patterns, counted on the progressively-masked
    value exactly as `redact` applies them."""
    total = F.lit(0)
    masked = col
    for pat, repl in patterns or PII_PATTERNS:
        total = total + F.regexp_count(masked, F.lit(pat))
        masked = F.regexp_replace(masked, pat, repl)
    return total
