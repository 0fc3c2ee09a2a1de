"""Include/exclude matchers (SURVEY.md §2.5 L1/L2).

Collector parity target: internal/processor/filterspan/filterspan.go ~approx
(Matcher.MatchSpan) + filterset (strict vs regexp match sets), used by the
filter processor and the attributes/span processors' include/exclude blocks.
Semantics: keep a record iff it matches ``include`` (when given) and does
NOT match ``exclude`` (when given); a properties block matches when ALL its
clauses match (AND within a block).

Everything compiles to a single boolean Column, so Catalyst pushes it into
the parquet scan (check ``PushedFilters`` in .explain) — the collector, by
contrast, evaluates matchers per-span in Go after full decode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass
class MatchProperties:
    """One include/exclude block (reference: filterspan.MatchProperties).

    ``match_type``: 'strict' → set membership; 'regexp' → rlike.
    ``clauses``: column → list of accepted values (strict) or patterns (regexp).
    """

    match_type: str = "strict"
    clauses: dict[str, list[str]] = field(default_factory=dict)

    def predicate(self) -> Column:
        if self.match_type not in ("strict", "regexp"):
            raise ValueError(f"match_type must be strict|regexp, got {self.match_type!r}")
        pred = F.lit(True)
        for col, values in self.clauses.items():
            if self.match_type == "strict":
                clause = F.col(col).isin(values)
            else:
                clause = F.lit(False)
                for pat in values:
                    clause = clause | F.col(col).rlike(pat)
            pred = pred & clause
        return pred


def include_exclude_filter(
    df: DataFrame,
    include: MatchProperties | None = None,
    exclude: MatchProperties | None = None,
) -> DataFrame:
    """keep = include ∧ ¬exclude (reference: filterspan.SkipSpan inverted)."""
    pred = F.lit(True)
    if include is not None:
        pred = pred & include.predicate()
    if exclude is not None:
        pred = pred & ~exclude.predicate()
    return df.filter(pred)


def filter_ottl_drop(df: DataFrame, drop_conditions: list[str]) -> DataFrame:
    """Contrib filter-processor semantics with OTTL conditions: a record is
    DROPPED when ANY condition evaluates true; conditions that evaluate
    NULL (e.g. a nil-valued path comparison) keep the record, matching the
    upstream error_mode: ignore behavior.  All conditions compile into one
    boolean Column — same pushdown-friendly shape as include/exclude."""
    from ..functions.ottl import compile_condition

    if not drop_conditions:
        return df
    dropped: Column | None = None
    for text in drop_conditions:
        c = compile_condition(df, text)
        dropped = c if dropped is None else (dropped | c)
    return df.filter(~F.coalesce(dropped, F.lit(False)))
