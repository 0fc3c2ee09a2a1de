"""Broadcast lookup enrich (SURVEY.md §2.4 P10/P11, §2.7 J1).

Collector parity target: the resource processor attaches/overrides
resource-level attributes (processor/resourceprocessor ~approx); contrib's
k8sattributes/resourcedetection processors do the same against a live entity
table.  Relationally this is a **left-outer equi-join against a small
dimension**, and at 10^12-row scale the only acceptable physical plan is a
broadcast hash join: the dimension ships to every executor once and the fact
table never shuffles.  ``F.broadcast`` pins that plan regardless of
statistics drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def broadcast_enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: str | list[str],
    defaults: dict[str, object] | None = None,
    how: str = "left",
) -> DataFrame:
    """Left-join a broadcast dimension and fill unmatched keys with defaults.

    ``defaults`` mirrors the attraction ``insert`` action for rows that miss
    the dimension (FIXTURES.md: src9 has no lookup row → env='unknown').
    """
    out = df.join(F.broadcast(lookup), on=on, how=how)
    for col, dv in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(dv)))
    return out
