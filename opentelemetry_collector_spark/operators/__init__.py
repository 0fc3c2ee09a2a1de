"""Operators (processors) — SURVEY.md §2.3-§2.10.

Each module mirrors one collector processor family, re-expressed as pure
DataFrame→DataFrame functions (immutable, lazily planned, Catalyst-optimized)
rather than in-place pdata mutation.
"""

from .attraction import AttrAction, apply_actions
from .enrich import broadcast_enrich
from .filters import MatchProperties, include_exclude_filter
from .router import Route, route_tag, fanout, exhaustiveness_check
from .sampling import probabilistic_sample, tail_sample

__all__ = [
    "AttrAction",
    "apply_actions",
    "broadcast_enrich",
    "MatchProperties",
    "include_exclude_filter",
    "Route",
    "route_tag",
    "fanout",
    "exhaustiveness_check",
    "probabilistic_sample",
    "tail_sample",
]
