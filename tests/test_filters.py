"""Include/exclude matcher tables (SURVEY §2.5 L1/L2) — mirrors the shape of
upstream filterspan_test.go's TestSpan_Matching_True/False tables: named
cases of (include, exclude) blocks against a fixed record set."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.operators.filters import (
    MatchProperties,
    include_exclude_filter,
)

ROWS = [
    # (id, service, span_name, env)
    (1, "auth", "login", "prod"),
    (2, "auth", "logout", "staging"),
    (3, "payments", "charge", "prod"),
    (4, "payments-eu", "charge", "prod"),
    (5, "web", "GET /health", "prod"),
]


@pytest.fixture(scope="module")
def spans(spark):
    return spark.createDataFrame(ROWS, "id int, service string, span_name string, env string")


CASES = [
    # name, include, exclude, expected ids
    (
        "strict service include",
        MatchProperties("strict", {"service": ["auth"]}),
        None,
        {1, 2},
    ),
    (
        "strict multi-clause ANDs within a block",
        MatchProperties("strict", {"service": ["auth"], "env": ["prod"]}),
        None,
        {1},
    ),
    (
        "regexp service include",
        MatchProperties("regexp", {"service": ["payments.*"]}),
        None,
        {3, 4},
    ),
    (
        "regexp multiple patterns OR within a clause",
        MatchProperties("regexp", {"span_name": ["log.*", "charge"]}),
        None,
        {1, 2, 3, 4},
    ),
    (
        "exclude only (health-check drop)",
        None,
        MatchProperties("regexp", {"span_name": ["GET /health"]}),
        {1, 2, 3, 4},
    ),
    (
        "include minus exclude",
        MatchProperties("strict", {"env": ["prod"]}),
        MatchProperties("regexp", {"service": ["payments.*"]}),
        {1, 5},
    ),
    ("no blocks keeps everything", None, None, {1, 2, 3, 4, 5}),
]


@pytest.mark.parametrize("name,inc,exc,want", CASES, ids=[c[0] for c in CASES])
def test_matcher_tables(spark, spans, name, inc, exc, want):
    got = {r.id for r in include_exclude_filter(spans, inc, exc).collect()}
    assert got == want, name


def test_unknown_match_type_rejected(spark, spans):
    with pytest.raises(ValueError):
        include_exclude_filter(spans, MatchProperties("glob", {"service": ["a*"]}))
