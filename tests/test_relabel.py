"""Prometheus relabel_config parity (SURVEY §2.1 S5).

Mirrors the upstream Prometheus `pkg/relabel` relabel_test.go case shapes:
replace-with-backref, keep/drop filtering, no-match leaves target untouched,
missing source labels join as empty string, case-fold actions, and
labeldrop/labelkeep over label names.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.operators.relabel import RelabelRule, apply_relabel


@pytest.fixture(scope="module")
def targets(spark):
    return spark.createDataFrame(
        [
            ("node_cpu", "us-east", "a1", None),
            ("node_mem", "eu-west", "b2", "extra"),
            ("http_requests_total", "us-east", "c3", None),
        ],
        "name string, region string, instance string, tmp_scratch string",
    )


def test_replace_with_backref(spark, targets):
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace",
                source_labels=("name",),
                regex="node_(.*)",
                target_label="subsystem",
                replacement="sub_$1",
            )
        ],
    ).collect()
    got = {r.name: r.subsystem for r in out}
    assert got == {"node_cpu": "sub_cpu", "node_mem": "sub_mem", "http_requests_total": None}


def test_replace_no_match_leaves_target_untouched(spark, targets):
    df = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace",
                source_labels=("name",),
                regex="nomatch.*",
                target_label="region",
                replacement="clobbered",
            )
        ],
    )
    assert {r.region for r in df.collect()} == {"us-east", "eu-west"}


def test_keep_and_drop_are_full_anchored(spark, targets):
    # unanchored 'node' would match node_cpu via search; anchored must not
    kept = apply_relabel(targets, [RelabelRule(action="keep", source_labels=("name",), regex="node")])
    assert kept.count() == 0
    kept = apply_relabel(
        targets, [RelabelRule(action="keep", source_labels=("name",), regex="node_.*")]
    )
    assert kept.count() == 2
    dropped = apply_relabel(
        targets, [RelabelRule(action="drop", source_labels=("name",), regex="node_.*")]
    )
    assert {r.name for r in dropped.collect()} == {"http_requests_total"}


def test_multi_source_join_and_missing_label_empty(spark, targets):
    # tmp_scratch is NULL for 2 rows -> joins as '' per Prometheus contract
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace",
                source_labels=("name", "tmp_scratch"),
                separator=";",
                regex="(node_mem);extra",
                target_label="hit",
                replacement="$1",
            )
        ],
    ).collect()
    assert {r.name: r.hit for r in out} == {
        "node_cpu": None,
        "node_mem": "node_mem",
        "http_requests_total": None,
    }


def test_case_fold_actions(spark, targets):
    out = apply_relabel(
        targets,
        [RelabelRule(action="uppercase", source_labels=("region",), target_label="region_uc")],
    ).collect()
    assert {r.region_uc for r in out} == {"US-EAST", "EU-WEST"}


def test_labeldrop_and_labelkeep(spark, targets):
    df = apply_relabel(targets, [RelabelRule(action="labeldrop", regex="tmp_.*")])
    assert df.columns == ["name", "region", "instance"]
    df = apply_relabel(targets, [RelabelRule(action="labelkeep", regex="name|region")])
    assert df.columns == ["name", "region"]


def test_chain_order_matters(spark, targets):
    """Rule 2 sees rule 1's rename — the in-order contract."""
    chain = [
        RelabelRule(
            action="replace",
            source_labels=("name",),
            regex="node_(.*)",
            target_label="name",
            replacement="n_$1",
        ),
        RelabelRule(action="keep", source_labels=("name",), regex="n_.*"),
    ]
    assert {r.name for r in apply_relabel(targets, chain).collect()} == {"n_cpu", "n_mem"}


def test_hashmod_matches_prometheus_semantics(spark, targets):
    """hashmod = uint64_be(md5(value)[8:16]) % modulus — bit-exact against a
    python recomputation of the upstream formula."""
    import hashlib
    import struct

    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="hashmod",
                source_labels=("instance",),
                target_label="shard",
                modulus=7,
            )
        ],
    ).collect()

    def pm_hashmod(value: str, modulus: int) -> str:
        digest = hashlib.md5(value.encode()).digest()
        return str(struct.unpack(">Q", digest[8:16])[0] % modulus)

    for r in out:
        assert r.shard == pm_hashmod(r.instance, 7), r.instance


def test_hashmod_requires_modulus(spark, targets):
    with pytest.raises(ValueError):
        apply_relabel(
            targets,
            [RelabelRule(action="hashmod", source_labels=("instance",), target_label="s")],
        )


def test_replace_groupless_regex_expands_empty(spark, targets):
    """Prometheus expands undefined capture groups to '' (RE2 Expand);
    Java replaceAll would throw 'No group 1' (review finding r2)."""
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace",
                source_labels=("region",),
                regex="us-east",          # no capture groups; default repl "$1"
                target_label="flag",
            )
        ],
    ).collect()
    got = {r.region: r.flag for r in out}
    assert got["us-east"] == "" and got["eu-west"] is None


def test_labelkeep_respects_protected_columns(spark, targets):
    df = apply_relabel(
        targets,
        [RelabelRule(action="labelkeep", regex="name")],
        protected=frozenset({"instance"}),
    )
    assert df.columns == ["name", "instance"]


def test_replace_brace_and_named_group_forms(spark, targets):
    """Prometheus-canonical ${1} and named-group forms must work (RE2
    Expand semantics), incl. undefined names expanding to ''."""
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace", source_labels=("name",), regex="node_(.*)",
                target_label="a", replacement="x${1}",
            ),
            RelabelRule(
                action="replace", source_labels=("name",),
                regex=r"(?P<sub>[a-z]+)_(?P<part>[a-z]+)",
                target_label="b", replacement="$part of $sub",
            ),
            RelabelRule(
                action="replace", source_labels=("name",), regex="(.*)",
                target_label="c", replacement="<$nope>",
            ),
        ],
    ).collect()
    got = {r.name: (r.a, r.b, r.c) for r in out}
    assert got["node_cpu"] == ("xcpu", "cpu of node", "<>")
    assert got["http_requests_total"][0] is None  # no node_ match → a untouched


def test_java_only_regex_does_not_crash_plan(spark, targets):
    r"""\p{Lu} is Java/RE2-legal but not Python-re-legal: the rule must
    still plan and execute (group counting is skipped, not fatal)."""
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace", source_labels=("region",), regex=r"\p{Ll}+-east",
                target_label="zone", replacement="east",
            )
        ],
    ).collect()
    assert {r.region: r.zone for r in out} == {"us-east": "east", "eu-west": None}


def test_replace_dangling_dollar_is_literal(spark, targets):
    """RE2 Expand emits a '$' not starting a group reference literally;
    Java regexp_replace throws on it — must be escaped at plan time
    (advice finding r2)."""
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace", source_labels=("name",), regex="(.*)",
                target_label="price", replacement="$1 costs 5$",
            )
        ],
    ).collect()
    got = {r.name: r.price for r in out}
    assert got["node_cpu"] == "node_cpu costs 5$"


def test_replace_double_dollar_is_re2_literal_escape(spark, targets):
    """RE2 Expand: '$$' emits ONE literal '$', so '$$1' is literal '$' +
    text '1' — NOT group 1 (review finding r3)."""
    out = apply_relabel(
        targets,
        [
            RelabelRule(
                action="replace", source_labels=("name",), regex="(.*)",
                target_label="a", replacement="$$1",
            ),
            RelabelRule(
                action="replace", source_labels=("name",), regex="(.*)",
                target_label="b", replacement="$$$1!",
            ),
        ],
    ).collect()
    got = {r.name: (r.a, r.b) for r in out}
    assert got["node_cpu"] == ("$1", "$node_cpu!")
