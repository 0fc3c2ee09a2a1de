"""Sequence packing + token stats + YAML config round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.packing import (
    chunk_token_stream,
    pack_sequences,
    packing_stats,
    token_freq_topk,
)
from opentelemetry_collector_spark.plans.config import ConfigError, spec_from_yaml, spec_to_yaml
from opentelemetry_collector_spark.plans.pipeline import PipelineSpec
from opentelemetry_collector_spark.sources.synthetic import gen_sequences


@pytest.fixture(scope="module")
def seqs(spark):
    return gen_sequences(spark, 2000, seed=7, partitions=4).cache()


def test_pack_conserves_tokens_and_respects_max_len(spark, seqs):
    packed = pack_sequences(seqs, max_len=256, salt_buckets=4).cache()
    # every bin within bound
    assert packed.filter(F.col("n_tok") > 256).count() == 0
    # token conservation: lengths ≤ max_len are never truncated here (gen
    # lengths are 8..128), so total packed tokens == total input tokens
    tot_in = seqs.agg(F.sum(F.size("tokens"))).collect()[0][0]
    tot_out = packed.agg(F.sum("n_tok")).collect()[0][0]
    assert tot_in == tot_out
    # every doc appears exactly once
    n_docs = packed.agg(F.sum("n_docs")).collect()[0][0]
    assert n_docs == 2000
    packed.unpersist()


def test_pack_is_deterministic_across_parallelism(spark, seqs):
    a = pack_sequences(seqs.repartition(2), max_len=256, salt_buckets=4)
    b = pack_sequences(seqs.repartition(16), max_len=256, salt_buckets=4)
    cols = ["source", "salt", "pack_id", "n_tok", "n_docs"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_pack_truncates_overlong_docs(spark):
    df = spark.createDataFrame(
        [("d1", list(range(300)), "s1")], "doc_id string, tokens array<int>, source string"
    )
    packed = pack_sequences(df, max_len=100, salt_buckets=1)
    row = packed.collect()[0]
    assert row["n_tok"] == 100 and row["tokens"] == list(range(100))


def test_packing_stats_fill(spark, seqs):
    packed = pack_sequences(seqs, max_len=256, salt_buckets=4)
    stats = packing_stats(packed)
    r = stats.filter("source = 'src0'").collect()[0]
    assert r["n_packs"] > 0 and 0 < r["avg_fill"] <= 1.0


def test_chunk_token_stream_exact_windows(spark, seqs):
    chunks = chunk_token_stream(seqs, max_len=128).cache()
    sizes = chunks.select(F.size("tokens").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [128]
    # conservation up to the per-partition dropped tail (< max_len each)
    tot_in = seqs.agg(F.sum(F.size("tokens"))).collect()[0][0]
    tot_out = chunks.agg(F.sum(F.size("tokens"))).collect()[0][0]
    nparts = seqs.rdd.getNumPartitions()
    assert tot_out <= tot_in < tot_out + 128 * nparts
    chunks.unpersist()


def test_chunk_global_parallelism_invariant_and_conserving(spark, seqs):
    from opentelemetry_collector_spark.operators.packing import chunk_token_stream_global

    ids = seqs.select(F.col("doc_id"), F.col("tokens"))
    a = chunk_token_stream_global(ids.repartition(2), max_len=128).cache()
    b = chunk_token_stream_global(ids.repartition(16), max_len=128)
    cols = ["chunk_id", "chunk_md5", "n_tok"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    # conservation: exactly floor(total/max_len) full chunks, ids 0..k-1
    tot_in = seqs.agg(F.sum(F.size("tokens"))).collect()[0][0]
    n_chunks = a.count()
    assert n_chunks == tot_in // 128
    ids_seen = sorted(r["chunk_id"] for r in a.select("chunk_id").collect())
    assert ids_seen == list(range(n_chunks))
    a.unpersist()


def test_chunk_global_matches_single_stream_reference(spark):
    """Docs spanning chunk boundaries reproduce the exact concatenated
    stream a sequential single-process walk would emit."""
    import hashlib

    from opentelemetry_collector_spark.operators.packing import chunk_token_stream_global

    rows = [(i, list(range(i * 100, i * 100 + ln))) for i, ln in enumerate([7, 13, 5, 29, 3, 17, 11])]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>").repartition(4)
    out = {r["chunk_id"]: (r["chunk_md5"], r["n_tok"])
           for r in chunk_token_stream_global(df, max_len=10).collect()}
    stream = [t for _, toks in sorted(rows) for t in toks]
    want = {
        c: (hashlib.md5(",".join(map(str, stream[c * 10:(c + 1) * 10])).encode()).hexdigest(), 10)
        for c in range(len(stream) // 10)
    }
    assert out == want


def test_chunk_global_ignores_null_and_empty_token_arrays(spark):
    """A NULL tokens array (size() = -1) must not shift the global prefix
    sum: output with null/empty docs interleaved equals output without them."""
    from opentelemetry_collector_spark.operators.packing import chunk_token_stream_global

    rows = [(i, list(range(i * 100, i * 100 + ln))) for i, ln in enumerate([7, 13, 5, 29])]
    clean = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    dirty = spark.createDataFrame(
        rows + [(1_000, None), (2, None), (10, [])],
        "doc_id int, tokens array<int>",
    )
    cols = ["chunk_id", "chunk_md5", "n_tok"]
    a = chunk_token_stream_global(clean.filter(F.col("doc_id") != 2), max_len=10).select(cols)
    b = chunk_token_stream_global(dirty.filter(F.col("doc_id") != 2), max_len=10).select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_epoch_shuffle_total_deterministic_permutation(spark, seqs):
    from opentelemetry_collector_spark.operators.packing import epoch_shuffle

    a = epoch_shuffle(seqs.repartition(3), "doc_id", seed=1).cache()
    n = seqs.count()
    pos = [r["shuffle_pos"] for r in a.orderBy("shuffle_pos").collect()]
    assert pos == list(range(1, n + 1))  # a total permutation, 1-based
    b = epoch_shuffle(seqs.repartition(16), "doc_id", seed=1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = epoch_shuffle(seqs, "doc_id", seed=2)
    # different seed ⇒ a different permutation (overwhelmingly)
    same = a.alias("x").join(c.alias("y"), "doc_id").filter(
        F.col("x.shuffle_pos") == F.col("y.shuffle_pos")
    ).count()
    assert same < n
    a.unpersist()


def test_token_freq_topk_deterministic(spark):
    df = spark.createDataFrame(
        [("a b b c c c",), ("c b a  a",)], "text string"
    )
    rows = token_freq_topk(df, "text", 3).collect()
    assert [(r["tok"], r["n"]) for r in rows] == [("c", 4), ("a", 3), ("b", 3)]


YAML_OK = """
pipeline:
  raw_col: raw
  salt_buckets: 16
  grok:
    pattern: '^%{LOGLEVEL:level} k=%{INT:k}$'
    types: {k: int}
  routes:
    - {sink: sink_hot, predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE", priority: 9}
  lookup_defaults: {env: unknown}
"""


def test_yaml_spec_round_trip():
    spec = spec_from_yaml(YAML_OK)
    assert isinstance(spec, PipelineSpec)
    assert [r.sink for r in spec.routes] == ["sink_hot", "sink_default"]
    assert spec.salt_buckets == 16 and spec.grok.types == {"k": "int"}
    spec2 = spec_from_yaml(spec_to_yaml(spec))
    assert [r.predicate for r in spec2.routes] == [r.predicate for r in spec.routes]
    assert spec2.grok.pattern == spec.grok.pattern


@pytest.mark.parametrize(
    "mutation,msg",
    [
        ("routes:", "route"),  # drop routes entirely → empty pipeline
        ('- {sink: sink_hot, predicate: "source = \'src0\'", priority: 0}\n    - {sink: sink_hot, predicate: "TRUE", priority: 9}', "duplicate"),
    ],
)
def test_yaml_spec_validation_errors(mutation, msg):
    if mutation == "routes:":
        bad = YAML_OK.replace(
            """  routes:
    - {sink: sink_hot, predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE", priority: 9}
""",
            "",
        )
    else:
        bad = YAML_OK.replace(
            """    - {sink: sink_hot, predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE", priority: 9}""",
            "    " + mutation,
        )
    with pytest.raises(ConfigError, match=msg):
        spec_from_yaml(bad)


def test_yaml_spec_requires_catch_all():
    bad = YAML_OK.replace('    - {sink: sink_default, predicate: "TRUE", priority: 9}\n', "")
    with pytest.raises(ConfigError, match="catch-all"):
        spec_from_yaml(bad)


def test_yaml_spec_drives_pipeline(spark):
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

    spec = spec_from_yaml(YAML_OK)
    out = run_pipeline(spark, gen_telemetry(spark, 500, partitions=2), gen_lookup(spark), spec=spec)
    sinks = {r["sink"] for r in out["sink_counts"].collect()}
    assert sinks == {"sink_hot", "sink_default"}
    total = sum(r["n_rows"] for r in out["sink_counts"].collect())
    assert total == 500


YAML_CHAINS = """
pipeline:
  raw_col: raw
  routes:
    - {sink: sink_hot,     predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE",            priority: 9}
  attributes:
    - {action: upsert, key: env2, value: prod}
    - {action: hash, key: svc_name, value: sha256}
    - {action: delete, key: tmp}
  relabel:
    - {action: replace, source_labels: [source], regex: "src(.*)",
       target_label: src_num, replacement: "n$1"}
    - {action: drop, source_labels: [source], regex: "src9"}
"""


def test_yaml_processor_chains_roundtrip():
    spec = spec_from_yaml(YAML_CHAINS)
    assert [a.action for a in spec.attr_actions] == ["upsert", "hash", "delete"]
    assert [r.action for r in spec.relabel] == ["replace", "drop"]
    spec2 = spec_from_yaml(spec_to_yaml(spec))
    assert spec2.attr_actions == spec.attr_actions
    assert spec2.relabel == spec.relabel


def test_yaml_rejects_unknown_attraction_action():
    bad = YAML_CHAINS.replace("action: upsert", "action: frobnicate")
    with pytest.raises(ConfigError):
        spec_from_yaml(bad)


def test_pipeline_runs_yaml_declared_chains(spark):
    """The collector config story end-to-end: relabel + attraction declared
    in YAML, executed in-order inside the flagship pipeline."""
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

    spec = spec_from_yaml(YAML_CHAINS)
    tel = gen_telemetry(spark, 500, partitions=2).withColumn(
        "svc_name", F.lit("payments")
    ).withColumn("tmp", F.lit("x"))
    out = run_pipeline(spark, tel, gen_lookup(spark), spec=spec)
    tagged = out["tagged"]
    assert "tmp" not in tagged.columns                       # delete ran
    row = tagged.filter("source = 'src0'").select("env2", "svc_name", "src_num").first()
    assert row["env2"] == "prod"
    assert row["svc_name"] == __import__("hashlib").sha256(b"payments").hexdigest()
    assert row["src_num"] == "n0"                            # relabel backref
    assert tagged.filter("source = 'src9'").count() == 0     # relabel drop ran


def test_golden_config_file_runs_pipeline(spark):
    """Golden-config parity (processor/*/testdata/config.yaml analog): the
    checked-in YAML file decodes, round-trips, and drives the pipeline."""
    import os

    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

    path = os.path.join(os.path.dirname(__file__), "testdata", "pipeline.yaml")
    with open(path) as f:
        spec = spec_from_yaml(f.read())
    assert spec_from_yaml(spec_to_yaml(spec)).routes == spec.routes
    out = run_pipeline(spark, gen_telemetry(spark, 400, partitions=2), gen_lookup(spark), spec=spec)
    tagged = out["tagged"]
    row = tagged.filter("source = 'src0'").select(
        "pipeline_name", "src_num", "tid", "tier"
    ).first()
    assert row["pipeline_name"] == "golden" and row["src_num"] == "n0"
    assert row["tid"] is None or len(row["tid"]) == 64  # sha256-hashed in place
    assert row["tier"] == "hot"                          # OTTL transform ran
    sinks = {r["sink"] for r in tagged.select("sink").distinct().collect()}
    assert "sink_hot" in sinks and "sink_default" in sinks
    # OTTL condition route (level == "ERROR") tags non-src0/1/2 error rows
    assert tagged.filter("sink = 'sink_errors' AND level <> 'ERROR'").count() == 0


YAML_TRANSFORM = YAML_OK.replace(
    "  lookup_defaults: {env: unknown}",
    """  lookup_defaults: {env: unknown}
  transform:
    - 'set(tier, "hot") where source == "src0"'
    - 'replace_pattern(raw, "k=[0-9]+", "k=#")'
""",
)


def test_yaml_transform_statements_round_trip_and_run(spark):
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

    spec = spec_from_yaml(YAML_TRANSFORM)
    assert len(spec.transform) == 2
    spec2 = spec_from_yaml(spec_to_yaml(spec))
    assert spec2.transform == spec.transform

    tel = gen_telemetry(spark, 200, seed=7, partitions=2)
    out = run_pipeline(spark, tel, gen_lookup(spark), spec=spec)
    rows = out["parsed"].select("source", "tier", "raw").collect()
    for r in rows:
        assert (r.tier == "hot") == (r.source == "src0")
        assert "k=#" in r.raw and "k=1" not in r.raw


def test_yaml_transform_bad_statement_fails_at_load():
    bad = YAML_OK.replace(
        "  lookup_defaults: {env: unknown}",
        """  lookup_defaults: {env: unknown}
  transform:
    - 'set(x, "unterminated'
""",
    )
    with pytest.raises(ConfigError):
        spec_from_yaml(bad)


YAML_OTTL = """
pipeline:
  raw_col: raw
  default_sink: sink_default
  routes:
    - {sink: sink_hot,    condition: 'source == "src0"',  priority: 0}
    - {sink: sink_errors, condition: 'level == "ERROR"',  priority: 1}
  filters:
    - 'level == "DEBUG"'
"""


def test_yaml_ottl_routes_and_filters_roundtrip():
    spec = spec_from_yaml(YAML_OTTL)
    assert [(r.sink, r.ottl) for r in spec.routes] == [
        ("sink_hot", True), ("sink_errors", True), ("sink_default", False)
    ]
    assert spec.routes[-1].predicate == "TRUE"      # default_sink catch-all
    assert spec.drop_conditions == ['level == "DEBUG"']
    spec2 = spec_from_yaml(spec_to_yaml(spec))      # condition key survives
    assert spec2.routes == spec.routes
    assert spec2.drop_conditions == spec.drop_conditions


def test_yaml_ottl_routes_and_filters_run(spark):
    """filterprocessor + routing-connector config story end-to-end: OTTL
    drop conditions and OTTL condition routes declared in YAML, executed
    in the flagship pipeline with first-match-wins semantics."""
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

    spec = spec_from_yaml(YAML_OTTL)
    tel = gen_telemetry(spark, 400, partitions=2)
    out = run_pipeline(spark, tel, gen_lookup(spark), spec=spec)
    tagged = out["tagged"].cache()
    assert tagged.filter("level = 'DEBUG'").count() == 0          # filter ran
    got = {r.sink for r in tagged.select("sink").distinct().collect()}
    assert got == {"sink_hot", "sink_errors", "sink_default"}
    # first-match-wins: src0 ERROR rows land in sink_hot, not sink_errors
    assert tagged.filter("source='src0' AND sink<>'sink_hot'").count() == 0
    assert tagged.filter("sink='sink_errors' AND level<>'ERROR'").count() == 0
    # conservation: every non-dropped row routed somewhere
    assert tagged.count() == tel.filter("raw NOT LIKE '% DEBUG %'").count()
    tagged.unpersist()


@pytest.mark.parametrize(
    "mutation,msg",
    [
        # both dialects on one route
        ("{sink: sink_hot, condition: 'source == \"src0\"', predicate: 'TRUE'}",
         "exactly one"),
        # unparseable OTTL condition fails at load, not at run
        ("{sink: sink_hot, condition: 'source == '}", "condition|parse|expected"),
        # default_sink colliding with a declared route
        ("{sink: sink_default, condition: 'source == \"src0\"'}", "duplicates"),
    ],
)
def test_yaml_ottl_route_validation(mutation, msg):
    bad = YAML_OTTL.replace(
        "{sink: sink_hot,    condition: 'source == \"src0\"',  priority: 0}", mutation
    )
    with pytest.raises(ConfigError, match=msg):
        spec_from_yaml(bad)


def test_yaml_bad_filter_condition_fails_at_load():
    bad = YAML_OTTL.replace("- 'level == \"DEBUG\"'", "- 'level =='")
    with pytest.raises(ConfigError):
        spec_from_yaml(bad)


def test_oov_rate_by_source(spark):
    """Vocab membership is (count desc, tok asc)-ranked; OOV mass is exact."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.operators.packing import oov_rate_by_source

    df = spark.createDataFrame(
        [
            ("a", "x x x y"),      # x:3 y:1
            ("a", "x y z"),        # z:1
            ("b", "q q y x"),      # q:2
        ],
        "source string, text string",
    )
    # global counts: x:5 q:2 y:3 z:1 -> top-2 vocab = {x, y}
    out = {r.source: r for r in oov_rate_by_source(df, "text", "source", 2).collect()}
    assert out["a"].total_tok == 7 and out["a"].oov_tok == 1        # z
    assert out["b"].total_tok == 4 and out["b"].oov_tok == 2        # q q
    assert abs(out["b"].oov_rate - 0.5) < 1e-9
    # tie at the boundary resolves by token asc: counts q:2 y:2 with vocab=3
    df2 = spark.createDataFrame(
        [("s", "x x x q q y y")], "source string, text string"
    )
    o2 = oov_rate_by_source(df2, "text", "source", 2).collect()[0]
    # top-2 = x(3) then q(2) beats y(2) on tok asc -> OOV = y y
    assert o2.oov_tok == 2


def test_padding_efficiency_exact_bins(spark):
    from opentelemetry_collector_spark.operators.packing import padding_efficiency

    df = spark.createDataFrame(
        [("a b c",), ("d e f g h",), ("",)], "text string"
    )  # n = 3, 5, 0
    out = {r.ctx: r for r in padding_efficiency(df, "text", lengths=(4,)).collect()}
    r = out[4]
    # bins: ceil(3/4)=1, ceil(5/4)=2, 0-token doc -> 0 bins
    assert r.n_docs == 3 and r.n_tok == 8 and r.n_bins == 3
    assert r.pad_tok == 3 * 4 - 8
    assert r.fill_ratio == round(8 / 12, 6)  # operator rounds to 6 dp


def test_token_coverage_curve_monotone_and_exact(spark):
    from opentelemetry_collector_spark.operators.packing import token_coverage_curve

    # counts: a:4 b:2 c:1 d:1 -> total 8; rank order a,b,c,d (count desc, tok asc)
    df = spark.createDataFrame(
        [("a a b c",), ("a a b d",)], "text string"
    )
    out = token_coverage_curve(df, "text", max_rank_log2=2).collect()
    got = {r.rank: (r.cum_tok, r.coverage) for r in out}
    assert got[1] == (4, 0.5)           # 'a' alone covers half
    assert got[2] == (6, 0.75)          # +'b'
    assert got[4] == (8, 1.0)           # full vocab
    covs = [r.coverage for r in out]
    assert covs == sorted(covs)


def test_sliding_window_chunks_clamp_and_coverage(spark):
    import hashlib

    from opentelemetry_collector_spark.operators.packing import sliding_window_chunks

    rows = [
        (1, list(range(10))),   # last=6: starts 0,2,4 + clamp 6
        (2, list(range(3))),    # shorter than size: one whole-doc window
        (3, []),                # empty: no windows
        (4, list(range(8))),    # clamp 4 collides with stride multiple: dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = sliding_window_chunks(df, "doc_id", "tokens", size=4, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    assert sorted(r.start for r in by_doc[1]) == [0, 2, 4, 6]
    assert all(r.n_tok == 4 for r in by_doc[1])
    assert [(r.start, r.n_tok) for r in by_doc[2]] == [(0, 3)]
    assert 3 not in by_doc
    assert sorted(r.start for r in by_doc[4]) == [0, 2, 4]
    # md5 value-checks the exact window content
    want = hashlib.md5("6,7,8,9".encode()).hexdigest()
    assert next(r.chunk_md5 for r in by_doc[1] if r.start == 6) == want
    # every token of doc 1 is covered by the union of windows
    covered = set()
    for r in by_doc[1]:
        covered |= set(range(r.start, r.start + r.n_tok))
    assert covered == set(range(10))


def test_sliding_window_chunks_rejects_bad_stride(spark):
    import pytest

    from opentelemetry_collector_spark.operators.packing import sliding_window_chunks

    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        sliding_window_chunks(df, "doc_id", "tokens", size=4, stride=5)
    with pytest.raises(ValueError):
        sliding_window_chunks(df, "doc_id", "tokens", size=4, stride=0)
