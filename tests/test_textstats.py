"""Text-analysis operators: golden values on hand-computable strings."""

import hashlib

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.textstats import (
    MOD,
    bpe_token_count,
    fingerprint_md5,
    lang_id,
    quality_score,
    rolling_hash,
    token_count,
    word_codes,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_token_counts(spark):
    assert _one(spark, "a b c", token_count(F.col("text"))) == 3
    # BPE-ish: words + punctuation pieces
    assert _one(spark, "hi, world!", bpe_token_count(F.col("text"))) == 4


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "x y z", fingerprint_md5(F.col("text")))
    b = _one(spark, "z y x", fingerprint_md5(F.col("text")))
    assert a == b == hashlib.md5(b"x y z").hexdigest()


def test_rolling_hash_matches_python(spark):
    text = "scan parse"
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % MOD
    assert _one(spark, text, rolling_hash(F.col("text"))) == expected


def test_word_codes_match_python(spark):
    text = "scan parse"
    def code(w):
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % MOD
        return h
    got = _one(spark, text, word_codes(F.col("text")))
    assert got == [code("scan"), code("parse")]


def test_lang_id_heuristic(spark):
    assert _one(spark, "the cat of the house is big", lang_id(F.col("text"))) == "en"
    assert _one(spark, "el gato de la casa y los perros", lang_id(F.col("text"))) == "es"
    assert _one(spark, "xyz qqq www", lang_id(F.col("text"))) == "und"
    # tie (one hit each) → earliest declared language wins deterministically
    assert _one(spark, "the el", lang_id(F.col("text"))) == "en"


def test_quality_score_ranges(spark):
    good = _one(spark, "the quick brown fox is one of the best and fast", quality_score(F.col("text")))
    junk = _one(spark, "!!! ??? ***", quality_score(F.col("text")))
    assert 0.0 <= junk < good <= 1.0


def test_repetition_stats_flags_looping_text(spark):
    from opentelemetry_collector_spark.operators.textstats import repetition_stats

    rows = [
        (1, "spam spam spam spam spam spam"),          # pure loop
        (2, "all words here are fully distinct okay"),  # no repetition
        (3, "ab"),                                      # < 3 words: no shingles
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert got[1].dup_3gram_ratio == 0.75 and got[1].uniq_word_ratio == round(1 / 6, 4)
    assert got[2].dup_3gram_ratio == 0.0 and got[2].uniq_word_ratio == 1.0
    assert got[3].dup_3gram_ratio == 0.0 and got[3].n_words == 1


def test_unigram_logprob_golden(spark):
    from opentelemetry_collector_spark.operators.textstats import unigram_logprob

    # corpus: doc1 = "a a b", doc2 = "a c" -> counts a=3,b=1,c=1, N=5
    # doc1 avg = (2*log2(3) + log2(1))/3 - log2(5)
    # doc2 avg = (log2(3) + log2(1))/2 - log2(5)
    import math

    df = spark.createDataFrame([(1, "a a b"), (2, "a c")], "id long, text string")
    out = {r.id: r for r in unigram_logprob(df, "id", "text").collect()}
    want1 = 2 * math.log2(3) / 3 - math.log2(5)
    want2 = math.log2(3) / 2 - math.log2(5)
    assert out[1].n_tok == 3 and abs(out[1].avg_logp - round(want1, 4)) < 1e-9
    assert out[2].n_tok == 2 and abs(out[2].avg_logp - round(want2, 4)) < 1e-9


def test_boilerplate_ratio_flags_shared_shingles(spark):
    from opentelemetry_collector_spark.operators.textstats import boilerplate_ratio

    # "x y z" appears in 3 docs (df=3 -> boilerplate at min_df=3);
    # each doc's second shingle is unique (df=1)
    rows = [(i, f"x y z u{i} v{i}") for i in range(3)] + [(9, "p q r s")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in boilerplate_ratio(df, "id", "text", min_df=3).collect()}
    for i in range(3):
        assert out[i].n_shingles == 3  # (x y z), (y z u_i), (z u_i v_i)
        assert out[i].n_boiler == 1
        assert abs(out[i].boiler_ratio - round(1 / 3, 4)) < 1e-9
    assert out[9].n_boiler == 0 and out[9].boiler_ratio == 0.0


def test_bigram_logprob_hand_case(spark):
    import math

    from opentelemetry_collector_spark.operators.textstats import bigram_logprob

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b"), (3, "x")], "id long, text string")
    out = {r["id"]: r for r in bigram_logprob(df, "id", "text").collect()}
    # corpus: uni a:3 b:3 x:1, NT=7; bigrams (a,b):3 (b,a):1
    p_ab = 0.75 * 3 / 3 + 0.25 * 3 / 7
    p_ba = 0.75 * 1 / 3 + 0.25 * 3 / 7
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logp2"] == round((2 * math.log2(p_ab) + math.log2(p_ba)) / 3, 4)
    assert out[2]["avg_logp2"] == round(math.log2(p_ab), 4)
    assert 3 not in out  # single-token doc has no bigrams


def test_ccnet_buckets_tertiles_per_lang(spark):
    from opentelemetry_collector_spark.operators.textstats import ccnet_buckets

    rows = [(i, " ".join(f"w{j % (2 + i % 7)}" for j in range(30)), "en" if i % 2 else "fr")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    out = ccnet_buckets(df, "id", "text").collect()
    assert len(out) == 30
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        got = {b: sum(1 for r in rs if r["bucket"] == b) for b in ("head", "middle", "tail")}
        # roughly a third each (ties may shift counts, never invert order)
        assert all(got[b] >= 1 for b in got)
        hs = [r["avg_logp2"] for r in rs if r["bucket"] == "head"]
        ts = [r["avg_logp2"] for r in rs if r["bucket"] == "tail"]
        assert min(hs) >= max(ts)  # head scores dominate tail scores


def test_dsir_weight_ranks_target_like_docs_higher(spark):
    """Docs sharing the target's vocabulary must outscore out-of-domain
    docs; every corpus doc gets a row; scores are finite."""
    import math

    from opentelemetry_collector_spark.operators.textstats import dsir_weight

    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta"), (101, "beta gamma delta")],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma beta"),       # in-domain
            (2, "zeta eta theta iota kappa"),   # out-of-domain
            (3, "alpha zeta beta eta"),         # mixed
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in dsir_weight(corpus, target, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert all(math.isfinite(r.avg_llr) for r in out.values())
    assert out[1].avg_llr > out[3].avg_llr > out[2].avg_llr
    assert out[1].n_tok == 4 and out[2].n_tok == 5


def test_dsir_hashed_ranks_and_matches_python_model(spark):
    """The hashed-bucket DSIR variant preserves the ranking signal and
    reproduces a pure-python replay of the bucketed construction exactly."""
    import math
    from collections import Counter

    from opentelemetry_collector_spark.operators.textstats import (
        MOD,
        dsir_weight_hashed,
    )

    B = 64  # small B so collisions actually occur in the test
    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta"), (101, "beta gamma delta")],
        "doc_id int, text string",
    )
    rows = [
        (1, "alpha beta gamma beta"),
        (2, "zeta eta theta iota kappa"),
        (3, "alpha zeta beta eta"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: r
        for r in dsir_weight_hashed(corpus, target, "doc_id", "text", n_buckets=B).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].avg_llr > out[3].avg_llr > out[2].avg_llr

    def bucket(w):
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % MOD
        return h % B

    cc = Counter(bucket(w) for _, t in rows for w in t.split(" "))
    tgt = ["alpha beta gamma alpha beta", "beta gamma delta"]
    ct = Counter(bucket(w) for t in tgt for w in t.split(" "))
    nc, nt = sum(cc.values()), sum(ct.values())
    q = {
        b: round(
            (math.log2((ct.get(b, 0) + 1) / (nt + B)) - math.log2((c + 1) / (nc + B))) * 1e6
        )
        for b, c in cc.items()
    }
    for doc_id, text in rows:
        ws = text.split(" ")
        want = round(sum(q[bucket(w)] for w in ws) / 1e6 / len(ws), 4) + 0.0
        assert out[doc_id].avg_llr == want and out[doc_id].n_tok == len(ws)


def test_hashed_lm_scoring_has_no_corpus_side_exchange(spark):
    """THE scale property of the hashed variants: the exact forms shuffle
    the corpus twice (token-keyed vocab join + per-doc groupBy); the hashed
    forms must shuffle it zero times — every Exchange in the plan belongs to
    the bounded B-row LM build, never to the scored document stream."""
    from opentelemetry_collector_spark.operators.textstats import (
        dsir_weight_hashed,
        unigram_logprob_hashed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = dsir_weight_hashed(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
    )
    uni = unigram_logprob_hashed(docs, "doc_id", "text")
    for plan in (
        hashed._jdf.queryExecution().executedPlan().toString(),
        uni._jdf.queryExecution().executedPlan().toString(),
    ):
        # the scored stream is never repartitioned by token or by doc
        assert "hashpartitioning(tok" not in plan
        assert "hashpartitioning(doc_id" not in plan
        assert "hashpartitioning(_wd" not in plan
        # LM build aggregates on the bucket id are the only wide ops
        assert "hashpartitioning(b" in plan
        # scoring side reaches the scan through a 1-row broadcast
        assert "BroadcastNestedLoopJoin" in plan


def test_quality_classifier_score_known_weights(spark):
    """Classifier inference with explicit weights: all +1 -> logit 1.0 /
    keep; all -1 -> logit -1.0 / drop; empty doc scores the bias; wrong
    weight-vector length raises."""
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.textstats import (
        quality_classifier_score,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], "doc_id int, text string"
    )
    up = quality_classifier_score(
        df, "doc_id", "text", n_buckets=8, weights=[1_000_000] * 8
    )
    got = {r.doc_id: r for r in up.collect()}
    assert got[1].n_tok == 3 and got[1].logit == 1.0 and got[1].keep
    # empty text splits to ONE empty token (engine split convention)
    assert got[2].n_tok == 1 and got[2].logit == 1.0 and got[2].keep
    down = quality_classifier_score(
        df, "doc_id", "text", n_buckets=8, weights=[-1_000_000] * 8, bias_q=500_000
    )
    got = {r.doc_id: r for r in down.collect()}
    # mean weight -1.0 + bias 0.5 -> logit -0.5, dropped
    assert got[1].logit == -0.5 and not got[1].keep
    assert got[2].logit == -0.5 and not got[2].keep
    with _pytest.raises(ValueError):
        quality_classifier_score(df, "doc_id", "text", n_buckets=8, weights=[1, 2])


def test_quality_classifier_plan_is_shuffle_free(spark):
    """The classifier must ride the scan: no Exchange anywhere in the plan."""
    from opentelemetry_collector_spark.operators.textstats import (
        quality_classifier_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        quality_classifier_score(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_redact_families_and_order(spark):
    from opentelemetry_collector_spark.functions.pii import pii_counts, redact_pii

    text = (
        "mail bob.smith+x@corp.example.com then ssn 123-45-6789 "
        "phone 415-555-0134 ip 192.168.1.7 done"
    )
    df = spark.createDataFrame([(text,)], "text string")
    c = pii_counts(F.col("text"))
    row = df.select(
        c["email"].alias("e"), c["ssn"].alias("s"),
        c["phone"].alias("p"), c["ipv4"].alias("i"),
        redact_pii(F.col("text")).alias("r"),
    ).collect()[0]
    assert (row.e, row.s, row.p, row.i) == (1, 1, 1, 1)
    assert row.r == "mail <EMAIL> then ssn <SSN> phone <PHONE> ip <IP> done"


def test_pii_redact_subset_and_no_pii(spark):
    from opentelemetry_collector_spark.functions.pii import redact_pii

    df = spark.createDataFrame(
        [("a@b.co and 10.0.0.1",), ("clean text only",)], "text string"
    )
    got = [r.r for r in df.select(redact_pii(F.col("text"), ["email"]).alias("r")).collect()]
    # only the email family applied; the IP survives untouched
    assert got == ["<EMAIL> and 10.0.0.1", "clean text only"]


def test_gopher_gates_golden(spark):
    from opentelemetry_collector_spark.operators.textstats import gopher_gates

    long_good = " ".join(
        ["the", "be", "to", "of"] + [f"word{i}" for i in range(56)]
    )  # 60 words, 4 distinct stopwords, all alpha
    short = "the be tiny text"  # word-count gate fails
    symbols = " ".join(["the", "be"] + ["#"] * 58)  # symbol + alpha gates fail
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_gates(df, "doc_id", "text").collect()}
    assert rows[1].keep and rows[1].n_words == 60 and rows[1].n_stop == 4
    assert not rows[2].keep and rows[2].n_words == 4
    assert not rows[3].keep and rows[3].symbol_ratio > 0.1 and rows[3].alpha_frac < 0.8
    # mean word length is the 4-decimal-rounded exact value
    assert rows[2].mean_word_len == round((3 + 2 + 4 + 4) / 4, 4)


def test_let_binding_semantics(spark):
    """let() evaluates the bound expr once and survives a pushed filter:
    filtering on a let-derived ratio returns the same rows as filtering the
    materialized output (the optimizer substitutes the predicate either way;
    the binding must not change values — the probe's O(n^2) trap was a perf
    bug, the guard here is value equivalence incl. NULL text)."""
    import pyspark.sql.functions as F
    from opentelemetry_collector_spark.operators.textstats import let, repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "x y z w v u t s"), (3, None)],
        "doc_id int, text string",
    )
    rep = repetition_stats(df, "doc_id", "text")
    pushed = sorted(r.doc_id for r in rep.filter(F.col("dup_3gram_ratio") <= 0.3).collect())
    materialized = sorted(
        r.doc_id for r in rep.collect() if r.dup_3gram_ratio is not None and r.dup_3gram_ratio <= 0.3
    )
    # doc 3 (NULL text) yields dup_3gram_ratio 0.0 -> passes the gate too
    assert pushed == materialized == [2, 3]
    # let() over a null bound value binds null, not an empty array
    out = df.select(
        "doc_id", let(F.split("text", " "), lambda w: F.size(w)).alias("n")
    ).collect()
    got = {r.doc_id: r.n for r in out}
    assert got[1] == 8 and got[2] == 8 and (got[3] is None or got[3] == -1)


def test_source_token_kl_values(spark):
    """KL(P_source || P_corpus): a source matching the corpus marginal gets
    ~0; a skewed source gets the hand-computed positive value."""
    import math

    import pyspark.sql.functions as F
    from opentelemetry_collector_spark.operators.textstats import source_token_kl

    # two sources with IDENTICAL distributions -> corpus marginal equals
    # each source's distribution -> KL = 0 for both
    df = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "a a b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in source_token_kl(df).collect()}
    assert out["s1"].kl_nats == 0.0 and out["s2"].kl_nats == 0.0
    assert out["s1"].n_toks == 3 and out["s1"].n_distinct_toks == 2

    # skewed: s1 = {a:2}, s2 = {a:1, b:1}; corpus = {a:3, b:1}, N=4
    df2 = spark.createDataFrame(
        [(1, "a a", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r.kl_nats for r in source_token_kl(df2).collect()}
    kl_s1 = 1.0 * math.log((2 * 4) / (2 * 3))
    kl_s2 = 0.5 * math.log((1 * 4) / (2 * 3)) + 0.5 * math.log((1 * 4) / (2 * 1))
    assert got["s1"] == round(kl_s1, 6)
    assert got["s2"] == round(kl_s2, 6)
    # KL >= 0 always (Gibbs); the skewed-away source is strictly positive
    assert got["s1"] > 0 and got["s2"] > 0


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee (Schleimer 2003 thm): two docs sharing a run of
    >= w+2 words (w window-min selections over 3-gram hashes cover any
    w+2-word substring) share at least one fingerprint; short docs select
    min-of-all; sub-3-word docs select nothing."""
    import pyspark.sql.functions as F
    from opentelemetry_collector_spark.operators.textstats import winnow_fingerprints

    w = 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+2 words shared
    df = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " pp qq rr"),
            (2, "mm nn oo " + shared),
            (3, "alpha beta gamma delta"),  # 2 hashes < w -> min of all
            (4, "alpha beta"),              # < 3 words -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), w=w).alias("fps")
        ).collect()
    }
    assert out[1] & out[2], "w+2-word shared run must share a fingerprint"
    assert len(out[3]) == 1
    assert out[4] == set()
    # selection density: ~2/(w+1) of hashes, never more than the hash count
    n_hashes_1 = len("xx yy ".split() + shared.split() + " pp qq rr".split()) - 2
    assert 1 <= len(out[1]) <= n_hashes_1


def test_pmi_topk_ranks_surprising_pairs(spark):
    """A pair that always co-occurs outranks a frequent-but-independent pair;
    the support floor drops rare pairs entirely."""
    import math

    from opentelemetry_collector_spark.operators.textstats import pmi_topk

    rows = (
        [("hong kong",)] * 5            # perfectly associated, c2 = 5
        + [("the cat",)] * 5 + [("the dog",)] * 5   # 'the' spreads over 2 pairs
        + [("rare pair",)] * 2          # below min_count=5
    )
    df = spark.createDataFrame(rows, "text string")
    out = pmi_topk(df, "text", k=10, min_count=5).collect()
    pairs = [(r.w1, r.w2) for r in out]
    assert ("rare", "pair") not in pairs
    assert pairs[0] == ("hong", "kong")
    byp = {(r.w1, r.w2): r for r in out}
    n_tok = 34  # 2*5 + 2*10 + 2*2 tokens
    exp = round(math.log2(5 * n_tok / (5 * 5)), 9)
    assert abs(byp[("hong", "kong")].pmi - exp) < 1e-9
    assert byp[("the", "cat")].pmi < byp[("hong", "kong")].pmi


def test_zipf_slope_by_source(spark):
    import pytest

    from opentelemetry_collector_spark.operators.textstats import zipf_slope_by_source

    # exact Zipf: freq(rank) = 48 / rank over 4 types -> slope exactly -1
    doc = " ".join(["a"] * 48 + ["b"] * 24 + ["c"] * 16 + ["d"] * 12)
    df = spark.createDataFrame([("s1", doc), ("s2", "x y")], "source string, text string")
    out = {r.source: r for r in zipf_slope_by_source(df, "source", "text").collect()}
    assert out["s1"].n_types == 4 and out["s1"].n_toks == 100
    assert out["s1"].zipf_slope == pytest.approx(-1.0, abs=1e-6)
    assert out["s1"].zipf_intercept == pytest.approx(__import__("math").log(48.0), abs=1e-6)
    # uniform 2-type source: both freqs equal -> slope 0
    assert out["s2"].zipf_slope == pytest.approx(0.0, abs=1e-9)


def test_hapax_stats_by_source(spark):
    import pytest

    from opentelemetry_collector_spark.operators.textstats import hapax_stats_by_source

    df = spark.createDataFrame(
        [("s1", "a a a b b c d"), ("s2", "x x y y")], "source string, text string"
    )
    out = {r.source: r for r in hapax_stats_by_source(df, "source", "text").collect()}
    assert out["s1"].n_types == 4
    assert out["s1"].n_hapax == 2 and out["s1"].n_dis == 1
    assert out["s1"].hapax_rate == pytest.approx(0.5)
    assert out["s1"].hapax_tok_share == pytest.approx(2 / 7, abs=1e-6)
    assert out["s2"].n_hapax == 0 and out["s2"].hapax_rate == 0.0


def test_ngram_novelty_by_source(spark):
    import pytest

    from opentelemetry_collector_spark.operators.textstats import ngram_novelty_by_source

    rows = [
        (1, "a b c d", "s1"),    # shingles: "a b c", "b c d" — both novel
        (2, "a b c e", "s2"),    # "a b c" seen in doc 1; "b c e" novel
        (3, "x y", "s2"),        # too short: no shingles, excluded from n_docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in ngram_novelty_by_source(df, "doc_id", "text", "source").collect()}
    assert out["s1"].n_docs == 1 and out["s1"].n_shingle_occ == 2
    assert out["s1"].n_novel == 2 and out["s1"].novelty_rate == 1.0
    assert out["s2"].n_docs == 1 and out["s2"].n_shingle_occ == 2
    assert out["s2"].n_novel == 1 and out["s2"].novelty_rate == pytest.approx(0.5)


def test_compression_ratio_by_source(spark):
    import pytest

    from opentelemetry_collector_spark.operators.textstats import (
        compression_ratio_by_source,
    )

    df = spark.createDataFrame(
        [("s1", "hi, world!"), ("s1", "a b"), ("s2", "xyz")],
        "source string, text string",
    )
    out = {r.source: r for r in compression_ratio_by_source(df, "source", "text").collect()}
    # "hi, world!": 2 ws tokens, 4 bpe pieces (hi , world !); "a b": 2 and 2
    assert out["s1"].n_docs == 2 and out["s1"].n_chars == 13
    assert out["s1"].n_ws_tok == 4 and out["s1"].n_bpe_tok == 6
    assert out["s1"].chars_per_ws_tok == pytest.approx(13 / 4)
    assert out["s1"].bpe_per_ws == pytest.approx(1.5)
    assert out["s2"].n_ws_tok == 1 and out["s2"].n_bpe_tok == 1


def test_bigram_entropy_by_source(spark):
    import math

    import pytest

    from opentelemetry_collector_spark.operators.textstats import (
        bigram_entropy_by_source,
    )

    df = spark.createDataFrame(
        [
            ("loop", "a b a b a b a b a"),   # deterministic alternation
            ("flat", "x y z w"),             # all bigrams unique
        ],
        "source string, text string",
    )
    out = {r.source: r for r in bigram_entropy_by_source(df, "source", "text").collect()}
    # alternating text: every transition is forced -> conditional entropy 0
    assert out["loop"].n_bigrams == 8 and out["loop"].h_bigram_cond == 0.0
    assert out["loop"].h_unigram == pytest.approx(
        -(5 / 9) * math.log2(5 / 9) - (4 / 9) * math.log2(4 / 9), abs=1e-6
    )
    # unique bigrams with unique left contexts: also fully determined
    assert out["flat"].n_distinct_bigrams == 3 and out["flat"].h_bigram_cond == 0.0
    assert out["flat"].h_unigram == pytest.approx(2.0)


def test_heldout_unigram_eval_oov_and_logprob(spark):
    from opentelemetry_collector_spark.operators.textstats import heldout_unigram_eval

    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(2, "s", "a b z"), (3, "t", "q")], "doc_id long, source string, text string"
    )
    out = {r.source: r for r in heldout_unigram_eval(train, ev, "text", "source").collect()}
    s = out["s"]
    # vocab a:2 b:1, NT=3; eval a,b in-vocab, z OOV
    assert s.n_tok == 3 and s.oov_rate == round(1 / 3, 6)
    import math
    assert s.avg_logp == round((1.0 + 0.0) / 2 - math.log2(3), 4)
    # all-OOV group: oov_rate 1, no in-vocab tokens -> avg_logp is NaN/None
    t = out["t"]
    assert t.n_tok == 1 and t.oov_rate == 1.0
    assert t.avg_logp is None or t.avg_logp != t.avg_logp


# --- Kneser-Ney bigram LM -----------------------------------------------------


def _kn_ref(docs, D=0.75):
    """Sequential scalar replica of the interpolated-KN recurrence."""
    import math
    from collections import Counter

    big = Counter()
    per_doc = {}
    for i, text in docs:
        ws = text.split()
        bgs = list(zip(ws, ws[1:]))
        per_doc[i] = bgs
        big.update(bgs)
    cw1, n1f, n1b = Counter(), Counter(), Counter()
    for (w1, w2), c in big.items():
        cw1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    bt = len(big)
    out = {}
    for i, bgs in per_doc.items():
        if not bgs:
            continue
        lps = [
            math.log2((big[(a, b)] - D) / cw1[a] + D * n1f[a] / cw1[a] * (n1b[b] / bt))
            for a, b in bgs
        ]
        out[i] = (len(bgs), round(sum(lps) / len(lps), 4))
    return out


def test_kn_bigram_matches_scalar_replica(spark):
    from opentelemetry_collector_spark.operators.textstats import kn_bigram_logprob

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "san francisco san francisco san francisco"),
        (4, "a b c d e f"),
        (5, "the the the the"),
        (6, "solo"),  # < 2 tokens: drops out
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp2)
        for r in kn_bigram_logprob(df, "doc_id", "text").collect()
    }
    assert got == _kn_ref(docs)


def test_kn_downweights_collocation_bound_words(spark):
    """The KN property: 'francisco' is frequent but follows only ONE
    distinct context, so its continuation probability is low — a doc of
    repeated 'san francisco' scores lower under KN relative to a doc of
    the same unigram frequencies spread over diverse contexts."""
    from opentelemetry_collector_spark.operators.textstats import kn_bigram_logprob

    # 'x' appears in 6 distinct bigram contexts; 'francisco' in 1
    docs = [
        (1, "san francisco san francisco san francisco san francisco"),
        (2, "a x b x c x a x b x c x"),
    ] + [(10 + i, "filler words only here") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.avg_logp2 for r in kn_bigram_logprob(df, "doc_id", "text").collect()}
    ref = _kn_ref(docs)
    assert got[1] == ref[1][1] and got[2] == ref[2][1]
