"""Dedup ladder: exact, minhash+LSH, simhash, jaccard, embedding cosine."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.dedup import (
    dedup_keep_canonical,
    shingle_hashes,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),          # near dup of 1
    (4, "completely different words entirely unrelated content here"),
    (5, "the quick brown fox leaps over the lazy dog"),          # near dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_exact_dedup_groups(spark, docs):
    groups = exact_dedup(docs, "doc_id", "text")
    dup = [r for r in groups.collect() if r.group_size > 1]
    assert len(dup) == 1 and dup[0].canonical_id == 1 and dup[0].group_size == 2


def test_keep_canonical(spark, docs):
    kept = dedup_keep_canonical(docs, "doc_id", "text")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4, 5]


def test_soft_dedup_weights(spark, docs):
    from opentelemetry_collector_spark.operators.dedup import soft_dedup_weights

    w = {r.doc_id: r for r in soft_dedup_weights(docs, "doc_id", "text").collect()}
    assert len(w) == 5  # every copy keeps a row — nothing is dropped
    assert w[1].cluster_size == 2 and w[2].cluster_size == 2
    assert w[1].weight == pytest.approx(0.5) and w[2].weight == pytest.approx(0.5)
    assert all(w[i].cluster_size == 1 and w[i].weight == 1.0 for i in (3, 4, 5))
    # total weighted mass == hard-dedup survivor count (the SoftDeDup invariant)
    assert sum(r.weight for r in w.values()) == pytest.approx(4.0)


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = {r.id: r.sig for r in minhash_signatures(docs, "doc_id", "text", k=16).collect()}
    assert sigs[1] == sigs[2]
    # near-dups share most minhashes; unrelated docs share almost none
    sim_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 16
    sim_14 = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 16
    assert sim_13 > sim_14


def test_lsh_candidates_catch_near_dups(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", k=16)
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, bands=8, rows_per_band=2).collect()}
    assert (1, 2) in pairs           # exact dup always collides
    assert not any(4 in p for p in pairs)  # unrelated doc never collides


def test_portable_and_native_modes_agree_on_pairs(spark, docs):
    for mode in ("native", "portable", "raw"):
        pairs = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, mode=mode).collect()
        }
        assert (1, 2) in pairs and (1, 3) in pairs, mode
        assert not any(4 in p for p in pairs), mode


def test_jaccard_values(spark, docs):
    out = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.0, mode="raw").collect()}
    assert out[(1, 2)] == 1.0
    # doc3 differs in last word: 7 shingles each, 6 shared → 6/8
    assert out[(1, 3)] == 0.75


def test_jaccard_with_candidate_prune(spark, docs):
    cand = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.0, candidates=cand).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


def test_jaccard_candidate_gate_survives_max_df(spark, docs):
    """max_df must compose with candidates: the hot-shingle anti-join has to
    apply ON TOP of the candidate left-semi gate, not rebase from the full
    shingle set (regression: the rebased form silently paid the all-docs
    co-shingle self-join the LSH prune exists to avoid — ~70% of the 1M-doc
    probe's ladder wall).  Checked at the plan level: the h-equi-join inputs
    must still contain the LeftSemi candidate gate."""
    cand = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    out_df = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, candidates=cand, max_df=1000
    )
    assert {(r.id_a, r.id_b) for r in out_df.collect()} == {(1, 2)}
    plan = out_df._jdf.queryExecution().optimizedPlan().toString()
    # two join_sh branches (a/b sides) -> at least 2 semi gates + the
    # pair-level one; the rebased-from-sh bug form has only the pair-level
    assert plan.count("LeftSemi") >= 3, plan


def test_simhash_hamming(spark, docs):
    sig = simhash(docs, "doc_id", "text", bits=16)
    vals = {r.id: r.simhash for r in sig.collect()}
    assert vals[1] == vals[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(sig, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 0
    # near-dup within radius, unrelated doc outside it
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_embedding_neardup(spark):
    from opentelemetry_collector_spark.operators.similarity import embedding_neardup_pairs

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),   # near dup of 1
            (3, [0.0, 1.0, 0.0]),      # orthogonal
        ],
        "vec_id int, embedding array<float>",
    )
    pairs = {(r.id_a, r.id_b): r.cos for r in embedding_neardup_pairs(vecs, threshold=0.95).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] > 0.99


def test_simhash_banded_matches_all_pairs(spark, docs):
    """Pigeonhole exactness: at max_hamming = bands-1 the banded equi-join
    finds exactly the all-pairs result (no probabilistic loss)."""
    from opentelemetry_collector_spark.operators.dedup import simhash_banded_pairs

    sig = simhash(docs, "doc_id", "text", bits=16)
    allp = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(sig, max_hamming=3).collect()}
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_banded_pairs(sig, bits=16, bands=4, max_hamming=3).collect()
    }
    assert banded == allp and allp  # non-empty: docs fixture has near-dups


def test_simhash_banded_rejects_overwide_radius(spark, docs):
    from opentelemetry_collector_spark.operators.dedup import simhash_banded_pairs

    sig = simhash(docs, "doc_id", "text", bits=16)
    with pytest.raises(ValueError):
        simhash_banded_pairs(sig, bits=16, bands=4, max_hamming=4)


def test_contamination_containment_not_jaccard(spark):
    """A short benchmark string inside a long doc must flag even though its
    Jaccard is tiny — containment semantics."""
    from opentelemetry_collector_spark.operators.dedup import contamination_pairs

    bench = spark.createDataFrame(
        [(0, "what is the capital of france")], "doc_id int, text string"
    )
    filler = " ".join(f"w{i}" for i in range(200))
    corpus = spark.createDataFrame(
        [
            (100, filler + " what is the capital of france " + filler),  # leaked
            (101, filler),                                               # clean
        ],
        "doc_id int, text string",
    )
    got = {
        (r.corpus_id, r.bench_id): r.n_shared
        for r in contamination_pairs(corpus, bench, "doc_id", "text", min_shared=2).collect()
    }
    assert set(got) == {(100, 0)} and got[(100, 0)] >= 3


def test_contamination_plan_broadcasts_benchmark(spark):
    from opentelemetry_collector_spark.operators.dedup import contamination_pairs

    bench = spark.createDataFrame([(0, "a b c d")], "doc_id int, text string")
    corpus = spark.createDataFrame([(1, "x y z a b c")], "doc_id int, text string")
    plan = (
        contamination_pairs(corpus, bench, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_short_docs_yield_no_shingles_not_crash(spark):
    """Docs with fewer than n words (incl. empty text) must produce ZERO
    shingles, not an ANSI element_at crash (code-review finding r2):
    sequence(0, size-n) DESCENDS when size<n."""
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "three word doc"), (5, "a b c d")],
        "doc_id int, text string",
    )
    for mode in ("raw", "native", "portable"):
        got = {
            r.id: r.n
            for r in shingle_hashes(df, "doc_id", "text", n=3, mode=mode)
            .groupBy("id").agg(F.count("*").alias("n")).collect()
        }
        assert 1 not in got and 2 not in got and 3 not in got, mode
        assert got.get(4) == 1 and got.get(5) == 2, mode
    # and the composed paths survive short docs end-to-end
    from opentelemetry_collector_spark.operators.dedup import contamination_pairs, dedup_corpus

    assert dedup_corpus(df, "doc_id", "text").count() == 5
    assert contamination_pairs(df, df.filter("doc_id = 2"), "doc_id", "text").count() == 0


def test_max_df_cap_bounds_hot_shingle_join(spark):
    """A degenerate corpus — 1000 docs all sharing ONE stopword shingle —
    must stay sub-quadratic under the df cap: the hot shingle is dropped
    from the pair join, so zero candidate intersections survive (without
    the cap this join bucket is 1000²/2 ≈ 500k pairs)."""
    rows = [(i, f"the of and unique{i}a unique{i}b unique{i}c") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, mode="raw", max_df=10
    )
    assert capped.count() == 0
    # sanity: WITHOUT the cap the hot shingle pairs everything with everything
    sample = df.filter(F.col("doc_id") < 40)
    uncapped = ngram_jaccard_pairs(
        sample, "doc_id", "text", n=3, threshold=0.0, mode="raw"
    )
    assert uncapped.count() == 40 * 39 // 2


def test_max_df_cap_never_adds_false_positives(spark, docs):
    """Union sizes stay uncapped, so the capped jaccard is a lower bound:
    capped pairs ⊆ uncapped pairs at any threshold, values ≤ uncapped."""
    unc = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.2, mode="raw"
        ).collect()
    }
    cap = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.2, mode="raw", max_df=3
        ).collect()
    }
    assert set(cap) <= set(unc)
    for pair, j in cap.items():
        assert j <= unc[pair] + 1e-9


def test_portable_lsh_buckets_match_native_pairs(spark, docs):
    """mode='portable' (verbatim '-'-joined band values, oracle-regenerable)
    must produce the same candidate pair set as the xxhash64 buckets."""
    sig = minhash_signatures(docs, "doc_id", "text", k=16, mode="portable")
    nat = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig, 4, 4, mode="native").collect()}
    por = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig, 4, 4, mode="portable").collect()}
    assert nat == por and len(por) > 0


def test_duplicate_span_stats_interval_union(spark):
    """Overlapping duplicated windows must be merged exactly (interval-union
    fold), internal self-repeats must NOT count (df is over distinct docs),
    and docs shorter than k report 0 rather than crash."""
    from opentelemetry_collector_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e x y z"),          # shares the 5-word run a..e with 2
            (2, "q a b c d e r s"),
            (3, "u v w m n o p t"),          # unique
            (4, "a b"),                      # shorter than k
            (5, "foo bar baz foo bar baz foo bar"),  # self-repeat only
        ],
        "doc_id int, text string",
    )
    out = {r.id: r for r in duplicate_span_stats(df, "doc_id", "text", k=3).collect()}
    # doc 1: dup windows at pos 0,1,2 (a b c / b c d / c d e) → union [0,5) = 5
    assert out[1].dup_tokens == 5 and abs(out[1].dup_span_ratio - 0.625) < 1e-9
    # doc 2: dup windows at pos 1,2,3 → union [1,6) = 5
    assert out[2].dup_tokens == 5 and out[2].n_words == 8
    assert out[3].dup_tokens == 0
    assert out[4].dup_tokens == 0 and out[4].n_words == 2
    # window df counts DISTINCT docs: repeating a phrase inside one doc is not
    # cross-corpus duplication
    assert out[5].dup_tokens == 0


def test_dup_span_df_cap_identical_to_uncapped(spark):
    """The broadcast hot-set df clamp (max_df=τ) is a pure skew control:
    for every τ ≥ min_df both span operators produce output identical to
    the uncapped (count-window) form, on the real documents fixture, and
    the capped plan carries the broadcast hot-set join."""
    from opentelemetry_collector_spark.operators.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op, cols in (
        (duplicate_span_stats, ["id", "n_words", "dup_tokens", "dup_span_ratio"]),
        (remove_duplicate_spans, ["id", "n_words", "n_kept", "clean_md5"]),
    ):
        ref = op(docs, "doc_id", "text", k=8, min_df=2).select(cols)
        for tau in (2, 3, 100):
            capped = op(docs, "doc_id", "text", k=8, min_df=2, max_df=tau).select(cols)
            assert ref.exceptAll(capped).count() == 0
            assert capped.exceptAll(ref).count() == 0
    plan = duplicate_span_stats(
        docs, "doc_id", "text", k=8, min_df=2, max_df=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the hot path must NOT reintroduce the unbounded count window
    assert "windowspecdefinition" not in plan.lower() or "Window" not in plan


def test_dup_span_df_cap_rejects_tau_below_min_df(spark, docs):
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.dedup import duplicate_span_stats

    with _pytest.raises(ValueError):
        duplicate_span_stats(docs, "doc_id", "text", k=3, min_df=3, max_df=2).collect()


def test_remove_duplicate_spans_excises_covered_tokens(spark):
    """Removal = complement of the stats coverage: overlapping duplicated
    windows excise their union, survivors keep original order, short docs
    pass through, and a fully-covered doc reports n_kept=0 with md5('')."""
    import hashlib

    from opentelemetry_collector_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e x y z"),   # shares 5-word run a..e with doc 2
            (2, "q a b c d e r s"),
            (3, "u v w m n o p t"),   # unique -> untouched
            (4, "a b"),               # shorter than k -> untouched
            (5, "a b c d e"),         # fully covered by the shared run
        ],
        "doc_id int, text string",
    )
    out = {r.id: r for r in remove_duplicate_spans(df, "doc_id", "text", k=3).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert (out[1].n_kept, out[1].clean_md5) == (3, md5("x y z"))
    assert (out[2].n_kept, out[2].clean_md5) == (3, md5("q r s"))
    assert (out[3].n_kept, out[3].clean_md5) == (8, md5("u v w m n o p t"))
    assert (out[4].n_kept, out[4].clean_md5) == (2, md5("a b"))
    assert (out[5].n_kept, out[5].clean_md5) == (0, md5(""))
    # conservation: kept + covered = total per doc
    assert all(out[i].n_kept <= out[i].n_words for i in out)


def test_dup_span_xxhash64_digest_identical_to_md5(spark):
    """The window digest only BUCKETS identical k-word runs, so swapping
    md5 (oracle-parity default) for xxhash64 (the 100 TB form: 8-byte longs
    through every shuffle/join instead of 32-char hex) must leave BOTH span
    operators' output bit-identical — capped and uncapped."""
    from opentelemetry_collector_spark.operators.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op, cols in (
        (duplicate_span_stats, ["id", "n_words", "dup_tokens", "dup_span_ratio"]),
        (remove_duplicate_spans, ["id", "n_words", "n_kept", "clean_md5"]),
    ):
        for max_df in (None, 4):
            ref = op(docs, "doc_id", "text", k=8, min_df=2, max_df=max_df).select(cols)
            xx = op(
                docs, "doc_id", "text", k=8, min_df=2, max_df=max_df, digest="xxhash64"
            ).select(cols)
            assert ref.exceptAll(xx).count() == 0
            assert xx.exceptAll(ref).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicate_span_stats(docs, "doc_id", "text", digest="sha1")


# ---- source-priority canonical + incremental (resumable-ingest) dedup ----

PRIO_DOCS = [
    # (doc_id, text, rank): same text from three sources; curated rank 0 wins
    (10, "alpha beta gamma", 2),
    (11, "alpha beta gamma", 0),
    (12, "alpha beta gamma", 1),
    (13, "delta epsilon zeta", 1),
    (14, "delta epsilon zeta", 1),   # rank tie -> min id wins
    (15, "unique text here", 3),
]


def test_priority_canonical_prefers_low_rank_then_min_id(spark):
    from opentelemetry_collector_spark.operators.dedup import (
        dedup_keep_priority,
        exact_dedup_priority,
    )

    d = spark.createDataFrame(PRIO_DOCS, "doc_id int, text string, rnk int")
    groups = {r.canonical_id: r for r in exact_dedup_priority(d, "doc_id", "text", "rnk").collect()}
    assert set(groups) == {11, 13, 15}
    assert groups[11].group_size == 3 and groups[11].canonical_rank == 0
    assert groups[13].group_size == 2 and groups[13].canonical_rank == 1
    kept = dedup_keep_priority(d, "doc_id", "text", "rnk")
    assert sorted(r.doc_id for r in kept.collect()) == [11, 13, 15]


def test_incremental_dedup_batch_vs_snapshot(spark):
    from opentelemetry_collector_spark.operators.dedup import incremental_dedup

    seen_docs = spark.createDataFrame(
        [(1, "already ingested page"), (2, "another old page")], "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "already ingested page"),   # exact dup of snapshot -> dropped
            (11, "brand new page"),
            (12, "brand new page"),          # within-batch dup -> min id kept
            (13, "another fresh one"),
        ],
        "doc_id int, text string",
    )
    seen = seen_docs.select(F.md5("text").alias("fp")).distinct()
    survivors, new_seen = incremental_dedup(batch, seen, "doc_id", "text")
    assert sorted(r.doc_id for r in survivors.collect()) == [11, 13]
    # updated snapshot = old fps U batch fps (distinct): 2 old + 2 new texts
    assert new_seen.count() == 4
    # bootstrap (no snapshot): within-batch dedup only
    boot, snap0 = incremental_dedup(batch, None, "doc_id", "text")
    assert sorted(r.doc_id for r in boot.collect()) == [10, 11, 13]
    assert snap0.count() == 3
    # replay idempotence (the resume story): re-ingesting the same batch
    # against the updated snapshot yields zero survivors
    replay, _ = incremental_dedup(batch, new_seen, "doc_id", "text")
    assert replay.count() == 0


def test_cross_source_overlap_counts(spark):
    """Pairwise distinct-shared-shingle counts on a hand-built fixture; a
    shingle present in 3 sources contributes 1 to each of the 3 pairs."""
    from opentelemetry_collector_spark.operators.dedup import cross_source_overlap

    common = "red green blue"          # one 3-gram shared by s1, s2, s3
    df = spark.createDataFrame(
        [
            (1, common + " aa bb cc", "s1"),
            (2, common + " dd ee ff", "s2"),
            (3, "zz " + common, "s3"),
            (4, "qq rr ss tt", "s3"),  # no overlap contribution
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.src_a, r.src_b): r.n_shared
        for r in cross_source_overlap(df, "source", "text", n=3).collect()
    }
    # docs 1 and 3 additionally share NO other 3-gram; each pair shares
    # exactly the one common shingle
    assert out == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 1}

    # duplicate shingles inside one source count once (distinct semantics)
    df2 = spark.createDataFrame(
        [
            (1, common + " " + common, "s1"),
            (2, common, "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out2 = {
        (r.src_a, r.src_b): r.n_shared
        for r in cross_source_overlap(df2, "source", "text", n=3).collect()
    }
    # doc1's text 'red green blue red green blue' has shingles: the common
    # one (twice -> once) plus 3 bridging shingles not present in s2
    assert out2 == {("s1", "s2"): 1}


def test_paragraph_dedup_basic(spark):
    """Later occurrences of a block drop; first (by id, idx) survives."""
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    # para_words=2: doc 1 = [ab, cd], doc 2 = [ab, xy], doc 3 = [cd]
    rows = [(1, "a b c d"), (2, "a b x y"), (3, "c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r
        for r in paragraph_dedup(
            df, "doc_id", "text", para_words=2, with_text=True
        ).collect()
    }
    assert out[1].n_para == 2 and out[1].n_kept == 2
    assert out[1].clean_text == "a b c d"
    assert out[2].n_para == 2 and out[2].n_kept == 1
    assert out[2].clean_text == "x y"          # "a b" already owned by doc 1
    assert out[3].n_para == 1 and out[3].n_kept == 0
    assert out[3].clean_text == ""             # fully deduped, row retained


def test_paragraph_dedup_within_doc_and_order(spark):
    """Within-doc repeats drop too; survivors keep document order."""
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(7, "p q p q r s")], "doc_id long, text string"
    )
    out = paragraph_dedup(df, "doc_id", "text", para_words=2, with_text=True).collect()[0]
    assert out.n_para == 3 and out.n_kept == 2
    assert out.clean_text == "p q r s"


def test_paragraph_dedup_no_hot_digest_window(spark):
    """The canonical-first pick must be a hash aggregate, not a count/rank
    window over the digest partition (the dup-span skew lesson)."""
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = paragraph_dedup(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def test_lsh_band_histogram_prices_candidate_join(spark, docs):
    """Histogram counts buckets by size and n_pairs = C(size,2)*n_buckets;
    total pairs across bands = per-band collisions the candidate join emits
    (before the cross-band distinct)."""
    from opentelemetry_collector_spark.operators.dedup import (
        lsh_band_histogram,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "doc_id", "text", k=16)
    hist = lsh_band_histogram(sigs, bands=8, rows_per_band=2).collect()
    assert all(r.n_pairs == r.bucket_size * (r.bucket_size - 1) // 2 * r.n_buckets
               for r in hist)
    # docs 1 and 2 are exact dups: identical signatures -> they share a
    # bucket in EVERY band, so every one of the 8 bands has >= 1 pair
    per_band_pairs = {}
    for r in hist:
        per_band_pairs[r.band] = per_band_pairs.get(r.band, 0) + r.n_pairs
    assert len(per_band_pairs) == 8 and all(v >= 1 for v in per_band_pairs.values())
    # bucket membership is conserved: sum(size * n_buckets) = 8 bands * n_docs
    n_docs = sigs.count()
    assert sum(r.bucket_size * r.n_buckets for r in hist) == 8 * n_docs


def test_source_fingerprint_overlap_matrix(spark):
    from opentelemetry_collector_spark.operators.dedup import source_fingerprint_overlap

    rows = [(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "x"),
            (5, "b", "z"), (6, "c", "q")]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {(r.src_a, r.src_b): r.shared_fps
           for r in source_fingerprint_overlap(df, "src", "text").collect()}
    # diagonal = distinct fps per source (b's duplicated "x" counts once)
    assert out[("a", "a")] == 2 and out[("b", "b")] == 2 and out[("c", "c")] == 1
    assert out[("a", "b")] == 1          # "x" present in both
    assert ("a", "c") not in out and ("b", "c") not in out
