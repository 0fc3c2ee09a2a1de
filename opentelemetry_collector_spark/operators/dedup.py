"""Deduplication for training-data pipelines (engine extension).

Five strategies, cheapest first — the standard 100 TB dedup ladder:

- exact        md5-keyed groupBy; one shuffle of (hash, id), never the text.
- fingerprint  sorted-word-bag md5 (order-shuffled copies).
- minhash+LSH  shingle → k minhashes → bands → bucket join; candidate pairs
               only, never all-pairs.  O(n·shingles) + band-key shuffle.
- simhash      b-bit majority signature; hamming-ball lookup.
- ngram-jaccard exact verify of candidate pairs (inter/union over distinct
               shingle sets) — run AFTER an LSH/bucket prune at scale.
- embedding    cosine near-dup over vector columns (see similarity.py).

Hash modes: ``native`` uses xxhash64 (JVM intrinsic — the scale path);
``portable`` uses the polynomial word-code hash (textstats.word_codes) that
the DuckDB oracle recomputes bit-identically.  Same plan shape either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textstats import MOD, word_codes, words

MINHASH_P = 2_147_483_647  # 2^31 - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: (fingerprint, canonical_id=min id, group_size).
    Only (hash, id) shuffles — the text stays where it was scanned."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
    )


def dedup_keep_canonical(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Filter to one row per exact-duplicate group (min-id wins)."""
    groups = exact_dedup(df, id_col, text_col).select(F.col("canonical_id").alias(id_col))
    return df.join(groups, on=id_col, how="left_semi")


def exact_dedup_priority(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rank_col: str,
) -> DataFrame:
    """Exact dedup groups with SOURCE-PRIORITY canonical selection: when a
    duplicate group spans sources, keep the copy from the most-trusted
    source (lowest ``rank_col``), then min id — the standard corpus-prep
    rule when the same page arrives via both a curated dump and a crawl
    (keep the curated copy so its provenance/license metadata survives).

    ``rank_col`` is any integer column the caller derived (typically a
    broadcast-joined or CASE-mapped source→rank table).  Plan: identical to
    :func:`exact_dedup` — one hash aggregate shuffling (fp, rank, id) rows,
    never the text; the argmin is ``min(struct(rank, id))`` so partial
    (map-side) aggregation still applies.  Returns
    (fp, canonical_id, canonical_rank, group_size)."""
    best = F.min(F.struct(F.col(rank_col).alias("r"), F.col(id_col).alias("i")))
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col), F.col(rank_col))
        .groupBy("fp")
        .agg(best.alias("_b"), F.count(F.lit(1)).alias("group_size"))
        .select(
            "fp",
            F.col("_b.i").alias("canonical_id"),
            F.col("_b.r").alias("canonical_rank"),
            "group_size",
        )
    )


def dedup_keep_priority(
    df: DataFrame, id_col: str, text_col: str, rank_col: str
) -> DataFrame:
    """Filter to one row per exact-duplicate group, best (rank, id) wins."""
    groups = exact_dedup_priority(df, id_col, text_col, rank_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(groups, on=id_col, how="left_semi")


def soft_dedup_weights(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SOFT deduplication (SoftDeDup, He et al. ACL 2024): instead of
    dropping duplicates, weight every copy by the inverse of its exact
    duplicate-cluster size, ``weight = 1 / cluster_size`` — downstream
    samplers then draw each distinct text with the same total mass it would
    have after a hard dedup, but no copy (and none of its provenance
    metadata) is discarded, and the weight doubles as a "commonness" score
    for curriculum/mixture tuning.

    Returns the skinny frame ``(id_col, cluster_size, weight)``.  Plan: one
    map-side md5, one partial-combinable (fp, count) hash aggregate, one
    equi-join of the two skinny frames on fp — the text itself NEVER
    shuffles.  Callers re-join the weights on ``id_col``, a uniform key, so
    a boilerplate mega-cluster (one page duplicated 10^7 times at web
    scale) skews only the count aggregate — which AQE's skew-join handles —
    and never pins all copies of the hot text into one task."""
    fp = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_fp"))
    sizes = fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return fp.join(sizes, "_fp").select(
        F.col(id_col),
        F.col("cluster_size"),
        (F.lit(1.0) / F.col("cluster_size")).alias("weight"),
    )


def incremental_dedup(
    new_batch: DataFrame,
    seen_fps: DataFrame | None,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Resumable-ingest exact dedup: dedup an INCOMING batch against the
    fingerprint snapshot of everything already ingested — the shape every
    continuously-fed 100 TB corpus needs (re-running the full-corpus dedup
    per increment is O(corpus) per batch; this is O(batch + lookup)).

    ``seen_fps`` is the persisted snapshot from the previous increment —
    one ``fp`` (md5) column, stored as a table keyed/bucketed by fp in
    production (the same Iceberg-snapshot seam as ``plans/ledger.py``'s
    resume ledger: a failed ingest re-reads the last committed snapshot and
    replays idempotently).  ``None`` bootstraps an empty snapshot.

    Returns (survivors, new_seen):

    - survivors — the batch rows that are NOT exact-dups of anything seen
      before and are the min-id canonical within the batch itself (the
      batch can contain its own duplicates);
    - new_seen — the updated snapshot (seen ∪ this batch's fps, distinct),
      to persist for the next increment.

    Plan: batch-side md5 is map-only; the within-batch canonical is one
    (fp, id) hash aggregate; the seen-lookup is a left-anti join that
    broadcasts only if the snapshot is small — at scale it's a shuffled
    join on fp, which bucketing the snapshot table on fp makes co-located
    (document, not config, here)."""
    fp = F.md5(F.col(text_col)).alias("fp")
    batch = new_batch.select(F.col(id_col), fp)
    canon = (
        batch.groupBy("fp").agg(F.min(id_col).alias(id_col))
    )
    if seen_fps is not None:
        fresh = canon.join(seen_fps.select("fp"), on="fp", how="left_anti")
        new_seen = seen_fps.select("fp").union(batch.select("fp")).distinct()
    else:
        fresh = canon
        new_seen = batch.select("fp").distinct()
    survivors = new_batch.join(fresh.select(id_col), on=id_col, how="left_semi")
    return survivors, new_seen


def shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int = 3, mode: str = "native") -> DataFrame:
    """(id, h): hash per word n-gram shingle.  Duplicates kept (min-hash is
    multiset-safe); use .distinct() for Jaccard set semantics."""
    if mode in ("native", "raw"):
        # stage the split words: the transform lambda references the words
        # array 3× per shingle, and HOFs block CSE, so an un-staged
        # split(text) is recomputed per reference — measured 9× slower at
        # sf0.1 (same trap as word_codes / simhash).
        df = df.select(F.col(id_col), words(F.col(text_col)).alias("_w"))
        w = F.col("_w")
        shingle = lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)])  # noqa: E731
        # NB: sequence(0, size-n) DESCENDS for size<n (Spark sequences run
        # backwards when end<start) and element_at past the array throws
        # under ANSI — documents shorter than n words must yield NO shingles
        sh = F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                (lambda i: F.xxhash64(shingle(i))) if mode == "native" else shingle,
            ),
        ).otherwise(F.array().cast("array<bigint>" if mode == "native" else "array<string>"))
    elif mode == "portable":
        if n != 3:
            raise ValueError("portable mode implements n=3")
        # stage the codes: the HOF expression would otherwise be recomputed
        # per element_at reference (no CSE through higher-order functions)
        df = df.select(F.col(id_col), word_codes(F.col(text_col)).alias("_codes"))
        codes = F.col("_codes")
        sh = F.when(
            F.size(codes) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(codes) - 2),
                lambda i: F.pmod(
                    F.pmod(F.element_at(codes, i.cast("int")) * 31 + F.element_at(codes, (i + 1).cast("int")), F.lit(MOD)) * 31
                    + F.element_at(codes, (i + 2).cast("int")),
                    F.lit(MOD),
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.select(F.col(id_col).alias("id"), F.explode(sh).alias("h"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, mode: str = "native"
) -> DataFrame:
    """(id, sig array<long>[k]): minhash signature via k affine perms of the
    shingle hash — one explode + one groupBy(id) with k min() aggregates
    (partial aggregation makes this a near-map-side-only pass)."""
    sh = shingle_hashes(df, id_col, text_col, mode=mode)
    mins = [
        F.min(F.pmod(F.lit(2 * j + 1) * F.pmod(F.col("h"), F.lit(MINHASH_P)) + F.lit(j * 97), F.lit(MINHASH_P))).alias(f"mh{j}")
        for j in range(k)
    ]
    out = sh.groupBy("id").agg(*mins)
    return out.select("id", F.array(*[F.col(f"mh{j}") for j in range(k)]).alias("sig"))


def lsh_bands(
    sig_df: DataFrame, bands: int = 4, rows_per_band: int = 4, mode: str = "native"
) -> DataFrame:
    """(id, band, bucket): hash each signature band — ids sharing (band,
    bucket) are candidate near-dups.  ``native`` buckets are the banded
    xxhash64 (small uniform join key — the scale path); ``portable``
    buckets are the '-'-joined band values verbatim, so an independent
    engine (the DuckDB oracle) regenerates them exactly (xxhash64 is
    Spark-only, and a 2⁻⁶⁴ hash collision would add a candidate the oracle
    can't see).

    Plan shape: ONE pass — explode of a bands-length struct array, not a
    union of per-band selects (the union form re-evaluates the upstream
    signature subtree once per band; with the minhash aggregation upstream
    that was bands× the whole shingle pipeline)."""

    def bucket(b: int):
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        # native keeps the 8-byte long join key (the scale path shuffles and
        # hash-joins on it); portable pays the string key for oracle parity
        return (
            F.xxhash64(sl)
            if mode == "native"
            else F.array_join(sl.cast("array<string>"), "-")
        )

    blocks = F.array(
        *[F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket")) for b in range(bands)]
    )
    return sig_df.select("id", F.explode(blocks).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_band_histogram(
    sig_df: DataFrame, bands: int = 4, rows_per_band: int = 4, mode: str = "native"
) -> DataFrame:
    """(band, bucket_size, n_buckets, n_pairs): band-bucket size histogram —
    the hot-bucket skew audit run BEFORE committing to the candidate
    self-join.  ``n_pairs`` = C(size,2)·n_buckets is exactly the number of
    candidate pairs that size class will emit, so the histogram's tail IS
    the join's cost model: one bucket of 10⁶ ids contributes 5·10¹¹ pairs
    and pins one task — this table says so for the price of the banding
    pass alone (groupBy(band,bucket) is map-side combinable; the histogram
    re-aggregation is bounded by distinct sizes, not by buckets).

    The 100 TB protocol: run this, pick the df cap / band count, THEN run
    lsh_candidate_pairs."""
    bk = lsh_bands(sig_df, bands, rows_per_band, mode=mode)
    sizes = bk.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bucket_size"))
    return (
        sizes.groupBy("band", "bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .withColumn(
            "n_pairs", F.expr("bucket_size * (bucket_size - 1) DIV 2 * n_buckets")
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 4, rows_per_band: int = 4, mode: str = "native"
) -> DataFrame:
    """(id_a, id_b) candidate pairs: equi-join on (band, bucket), a < b,
    distinct.  This is the scale path — pair count ≈ collisions, not n²."""
    # the banded frame feeds BOTH sides of the self-join; without persist
    # Spark re-runs the whole minhash pipeline per side (no cross-branch
    # CSE, and self-join re-aliasing defeats exchange reuse)
    bk = lsh_bands(sig_df, bands, rows_per_band, mode=mode).persist()
    a = bk.alias("a")
    b = bk.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    mode: str = "native",
    candidates: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard): exact n-gram Jaccard over distinct shingle sets.

    Without ``candidates`` this self-joins on shingle (all co-shingled pairs
    — fine at verification scale, quadratic in the worst case); at 100 TB
    pass ``lsh_candidate_pairs`` output to verify only LSH survivors.

    ``max_df`` caps shingle document frequency for the SELF-JOIN side only:
    a stopword-heavy shingle shared by 10⁵ docs would create a 10¹⁰-row join
    bucket — the standard MinHash-pipeline bound drops h with df > τ before
    pairing.  Union sizes stay UNCAPPED, so the cap can only shrink the
    intersection count: reported jaccard ≤ true jaccard, which provably
    cannot create false positives at any threshold (it costs recall on
    pairs whose overlap is mostly hot shingles — document the τ you pick).
    The hot set is df > τ by construction (≤ |shingles|/τ rows), so it
    broadcasts."""
    # sh feeds sizes, the df-cap stats, and both sides of the pair join —
    # persist or the shingle pipeline (split+explode+distinct) re-runs 4×
    sh = shingle_hashes(df, id_col, text_col, n=n, mode=mode).distinct().persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    join_sh = sh
    if candidates is not None:
        # restrict BOTH sides of the pair join to docs that appear in some
        # candidate pair BEFORE self-joining — at corpus scale the candidate
        # set is a tiny fraction of the corpus, and gating only after the
        # intersection (a pair-level semi-join) would still pay the full
        # all-docs co-shingle explosion the LSH gate exists to avoid.
        # Semantics-preserving: a candidate pair's members are candidate ids
        # by construction, so their shingle rows all survive; the pair-level
        # semi-join below still removes co-shingled non-candidate pairs.
        # Persist: the candidates plan (an LSH join + distinct) now feeds two
        # consumers (cand_ids + the pair gate).  cand_ids uses one explode —
        # not a union of two selects (two plan evaluations) — and no distinct
        # (left_semi builds a hash set; a pre-distinct is a wasted exchange).
        candidates = candidates.persist()
        cand_ids = candidates.select(
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("id")
        )
        join_sh = join_sh.join(cand_ids, on="id", how="left_semi")
    if max_df is not None:
        # df counted over the FULL corpus (the cap is a global document
        # frequency, not a within-candidates one), but anti-joined onto the
        # candidate-gated join_sh: rebasing from sh here would silently
        # discard the left_semi candidate gate above and pay the all-docs
        # co-shingle explosion the LSH prune exists to avoid (measured: the
        # 1M-doc probe spent ~70% of its ladder wall in exactly that join)
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("h")
        )
        join_sh = join_sh.join(F.broadcast(hot), on="h", how="left_anti")
    a, b = join_sh.alias("a"), join_sh.alias("b")
    inter = (
        a.join(b, on="h")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="left_semi")
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("id_a", "id_b", "jaccard")


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 2,
    mode: str = "raw",
) -> DataFrame:
    """Benchmark decontamination: (corpus_id, bench_id, n_shared) for every
    corpus doc sharing ≥ ``min_shared`` distinct word n-grams with a
    benchmark doc — the containment check run before training to drop
    eval-set leakage.

    Scale shape: the benchmark side is small by definition — its distinct
    shingles broadcast, so the corpus side streams through one codegen pass
    and the broadcast join FILTERS BEFORE the distinct: only shingles that
    actually hit a benchmark shingle reach any shuffle (the set-semantics
    dedup runs over hits, not over the corpus — deduping the whole corpus
    shingle stream first would shuffle every (doc, shingle) string at
    100 TB for a filter that discards almost all of them).  This is
    containment (shared-shingle count), deliberately NOT Jaccard: a
    50-token benchmark question inside a 10k-token document has tiny
    Jaccard but is still contamination."""
    c_sh = shingle_hashes(corpus, id_col, text_col, n=n, mode=mode)
    b_sh = (
        shingle_hashes(benchmark, id_col, text_col, n=n, mode=mode)
        .distinct()
        .select(F.col("id").alias("bench_id"), "h")
    )
    hits = c_sh.join(F.broadcast(b_sh), on="h").distinct()  # set semantics on HITS
    return (
        hits.groupBy(F.col("id").alias("corpus_id"), "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.5,
    mode: str = "raw",
    candidates: DataFrame | None = None,
    max_df: int | None = None,
    survivors: DataFrame | None = None,
) -> DataFrame:
    """The full dedup ladder composed end-to-end (the corpus-clean pass):

    1. exact dedup — keep the min-id canonical of every byte-identical group;
    2. near-dup prune — among the canonicals, drop every doc that has an
       n-gram-Jaccard ≥ τ near-dup with a SMALLER id (greedy one-pass rule:
       deterministic and join-expressible; a full union-find transitive
       closure is iterative and deliberately out of scope).

    At 100 TB pass ``candidates=lsh_candidate_pairs(...)`` so step 2 only
    verifies LSH survivors; without it the verify self-joins on shingles
    (exact, used by the correctness gate at small SF)."""
    # survivors feeds the verify pipeline AND the final anti-join (and the
    # LSH-gated caller's signature path — pass the SAME persisted frame via
    # ``survivors=`` so the exact-dedup pass isn't recomputed per consumer);
    # at petabyte scale materialize it to a snapshot table instead
    if survivors is None:
        survivors = dedup_keep_canonical(df, id_col, text_col).persist()
    pairs = ngram_jaccard_pairs(
        survivors, id_col, text_col, threshold=jaccard_threshold, mode=mode,
        candidates=candidates, max_df=max_df,
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return survivors.join(drops, on=id_col, how="left_anti")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash): b-bit majority signature over portable word codes.
    Near-dups differ in ≤3 bits; pair lookup = bit_count(xor) ≤ r.

    The word codes are STAGED behind a projection (higher-order functions
    block subexpression elimination — recomputing the word hashing per
    reference measured 2.4× slower), and the per-bit ones-counts come from
    ONE aggregate pass building an array<long>[bits] accumulator via
    zip_with against a powers-of-two array (b separate aggregates, each
    re-traversing the codes, measured 1.35× slower; shiftright needs a
    literal shift so the bit test is floor(c/2^b) mod 2 — exact for codes
    < 2^30 ≪ 2^53)."""
    df = df.select(F.col(id_col), word_codes(F.col(text_col)).alias("_codes"))
    codes = F.col("_codes")
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    counts = F.aggregate(
        codes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, c: F.zip_with(
            acc, powers, lambda a, p: a + F.pmod(F.floor(c / p).cast("long"), F.lit(2))
        ),
    )
    staged = df.select(F.col(id_col), F.size(codes).alias("_n"), counts.alias("_cnt"))
    total = None
    for b in range(bits):
        col = F.when(
            F.element_at(F.col("_cnt"), b + 1) * 2 > F.col("_n").cast("long"), F.lit(1 << b)
        ).otherwise(F.lit(0))
        total = col if total is None else total + col
    return staged.select(F.col(id_col).alias("id"), total.cast("long").alias("simhash"))


def simhash_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All-pairs reference form (bit_count(a^b) ≤ r) — verification scale
    only; the keyed/scale path is ``simhash_banded_pairs`` below."""
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
    )


def simhash_banded_pairs(
    sig: DataFrame, bits: int = 16, bands: int = 4, max_hamming: int | None = None
) -> DataFrame:
    """Scale path for simhash pair search: split the b-bit signature into
    ``bands`` contiguous bit-blocks and equi-join on (band, block).

    Pigeonhole EXACTNESS (not probabilistic): a pair differing in
    ≤ bands−1 bits must agree on at least one whole block, so with the
    default max_hamming = bands−1 this finds exactly the same pairs as the
    all-pairs form — but the pair join is an equi-join whose volume is
    collision-sized, never n².  Only (id, simhash, band, block) rows
    shuffle; ``distinct`` dedups pairs that collide in several bands."""
    if max_hamming is None:
        max_hamming = bands - 1
    if max_hamming > bands - 1:
        raise ValueError(f"banding is exact only for hamming ≤ bands-1 ({bands - 1})")
    rb = bits // bands
    mask = (1 << rb) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * rb).bitwiseAND(F.lit(mask)).alias("blk"),
            )
            for b in range(bands)
        ]
    )
    bk = sig.select("id", "simhash", F.explode(blocks).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.blk").alias("blk")
    ).persist()  # self-joined: without persist the simhash aggregate runs twice
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, on=["band", "blk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _dup_window_frames(
    df: DataFrame, id_col: str, text_col: str, k: int, min_df: int,
    max_df: int | None = None, digest: str = "md5",
):
    """Shared single-digest-pass ladder for the duplicate-span operators:
    k-word window md5 digests + positions (one posexplode), grouped to one
    row per (digest, doc) with that doc's position list, then the ≥ *min_df*
    document-frequency gate.  Returns
    (base(id, n_words, _w, _sh), dup(h, id, _ps, _df)).

    ``max_df`` (τ) is the 100 TB skew control, the same broadcast hot-set
    pattern as :func:`ngram_jaccard_pairs`'s shingle cap: a boilerplate
    digest shared by 10⁶ docs must never concentrate its rows on one task.

    - ``max_df=None``: document frequency from a count window over the
      digest partition — exact, but a hot digest pins one task (fine at
      verification scale only).
    - ``max_df=τ`` (τ ≥ min_df): digest df comes from a hash AGGREGATE
      (map-side partial combine — a hot key contributes one partial row per
      task, never a windowed buffer).  Digests with df > τ form the hot set
      (≤ #windows/τ rows by construction, so it broadcasts); their rows are
      *known duplicates* — df > τ ≥ min_df — and skip the df join entirely
      via a broadcast semi-join, with _df CLAMPED to τ (clamp, don't drop:
      a span above the cap is a certain dup, so the ≥ min_df semantics are
      preserved exactly).  Cold digests (df ≤ τ) equi-join their exact df —
      bounded at τ rows per key, so no task can be pinned.  Output is
      provably identical to the uncapped form for every τ ≥ min_df.

    The (digest, doc) frame is persisted on the capped path (three
    consumers: df aggregate, hot semi-join, cold anti-join) — caller-owned
    lifetime, same contract as the textstats vocab caches.

    ``digest`` picks the window-digest function: ``"md5"`` (default — the
    oracle-parity form, DuckDB has md5) or ``"xxhash64"`` (the 100 TB form:
    an 8-byte long instead of a 32-char hex string through every shuffle
    and join; engine-native, no hex encode).  The digest only BUCKETS
    identical windows, so both forms produce identical operator output —
    pytest-checked."""
    if digest not in ("md5", "xxhash64"):
        raise ValueError(f"digest must be 'md5' or 'xxhash64', got {digest!r}")
    digest_fn = F.md5 if digest == "md5" else F.xxhash64
    null_arr = "array<string>" if digest == "md5" else "array<bigint>"
    staged = df.select(F.col(id_col).alias("id"), words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    windows = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: digest_fn(F.array_join(F.slice(w, i + 1, k), " ")),
        ),
    ).otherwise(F.array().cast(null_arr))
    base = staged.select("id", F.size(w).alias("n_words"), w, windows.alias("_sh"))
    pos_h = base.select("id", F.posexplode("_sh").alias("pos", "h"))
    per_doc = pos_h.groupBy("h", "id").agg(
        F.collect_list(F.col("pos").cast("long")).alias("_ps")
    )
    if max_df is None:
        from pyspark.sql import Window

        dup = per_doc.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        ).filter(F.col("_df") >= min_df)
        return base, dup
    if max_df < min_df:
        raise ValueError(
            f"max_df ({max_df}) must be ≥ min_df ({min_df}): a digest above "
            "the cap must be a certain duplicate for the clamp to be exact"
        )
    per_doc = per_doc.persist()
    dfreq = per_doc.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    hot = dfreq.filter(F.col("_df") > max_df).select("h")
    dup_hot = per_doc.join(F.broadcast(hot), "h", "left_semi").withColumn(
        "_df", F.lit(max_df).cast("long")
    )
    dup_cold = (
        per_doc.join(F.broadcast(hot), "h", "left_anti")
        .join(dfreq, "h")
        .filter(F.col("_df") >= min_df)
    )
    return base, dup_hot.unionByName(dup_cold)


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_df: int = 2,
    max_df: int | None = None,
    digest: str = "md5",
) -> DataFrame:
    """Exact duplicate-SPAN exposure (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", public): per document, how
    many of its tokens sit inside a run of ≥ *k* consecutive words that also
    appears verbatim in ≥ *min_df* distinct documents — the substring-level
    signal document-level MinHash misses (a unique page wrapping a copied
    license block or boilerplate footer).

    Plan, all built-ins, ONE digest pass (the md5-per-window projection is
    the CPU hotspot, so the plan is shaped to evaluate it exactly once —
    the earlier two-consumer form ran the explode+md5 subtree twice):
    1. every k-word window → md5 digest + its position (one staged split +
       posexplode: one row per token, linear);
    2. group to one row per (digest, doc) carrying that doc's position
       list; document frequency = a count window over the digest partition
       (the rows are distinct (digest, doc) pairs by construction);
    3. per doc the covered token count is an exact interval-union fold over
       the SORTED flattened position list (aggregate with a
       (total, prev_end) struct accumulator — pure codegen, no UDF).
    Shuffles carry (digest, doc, positions) rows only.  At 100 TB swap the
    md5 for xxhash64 (engine-native) and pass ``max_df`` — the broadcast
    hot-set clamp in :func:`_dup_window_frames` that keeps a boilerplate
    digest's zipf head off any single task (provably identical output for
    any τ ≥ min_df).  Docs shorter than k words report 0.

    Returns (id, n_words, dup_tokens, dup_span_ratio)."""
    base, dup = _dup_window_frames(df, id_col, text_col, k, min_df, max_df, digest)
    init = F.struct(
        F.lit(0).cast("long").alias("t"), F.lit(-(k + 1)).cast("long").alias("e")
    )
    covered = dup.groupBy("id").agg(
        F.aggregate(
            F.array_sort(F.flatten(F.collect_list("_ps"))),
            init,
            lambda acc, p: F.struct(
                (acc["t"] + k - F.greatest(F.lit(0).cast("long"), acc["e"] - p)).alias("t"),
                (p + k).alias("e"),
            ),
        )["t"].alias("dup_tokens")
    )
    return (
        base.select("id", "n_words")
        .join(covered, "id", "left")
        .select(
            F.col("id"),
            "n_words",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.greatest("n_words", F.lit(1)), 4
            ).alias("dup_span_ratio"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_df: int = 2,
    max_df: int | None = None,
    with_text: bool = False,
    digest: str = "md5",
) -> DataFrame:
    """Exact duplicate-SPAN removal (the action Lee et al. 2021 take on the
    signal :func:`duplicate_span_stats` measures): excise from every
    document each token covered by a ≥ *k*-word run appearing verbatim in
    ≥ *min_df* distinct documents, keeping the rest in order.

    Shares the single-digest-pass ladder (``_dup_window_frames``), then:
    duplicated window starts explode into their k covered positions
    (distinct), the token stream anti-joins the covered set on (doc, pos),
    and the survivors fold back into one row per doc.  The cleaned text is
    emitted as an md5 digest of the kept-token join (scalar — the driver
    canonicalizer and an independent engine can value-check contents
    without comparing raw arrays); fully-covered docs report n_kept=0 with
    md5('').  Shuffles carry (doc, digest)/(doc, pos) rows only — linear.
    ``max_df`` enables the broadcast hot-set df clamp (see
    :func:`_dup_window_frames`) — identical output, skew-proof at 100 TB.

    Returns (id, n_words, n_kept, clean_md5); with ``with_text`` also the
    reconstructed ``clean_text`` itself (the pipeline form — downstream
    quality gates and packing consume the cleaned document, md5 is the
    value-check form of the same string)."""
    base, dup = _dup_window_frames(df, id_col, text_col, k, min_df, max_df, digest)
    cov = (
        dup.select("id", F.explode("_ps").alias("p"))
        .select(
            "id",
            F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))).alias("pos"),
        )
        .distinct()
    )
    toks = base.select("id", F.posexplode("_w").alias("pos", "w")).withColumn(
        "pos", F.col("pos").cast("long")
    )
    kept = toks.join(cov, ["id", "pos"], "left_anti")
    agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
        ).alias("_ct"),
    )
    out = (
        base.select("id", "n_words")
        .join(agg, "id", "left")
        .select(
            "id",
            "n_words",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.md5(F.coalesce("_ct", F.lit(""))).alias("clean_md5"),
            F.coalesce("_ct", F.lit("")).alias("clean_text"),
        )
    )
    return out if with_text else out.drop("clean_text")


def cross_source_overlap(
    df: DataFrame, group_col: str, text_col: str, n: int = 3, mode: str = "raw"
) -> DataFrame:
    """Pairwise cross-source shingle-leakage matrix: for every unordered
    pair of sources, the number of DISTINCT word n-gram shingles present in
    BOTH — the train/eval (and source/source) leakage audit run before a
    mixture is frozen (the decontamination matrix behind GPT-3 §C /
    Gopher §A2-style overlap reports, public).

    Scale shape: the multiplicity of a shingle hash after
    ``distinct (source, h)`` is bounded by #sources, so the self-join
    fan-out per shingle is ≤ #sources² REGARDLESS of how hot the shingle
    is — no df cap needed (contrast the doc-keyed candidate join in
    ``verify_jaccard``, where multiplicity is unbounded and ``max_df``
    exists).  One explode → distinct → self-equi-join on h → #source²-row
    aggregate; nothing after the distinct is corpus-sized."""
    sh = shingle_hashes(
        df.select(F.col(group_col).alias("_g"), F.col(text_col)),
        "_g",
        text_col,
        n=n,
        mode=mode,
    ).distinct()
    a = sh.select(F.col("id").alias("src_a"), "h")
    b = sh.select(F.col("id").alias("src_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def source_fingerprint_overlap(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """(src_a, src_b, shared_fps): doc-LEVEL exact-dup overlap matrix — for
    every unordered source pair, the number of DISTINCT whole-document
    fingerprints present in BOTH (diagonal = distinct fingerprints per
    source).  The mixture-planning complement to cross_source_overlap's
    shingle-level leakage: this one prices "how much of source A is source
    B verbatim", which decides whether cross-source dedup is worth a pass
    before the mixture is frozen.

    Scale shape: identical to cross_source_overlap — after
    ``distinct (fp, source)`` a fingerprint's multiplicity is ≤ #sources,
    so the self-equi-join on fp fans out ≤ #sources² per fp no matter how
    duplicated the doc is; output is #sources²-row tiny."""
    d = df.select(
        F.md5(F.col(text_col)).alias("fp"), F.col(group_col).alias("_src")
    ).distinct()
    a = d.select("fp", F.col("_src").alias("src_a"))
    b = d.select("fp", F.col("_src").alias("src_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("src_a") <= F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    para_words: int = 20,
    with_text: bool = False,
) -> DataFrame:
    """Paragraph-level exact dedup (the C4 / Dolma `dedupe.paragraphs`
    action: drop every later occurrence of a paragraph seen anywhere in the
    corpus, keep documents' surviving paragraphs in order).  This corpus is
    newline-free, so "paragraph" is the deterministic fixed-width analog —
    consecutive *para_words*-word blocks (the last block may be short);
    with newline-delimited text the split expression is the only change.

    Contrast with :func:`remove_duplicate_spans`: that operator digests
    every OVERLAPPING k-word window (|words| rows/doc) and excises exact
    interval unions; this one digests |words|/P non-overlapping blocks —
    the cheap first-pass form the public pipelines run corpus-wide before
    any window-level pass.

    Shape at 10¹² rows: block digests flow into ONE hash aggregate
    (map-side partial combine — a boilerplate paragraph contributes one
    partial per task, never a windowed buffer; min(struct(id, idx)) picks
    the canonical first occurrence by (id, idx) order, the same
    rerun-stable rule as exact_dedup) and one equi-join back on the digest
    (build side is 1 row per digest; probe-side zipf heat is AQE
    skew-split).  Reassembly is a per-doc hash agg over kept blocks.  The
    cleaned text is value-checked as md5; fully-deduped docs report
    n_kept=0 with md5('').

    Returns (id, n_para, n_kept, clean_md5[, clean_text])."""
    p = F.lit(para_words)
    base = df.select(
        F.col(id_col).alias("id"),
        words(F.col(text_col)).alias("_w"),
    ).select(
        "id", "_w", F.ceil(F.size("_w") / p).cast("long").alias("n_para")
    )
    paras = base.select(
        "id",
        "n_para",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_para") - 1),
                lambda i: F.array_join(F.slice("_w", i * p + 1, p), " "),
            )
        ).alias("idx", "para"),
    ).withColumn("idx", F.col("idx").cast("long")).withColumn(
        "h", F.md5("para")
    )
    keeper = paras.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("_k")
    )
    kept = (
        paras.join(keeper, "h")
        .filter((F.col("id") == F.col("_k.id")) & (F.col("idx") == F.col("_k.idx")))
    )
    agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
        ).alias("_ct"),
    )
    out = (
        base.select("id", "n_para")
        .join(agg, "id", "left")
        .select(
            "id",
            "n_para",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.md5(F.coalesce("_ct", F.lit(""))).alias("clean_md5"),
            F.coalesce("_ct", F.lit("")).alias("clean_text"),
        )
    )
    return out if with_text else out.drop("clean_text")
