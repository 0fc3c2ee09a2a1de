"""Training-sequence packing & token statistics (engine extensions).

The input contract (BASELINE.json input_hint) is a corpus of pre-tokenized
training sequences; the two operators a 100 TB training-data pipeline runs
on such a table constantly:

- **token_freq_topk** — global token frequency (vocabulary audit, UNK-rate
  checks).  Pure built-ins: explode → two-phase hash aggregate → top-k.
  Bytes shuffled ≈ #distinct tokens (partial map-side combine), NOT #tokens:
  the plan that survives 10^12 rows.

- **pack_sequences** — greedy sequential packing of documents into
  fixed-length training bins (the "sample packing" step before pretraining).
  Custom stateful-per-group logic Spark lacks → ``applyInPandas`` (the
  sanctioned custom-operator path; Arrow batch in/out, numpy inside, no
  per-row Python dispatch).  Groups are ``(source, salt)`` so the zipf-head
  source spreads over many independent packing tasks; determinism comes from
  sorting by doc_id inside each group, so results are stable under any
  partitioning/parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PACK_SCHEMA = (
    "source string, salt int, pack_id bigint, doc_ids array<string>, "
    "tokens array<int>, n_tok int, n_docs int, fill_ratio double"
)


def token_freq_topk(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Top-k whitespace tokens by global frequency (deterministic tie-break).

    explode → partial count per partition → final count → top-k.  The sort
    runs over #distinct tokens only; at corpus scale cap the explode cost
    with a pre-filter (`n_chars` bound) or sampling upstream.
    """
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    counts = toks.filter(F.col("tok") != "").groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(k)


def _pack_group(pdf: pd.DataFrame, max_len: int) -> pd.DataFrame:
    """Greedy sequential packing of one (source, salt) group.

    Docs in doc_id order; a doc that would overflow the open bin closes it.
    Docs longer than max_len are truncated to max_len (their tail dropped —
    the standard pretraining choice; count surfaced via fill_ratio).
    """
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    lens = np.minimum(pdf["n_tok"].to_numpy(), max_len)
    # bin assignment: sequential greedy via cumulative sum with resets.
    bin_ids = np.empty(len(pdf), dtype=np.int64)
    acc = 0
    b = 0
    for i, ln in enumerate(lens):  # per-document (not per-token) loop
        if acc + ln > max_len and acc > 0:
            b += 1
            acc = 0
        bin_ids[i] = b
        acc += int(ln)
    out_rows = []
    src = pdf["source"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    for b in range(bin_ids.max() + 1 if len(pdf) else 0):
        sel = pdf[bin_ids == b]
        toks: list[int] = []
        for t, ln in zip(sel["tokens"], np.minimum(sel["n_tok"].to_numpy(), max_len)):
            toks.extend(list(t[: int(ln)]))
        out_rows.append(
            (
                src,
                salt,
                b,
                list(sel["doc_id"]),
                toks,
                len(toks),
                len(sel),
                round(len(toks) / max_len, 4),
            )
        )
    return pd.DataFrame(
        out_rows,
        columns=["source", "salt", "pack_id", "doc_ids", "tokens", "n_tok", "n_docs", "fill_ratio"],
    )


def pack_sequences(
    df: DataFrame,
    max_len: int = 2048,
    salt_buckets: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
    salt_mode: str = "native",
) -> DataFrame:
    """Pack sequences into ≤max_len training bins, parallel by (source, salt).

    Deterministic for a fixed (input, max_len, salt_buckets): the salt is a
    pure hash of doc_id and each group sorts internally — re-running at any
    cluster size yields identical packs.  ``salt_mode='portable'`` uses the
    integer-arithmetic bucket an independent engine can regenerate (the
    DuckDB oracle replays the greedy walk with a recursive CTE); 'native'
    keeps the xxhash64 salt for the hot path.
    """
    from ..functions.hashing import portable_bucket

    salt = (
        F.pmod(F.xxhash64(id_col), F.lit(salt_buckets))
        if salt_mode == "native"
        else portable_bucket(F.col(id_col), salt_buckets)
    )
    salted = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).alias("tokens"),
        F.col(source_col).alias("source"),
        F.size(tokens_col).cast("int").alias("n_tok"),
        salt.cast("int").alias("salt"),
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_group(pdf, max_len)

    return salted.groupBy("source", "salt").applyInPandas(apply, PACK_SCHEMA)


def packing_stats(packed: DataFrame, max_len: int | None = None) -> DataFrame:
    """Fill-efficiency report per source (waste audit for the packing run).

    With ``max_len``, avg_fill = sum(n_tok)/(n_packs·max_len) computed from
    EXACT integer sums (deterministic across engines/orders — every pack
    holds ≤ max_len tokens, so this equals the mean per-pack fill before
    rounding); without it, the mean of the per-pack rounded ratios."""
    avg_fill = (
        F.round(F.avg("fill_ratio"), 4)
        if max_len is None
        else F.round(F.sum("n_tok") / F.count(F.lit(1)) / F.lit(max_len), 4)
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tok").alias("n_tok"),
        avg_fill.alias("avg_fill"),
    )


def _seq_chunk_iter(max_len: int):
    """mapInPandas kernel: re-chunk a token stream into exact max_len windows
    (the 'concat-then-split' packing variant used for causal LM training —
    no padding, documents may span chunk boundaries within a partition)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: list[int] = []
        for pdf in batches:
            for toks in pdf["tokens"]:
                carry.extend(list(toks))
            n_full = len(carry) // max_len
            if n_full:
                arr = np.asarray(carry[: n_full * max_len], dtype=np.int32).reshape(
                    n_full, max_len
                )
                yield pd.DataFrame({"tokens": [list(r) for r in arr]})
                carry = carry[n_full * max_len :]
        # tail (< max_len) dropped, as in standard LM pretraining

    return fn


def chunk_token_stream(df: DataFrame, max_len: int = 2048, tokens_col: str = "tokens") -> DataFrame:
    """Concat-and-split packing: every output row is exactly max_len tokens."""
    return df.select(F.col(tokens_col).alias("tokens")).mapInPandas(
        _seq_chunk_iter(max_len), "tokens array<int>"
    )


def _global_prefix_sum(
    df: DataFrame, order_cols: list[str], weight_col: str, out_col: str
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over the GLOBAL order of
    ``order_cols`` — two-phase distributed, never a one-partition Window:

    1. range-repartition + sort-within on the order key, then
       ``localCheckpoint(eager=True)``.  Range boundaries are SAMPLED per
       evaluation, so the frame that feeds BOTH the per-partition totals and
       the local cumsum must be pinned to ONE materialization; a checkpoint
       (unlike ``persist``, whose evicted blocks silently recompute with
       fresh boundaries) truncates lineage — a lost block fails the job
       loudly instead of mis-aligning offsets.
    2. per-partition weight totals → prefix offsets (a #partitions-row
       aggregate, broadcast back) + per-partition running sum.

    Returns the input columns plus ``out_col`` (sum of weights of all rows
    strictly before this row in the global order)."""
    from pyspark.sql import Window

    staged = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = staged.groupBy("_pid").agg(F.sum(weight_col).alias("_w"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_w").over(off_w), F.lit(0)).alias("_part_off")
    )
    run_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        staged.withColumn("_run", F.sum(weight_col).over(run_w))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn(out_col, F.col("_part_off") + F.col("_run") - F.col(weight_col))
        .drop("_pid", "_run", "_part_off")
    )


def chunk_token_stream_global(
    df: DataFrame,
    max_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    with_tokens: bool = False,
) -> DataFrame:
    """Concat-and-split packing with a DETERMINISTIC global stream order —
    the fully parallel, value-checkable form of ``chunk_token_stream``.

    The virtual token stream is the concatenation of all docs ordered by
    ``id_col``; chunk *c* holds global token positions
    ``[c·max_len, (c+1)·max_len)``; the trailing partial chunk is dropped
    (standard causal-LM packing).  Plan, all built-ins:

    1. exclusive global token offset per doc via :func:`_global_prefix_sum`
       (two-phase rank — no single-partition funnel);
    2. each doc explodes into the ≤ ⌈n_tok/max_len⌉+1 chunk ids it overlaps
       and contributes an ``F.slice`` of its token array per chunk — rows
       shuffled ≈ #docs + #chunks carrying array SEGMENTS, never one row
       per token;
    3. groupBy(chunk_id): sort segments by their start offset within the
       chunk, flatten, keep exactly-max_len chunks.

    Output: ``chunk_id`` (global 0-based ordinal), ``chunk_md5`` (digest of
    the comma-joined token list — lets an independent engine value-check
    chunk CONTENTS without comparing raw arrays), ``n_tok``, and the token
    array itself when ``with_tokens``.  Deterministic at any parallelism."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_toks"),
        # size() is -1 for a NULL array — coalesce to 0 and drop empty docs
        # BEFORE the prefix sum, or a null-array doc would contribute -1 to
        # the global offsets and shift every later chunk by one token.
        F.greatest(F.size(tokens_col).cast("bigint"), F.lit(0).cast("bigint")).alias("_n"),
    ).filter(F.col("_n") > 0)
    with_off = _global_prefix_sum(base, ["_id"], "_n", "_off")
    first_c = F.floor(F.col("_off") / max_len)
    last_c = F.floor((F.col("_off") + F.col("_n") - 1) / max_len)
    seg = with_off.select(
        "_off", "_toks", "_n", F.explode(F.sequence(first_c, last_c)).alias("chunk_id")
    )
    g_start = F.greatest(F.col("chunk_id") * max_len, F.col("_off"))
    g_end = F.least((F.col("chunk_id") + 1) * max_len, F.col("_off") + F.col("_n"))
    pieces = seg.select(
        "chunk_id",
        (g_start - F.col("chunk_id") * max_len).cast("int").alias("_pos"),
        F.slice(
            "_toks", (g_start - F.col("_off") + 1).cast("int"), (g_end - g_start).cast("int")
        ).alias("_piece"),
    )
    chunks = (
        pieces.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_piece"))),
                    lambda x: x["_piece"],
                )
            ).alias("tokens")
        )
        .filter(F.size("tokens") == max_len)
    )
    out = chunks.select(
        "chunk_id",
        F.md5(F.array_join(F.transform("tokens", lambda t: t.cast("string")), ",")).alias(
            "chunk_md5"
        ),
        F.size("tokens").alias("n_tok"),
        "tokens",
    )
    return out if with_tokens else out.drop("tokens")


def epoch_shuffle(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Deterministic global training-epoch shuffle: a total order derived
    from md5(id:seed), exposed as ``shuffle_pos`` (1-based).

    Every epoch of a pretraining run consumes the corpus in a fresh but
    REPRODUCIBLE permutation; hashing the id with the epoch seed gives the
    same permutation on any cluster size (md5 is engine-portable, unlike
    xxhash64/rand).  The plan is one narrow global sort over (hash, id) —
    a range-partitioned exchange, the same shape as any ORDER BY at scale;
    for write-out pipelines that only need per-file randomness, sort WITHIN
    partitions by the same key instead (repartitionByRange(hash) +
    sortWithinPartitions) and skip the global merge.  The id tie-break
    makes the permutation total even on the 2^-64 hash-collision path.

    Position assignment is the two-phase distributed global rank — NOT a
    global Window.orderBy, which collapses every row into ONE partition
    (the canonical window-function scale-killer).  Because the sort key is
    a UNIFORM md5 hex string, the range split needs no boundary sampling:
    the leading ``hex_chars`` characters of the key ARE a deterministic,
    order-preserving bucket (bucket b's keys all sort before bucket b+1's).
    (1) bucket = int(hex prefix); (2) rank within bucket (hash-partitioned
    window — balanced, 16^hex_chars buckets); (3) add per-bucket row-count
    prefix offsets (a #buckets-row aggregate, broadcast back).  Fully
    deterministic with NO persist/checkpoint dependence — unlike a sampled
    ``repartitionByRange``, re-evaluating the frame cannot re-draw
    boundaries, so executor loss recomputes the identical answer."""
    from pyspark.sql import Window

    hex_chars = 3  # 4096 buckets; raise to 4 (65536) beyond ~10^10 rows
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    keyed = df.select(
        F.col(id_col), key.alias("_sk")
    ).withColumn("_b", F.conv(F.substring("_sk", 1, hex_chars), 16, 10).cast("int"))
    # prefix offsets: #buckets rows — window over that tiny frame is fine
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    local_w = Window.partitionBy("_b").orderBy(F.col("_sk").asc(), F.col(id_col).asc())
    return (
        keyed.withColumn("_r", F.row_number().over(local_w))
        .join(F.broadcast(offsets), on="_b")
        .select(F.col(id_col), (F.col("_off") + F.col("_r")).alias("shuffle_pos"))
    )


def oov_rate_by_source(
    df: DataFrame, text_col: str, source_col: str, vocab_size: int = 256
) -> DataFrame:
    """Tokenizer-coverage audit: per-source out-of-vocabulary occurrence rate
    against the corpus's own top-``vocab_size`` token vocabulary — the check
    a pretraining pipeline runs before freezing a tokenizer (a source whose
    OOV/UNK rate is an outlier is mis-tokenized, wrong-language, or binary
    junk; cf. the vocabulary-coverage audits in Sennrich et al. 2016 BPE and
    the fastText-era corpus reports).

    Vocabulary membership is deterministic: rank by (count DESC, token ASC),
    so boundary ties are stable across engines and reruns.

    Plan shape at 10^12 tokens: one explode feeding a (source, token) hash
    aggregate (partial map-side combine shrinks it to ~|sources|·|vocab|
    observed pairs — the explode stream is never shuffled raw); the global
    vocab is a token-keyed re-aggregate of that table (vocab-sized), and its
    top-V cut is a broadcast (V rows, config-sized) left-joined back.  The
    final per-source rollup is a |sources|-group aggregate.  No UDF, no
    driver collect.
    """
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        st.groupBy("tok")
        .agg(F.sum("n").alias("cn"))
        .orderBy(F.desc("cn"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in"))
    )
    agg = (
        st.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_tok"),
            F.sum(F.when(F.col("_in").isNull(), F.col("n")).otherwise(F.lit(0))).alias(
                "oov_tok"
            ),
        )
    )
    return agg.select(
        "source",
        "total_tok",
        "oov_tok",
        F.round(F.col("oov_tok").cast("double") / F.col("total_tok"), 6).alias(
            "oov_rate"
        ),
    )


def padding_efficiency(
    df: DataFrame, text_col: str, lengths: tuple[int, ...] = (64, 128, 256, 512)
) -> DataFrame:
    """Context-length sizing audit: for each candidate training context
    length L, the padding waste of the naive one-doc-per-bin layout —
    ceil(n/L) bins of L tokens each, so pad = ceil(n/L)·L − n per doc.  The
    fill_ratio column is the number ``pack_sequences`` packing must beat;
    comparing the two picks the context length / packing policy before a
    100 TB tokenization run commits to one.

    All arithmetic is exact int64 (``(n + L − 1) div L``, no float ceil), so
    an independent engine reproduces every cell; the only division is the
    final rounded ratio.  Plan: per-doc token count (map-only), a
    |lengths|-way explode of a literal array, one hash aggregate with
    |lengths| groups.  Linear, no shuffle beyond the final tiny aggregate.
    """
    n = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    staged = df.select(n.alias("n")).select(
        F.explode(F.array([F.lit(int(c)) for c in lengths])).alias("ctx"), F.col("n")
    )
    b = staged.withColumn(
        "bins", F.expr("div(n + ctx - 1, ctx)")
    )
    return (
        b.groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tok"),
            F.sum("bins").alias("n_bins"),
            F.sum(F.col("bins") * F.col("ctx") - F.col("n")).alias("pad_tok"),
            F.round(
                F.sum("n").cast("double") / F.sum(F.col("bins") * F.col("ctx")), 6
            ).alias("fill_ratio"),
        )
        .orderBy("ctx")
    )


def token_coverage_curve(
    df: DataFrame, text_col: str, max_rank_log2: int = 16
) -> DataFrame:
    """Vocabulary-sizing curve: for each power-of-two rank V = 1, 2, 4, …,
    the fraction of all corpus token OCCURRENCES covered by the top-V tokens
    — the plot a tokenizer design reads to pick vocab size (the knee of this
    curve is where BPE merges stop paying; cf. the coverage tables in
    Sennrich et al. 2016).  Ranking is (count DESC, token ASC), so the curve
    is deterministic across engines and reruns.

    Scale shape: the corpus stream is reduced to a token-keyed hash
    aggregate (map-side combine; vocab-sized output) before anything else.
    The rank assignment is a global Window over THE VOCAB TABLE ONLY —
    bounded by distinct-token count, which does not grow with corpus size
    (Heaps-law sublinear; ~10^6 rows at web scale), so the single-partition
    window sort is a deliberate, documented exception to the no-global-
    window rule (contrast ``epoch_shuffle``, whose sort domain IS the
    corpus and therefore uses the two-phase rank).  The corpus total rides
    the same aggregate; output is ≤ max_rank_log2+1 rows.
    """
    from pyspark.sql import Window

    uni = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = uni.select(
        F.col("n"),
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    marks = [1 << i for i in range(max_rank_log2 + 1)]
    return (
        ranked.filter(F.col("rank").isin(marks))
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            F.col("cum").alias("cum_tok"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("rank")
    )


def sliding_window_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    size: int = 256,
    stride: int = 128,
) -> DataFrame:
    """Stride-overlap context windows per document (the tokenizer
    ``return_overflowing_tokens`` convention): windows of exactly
    ``min(size, n)`` tokens starting at 0, stride, 2·stride, …, with the
    LAST window clamped to end at the document end so every token is
    covered and no window is shorter than the clamp allows.  The
    overlapping complement to ``chunk_token_stream_global``'s disjoint
    concat-and-split: this one keeps document boundaries and trades
    duplicate tokens for full-context training windows.

    Doc-local by construction — start offsets come from a per-row
    ``sequence``, so there is NO cross-doc coordination, no prefix sum, no
    shuffle: one codegen projection + explode, embarrassingly parallel at
    any corpus size.

    Returns (id, start, n_tok, chunk_md5) — the md5 of the comma-joined
    token ids value-checks every token of every window."""
    if not 0 < stride <= size:
        raise ValueError("need 0 < stride <= size")
    n = F.size(F.col(tokens_col))
    last = F.greatest(n - size, F.lit(0))
    starts = F.array_distinct(
        F.concat(
            F.filter(
                F.sequence(F.lit(0), last, F.lit(stride)), lambda s: s < last
            ),
            F.array(last),
        )
    )
    chunk = F.slice(F.col(tokens_col), F.col("start") + 1, size)
    return (
        df.filter(n > 0)
        .select(F.col(id_col).alias("id"), F.col(tokens_col), F.explode(starts).alias("start"))
        .select(
            "id",
            F.col("start").cast("bigint").alias("start"),
            F.size(chunk).cast("int").alias("n_tok"),
            F.md5(F.concat_ws(",", chunk.cast("array<string>"))).alias("chunk_md5"),
        )
    )
