"""Byte-pair-encoding merge learning over a distributed corpus (engine
extension — tokenizer-training support).

Not in the reference (the collector ships tokenized bodies opaquely); a
training-data platform needs the step that PRODUCES the tokenizer: BPE
(Sennrich et al. 2016, public) — repeatedly count adjacent symbol pairs over
the whole corpus, merge the most frequent pair everywhere, repeat.

Shapes, all built-ins:

- :func:`pair_counts` — one array transform + explode + hash aggregate; the
  shuffle carries (w1, w2, partial-count) rows only, i.e. vocabulary-sized
  after map-side combine, never corpus-sized.
- :func:`top_merges` — deterministic top-k (count desc, then pair lexicographic)
  so every engine picks the same merge under ties.
- :func:`apply_merge` — per-row left-to-right non-overlapping greedy merge as
  an ``aggregate`` fold with a (built-array, pending-symbol) accumulator:
  pure codegen projection, no shuffle, no UDF.  The fold copies the array per
  element (O(len²) bytes per doc) — fine for document-scale rows; at 100 TB
  with multi-KB docs swap the fold for the mapInPandas kernel shape used by
  ``packing._seq_chunk_iter`` (same signature, Arrow-batched).
- :func:`learn_merges` — the driver loop: each round is one pair-count
  aggregate plus a 1-row collect (the argmax merge — config-sized, like the
  IVF Lloyd centroid collect), then a merge projection;
  ``localCheckpoint`` per round truncates the expression/lineage stack the
  way ``components.connected_components`` does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def pair_counts(arrs: DataFrame, arr_col: str = "toks") -> DataFrame:
    """Corpus-wide adjacent-pair frequencies over an array<string> column.

    Overlapping occurrences count (standard BPE statistics: 'a a a' yields
    (a,a) twice).  Returns (w1, w2, cnt)."""
    w = F.col(arr_col)
    return (
        arrs.filter(F.size(w) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - 2),
                    lambda i: F.struct(
                        F.element_at(w, (i + 1).cast("int")).alias("w1"),
                        F.element_at(w, (i + 2).cast("int")).alias("w2"),
                    ),
                )
            ).alias("_p")
        )
        .select("_p.w1", "_p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_merges(counts: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k merge candidates: count desc, then (w1, w2)
    lexicographic — binary collation on both Spark and the oracle engine, so
    ties at the k boundary resolve identically everywhere."""
    return counts.orderBy(F.col("cnt").desc(), "w1", "w2").limit(k)


def _merge_fold(w: Column, w1: str, w2: str, merged: str) -> Column:
    """Left-to-right non-overlapping greedy merge of (w1, w2) → merged inside
    one symbol array — the BPE apply step as a pure fold.

    Accumulator = (arr: symbols emitted so far, prev: one pending symbol not
    yet emitted).  On each token t: if (prev, t) is the pair, emit the merged
    symbol and clear prev (so 'a a a' with pair (a,a) → ['aa', 'a'] —
    non-overlapping, exactly Sennrich's replace semantics); otherwise flush
    prev and hold t.  The finish lambda flushes the last pending symbol."""
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc: Column, t: Column) -> Column:
        hit = acc["prev"].eqNullSafe(F.lit(w1)) & (t == F.lit(w2))
        return F.struct(
            F.when(hit, F.concat(acc["arr"], F.array(F.lit(merged))))
            .when(acc["prev"].isNull(), acc["arr"])
            .otherwise(F.concat(acc["arr"], F.array(acc["prev"])))
            .alias("arr"),
            F.when(hit, F.lit(None).cast("string")).otherwise(t).alias("prev"),
        )

    def fin(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["prev"]))
        )

    return F.aggregate(w, init, step, fin)


def apply_merge(
    arrs: DataFrame, w1: str, w2: str, arr_col: str = "toks", joiner: str = "▁"
) -> DataFrame:
    """Apply one learned merge to every row (projection only, no shuffle).

    The joiner must not occur in raw corpus symbols (standard BPE caveat:
    a raw token equal to ``w1+joiner+w2`` would alias the merged symbol) —
    hence the default U+2581 sentencepiece marker, which whitespace
    tokenization cannot produce."""
    merged = w1 + joiner + w2
    return arrs.withColumn(arr_col, _merge_fold(F.col(arr_col), w1, w2, merged))


def learn_merges(
    arrs: DataFrame, rounds: int, arr_col: str = "toks", joiner: str = "▁"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``rounds`` BPE merges over the corpus.

    Returns (merge list [(w1, w2, count_at_merge_time)], final symbol-array
    frame).  Stops early if no pair occurs twice.  Per round: one
    vocabulary-sized aggregate + a 1-row collect + one merge projection;
    ``localCheckpoint(eager=True)`` pins each round's result so round R+1's
    counts are measured over the post-merge corpus (the defining BPE
    property) without re-running R rounds of folds per evaluation."""
    merges: list[tuple[str, str, int]] = []
    cur = arrs
    for _ in range(rounds):
        top = top_merges(pair_counts(cur, arr_col), 1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        w1, w2, cnt = top[0]["w1"], top[0]["w2"], int(top[0]["cnt"])
        merges.append((w1, w2, cnt))
        cur = apply_merge(cur, w1, w2, arr_col, joiner).localCheckpoint(eager=True)
    return merges, cur


def encode_with_merges(
    arrs: DataFrame,
    merges: list[tuple[str, str]],
    arr_col: str = "toks",
    joiner: str = "▁",
) -> DataFrame:
    """BPE ENCODE: apply an ordered, frozen merge list (the trained tokenizer
    artifact that `learn_merges` produces) to every row — the inference half
    of the tokenizer story.

    Each merge is one `_merge_fold` projection stacked on the previous one;
    Catalyst collapses the stack into a single map-only projection (no
    shuffle, no UDF), so at 100 TB encoding rides the scan.  The stacked-fold
    expression grows linearly with len(merges): fine for the config-sized
    lists used here; for a production 32k-merge vocabulary swap in the
    Arrow-batched mapInPandas kernel shape used by `packing._seq_chunk_iter`
    (same dataframe contract, merges broadcast as one dict).
    """
    cur = arrs
    for w1, w2 in merges:
        cur = cur.withColumn(
            arr_col, _merge_fold(F.col(arr_col), w1, w2, w1 + joiner + w2)
        )
    return cur
