"""BPE merge learning: Spark fold vs a pure-Python reference."""


def _py_pair_counts(corpus):
    from collections import Counter

    c = Counter()
    for toks in corpus:
        for a, b in zip(toks, toks[1:]):
            c[(a, b)] += 1
    return c


def _py_apply(toks, w1, w2, joiner="▁"):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == w1 and toks[i + 1] == w2:
            out.append(w1 + joiner + w2)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_learn(corpus, rounds, joiner="▁"):
    merges = []
    cur = [list(t) for t in corpus]
    for _ in range(rounds):
        c = _py_pair_counts(cur)
        if not c:
            break
        # same tie-break as top_merges: count desc, pair lexicographic
        (w1, w2), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((w1, w2, n))
        cur = [_py_apply(t, w1, w2, joiner) for t in cur]
    return merges, cur


CORPUS = [
    "the cat sat on the mat".split(),
    "the cat ate the rat".split(),
    "a cat and the cat sat".split(),
    "the cat the cat the cat".split(),
]


def test_apply_merge_is_greedy_nonoverlapping(spark):
    from opentelemetry_collector_spark.operators.bpe import apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],)], "toks array<string>"
    )
    got = sorted(r.toks for r in apply_merge(df, "a", "a").collect())
    assert got == [["a▁a", "a"], ["a▁a", "a▁a"]]


def test_pair_counts_count_overlapping_occurrences(spark):
    from opentelemetry_collector_spark.operators.bpe import pair_counts

    df = spark.createDataFrame([(["a", "a", "a"],), (["b"],)], "toks array<string>")
    got = {(r.w1, r.w2): r.cnt for r in pair_counts(df).collect()}
    assert got == {("a", "a"): 2}  # len-1 row contributes nothing, no crash


def test_learn_merges_matches_python_reference(spark):
    """3 rounds of distributed BPE = the sequential reference: same merge
    sequence (counts measured on the post-merge corpus each round — the
    defining BPE property) and same final symbol arrays."""
    from opentelemetry_collector_spark.operators.bpe import learn_merges

    df = spark.createDataFrame([(t,) for t in CORPUS], "toks array<string>")
    merges, final = learn_merges(df, rounds=3)
    exp_merges, exp_final = _py_learn(CORPUS, 3)
    assert merges == exp_merges
    assert sorted(r.toks for r in final.collect()) == sorted(exp_final)


def test_encode_with_merges_matches_python(spark):
    from opentelemetry_collector_spark.operators.bpe import encode_with_merges

    merges = [("a", "b"), ("a▁b", "c"), ("x", "x")]
    rows = [
        (1, ["a", "b", "c", "x", "x", "x"]),
        (2, ["a", "a", "b", "b"]),
        (3, []),
        (4, ["a", "b", "a", "b", "c"]),
    ]

    def py_encode(toks):
        for w1, w2 in merges:
            out, prev = [], None
            for t in toks:
                if prev == w1 and t == w2:
                    out.append(w1 + "▁" + w2)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = t
            if prev is not None:
                out.append(prev)
            toks = out
        return toks

    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = {r.doc_id: r.toks for r in encode_with_merges(df, merges).collect()}
    for doc_id, toks in rows:
        assert got[doc_id] == py_encode(toks), doc_id
    # spot-check the cascade: (a,b)->a▁b then (a▁b,c)->a▁b▁c
    assert got[1] == ["a▁b▁c", "x▁x", "x"]
    assert got[4] == ["a▁b", "a▁b▁c"]
