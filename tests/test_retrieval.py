"""BM25 top-k retrieval (operators/retrieval.py)."""

import math

import pytest

from opentelemetry_collector_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "spark join spark join spark"),      # heavy on both query terms
    (2, "spark window agg"),                 # one hit of 'spark'
    (3, "join order join"),                  # 'join' twice, longer doc penalized less
    (4, "completely unrelated words here"),  # no hits -> never retrieved
    (5, "spark"),                            # shortest doc, single hit
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def _bm25_reference(query_terms, k1=1.2, b=0.75):
    """Row-by-row python reference on the same fixture."""
    toks = {i: t.split(" ") for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        t: sum(1 for w in toks.values() if t in w)
        for t in query_terms
    }
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in query_terms:
            tf = w.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_reference_and_ranks(spark, docs):
    res = bm25_topk(docs, [(0, "spark join")], "doc_id", "text", k=5)
    rows = {r.doc_id: r for r in res.collect()}
    ref = _bm25_reference(["spark", "join"])
    assert set(rows) == set(ref)  # doc 4 (no hits) absent
    for i, score in ref.items():
        assert rows[i].score == pytest.approx(score, abs=1e-4)
    # ranks are 1..n ordered by (score desc, doc_id)
    ordered = sorted(rows.values(), key=lambda r: r.rank)
    scores = [r.score for r in ordered]
    assert scores == sorted(scores, reverse=True)
    assert [r.rank for r in ordered] == list(range(1, len(ordered) + 1))


def test_bm25_k_cutoff_and_multi_query(spark, docs):
    res = bm25_topk(
        docs, [(0, "spark join"), (1, "order")], "doc_id", "text", k=2
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) <= 2 for v in by_q.values())
    # query 1 = 'order' appears only in doc 3
    assert [r.doc_id for r in by_q[1]] == [3]


def test_bm25_duplicate_query_terms_counted_once(spark, docs):
    once = bm25_topk(docs, [(0, "spark")], "doc_id", "text", k=5).collect()
    twice = bm25_topk(docs, [(0, "spark spark")], "doc_id", "text", k=5).collect()
    assert sorted((r.doc_id, r.score) for r in once) == sorted(
        (r.doc_id, r.score) for r in twice
    )
