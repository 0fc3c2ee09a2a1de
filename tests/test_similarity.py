"""ANN: brute-force exactness, LSH bucket recall, plan shape."""

import math

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.similarity import (
    cosine,
    cosine_topk,
    lsh_bucketed_vectors,
    lsh_cosine_topk,
)


def _vec(i, dim=8):
    # deterministic unit-ish vectors on a ring
    return [math.cos(i * 0.37 + d) for d in range(dim)]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [(i, _vec(i)) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>").cache()


def test_cosine_column_math(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<float>, b array<float>")
    got = [r.c for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert got == [0.0, 1.0]


def test_topk_matches_python_bruteforce(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    got = [
        (r.neighbor_id, r.cos)
        for r in cosine_topk(vectors, q, k=3).orderBy(F.desc("cos"), "neighbor_id").collect()
    ]
    # independent python computation
    import numpy as np

    v0 = np.array(_vec(0), dtype=np.float32).astype(float)
    sims = []
    for i in range(1, 60):
        vi = np.array(_vec(i), dtype=np.float32).astype(float)
        sims.append((i, round(float(v0 @ vi / (np.linalg.norm(v0) * np.linalg.norm(vi))), 4)))
    sims.sort(key=lambda t: (-t[1], t[0]))
    assert got == sims[:3]


def test_lsh_buckets_deterministic(spark, vectors):
    b1 = {r.vec_id: r.bucket for r in lsh_bucketed_vectors(vectors, dim=8, bits=6).collect()}
    b2 = {r.vec_id: r.bucket for r in lsh_bucketed_vectors(vectors, dim=8, bits=6).collect()}
    assert b1 == b2
    assert all(0 <= b < 64 for b in b1.values())


def test_lsh_topk_recall_vs_exact(spark, vectors):
    """LSH@few-bits must recover most of the exact top-k (same-bucket bias)."""
    q = vectors.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(vectors, q, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk(vectors, q, dim=8, k=3, bits=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, (recall, exact, approx)


def test_topk_broadcast_plan(spark, vectors):
    """The query side must broadcast — no shuffle of the big vector table."""
    q = vectors.filter(F.col("vec_id") < 2)
    plan = cosine_topk(vectors, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_cell_assignment_and_topk(spark, vectors):
    """Every vector lands in its argmax-cosine cell, and within-cell top-k
    equals brute force restricted to the probed cell."""
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_cell,
        ivf_cosine_topk,
    )

    cent = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in vectors.filter(F.col("vec_id") < 4).collect()
    ]
    cells = {
        r.vec_id: r.cell
        for r in vectors.select(
            "vec_id", ivf_cell(F.col("embedding"), cent, 6).alias("cell")
        ).collect()
    }
    # python-side argmax with the same rounding + cid-asc tiebreak
    import math as m

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        return round(d / (m.sqrt(sum(float(x) ** 2 for x in a)) * m.sqrt(sum(float(y) ** 2 for y in b))), 6)

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in vectors.collect()}
    for vid, v in vecs.items():
        want = max(cent, key=lambda c: (cos(v, c[1]), -c[0]))[0]
        assert cells[vid] == want, vid

    q = vectors.filter(F.col("vec_id") < 2)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(vectors, q, cent, k=3).collect()
    }
    for qid in (0, 1):
        cell_members = [v for v in vecs if cells[v] == cells[qid] and v != qid]
        want = sorted(
            cell_members, key=lambda n: (-round(cos(vecs[qid], vecs[n]), 4), n)
        )[:3]
        assert {(qid, n) for n in want} == {p for p in got if p[0] == qid}


def test_ivf_plan_is_equi_join(spark, vectors):
    from opentelemetry_collector_spark.operators.similarity import ivf_cosine_topk

    cent = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in vectors.filter(F.col("vec_id") < 4).collect()
    ]
    q = vectors.filter(F.col("vec_id") < 2)
    plan = ivf_cosine_topk(vectors, q, cent, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_arrow_topk_matches_builtin(spark, vectors):
    """The numpy/mapInPandas wide-vector path returns the same neighbors
    (and cosines to rounding) as the codegen brute-force path."""
    from opentelemetry_collector_spark.operators.similarity import cosine_topk_arrow

    q = vectors.filter(F.col("vec_id") < 3)
    builtin = {
        (r.query_id, r.neighbor_id): r.cos for r in cosine_topk(vectors, q, k=4).collect()
    }
    arrow = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk_arrow(vectors.repartition(7), q, k=4).collect()
    }
    assert set(builtin) == set(arrow)
    for key in builtin:
        assert abs(builtin[key] - arrow[key]) < 1e-3


def test_kmeans_refine_improves_or_matches_seed_recall(spark, vectors):
    """Lloyd refinement must not hurt IVF recall@k vs exact top-k; on a
    deliberately bad seed set (4 adjacent ring vectors = clumped seeds)
    it should strictly help cell balance."""
    from opentelemetry_collector_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        kmeans_refine,
    )

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in vectors.filter(F.col("vec_id") < 4).collect()
    ]
    refined = kmeans_refine(vectors, seeds, iters=2)
    assert [c for c, _ in refined] == [c for c, _ in seeds]  # ids preserved
    assert any(rv != sv for (_, rv), (_, sv) in zip(refined, seeds))  # moved

    q = vectors.filter(F.col("vec_id") < 6)
    truth = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(vectors, q, k=3).collect()
    }

    def recall(cents):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_cosine_topk(vectors, q, cents, k=3).collect()
        }
        return len(got & truth) / len(truth)

    r_seed, r_ref = recall(seeds), recall(refined)
    assert r_ref >= r_seed, (r_seed, r_ref)


def test_kmeans_refine_is_deterministic_under_parallelism(spark, vectors):
    """The integer-quantized sums make refinement independent of partition
    count / accumulation order — same centroids at 1 and 16 partitions."""
    from opentelemetry_collector_spark.operators.similarity import kmeans_refine

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in vectors.filter(F.col("vec_id") < 4).collect()
    ]
    a = kmeans_refine(vectors.coalesce(1), seeds, iters=2)
    b = kmeans_refine(vectors.repartition(16), seeds, iters=2)
    assert a == b  # bit-for-bit, not approximately


def test_pq_topk_matches_numpy_reference(spark):
    """PQ encode + ADC scoring against a direct numpy replay."""
    import numpy as np

    from opentelemetry_collector_spark.operators.similarity import pq_encode, pq_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)
    M, sub, K = 4, 4, 8
    codebooks = [
        [[float(x) for x in vecs[j, m * sub:(m + 1) * sub]] for j in range(K)]
        for m in range(M)
    ]

    def int_d(a, b):
        acc = 0.0
        for x, y in zip(a.astype(np.float64), np.asarray(b, dtype=np.float64)):
            acc += (x - y) * (x - y)
        return round(acc * 1e6)

    codes_ref = {
        i: [min(range(K), key=lambda j: (int_d(vecs[i, m * sub:(m + 1) * sub], codebooks[m][j]), j))
            for m in range(M)]
        for i in range(40)
    }
    got_codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, codebooks, sub).collect()}
    assert got_codes == codes_ref

    q = df.filter("vec_id < 2")
    got = {(r.query_id, r.neighbor_id): r.adist for r in pq_topk(df, q, codebooks, sub, k=3).collect()}
    for qid in (0, 1):
        dists = {
            n: sum(int_d(vecs[qid, m * sub:(m + 1) * sub], codebooks[m][codes_ref[n][m]])
                   for m in range(M))
            for n in range(40) if n != qid
        }
        top = sorted(dists, key=lambda n: (dists[n], n))[:3]
        for n in top:
            assert got[(qid, n)] == round(dists[n] / 1e6, 4)


def test_semantic_dedup_keep_min_id_wins(spark):
    """SemDeDup prune: identical vectors in the same cell collapse to the
    min id; near-orthogonal vectors survive; pruning never crosses cells."""
    from opentelemetry_collector_spark.operators.similarity import semantic_dedup_keep

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, e1),            # cell A canonical
        (1, e1),            # exact dup of 0 -> dropped
        (2, [0.99, 0.14, 0.0, 0.0]),  # cos~0.99 with 0 -> dropped
        (3, e2),            # cell B canonical
        (4, e2),            # exact dup of 3 -> dropped (never vs cell A)
        (5, [0.1, 0.99, 0.0, 0.0]),   # cell B, cos~0.99 with 3 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    centroids = [(0, e1), (1, e2)]
    kept = semantic_dedup_keep(df, centroids, threshold=0.9)
    got = {r.vec_id: r.cell for r in kept.collect()}
    assert got == {0: 0, 3: 1}
    # loosening tau to 1.01 disables pruning entirely
    all_kept = semantic_dedup_keep(df, centroids, threshold=1.01)
    assert all_kept.count() == 6


def test_label_dispersion_golden(spark):
    import pytest

    from opentelemetry_collector_spark.operators.similarity import label_dispersion

    rows = [
        # label 0: two colinear unit-ish vectors -> cos to centroid == 1.0
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [2.0, 0.0, 0.0, 0.0], 0),
        # label 1: orthogonal pair -> centroid at 45 deg, cos = 1/sqrt(2)
        (3, [1.0, 0.0, 0.0, 0.0], 1),
        (4, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in label_dispersion(df, "vec_id", "embedding", "label").collect()}
    assert out[0].n_vecs == 2
    assert out[0].centroid_norm == pytest.approx(1.5)
    assert out[0].avg_cos == pytest.approx(1.0) and out[0].min_cos == pytest.approx(1.0)
    assert out[1].avg_cos == pytest.approx(2 ** -0.5, abs=1e-5)
    assert out[1].min_cos == pytest.approx(2 ** -0.5, abs=1e-5)


def test_cosine_range_search_threshold_and_no_shuffle(spark):
    from opentelemetry_collector_spark.operators.similarity import (
        cosine_range_search,
        cosine_topk,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),    # cos with q0 ~ 0.995
        (2, [0.0, 1.0]),    # cos with q0 = 0
        (3, [-1.0, 0.0]),   # cos with q0 = -1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    out = cosine_range_search(df, q, threshold=0.5).collect()
    assert {(r.query_id, r.neighbor_id) for r in out} == {(0, 1)}
    assert all(r.cos >= 0.5 for r in out)
    # radius superset sanity: every top-k hit above tau is a range hit
    topk = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, q, k=4).collect()
            if r.cos >= 0.5}
    assert topk <= {(r.query_id, r.neighbor_id) for r in out}
    # no SHUFFLE exchange and no ranking window: the only Exchange is the
    # intended BroadcastExchange of the query side
    plan = cosine_range_search(df, q, threshold=0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan and "Window" not in plan
    assert "BroadcastExchange" in plan


def test_sq8_quantization_audit_reconstruction(spark):
    import math

    from opentelemetry_collector_spark.operators.similarity import (
        sq8_quantization_audit,
    )

    rows = [
        (0, [1.0, -0.5], 7),
        (1, [0.25, 0.25], 7),
        (2, [0.0, 0.0], 9),     # zero vector: filtered (scale 0)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in sq8_quantization_audit(df).collect()}
    assert 9 not in out and out[7].n_vec == 2
    # python replica of the codec for vector 0
    x = [1.0, -0.5]
    scale = 1.0
    r = [math.floor(v * 127 / scale) * scale / 127 for v in x]
    cos0 = round(sum(a * b for a, b in zip(x, r)) / (
        math.sqrt(sum(a * a for a in x)) * math.sqrt(sum(b * b for b in r))), 6)
    # vector 1 is uniform: quantizes exactly -> cos 1.0
    assert out[7].min_cos == round(min(cos0, 1.0), 4)
    assert out[7].avg_cos == round((cos0 + 1.0) / 2, 4)
    assert out[7].avg_scale == round((1.0 + 0.25) / 2, 6)
    # SQ8 on near-uniform vectors must be near-lossless
    assert out[7].min_cos > 0.99
