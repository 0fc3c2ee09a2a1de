"""Connected components: chains, cliques, determinism, convergence speed."""

from __future__ import annotations

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.components import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r.comp for r in connected_components(df, **kw).collect()}


def test_two_cliques_and_a_chain(spark):
    edges = [(1, 2), (2, 3), (1, 3),          # clique {1,2,3}
             (10, 11), (11, 12),              # path {10,11,12}
             (20, 21)]                        # pair {20,21}
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_with_pointer_jumping(spark):
    """A 64-node path has diameter 63; plain min-propagation would need 63
    rounds — pointer jumping must close it within the default max_iters=30
    (O(log d) rounds)."""
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0} and len(got) == 64


def test_transitive_closure_beats_greedy_prune(spark):
    """A≈B, B≈C but A̸≈C: components put all three together (keep ONE of
    {A,B,C}); the greedy pairwise rule would keep A and C."""
    got = _cc(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_nodes_are_edge_endpoints_only(spark):
    got = _cc(spark, [(5, 7)])
    assert set(got) == {5, 7}


def test_deterministic_under_partitioning(spark):
    edges = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
    df1 = spark.createDataFrame(edges, "id_a long, id_b long").coalesce(1)
    df16 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(16)
    a = {r.node: r.comp for r in connected_components(df1).collect()}
    b = {r.node: r.comp for r in connected_components(df16).collect()}
    assert a == b


def test_unconverged_raises_instead_of_wrong_labels(spark):
    import pytest

    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=2)
