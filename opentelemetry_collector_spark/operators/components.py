"""Distributed connected components over near-dup pair graphs.

The corpus-clean pass (`dedup_corpus`) uses a greedy one-pass prune; real
100 TB dedup wants transitive CLUSTERS ("A≈B, B≈C ⇒ {A,B,C} is one group,
keep one member"), i.e. connected components of the candidate-pair graph.
The reference has no graph executor at all (engine extension, like asof).

Algorithm: min-label propagation with pointer jumping —

  1. every node starts labeled with itself;
  2. each round, a node takes the min of its own and its neighbors' labels
     (one equi-join edges⋈labels + one groupBy(node) min);
  3. then labels POINTER-JUMP (label(n) ← label(label(n)), one self-join) —
     this is the hash-to-min trick that collapses long chains in O(log d)
     rounds instead of O(d);
  4. stop when a round changes nothing.

Scale shape: every step is an equi-join or a keyed aggregation — shuffle
volume per round is O(|E| + |V|) narrow (node, label) rows, never the
payloads.  Each round ends in an eager ``localCheckpoint`` to cut lineage
(iterative plans otherwise grow exponentially); on a real cluster use
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for the
fault-tolerant variant — same plan, durable shuffle files.

The DuckDB oracle computes min-reachable-label independently with a
recursive CTE, so the two engines implement the semantics independently.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """(node, component): component = min node id reachable from ``node``
    in the undirected graph given by ``edges``.  Nodes are exactly the ids
    appearing in at least one edge (attach singletons afterwards with a
    left join + coalesce(component, id))."""
    und = edges.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=True)

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cur_sum = labels.agg(F.sum("comp").alias("s")).collect()[0]["s"]
    for _ in range(max_iters):
        nbr_min = (
            und.join(labels.select(F.col("node").alias("b"), "comp"), on="b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, on="node", how="left").select(
            "node", F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp")
        )
        # pointer jump: comp(n) ← comp(comp(n)); comp ids are themselves
        # nodes, and their labels only ever shrink, so this is monotone.
        # (A second jump per round — pointer doubling — measured faster on
        # chain-heavy graphs but SLOWER on real near-dup graphs, whose
        # clusters have diameter ≤2: the extra |V| self-join buys nothing.)
        jumped = stepped.alias("x").join(
            stepped.select(F.col("node").alias("comp"), F.col("comp").alias("jc")),
            on="comp",
            how="left",
        ).select("node", F.coalesce("jc", "comp").alias("comp"))
        # lazy localCheckpoint: the convergence aggregate right below is the
        # materializing action — eager=True would run a separate job first
        new = jumped.localCheckpoint(eager=False)
        # convergence: labels only ever DECREASE elementwise, so the label
        # sum is strictly monotone until fixpoint — one narrow aggregate
        # over the checkpointed frame beats a join-and-diff per round
        new_sum = new.agg(F.sum("comp").alias("s")).collect()[0]["s"]
        labels = new
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    else:
        # returning unconverged labels would silently split components —
        # downstream dedup would keep several "canonical" docs per cluster
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations "
            "(pointer jumping needs ~log2(diameter) rounds — raise max_iters)"
        )
    return labels.select("node", "comp")
