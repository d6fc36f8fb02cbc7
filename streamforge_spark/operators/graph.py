"""Iterative graph operators on DataFrames.

Connected components powers duplicate clustering: near-dup PAIRS
(MinHash/SimHash/Jaccard output) become GROUPS by taking the
transitive closure, and each group keeps one canonical document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "d1", dst: str = "d2",
                         max_iter: int = 20) -> DataFrame:
    """Min-label propagation over undirected edges → (node, component),
    component = min node id of the connected component.

    Each iteration: every node takes the min of its own label and its
    neighbors' labels — one shuffle join + one aggregate per round,
    converging in O(component diameter) rounds (near-dup clusters are
    shallow; max_iter bounds adversarial chains). The per-round
    ``localCheckpoint`` truncates lineage — without it, iteration K
    replays all K-1 predecessors and the DAG grows quadratically (on a
    cluster, use a checkpoint dir for fault tolerance instead). The
    only driver-side data is the converged? flag (one count per
    round), never the labels."""
    # materialize the edge list ONCE — it is re-joined every round, and
    # without this the (possibly expensive) upstream pipeline that
    # produced the edges re-executes per iteration
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .distinct().localCheckpoint(eager=True))
    # LAZY checkpoints: the convergence aggregate right below is the
    # action that materializes (and truncates) each round's labels —
    # one pass per round instead of eager-checkpoint + aggregate
    labels = (sym.select(F.col("a").alias("n")).distinct()
              .withColumn("c", F.col("n")).localCheckpoint(eager=False))
    # labels only ever decrease (min-propagation), so the label-sum is
    # strictly decreasing until fixpoint: an unchanged sum IS
    # convergence — one scalar aggregate per round instead of a
    # join+count against the previous labels
    prev_sum = labels.agg(F.sum("c")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["n"])
            .groupBy(F.col("a").alias("n")).agg(F.min("c").alias("c")))
        labels = (
            labels.union(neighbor_min)
            .groupBy("n").agg(F.min("c").alias("c"))
            .localCheckpoint(eager=False))
        new_sum = labels.agg(F.sum("c")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("n").alias("node"), F.col("c").alias("component"))
