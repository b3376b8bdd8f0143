"""Connected components over candidate-pair edges — the transitive-closure
step every corpus-dedup pipeline needs after pair generation: if A
near-dups B and B near-dups C, the three are ONE family, which no
pairwise-threshold output expresses (the reference's pair operators stop
at pairs; a user deduplicating a corpus needs the closure, so this is a
first-class training-data operator alongside dedup.py).

Algorithm: iterative min-label propagation in pure DataFrames — each round
every node takes min(own label, neighbors' labels); fixpoint in
O(component diameter) rounds. Near-dup families are dense and shallow
(diameter 2-4 in practice), so a handful of rounds close 10^9-node graphs;
each round is one shuffle on the edge key. Convergence is detected from
sum(label) — labels only ever decrease, so an unchanged sum IS the
fixpoint (one tiny aggregate action per round, no extra join).
``localCheckpoint`` truncates the growing iterative lineage each round
(the classic Spark iterative-algorithm requirement).

For ADVERSARIAL diameters (a 10^6-long chain of near-dups) the
alternating large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond") converges in O(log^2 n) rounds with
the same per-round join shape; label propagation is chosen as the default
because dup families produced by LSH verification are never chains — the
verify step only emits pairs above a similarity threshold, which is
near-transitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Returns (``id_col``, cluster_id): cluster_id = min node id in the
    component. Every node appears, singletons included."""
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # edges reused every round
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.alias("l")
            .join(nbr.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("l.label"), F.coalesce("n.nbr_label", "l.label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new.agg(F.sum("label")).collect()[0][0]
        labels = new
        if new_sum == prev_sum:  # labels only decrease: fixpoint reached
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(adversarial diameter? use the large-star/small-star variant)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Near-dup FAMILIES from pair output: one row per doc with its
    cluster_id (min doc id of the family — the canonical keeper) and the
    family size. Downstream dedup keeps ``doc_id == cluster_id`` rows."""
    from pyspark.sql import Window

    cc = connected_components(docs, pairs, id_col, src_col, dst_col)
    w = Window.partitionBy("cluster_id")
    return cc.withColumn(
        "cluster_size", F.count("*").over(w).cast("long")
    ).select(id_col, "cluster_id", "cluster_size")
