"""Connected components over near-duplicate candidate pairs — turns pairwise
LSH hits into dedup CLUSTERS (pick one keeper per component).

Algorithm: iterative min-label propagation. Each node starts labeled with its
own id; every round each node takes the min of its own label and its
neighbors' labels; fixpoint = every node carries the min id of its component.
Rounds needed = graph diameter — near-dup clusters are shallow (pairs/small
cliques), so this converges in 2-4 rounds in practice.

Scale: each round is one shuffle keyed by node id (edges are pre-partitioned
once and reused); ``localCheckpoint`` truncates the plan between rounds so
lineage doesn't grow. For 100 TB-scale graphs with long chains you'd switch
to the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join primitive, fewer
rounds; the fixpoint loop here is the honest general form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "a_id", dst: str = "b_id", max_rounds: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id reachable through the pair graph. Deterministic."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("d").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nb_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning partial labels would split one real dup
        # cluster into several and KEEP duplicates — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the cap — raise max_rounds or switch "
            "to the large-star/small-star variant)"
        )
    return labels.select("node", F.col("label").alias("component"))
