"""Iterative graph operators for dedup clustering.

``connected_components`` turns near-duplicate PAIRS (MinHash/SimHash/
embedding channels) into duplicate GROUPS — the final step of corpus
dedup: keep one representative per component.

Algorithm: iterative label propagation (each node takes the min label in
its neighborhood) to fixpoint. Each iteration is one join + one aggregate
— all DataFrame ops; ``localCheckpoint`` truncates the lineage so the
plan does not grow exponentially with iterations. Converges in
O(diameter) iterations; near-dup graphs are unions of small cliques, so
diameter is tiny in practice (``max_iterations`` guards adversarial
chains).

At 100 TB scale the same loop runs with the edge list on disk between
iterations; large-diameter graphs would want the large-star/small-star
algorithm (Kiveris et al.) — noted as the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Output (node, component) where component = min node id reachable.

    ``edges`` is undirected (each pair once is fine). Isolated nodes don't
    appear (no edges ⇒ their component is themselves, trivially).
    """
    sym = edges.select(
        F.col(src).alias("edge_u"), F.col(dst).alias("edge_v")
    ).unionByName(
        edges.select(F.col(dst).alias("edge_u"), F.col(src).alias("edge_v"))
    )
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.groupBy(F.col("edge_u").alias("node"))
        .agg(F.min("edge_v").alias("m"))
        .select("node", F.least("node", "m").alias("comp"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.edge_v == labels.node)
            .groupBy(F.col("edge_u").alias("node"))
            .agg(F.min("comp").alias("neigh_comp"))
        )
        propagated = (
            labels.withColumnRenamed("comp", "old_comp")
            .join(neighbor_min, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("old_comp"), F.coalesce("neigh_comp", F.col("old_comp"))
                ).alias("comp"),
                F.col("old_comp"),
            )
        )
        # Pointer jumping: follow the label one hop (a label is itself a
        # node id) — turns O(diameter) propagation into O(log n) rounds.
        hop = propagated.select(
            F.col("node").alias("c_node"), F.col("comp").alias("c_comp")
        )
        new_labels = (
            propagated.join(hop, propagated.comp == hop.c_node, "left_outer")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("c_comp", F.col("comp"))
                ).alias("comp"),
                "old_comp",
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.filter(F.col("comp") != F.col("old_comp")).limit(1).count()
        )
        labels = new_labels.drop("old_comp")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def dedup_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: (component, members, size,
    keeper) — keep ``keeper`` (min id), drop the rest."""
    comps = connected_components(pairs, id_a, id_b)
    return comps.groupBy("component").agg(
        F.array_sort(F.collect_list("node")).alias("members"),
        F.count(F.lit(1)).alias("size"),
        F.min("node").alias("keeper"),
    )
