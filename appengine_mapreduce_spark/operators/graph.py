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
iterations. For adversarially large diameters ``connected_components_star``
implements the large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public paper,
re-derived here as DataFrame ops), which converges in O(log² n) rounds
regardless of diameter and keeps every round a plain groupBy+join.
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


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via large-star/small-star alternation.

    Same output contract as ``connected_components`` — (node, component)
    with component = min reachable id, isolated nodes absent — but round
    count is O(log² n) in the worst case independent of graph diameter,
    so a 10k-node path converges in ~a dozen rounds where plain label
    propagation would need 10k.

    Per round (each a groupBy + join over the current edge set):
    - large-star: for every node u, attach each strictly-larger neighbor
      to m = min(N(u) ∪ {u}).
    - small-star: orient edges child>parent, attach each parent-side
      neighbor and u itself to the minimum.
    Fixpoint ⇒ the edge set is a union of stars centered at component
    minima. ``stats``, if given, receives {"rounds": n}.
    """
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _signature(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive content digest with no ANSI
            # overflow (sum of hashes overflows long under ANSI mode)
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return row["n"], row["h"]

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        out = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    def _small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        joined = oriented.join(m, "u")
        out = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
            joined.select(F.col("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    sig = _signature(cur)
    rounds = 0
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        rounds += 1
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    if stats is not None:
        stats["rounds"] = rounds

    # Fixpoint edges are stars (child > center): child's component is its
    # center; centers (and any node appearing only as a center) map to
    # themselves.
    child = cur.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component")
    )
    centers = cur.select(
        F.least("u", "v").alias("node"), F.least("u", "v").alias("component")
    )
    return child.unionByName(centers).groupBy("node").agg(
        F.min("component").alias("component")
    )


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


def pagerank(
    edges: DataFrame,
    n_iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    decimals: int = 9,
) -> DataFrame:
    """PageRank with a FIXED iteration count — the first iterative
    operator here with a full SQL oracle: because N is fixed, the oracle
    unrolls the recurrence into N chained CTE stages, and per-iteration
    ``round(decimals)`` pins the floating point so both engines agree
    bit-for-bit despite different summation orders.

    Proper dangling-mass handling: nodes without out-edges redistribute
    their rank uniformly each iteration (one scalar aggregate). Per
    iteration: ONE join (ranks ⨝ edges on src) + ONE groupBy(dst) —
    both shuffles keyed the same way every round, so at 100 TB the
    edge table pre-partitioned on src makes the join exchange-free and
    only the contribution aggregation re-shuffles. ``localCheckpoint``
    truncates the growing lineage each round (same policy as the CC
    operators).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0 / n), decimals))
    for _ in range(n_iterations):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg._s, "left"
        ).select("node", "rank", "_deg")
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col("_s"))
            .groupBy("_d")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs._d, "left")
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0))
                       + F.lit(float(dangling) / n)),
                    decimals,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
