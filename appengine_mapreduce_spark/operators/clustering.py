"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The iterative driver loop holds only the model (k × dim floats); all data
passes are DataFrame ops:

- assignment: distance to each centroid as statically-unrolled JVM
  expressions (k literal arrays — no Python per row, no crossJoin),
  argmin via least + chained when.
- update: posexplode → groupBy(cluster, dim) → avg → driver collect of
  k×dim means (the model update is inherently driver-side in Lloyd's).

Deterministic: centroids initialize from the k smallest-id vectors and
every step is order-independent (avg of floats grouped per (cluster,
dim) — rounding to 9dp on collect quashes partial-sum jitter between
runs). This is the real IVF list-builder; `ivf_topk` (plans) uses
deterministic min-id representatives only so its DuckDB oracle can replay
list selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist_sq(vec_col, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec_col, c, lambda a, b: a.cast("double") - b)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add (cluster, dist_sq) = nearest centroid per row."""
    dists = [
        _dist_sq(F.col(vec_col), centroids[i]).alias(f"_d{i}")
        for i in range(len(centroids))
    ]
    with_d = df.select("*", *dists)
    best = F.least(*[F.col(f"_d{i}") for i in range(len(centroids))])
    cluster = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):
        cluster = F.when(F.col(f"_d{i}") == best, F.lit(i)).otherwise(cluster)
    return with_d.withColumn("cluster", cluster).withColumn("dist_sq", best).drop(
        *[f"_d{i}" for i in range(len(centroids))]
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    n_iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Run Lloyd's; returns (centroids, assignments df (id, cluster,
    dist_sq)). Empty clusters keep their previous centroid."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    dim = len(centroids[0])

    assigned = None
    for _ in range(n_iterations):
        assigned = assign_clusters(df, centroids, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg(F.col("v").cast("double")), 9).alias("m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in means:
            new_centroids[r.cluster][r.dim] = r.m
        if new_centroids == centroids:
            break
        centroids = new_centroids

    final = assign_clusters(df, centroids, vec_col).select(
        id_col, "cluster", F.round("dist_sq", 6).alias("dist_sq")
    )
    return centroids, final


def inertia(assignments: DataFrame) -> float:
    """Sum of squared distances — the k-means objective."""
    return float(assignments.agg(F.sum("dist_sq")).first()[0])

def diversity_sample(
    assignments: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster-balanced diversity sampling: keep the ``per_cluster`` most
    central rows of every k-means cluster (lowest dist_sq, ties to the
    lowest id) — the embedding-space corpus-diversification step (select
    prototypical documents evenly across semantic clusters instead of
    letting dominant modes swamp the sample).

    Ranking uses the 6dp-rounded dist_sq ``kmeans`` emits (the quantity
    the oracle already replays exactly), so the kept set is deterministic
    across engines. One window per cluster partition — the quota is
    model-sized, the corpus shuffles once on the cluster key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy("dist_sq", id_col)
    return (
        assignments.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cluster)
        .drop("_rn")
    )
