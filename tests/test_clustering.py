"""k-means tests: objective decreases, assignments deterministic,
clusters separate planted blobs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from appengine_mapreduce_spark.operators.clustering import (
    assign_clusters,
    inertia,
    kmeans,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def blobs(spark):
    """3 well-separated 8-dim blobs, 60 points each."""
    rng = random.Random(5)
    rows = []
    centers = [[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4]
    for i in range(180):
        c = centers[i % 3]
        rows.append((i, [x + rng.gauss(0, 0.5) for x in c]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_kmeans_objective_decreases(blobs):
    _, a1 = kmeans(blobs, k=3, n_iterations=1)
    _, a5 = kmeans(blobs, k=3, n_iterations=5)
    assert inertia(a5) <= inertia(a1) + 1e-6


def test_kmeans_separates_blobs(blobs):
    _, assigned = kmeans(blobs, k=3, n_iterations=8)
    rows = assigned.collect()
    # every planted blob maps to exactly one cluster
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.vec_id % 3, set()).add(r.cluster)
    assert all(len(cs) == 1 for cs in by_blob.values()), by_blob
    assert len({next(iter(cs)) for cs in by_blob.values()}) == 3


def test_kmeans_deterministic(blobs):
    c1, a1 = kmeans(blobs, k=3, n_iterations=3)
    c2, a2 = kmeans(blobs, k=3, n_iterations=3)
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    centroids, assigned = kmeans(emb, k=4, n_iterations=3)
    assert len(centroids) == 4 and len(centroids[0]) == 64
    n = assigned.count()
    assert n == emb.count()
    assert assigned.select("cluster").distinct().count() <= 4


def test_diversity_sample_quota_and_centrality(blobs):
    """Cluster-balanced sampling: at most m rows kept per cluster, and
    every kept row is at least as central (rounded dist_sq) as every
    dropped row of the same cluster."""
    from appengine_mapreduce_spark.operators.clustering import diversity_sample

    _, assigned = kmeans(blobs, k=3, n_iterations=3)
    kept = diversity_sample(assigned, per_cluster=7)
    rows = kept.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"), F.max("dist_sq").alias("radius")
    ).collect()
    assert len(rows) == 3
    assert all(r.n == 7 for r in rows), rows  # 60/cluster: quota bites

    radius = {r.cluster: r.radius for r in rows}
    kept_ids = {(r.cluster, r.vec_id) for r in kept.collect()}
    dropped = [
        r for r in assigned.collect()
        if (r.cluster, r.vec_id) not in kept_ids
    ]
    assert all(r.dist_sq >= radius[r.cluster] for r in dropped), "kept set \
must be the most central rows per cluster"

    # determinism: same call -> same kept set
    again = diversity_sample(assigned, per_cluster=7)
    assert {(r.cluster, r.vec_id) for r in again.collect()} == kept_ids


def test_ivf_assign_incremental_no_retraining(spark):
    """Incremental index maintenance: assigning a new batch against
    frozen centroids must (a) give every new vector its true nearest
    stored-corpus centroid, (b) leave the stored model bit-identical
    (no retraining side effects), and (c) keep each planted near-copy
    of a stored vector in that vector's list."""
    import math

    from appengine_mapreduce_spark.operators.clustering import (
        assign_clusters,
        kmeans,
    )

    # stored corpus: 3 tight blobs around distinct corners
    corners = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    for i in range(60):
        c = corners[i % 3]
        rows.append((100 + i, [x + (i % 5) * 0.01 for x in c]))
    stored = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids, assigned = kmeans(stored, k=3, n_iterations=3)
    again, _ = kmeans(stored, k=3, n_iterations=3)
    assert centroids == again  # deterministic, frozen model

    # new batch: near-copies of corner vectors + one midpoint
    batch = spark.createDataFrame(
        [(0, [9.9, 0.05, 0.0]), (1, [0.05, 9.9, 0.0]), (2, [0.0, 0.05, 9.9]),
         (3, [5.0, 5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: (r.cluster, r.dist_sq)
           for r in assign_clusters(batch, centroids).collect()}

    def nearest(v):
        ds = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centroids]
        return min(range(len(ds)), key=lambda i: (ds[i], i))

    for r in batch.collect():
        want = nearest([float(x) for x in r.embedding])
        assert got[r.vec_id][0] == want, (r.vec_id, got[r.vec_id], want)
    # the three near-copies land in three DISTINCT lists
    assert len({got[i][0] for i in (0, 1, 2)}) == 3
    assert all(not math.isnan(d) for _, d in got.values())
