"""Connected-components / dedup-clustering tests on planted graphs."""

from __future__ import annotations

import pytest

from appengine_mapreduce_spark.operators.graph import connected_components, dedup_groups


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint",
    )
    comps = {r.node: r.component for r in connected_components(edges).collect()}
    assert {comps[n] for n in (1, 2, 3, 4)} == {1}
    assert {comps[n] for n in (10, 11)} == {10}
    assert {comps[n] for n in (20, 21, 22)} == {20}


def test_connected_components_long_chain(spark):
    """A 30-node path needs multiple propagation rounds (diameter ≫ 1)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a bigint, id_b bigint"
    )
    comps = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 31


def test_dedup_groups(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 101)], "id_a bigint, id_b bigint"
    )
    groups = {r.component: r for r in dedup_groups(edges).collect()}
    assert groups[5].members == [5, 7, 9]
    assert groups[5].size == 3
    assert groups[5].keeper == 5
    assert groups[100].members == [100, 101]
    assert groups[100].keeper == 100


def test_star_cc_basic(spark):
    from appengine_mapreduce_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint",
    )
    comps = {r.node: r.component for r in connected_components_star(edges).collect()}
    assert {comps[n] for n in (1, 2, 3, 4)} == {1}
    assert {comps[n] for n in (10, 11)} == {10}
    assert {comps[n] for n in (20, 21, 22)} == {20}


def test_star_cc_path_graph_logarithmic_rounds(spark):
    """The adversarial case for label propagation: a 10k-node path
    (diameter 10k). large-star/small-star must (a) agree with the plain
    algorithm's answer and (b) converge in O(log n) rounds, not O(n)."""
    import math

    from appengine_mapreduce_spark.operators.graph import connected_components_star

    n = 10_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    ).coalesce(8)

    stats: dict = {}
    comps = connected_components_star(edges, stats=stats, max_iterations=40)
    rows = comps.collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}
    # O(log n) + small constant; label-prop would need ~n/2 rounds even
    # with pointer jumping halving that to ~log n only per hop doubling.
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)) + 4, stats


def test_star_cc_matches_label_prop_random(spark):
    """Random sparse graph: both algorithms produce identical labelings."""
    import random

    from appengine_mapreduce_spark.operators.graph import connected_components_star

    rng = random.Random(42)
    edges_py = [(rng.randrange(500), rng.randrange(500)) for _ in range(400)]
    edges_py = [(a, b) for a, b in edges_py if a != b]
    edges = spark.createDataFrame(edges_py, "id_a bigint, id_b bigint")

    ref = {r.node: r.component for r in connected_components(edges).collect()}
    got = {r.node: r.component for r in connected_components_star(edges).collect()}
    assert got == ref
