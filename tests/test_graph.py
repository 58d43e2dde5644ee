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
