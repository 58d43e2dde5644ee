"""Deterministic sampling / split / profiling tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from appengine_mapreduce_spark.operators.sampling import (
    deterministic_sample,
    profile_table,
    train_test_split,
)


def test_sample_reproducible_and_partition_independent(spark):
    df1 = spark.range(0, 10000, 1, 4).select(F.col("id"))
    df32 = spark.range(0, 10000, 1, 32).select(F.col("id"))
    s1 = {r.id for r in deterministic_sample(df1, "id", 0.2).collect()}
    s2 = {r.id for r in deterministic_sample(df32, "id", 0.2).collect()}
    assert s1 == s2  # partitioning-independent membership
    assert 0.15 < len(s1) / 10000 < 0.25  # ~20%


def test_train_test_split_disjoint_exhaustive(spark):
    df = spark.range(0, 5000).select(F.col("id"))
    train, test = train_test_split(df, "id", test_fraction=0.25)
    tr = {r.id for r in train.collect()}
    te = {r.id for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 5000
    assert 0.20 < len(te) / 5000 < 0.30
    # different salt ⇒ different split
    _, te2 = train_test_split(df, "id", test_fraction=0.25, salt="other")
    assert te != {r.id for r in te2.collect()}


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "a")],
        "x bigint, s string",
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["x"].n_nulls == 1 and prof["x"].n_distinct == 3
    assert prof["x"].min_s == "1" and prof["x"].max_s == "3"
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_s == "a" and prof["s"].max_s == "b"
