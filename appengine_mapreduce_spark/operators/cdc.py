"""Change-data capture between table snapshots.

``snapshot_diff`` computes the (insert / delete / update) delta that turns
one snapshot of a keyed table into another — the feed an incremental
pipeline consumes instead of reprocessing the full table. One full-outer
key shuffle; change detection is null-safe column comparison, all JVM
expressions. The reference's closest surface is the datastore mutation
pool (output_writers.py _MutationPool) which APPLIES changes; this derives
them.

At 100 TB: the join shuffles both snapshots once on the key — bucketing
both snapshots by the key makes the diff exchange-free, and a date-
partitioned layout lets unchanged partitions skip entirely (diff only the
partitions whose files changed).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that differ between snapshots, labeled ``change_type`` ∈
    {'insert', 'delete', 'update'}; unchanged rows are dropped.

    Output columns: key columns + ``change_type`` + the NEW snapshot's
    compare columns for insert/update (the OLD values for delete).
    """
    compare_cols = compare_cols or [
        c for c in new.columns if c not in key_cols
    ]
    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{c}") == F.col(f"_nk_{c}") for c in key_cols],
    )
    joined = o.join(n, cond, "full_outer")

    old_absent = reduce(
        lambda a, b: a & b, [F.col(f"_ok_{c}").isNull() for c in key_cols]
    )
    new_absent = reduce(
        lambda a, b: a & b, [F.col(f"_nk_{c}").isNull() for c in key_cols]
    )
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(old_absent, F.lit("insert"))
        .when(new_absent, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_nk_{c}"), F.col(f"_ok_{c}")).alias(c)
        for c in key_cols
    ]
    out_vals = [
        F.coalesce(F.col(f"_nv_{c}"), F.col(f"_ov_{c}")).alias(c)
        for c in compare_cols
    ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, F.col("change_type"), *out_vals)
    )
