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
    include_old: bool = False,
) -> DataFrame:
    """Rows that differ between snapshots, labeled ``change_type`` ∈
    {'insert', 'delete', 'update'}; unchanged rows are dropped.

    Output columns: key columns + ``change_type`` + the NEW snapshot's
    compare columns for insert/update (the OLD values for delete).
    ``include_old=True`` additionally emits ``old_<col>`` columns (NULL
    for inserts) — the retraction values downstream incremental
    aggregation needs (see :func:`incremental_sum_refresh`).
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
    # Keys-only tables have nothing to compare: presence on both sides
    # means unchanged, so 'changed' degenerates to FALSE.
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
            for c in compare_cols
        ],
        F.lit(False),
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
    # Value columns must reflect the NEW snapshot for insert/update —
    # including an update that sets a value to NULL (a coalesce here would
    # silently resurrect the OLD value and corrupt downstream consumers).
    # Only deletes carry the old values; keys may coalesce because the
    # present side's keys are never NULL for a matched row.
    out_vals = [
        F.when(new_absent, F.col(f"_ov_{c}"))
        .otherwise(F.col(f"_nv_{c}"))
        .alias(c)
        for c in compare_cols
    ]
    extra = (
        [F.col(f"_ov_{c}").alias(f"old_{c}") for c in compare_cols]
        if include_old
        else []
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, F.col("change_type"), *out_vals, *extra)
    )


def incremental_sum_refresh(
    old_agg: DataFrame,
    delta: DataFrame,
    group_col: str,
    value_col: str,
    sum_col: str = "total",
    count_col: str = "n",
    drop_empty: bool = True,
) -> DataFrame:
    """Maintain a (group → sum, count) aggregate from a CDC delta instead
    of recomputing it from the full table.

    ``old_agg`` is the previously materialized aggregate; ``delta`` is
    :func:`snapshot_diff` output with ``include_old=True``. Additions are
    the new values of inserts/updates, retractions the old values of
    updates/deletes; the refresh is one group-keyed aggregation of the
    (small) delta plus one full-outer join against the aggregate — at
    100 TB the cost tracks the CHANGE volume, not the table. Groups whose
    count reaches zero are dropped. Sums must be decimal-typed for exact
    retraction (float retraction drifts).

    NULL values contribute nothing (SQL SUM semantics): an update to NULL
    retracts the old value and adds nothing. One documented divergence
    from a full recompute: a group whose surviving values are ALL NULL
    reports sum 0 here where SUM over the table reports NULL — matching
    exactly would require maintaining a non-null count alongside.
    """
    # Signed contribution entries: inserts/updates ADD the new value under
    # the NEW group, updates/deletes RETRACT the old value under the OLD
    # group. An update whose group column changed therefore migrates
    # cleanly (+1 new group, −1 old group); same-group updates cancel
    # their count terms. Requires include_old=True delta (old_<col>
    # retraction values); for delete rows the coalesced columns already
    # hold old values.
    ch = F.col("change_type")
    old_group = (
        F.when(ch == "update", F.col(f"old_{group_col}"))
        .otherwise(F.col(group_col))
    )
    old_value = (
        F.when(ch == "update", F.col(f"old_{value_col}"))
        .otherwise(F.col(value_col))
    )
    add_entry = F.when(
        ch != "delete",
        F.struct(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("dv"),
            F.lit(1).alias("dn"),
        ),
    )
    rem_entry = F.when(
        ch != "insert",
        F.struct(
            old_group.alias("g"),
            (-old_value).alias("dv"),
            F.lit(-1).alias("dn"),
        ),
    )
    entries = F.filter(
        F.array(add_entry, rem_entry), lambda e: e.isNotNull()
    )
    adj = (
        delta.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.g").alias(group_col))
        .agg(
            F.sum("e.dv").alias("_d_sum"),
            F.sum("e.dn").alias("_d_n"),
        )
    )
    joined = old_agg.join(adj, group_col, "full_outer")
    out = joined.select(
        F.col(group_col),
        (
            F.coalesce(F.col(sum_col), F.lit(0))
            + F.coalesce(F.col("_d_sum"), F.lit(0))
        ).alias(sum_col),
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias(count_col),
    )
    if drop_empty:
        # Batch semantics: emptied groups vanish. A STORED aggregate that
        # more deltas will land on must keep zero-count rows instead
        # (drop_empty=False) — deltas can arrive in any additive order,
        # and dropping a transiently-zero group would lose retractions.
        out = out.filter(F.col(count_col) > 0)
    return out
