"""Entity-table scan: the reference's Datastore input readers.

Reference semantics reproduced:
- ``filters``: list of ``(property, op, value)`` with ops ``< <= > >= =``,
  at most one inequality property, validated before running
  (reference: input_readers.py:607-785; validation :646-713;
  java inputs/DatastoreShardStrategy.java:51-110 — OR/NOT_EQUAL/IN are
  unsupported there too).
- ``keys_only``: project just the key column
  (reference: DatastoreKeyInputReader input_readers.py:788-791).
- ``namespace``: equality filter on a tenant/partition column
  (reference: namespace_range.py).

The reference's scatter-sampled range sharding and ``oversplit_factor``
skew handling (input_readers.py:418-519, :724-733) are owned by Spark:
parquet row-group splits + AQE. ``repartition_by_range`` is exposed for
callers that need range-clustered output.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

_OPS = {"<", "<=", ">", ">=", "="}


def _validate_filters(filters: list[tuple[str, str, Any]]) -> None:
    inequality_props = set()
    for prop, op, _ in filters:
        if op not in _OPS:
            raise ValueError(
                f"unsupported filter op {op!r}; supported: {sorted(_OPS)} "
                "(parity with reference input_readers.py:554-567)"
            )
        if op != "=":
            inequality_props.add(prop)
    if len(inequality_props) > 1:
        raise ValueError(
            "only one inequality filter property is supported "
            f"(got {sorted(inequality_props)}; parity with reference "
            "datastore query restrictions)"
        )


def _filter_expr(filters: list[tuple[str, str, Any]]) -> Column:
    expr = F.lit(True)
    for prop, op, value in filters:
        c = F.col(prop)
        cond = {
            "<": c < value,
            "<=": c <= value,
            ">": c > value,
            ">=": c >= value,
            "=": c == value,
        }[op]
        expr = expr & cond
    return expr


def entity_scan(
    df: DataFrame,
    filters: list[tuple[str, str, Any]] | None = None,
    projection: list[str] | None = None,
    keys_only: str | None = None,
    namespace: tuple[str, str] | None = None,
) -> DataFrame:
    """Declarative entity scan; every predicate/projection lands in the
    parquet scan (PushedFilters / ReadSchema) via Catalyst."""
    if filters:
        _validate_filters(filters)
        df = df.filter(_filter_expr(filters))
    if namespace is not None:
        ns_col, ns_val = namespace
        df = df.filter(F.col(ns_col) == ns_val)
    if keys_only is not None:
        return df.select(keys_only)
    if projection is not None:
        df = df.select(*projection)
    return df


def repartition_by_range(df: DataFrame, key: str, num_partitions: int) -> DataFrame:
    """Range-clustered layout ≙ the reference's scatter-sampled key-range
    sharding (input_readers.py:418-519). Spark samples the key itself."""
    return df.repartitionByRange(num_partitions, F.col(key))
