"""Z-order (Morton) curve values for multi-dimensional data clustering.

Sorting a table by ``z_value(x, y)`` interleaves the two keys' bits, so
rows close in BOTH dimensions land in the same files — the layout trick
behind lakehouse OPTIMIZE ZORDER. A 2-D predicate then prunes via plain
per-column parquet min/max stats: each file covers a small rectangle of
(x, y) space instead of a thin slice of one dimension.

The interleave is statically unrolled shift/mask arithmetic — pure JVM
codegen, engine-portable, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns into a single orderable bigint: bit i of x → bit 2i, bit i of
    y → bit 2i+1.

    Keys wider than ``bits`` should be range-bucketed first (the curve
    needs a bounded domain); 16 bits each → a 32-bit z space, plenty of
    resolution for file-level clustering.
    """
    xx = x.cast("bigint")
    yy = y.cast("bigint")
    expr = F.lit(0).cast("bigint")
    for i in range(bits):
        expr = (
            expr
            + F.shiftleft(F.shiftright(xx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return expr


def z_value_scaled(
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 8,
) -> Column:
    """Morton value with each dimension min/max-normalized to ``bits`` bits
    FIRST.

    Raw interleave is only balanced when both keys have equal bit widths —
    interleaving an 11-bit key with a 7-bit key leaves the wide key's high
    bits on top, so a z-sort degenerates to a 1-D sort on that key (every
    file still spans the narrow dimension fully; caught by
    tests/test_plan_quality.py's rectangle assertion). Normalizing both
    domains to the same resolution makes the top z bits alternate between
    dimensions, which is what yields per-file rectangles. The ranges are
    layout-job parameters (one tiny min/max aggregate at write time — a
    model-sized scalar, like the SQ8 stats row).
    """

    def norm(c: Column, lo: float, hi: float) -> Column:
        rng = float(hi) - float(lo)
        if rng == 0:
            return F.lit(0).cast("bigint")
        scaled = F.floor(
            (c.cast("double") - F.lit(float(lo))) * ((1 << bits) - 1) / F.lit(rng)
        )
        # Stale/approximate ranges must not corrupt the interleave: a value
        # below lo would go negative and its sign bits would scramble the
        # Morton ordering (shiftright is arithmetic). Clamp to the curve's
        # domain — out-of-range rows cluster at the edge cells instead.
        hi_cell = F.lit((1 << bits) - 1).cast("bigint")
        return F.greatest(
            F.lit(0).cast("bigint"), F.least(hi_cell, scaled.cast("bigint"))
        )

    return z_value(norm(x, *x_range), norm(y, *y_range), bits)
