"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Used by the similarity-search operators. ``F.zip_with`` + ``F.aggregate``
keep the arithmetic inside codegen; no Python crossing per row.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns (double precision)."""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
