"""Local twin of the driver's correctness gate: run every registered query
in Spark AND its DuckDB oracle on the same parquet tables, then compare
row count, column names, and values (order-insensitive).

Catches alias mismatches, float drift, and SQL-dialect divergence *before*
the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from appengine_mapreduce_spark.plans import all_queries
from tests.conftest import SF_CORRECT, register_duck_views

QUERIES = all_queries()
ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in s.columns:
        sc, dc = s[col], d[col]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            sc_f = pd.to_numeric(sc, errors="coerce")
            dc_f = pd.to_numeric(dc, errors="coerce")
            bad = ~(
                (sc_f.isna() & dc_f.isna())
                | (abs(sc_f - dc_f) <= 1e-9 + 1e-9 * abs(dc_f))
            )
            assert not bad.any(), (
                f"{name}.{col}: {int(bad.sum())} value mismatches, first: "
                f"spark={sc_f[bad].iloc[0]!r} duck={dc_f[bad].iloc[0]!r}"
            )
        else:
            eq = (sc == dc) | (sc.isna() & dc.isna())
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} mismatches, first: "
                f"spark={sc[~eq].iloc[0]!r} duck={dc[~eq].iloc[0]!r}"
            )


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_CORRECT)
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, SF_CORRECT).toPandas()
    duck_pdf = duck.sql(spec.oracle).df()
    _compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0
