"""Declarative data-quality validation — one aggregation pass per table.

``validate`` takes (rule_name → boolean Column) expectations and returns a
small DataFrame of (rule, violations, n_rows): every rule is evaluated as
a conditional sum inside ONE partial+final aggregation, so a 100-rule
suite over 100 TB costs a single scan with map-side combine — never a
pass per rule. The wide 1-row aggregate is unpivoted to rows with
``stack`` (no shuffle; the aggregate is already a single row).

This is the pipeline admission gate (null keys, referential ranges, value
domains) a training-data build runs before accepting a new drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every expectation in one pass.

    Output: (rule string, violations bigint, n_rows bigint), one row per
    rule, where ``violations`` counts rows for which the rule column is
    NOT true (NULL counts as a violation — an unevaluable expectation is
    a failing one).
    """
    if not rules:
        # stack(0, ...) is unparseable; an empty suite is simply no rows.
        return df.sparkSession.createDataFrame(
            [], "rule string, violations bigint, n_rows bigint"
        )
    aggs = [
        F.coalesce(
            F.sum(F.when(cond.eqNullSafe(F.lit(True)), 0).otherwise(1)),
            F.lit(0).cast("bigint"),  # empty input: 0 violations, not NULL
        ).alias(f"_viol_{i}")
        for i, cond in enumerate(rules.values())
    ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("_n"))
    names = list(rules)
    # Rule names are data, not SQL: build the unpivot from Column
    # expressions so a quote/backslash in a name can't break (or inject
    # into) the plan the way interpolating into stack()'s string would.
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_viol_{i}").alias("violations"),
            )
            for i, name in enumerate(names)
        ]
    )
    return wide.select(
        F.explode(entries).alias("_e"), F.col("_n").alias("n_rows")
    ).select("_e.rule", "_e.violations", "n_rows")
