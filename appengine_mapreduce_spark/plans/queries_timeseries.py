"""Time-series product analytics over the events table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "daily_active_users",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS dau,
               count(*) AS n_events
        FROM events GROUP BY 1
    """,
    description="Daily active users: event-time day bucketing + distinct "
    "users — the canonical engagement time series.",
    tags=("analytics", "timeseries"),
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count_distinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "weekly_retention",
    oracle="""
        WITH w1 AS (SELECT DISTINCT user_id FROM events
                    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                      AND ts <  TIMESTAMP '2024-01-08 00:00:00'),
             w2 AS (SELECT DISTINCT user_id FROM events
                    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
                      AND ts <  TIMESTAMP '2024-01-15 00:00:00')
        SELECT (SELECT count(*) FROM w1) AS week1_users,
               (SELECT count(*) FROM w1 WHERE user_id IN (SELECT user_id FROM w2))
                   AS retained_users
    """,
    description="Week-over-week retention: distinct week-1 users retained "
    "in week 2 — a semi-join between two time-sliced distinct sets.",
    tags=("analytics", "timeseries", "retention", "scalar-cross"),
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def week(lo: str, hi: str) -> DataFrame:
        return (
            ev.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .select("user_id")
            .distinct()
        )

    w1 = week("2024-01-01 00:00:00", "2024-01-08 00:00:00")
    w2 = week("2024-01-08 00:00:00", "2024-01-15 00:00:00")
    retained = w1.join(w2, "user_id", "left_semi")
    return w1.agg(F.count(F.lit(1)).alias("week1_users")).crossJoin(
        retained.agg(F.count(F.lit(1)).alias("retained_users"))
    )
