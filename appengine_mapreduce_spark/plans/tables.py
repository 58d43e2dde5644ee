"""Testdata table loading helpers shared by all registered queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; Catalyst handles pushdown/pruning from here.

    Pins the session time zone to UTC so timestamp semantics match the
    DuckDB oracle (which reads parquet timestamps UTC-naive).

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read it via the nanosAsLong escape hatch and truncate
    to microseconds (identical to DuckDB's ns→µs semantics).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)
