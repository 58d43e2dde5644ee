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

    ``events.ts`` is written as TIMESTAMP(NANOS).  Depending on reader
    path, Spark surfaces it as bigint (the nanosAsLong escape hatch) or
    TIMESTAMP_NTZ (native nanos support, truncated to µs); normalize both
    to a session-UTC TIMESTAMP so every query sees one type (identical to
    DuckDB's ns→µs semantics under a UTC-naive read).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)
