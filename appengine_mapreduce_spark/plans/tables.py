"""Testdata table loading helpers shared by all registered queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


_INFER_FILTERS_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _exclude_infer_filters_from_generate(spark: SparkSession) -> None:
    """Disable Catalyst's InferFiltersFromGenerate for this session
    (round-9 measured finding): the rule adds ``size(e) > 0 AND
    isnotnull(e)`` below every inner explode, and when ``e`` is an
    expensive computed array (per-position k-gram digests, shingle
    arrays) the filter re-materializes the ENTIRE expression per doc —
    and gets pushed below the widening exchange, so it also runs on the
    source's narrow split count. Measured on the substring-dedup
    explode: 3.57 s -> 0.62 s at sf0.1 with the rule off. The filter
    only skips empty/null arrays, which our generators handle anyway
    (outer-explode + notnull at the hottest sites keeps the operators
    fast even in sessions without this exclusion). Appended, not
    overwritten, so caller-set exclusions survive."""
    try:
        cur = spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    except Exception:
        cur = ""
    if _INFER_FILTERS_RULE not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{cur},{_INFER_FILTERS_RULE}" if cur else _INFER_FILTERS_RULE,
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
    _exclude_infer_filters_from_generate(spark)
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
