"""Storage-layout queries: partitioned, sorted, and columnar-format sinks
read back through layout-aware scans.

These are the 100 TB data-organization half of the sink story: a table
written once with the right layout turns every later query's scan into a
fraction of the bytes.

- ``partitioned_layout_pruned`` — Hive-style ``partitionBy(date)`` layout;
  the read-back filter prunes to the matching date directories at PLANNING
  time (PartitionFilters in the scan, asserted in
  tests/test_plan_quality.py), so a day query over a year of data opens
  1/365 of the files no matter the total size.
- ``sorted_layout_scan`` — range-partitioned + sorted-within-partition
  parquet (the layout ``sinks/files.FileOutput(sort_by=...)`` produces,
  ≙ the reference's sorted shuffle output, java MapReduceJob.java:184-364);
  a tight range predicate then skips whole row-groups via parquet min/max
  stats — the poor man's clustered index.
- ``orc_roundtrip`` — ORC sink→source roundtrip: same declarative writer
  surface as parquet/csv/json (the reference's output formats are all
  row-framed, output_writers.py:669-848; columnar formats replace framing
  entirely).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


def _layout_root(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/tmp", "amr_spark_layout", tag)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently write events partitioned by event_date (Hive layout)."""
    out = os.path.join(_layout_root(sf_dir), "events_by_date")
    marker = os.path.join(out, "_LAYOUT_OK")
    if not os.path.exists(marker):
        ev = load(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        # One file per (date) directory at test scale; at 100 TB the same
        # write fans out per-date via the shuffle, and maxRecordsPerFile
        # rolls oversized days.
        ev.repartition("event_date").write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(out)
        with open(marker, "w") as fh:
            fh.write("ok")
    return out


@register(
    "partitioned_layout_pruned",
    oracle="""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
        GROUP BY event_type
    """,
    description="Hive-partitioned layout + partition pruning: events written "
    "partitionBy(event_date), read back with a 3-day date predicate that "
    "resolves to PartitionFilters — directories outside the range are never "
    "opened (planning-time pruning, asserted in tests/test_plan_quality.py). "
    "At 100 TB this is the difference between scanning 3 days and scanning "
    "the table. ≙ ShardingOutputWriter's key-routed files "
    "(outputs/ShardingOutputWriter.java:25) upgraded to a queryable layout.",
    tags=("sinks", "sources", "layout", "pruning"),
)
def partitioned_layout_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(out)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
            & (F.col("event_date") <= F.lit("2024-01-12").cast("date"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "sorted_layout_scan",
    oracle="""
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-06-08 00:00:00'
    """,
    description="Sorted data layout: lineitem range-partitioned and sorted "
    "by l_shipdate (sinks/files.FileOutput(sort_by=...) layout, ≙ the "
    "reference's sorted shuffle output), read back with a 1-week predicate. "
    "Because each file covers a narrow sorted key range, parquet min/max "
    "row-group stats let the pushed filter (PushedFilters, plan-asserted) "
    "skip all but ~1 week's row groups — a clustered-index scan without an "
    "index.",
    tags=("sinks", "sources", "layout", "pushdown"),
)
def sorted_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.sinks.files import FileOutput

    out = os.path.join(_layout_root(sf_dir), "lineitem_by_shipdate")
    marker = os.path.join(out, "_LAYOUT_OK")
    if not os.path.exists(marker):
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_quantity"
        )
        FileOutput(path=out, shards=8, sort_by=["l_shipdate"]).write(li)
        with open(marker, "w") as fh:
            fh.write("ok")
    li = spark.read.parquet(out)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-08 00:00:00").cast("timestamp"))
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )


@register(
    "orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    description="ORC sink→source roundtrip — second columnar format behind "
    "the same declarative writer surface (parquet/orc/csv/json/text all "
    "swap via FileOutput.format). Values bit-identical to the parquet "
    "original.",
    tags=("sources", "sinks", "orc"),
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(_layout_root(sf_dir), "orc_rt")
    shutil.rmtree(out, ignore_errors=True)
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    supp.write.orc(out)
    return spark.read.orc(out)


@register(
    "zorder_layout_scan",
    oracle="""
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_partkey BETWEEN 20 AND 120
          AND l_suppkey BETWEEN 2 AND 6
    """,
    description="Z-order (Morton) layout: lineitem range-partitioned and "
    "sorted by the bit-interleave of (l_partkey, l_suppkey) "
    "(functions/zorder.z_value — unrolled shift/mask, pure codegen), so "
    "each file covers a small RECTANGLE of the 2-D key space (per-file "
    "spans asserted in tests/test_plan_quality.py). A predicate on both "
    "dimensions then prunes through ordinary per-column parquet min/max "
    "stats — the lakehouse OPTIMIZE ZORDER trick, with both filters "
    "pushed to the scan.",
    tags=("sinks", "sources", "layout", "pushdown", "zorder"),
)
def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.functions.zorder import z_value_scaled

    out = os.path.join(_layout_root(sf_dir), "lineitem_zorder")
    marker = os.path.join(out, "_LAYOUT_OK")
    if not os.path.exists(marker):
        li = load(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_quantity"
        )
        # Layout-job parameter: per-dimension domain (a 1-row aggregate at
        # write time). Both keys normalize to 8 bits before interleave so
        # the z-sort balances the dimensions regardless of key width.
        bounds = li.agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_suppkey"), F.max("l_suppkey"),
        ).first()
        zed = li.withColumn(
            "_z",
            z_value_scaled(
                F.col("l_partkey"),
                F.col("l_suppkey"),
                (bounds[0], bounds[1]),
                (bounds[2], bounds[3]),
            ),
        )
        (
            zed.repartitionByRange(8, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(out)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    li = spark.read.parquet(out)
    return li.filter(
        (F.col("l_partkey") >= 20)
        & (F.col("l_partkey") <= 120)
        & (F.col("l_suppkey") >= 2)
        & (F.col("l_suppkey") <= 6)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )


@register(
    "compaction_roundtrip",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
    description="Small-file compaction roundtrip: documents scattered "
    "across 64 tiny files (a streaming-sink shape), compacted to "
    "byte-targeted files via read -> round-robin repartition -> atomic "
    "tmp-swap rewrite (operators/compaction.compact_files), read back "
    "content-identical. At 100 TB the compaction pass is what keeps scan "
    "cost proportional to bytes instead of file count; file-count "
    "reduction is asserted in tests/test_sources_sinks.py.",
    tags=("sinks", "sources", "layout", "compaction"),
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.compaction import compact_files

    out = os.path.join(_layout_root(sf_dir), "docs_compacted")
    shutil.rmtree(out, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.repartition(64).write.mode("overwrite").parquet(out)
    compact_files(spark, out, target_bytes=8 * 1024 * 1024)
    return spark.read.parquet(out)


@register(
    "footer_stats_orders",
    oracle="""
        SELECT 'o_custkey' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(min(o_custkey) AS VARCHAR) AS min_s,
               CAST(max(o_custkey) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', count(*),
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    description="Table statistics WITHOUT a table scan "
    "(operators/footer_stats.parquet_footer_stats): the file list fans out "
    "across executors, each task reads only parquet FOOTERS (KB per file) "
    "and emits per-row-group (rows, nulls, min, max); a column-keyed "
    "aggregation — numeric min/max typed before stringification — yields "
    "exact table stats. The oracle computes the same stats from the DATA, "
    "so the match proves footers ≡ full scan. At 100 TB this is a "
    "megabytes-read stats refresh; string min/max trusted only for short "
    "values (parquet writers may truncate long ones).",
    tags=("sources", "layout", "profiling", "udf"),
)
def footer_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.footer_stats import (
        parquet_footer_stats,
    )

    return parquet_footer_stats(
        spark,
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
        int_columns=["o_orderkey", "o_custkey"],
    )
