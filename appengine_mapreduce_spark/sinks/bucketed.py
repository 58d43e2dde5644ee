"""Bucketed-table sink: pre-shuffled storage layout for repeat joins.

The reference's ``ShardingOutputWriter`` (outputs/ShardingOutputWriter.java)
wrote per-key-bucket files so a *next job* could consume co-located keys;
Spark's first-class version is ``bucketBy`` + ``saveAsTable``: the bucket
hash is recorded in the catalog, and joins/aggregations between tables
bucketed on the same key by the same count run WITHOUT a shuffle —
at 100 TB the difference between re-shuffling the fact table per join and
reading it in place.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class BucketedTableOutput:
    """Write as a bucketed (optionally sorted) managed table.

    ``table``: catalog table name. ``num_buckets``/``key``: bucket spec —
    match these across tables that will be joined. ``sort_by``: within-
    bucket sort for merge-friendly reads.
    """

    table: str
    key: str
    num_buckets: int = 32
    sort_by: list[str] | None = None
    format: str = "parquet"
    mode: str = "overwrite"

    def write(self, df: DataFrame, job_name: str = "") -> str:
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        # A fresh session's in-memory catalog cannot see tables a previous
        # session created, but their warehouse directories persist on disk
        # and block saveAsTable (LOCATION_ALREADY_EXISTS). Remove orphans.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            shutil.rmtree(f"{wh.path}/{self.table.lower()}", ignore_errors=True)
        writer = (
            df.write.mode(self.mode)
            .format(self.format)
            .bucketBy(self.num_buckets, self.key)
        )
        if self.sort_by:
            writer = writer.sortBy(*self.sort_by)
        writer.saveAsTable(self.table)
        return self.table
