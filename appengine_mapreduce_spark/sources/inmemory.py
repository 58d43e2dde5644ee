"""In-memory / composite sources.

- in_memory  ≙ java inputs/InMemoryInput.java:18 (parallelize lists)
- no_input   ≙ java inputs/NoInput.java:20 (empty source)
- concatenate ≙ java inputs/ConcatenatingInputReader.java:16 (union)
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def in_memory(
    spark: SparkSession, rows: Iterable[Any], schema: StructType | str
) -> DataFrame:
    return spark.createDataFrame(list(rows), schema=schema)


def no_input(spark: SparkSession, schema: StructType | str) -> DataFrame:
    return spark.createDataFrame([], schema=schema)


def concatenate(dfs: list[DataFrame]) -> DataFrame:
    """Union by name — shard counts add, like the reference's reader list."""
    if not dfs:
        raise ValueError("concatenate requires at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
