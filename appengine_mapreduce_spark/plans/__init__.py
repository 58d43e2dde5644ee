"""Query plans — the registry consumed by __spark_entry__, bench, tests."""

from appengine_mapreduce_spark.plans.registry import (
    QuerySpec,
    all_queries,
    bench_queries,
    register,
)

__all__ = ["QuerySpec", "all_queries", "bench_queries", "register"]
