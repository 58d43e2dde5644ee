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
    # ---- 25 anchors: the frozen bench headliner set (comparable round
    # over round; every family's hottest representative). These all have
    # prior CORRECTNESS_r{N} rows except phrases_demo /
    # decontaminate_overlap, which debuted in round 3's bench.
    "mapreduce_api_wordcount", "mapreduce_api_eventfilter", "wordcount",
    "sq8_ann_topk", "scd2_upsert",
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "q6_revenue_delta", "sessionize_users", "asof_join_latest_order",
    "q21_waiting_suppliers", "q2_min_cost_supplier", "q9_profit_by_nation",
    "quality_scores", "repetition_signals",
    "cosine_topk", "ivf_topk", "dedup_exact", "minhash_lsh_pairs",
    "phrases_demo", "hourly_event_stats", "q18_large_orders",
    "simhash_fingerprints", "decontaminate_overlap",
    # ---- 25 rotation slots (round 5): the top-priority slice of the
    # 45-query tail that has NEVER had a CORRECTNESS_r{N} row (checked
    # only by the pytest full-gate twin until now). Round-4 slots (TPC-H
    # q4/q7/q8/q12/q13/q22, corpus_build_pipeline, streaming replays,
    # dedup capstones, zorder/footer-stats, winnowing, session windows,
    # mp3/jpeg/avi decode, salted/bucketed joins, CDC, quality gate) all
    # went green in CORRECTNESS_r04 and rotate out. Round-6 builder:
    # rotate to the final tail — embedding_norms, label_centroids,
    # ivf_multiprobe_topk, signup_purchase_funnel, grouped_values_capped,
    # line_input_custom_sep, mp4_frame_stats, avi_audio_features,
    # webp_gif_decode_meta, tiff_decode_meta, pivot_status_by_priority,
    # grouping_sets_order_stats, multimodal_decode_stub,
    # token_budget_packing, profile_orders_table, doc_fingerprints,
    # the round-5 codec queries (g711_audio_features,
    # gif_frame_pixel_decode, tiff_strip_pixel_decode, bmp_pixel_decode,
    # avi_raw_frame_decode, flac_audio_features, mrle_interframe_decode),
    # plus rows-only random_strings_count / approx_distinct_parts /
    # kmeans_ivf_clusters / bpe_learned_merges.
    # TPC-H tail (last four never driver-witnessed):
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q20_promotion_suppliers",
    # capstone + graph closure + training-export shuffle:
    "corpus_filter_pipeline", "dedup_clusters", "global_shuffle_shards",
    # stream-stream interval join replay (two-sided watermark state):
    "streaming_conversion_join_replay",
    # multimodal metadata/feature oracles (round-4 codecs first):
    "aac_decode_meta", "jpeg_decode_meta", "wav_decode_meta",
    "mp4_decode_meta", "wav_pcm_features",
    # storage layout family:
    "sorted_layout_scan", "compaction_roundtrip", "orc_roundtrip",
    # token/text-statistics family:
    "token_stats_corpus", "top_tokens", "token_rarity_scores",
    "bpe_token_stats",
    # sampling family (deterministic hash cuts):
    "stratified_sample_by_lang", "deterministic_sample_10pct",
    # ANN tail + distribution analytics:
    "ann_sign_lsh_topk", "batch_ann_topk", "customer_balance_quartiles",
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
        queries_streaming,
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
