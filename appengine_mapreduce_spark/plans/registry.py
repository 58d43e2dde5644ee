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
    # ---- 25 rotation slots (round 4): queries that have NEVER had a
    # CORRECTNESS_r{N} row — previously checked only by the pytest
    # full-gate twin. Round-5 builder: rotate these slots to the
    # still-unwitnessed tail — aac_decode_meta,
    # streaming_conversion_join_replay, global_shuffle_shards,
    # corpus_filter_pipeline, dedup_clusters (newly oracled),
    # jpeg_decode_meta / wav_decode_meta / mp4_decode_meta /
    # wav_pcm_features, q15/q16/q17/q20, sorted_layout_scan,
    # compaction_roundtrip, orc_roundtrip, customer_balance_quartiles,
    # token_stats/top_tokens/token_rarity/bpe_token_stats, the
    # sampling family, ann_sign_lsh/batch_ann/embedding_norms/
    # label_centroids, signup_purchase_funnel, grouped_values_capped,
    # line_input_custom_sep, ivf_multiprobe_topk.
    # TPC-H tail (never driver-witnessed):
    "q4_order_priority", "q7_nation_volume", "q8_market_share",
    "q12_late_shipment_priority", "q13_order_count_distribution",
    "q22_idle_customers",
    # grand capstone: scrub -> near-dup dedup -> decontaminate -> mix
    # accounting as ONE oracled plan (q15_top_supplier rotates next round):
    "corpus_build_pipeline",
    # live Structured Streaming replays (readStream -> jobs -> memory
    # sink), oracled against batch SQL:
    "streaming_hourly_replay", "streaming_dedup_replay",
    "streaming_sessionize_replay",
    # dedup capstones + incremental dedup:
    "semantic_dedup_keepers", "text_dedup_keepers", "dedup_incremental",
    # storage layout / footer stats:
    "zorder_layout_scan", "footer_stats_orders",
    # text fingerprinting + native session windows:
    "winnow_doc_fingerprints", "session_window_stats",
    # multimodal metadata/pixel oracles (round-4 NEW operators first —
    # jpeg_decode_meta / wav_pcm_features / mp4_frame_stats rotate next):
    "mp3_decode_meta", "jpeg_progressive_color_decode",
    "avi_mjpeg_frame_decode", "jpeg_progressive_decode",
    # skew + bucketed join strategies:
    "salted_join_priority_revenue", "bucketed_join_revenue",
    # CDC diff + quality gate (fixed this round — fresh evidence wanted):
    "cdc_snapshot_diff", "data_quality_checks",
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
