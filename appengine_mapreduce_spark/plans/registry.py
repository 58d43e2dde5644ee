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
    # Window policy (round 7 onward, ledger closed): the driver-witness
    # union over rounds 1-6 covers EVERY oracled registry query
    # (161/161 green, CORRECTNESS_r01-r06), so the window now holds the
    # 25 frozen bench anchors (all nine round-6 rotations restored, per
    # the round-6 note) followed by the newest queries — each round's
    # additions and upgrades get their independent driver witness
    # first, then previously-witnessed queries flow in registration
    # order. Bench comparability is unaffected: the bench set is frozen
    # in bench_queries() via the ``bench=True`` flag, independent of
    # this correctness ordering.
    # ---- the 25 frozen bench anchors:
    "wordcount", "q1_pricing_summary", "q3_top_orders",
    "q5_region_revenue", "q6_revenue_delta", "dedup_exact",
    "sessionize_users", "asof_join_latest_order", "hourly_event_stats",
    "mapreduce_api_wordcount", "mapreduce_api_eventfilter",
    "sq8_ann_topk", "scd2_upsert",
    "q21_waiting_suppliers", "q2_min_cost_supplier", "q9_profit_by_nation",
    "quality_scores", "repetition_signals",
    "cosine_topk", "ivf_topk", "minhash_lsh_pairs",
    "phrases_demo", "q18_large_orders",
    "simhash_fingerprints", "decontaminate_overlap",
    # ---- round 7: the former rows-only set, now driver-checkable.
    # Three upgraded IN PLACE to full value-hash oracles (unrolled-CTE
    # replays of the iterative training loops):
    "kmeans_ivf_clusters", "pq_ann_topk", "bpe_learned_merges",
    # Two genuinely engine-specific sketch ops stay rows-only but get
    # SELF-VALIDATING oracle twins (exact side + within-tolerance flags
    # replayed by DuckDB):
    "approx_distinct_within_tolerance", "sketch_merge_consistency",
    # and the rows-only originals keep their driver rows-only rows,
    # each description pointing at its witness:
    "approx_distinct_parts", "mergeable_sketches",
    # ---- round-7 additions (new operators that round; two rotated OUT
    # of the window in round 11 — incident_click_attribution_adaptive and
    # adpcm_stereo_features, both freshly witnessed in CORRECTNESS_r10 —
    # to make room for the late round-11 additions below):
    "bpe_encode_segments", "bloom_incremental_dedup_stats",
    "ivfadc_topk", "crosscorpus_neardup_candidates",
    "crosscorpus_neardup_verified", "bigram_lm_quality_scores",
    # ---- round-9 additions:
    "substring_dedup_spans", "substring_dedup_cleaned",
    # ---- round-10 additions (VERDICT r10 "what's wrong" #1: these were
    # omitted from the window in round 10 — the only ledger leak — so
    # they take priority slots now; tests/test_registry.py's
    # never-witnessed guard mechanically prevents a repeat):
    "substring_dedup_incremental", "substring_dedup_incremental_cleaned",
    # ---- round-11 additions:
    "ivf_bucketed_probe_topk", "streaming_substring_scrub_replay",
    "hard_negatives_topk", "temperature_mixture_sample",
    "curriculum_quality_buckets", "diversity_sample_clusters",
    "eval_contamination_report", "packing_efficiency_stats",
    # NOTE on rotation (VERDICT r10 ask #7 asked for 2-3 refreshed stale
    # witnesses): the late round-11 additions above filled the window to
    # exactly 50, displacing the q10/tfidf rotation slots per the stated
    # policy — new queries get their independent driver witness first.
    # Round 12 should take its rotation slots from
    # `python tools/witness_ledger.py` (current stalest, family-diverse:
    # cube_order_stats, scalar_functions_projection,
    # simhash_hamming_pairs — all last witnessed r1).
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


def registry_fingerprint() -> str:
    """Stable 12-hex-digit digest of the registry CONTENT: sorted names,
    each query's oracle TEXT (not just presence — editing an oracle must
    invalidate sweeps, per ADVICE r10), and a digest of the plan
    function's source. Artifacts that sweep the whole registry
    (PLAN_AUDIT.md, PARITY_r*.md) embed it so a sweep generated against
    an older registry — renamed, added, OR logic-edited — is mechanically
    detectable as stale; tests compare the embedded value against the
    live one."""
    import hashlib
    import inspect

    def _fn_src(s: QuerySpec) -> str:
        try:
            return inspect.getsource(s.fn)
        except (OSError, TypeError):  # builtins / dynamically built fns
            return repr(s.fn)

    surface = "\n".join(
        f"{n}:{hashlib.md5((s.oracle or 'rows-only').encode()).hexdigest()}"
        f":{hashlib.md5(_fn_src(s).encode()).hexdigest()}"
        for n, s in sorted(all_queries().items())
    )
    return hashlib.md5(surface.encode()).hexdigest()[:12]
