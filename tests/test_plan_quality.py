"""Physical-plan quality gates: the optimizations the brief demands must be
visible in ``explain()`` output, not assumed.

- filter pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches ReadSchema
- dimension joins broadcast (no shuffle of the big side)
- aggregations are partial+final (map-side combine)
- top-k compiles to TakeOrderedAndProject (no global sort materialization)
"""

from __future__ import annotations

import re

import pytest

from appengine_mapreduce_spark.plans import all_queries
from tests.conftest import SF_CORRECT

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF_CORRECT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_entity_scan(spark):
    plan = plan_of(spark, "entity_scan_filtered")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    assert "o_orderpriority" in pushed.group(1)
    assert "o_totalprice" in pushed.group(1)
    # projection pruning: the scan reads only projected + filter columns
    # (parquet pushdown is best-effort, so filter columns stay in the scan),
    # never the full 6-column table.
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    read_cols = sorted(c.split(":")[0].strip() for c in schema.split(","))
    assert read_cols == ["o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"]


def test_column_pruning_keys_only(spark):
    plan = plan_of(spark, "keys_only_scan")
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert schema == "o_orderkey:bigint"


def test_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "q6_revenue_delta")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed.group(1), f"{col} not pushed: {pushed.group(1)}"


@pytest.mark.parametrize("name", ["q3_top_orders", "q5_region_revenue",
                                  "top_customers_per_nation", "customer_order_totals"])
def test_joins_broadcast_when_small(spark, name):
    """At test SF the optimizer's size guard picks broadcast on its own —
    the queries carry NO hints on SF-scaled tables, so this is the *chosen*
    strategy under the default autoBroadcastJoinThreshold, not a pin."""
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan, plan


import contextlib


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


@pytest.mark.parametrize(
    "name,allowed_bhj",
    [
        ("q3_top_orders", 0),          # no constant-size dims → no hints
        ("customer_order_totals", 0),  # customer is SF-scaled → no hint
        ("q5_region_revenue", 2),      # nation + region hints only
        ("q9_profit_by_nation", 1),    # nation hint only
    ],
)
def test_no_forced_broadcast_of_sf_scaled_tables(spark, name, allowed_bhj):
    """The 100 TB safety gate: with the size guard disabled
    (autoBroadcastJoinThreshold=-1) the ONLY BroadcastHashJoins left are
    the explicit hints on constant-size dims (region=5, nation=25 rows).
    A hard F.broadcast on customer/supplier/part/orders would survive the
    disabled threshold and fail this count — exactly the hint that OOMs
    executors when the table is GBs at production scale."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = plan_of(spark, name)
    # explain("formatted") prints each node twice (tree + detail section);
    # count in the tree block only.
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == allowed_bhj, plan


def test_q5_single_fact_shuffle_join(spark):
    """lineitem⨝orders is the only non-broadcast join in Q5 at test SF
    (the SF-scaled dims broadcast by measured size, not by hint)."""
    plan = plan_of(spark, "q5_region_revenue")
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_smj <= 1, plan


def test_partial_aggregation(spark):
    """Wordcount compiles to partial+final hash aggregation — the
    reference's combiner done by Catalyst."""
    plan = plan_of(spark, "wordcount")
    assert "partial_count" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "top_tokens")
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_join_for_exists(spark):
    plan = plan_of(spark, "orders_with_heavy_items")
    assert "LeftSemi" in plan, plan


def test_q13_left_outer_join(spark):
    plan = plan_of(spark, "q13_order_count_distribution")
    assert "LeftOuter" in plan, plan


def test_q22_anti_join(spark):
    plan = plan_of(spark, "q22_idle_customers")
    assert "LeftAnti" in plan, plan


def test_asof_join_single_shuffle(spark):
    """The as-of join must shuffle each side once (union + window), never
    a nested-loop/range join."""
    plan = plan_of(spark, "asof_join_latest_order")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_q11_reuses_perpart_exchange(spark):
    """Q11's global total derives from the per-part aggregate, so AQE must
    reuse the ps_partkey shuffle for the threshold branch — the lineitem
    scan and the partsupp aggregation execute once, not twice. Asserted on
    the post-execution adaptive plan (reuse is a runtime decision)."""
    df = QUERIES["q11_important_stock"].fn(spark, SF_CORRECT)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_q9_partsupp_side_needs_no_extra_exchange(spark):
    """The derived partsupp's groupBy exchange is on (partkey, suppkey) —
    the same key the fact join uses — so under shuffle join the ps side
    must go Sort→HashAggregate directly, with no second Exchange. This is
    the shared-shuffle property that keeps the double lineitem read to one
    extra aggregation at 100 TB."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = QUERIES["q9_profit_by_nation"].fn(spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    sort_idx = [i for i, l in enumerate(lines) if "Sort [ps_partkey" in l]
    assert sort_idx, plan
    nxt = lines[sort_idx[0] + 1]
    assert "HashAggregate" in nxt and "Exchange" not in nxt, plan


def test_q18_preaggregates_below_join(spark):
    """Q18 rewrite: the lineitem sum (and its HAVING) must sit BELOW the
    join, so the join consumes |large orders| rows, not |lineitem|. In
    explain('formatted') a join's children print after the join line, so
    a HashAggregate appearing after the first Join line proves the
    pre-aggregation."""
    plan = plan_of(spark, "q18_large_orders")
    tree = plan.split("\n\n")[0].splitlines()
    join_idx = next(i for i, l in enumerate(tree) if "Join" in l)
    agg_after = [l for l in tree[join_idx + 1 :] if "HashAggregate" in l]
    assert agg_after, plan
