"""Fifth TPC-H batch — the five remaining classic shapes (Q2, Q9, Q11,
Q12, Q16, Q20), completing all 22 TPC-H query patterns in the registry.

The fixture has no ``partsupp`` table, so these queries DERIVE one from
lineitem: ``ps_supplycost := min(l_extendedprice / l_quantity)`` and
``ps_availqty := count(*)`` per (l_partkey, l_suppkey) pair.  Both proxies
are exact (min of per-row doubles, integer count), so Spark and the DuckDB
oracle agree bit-for-bit; the oracle applies the identical derivation in a
WITH clause.  What matters — and what the reference's users would run — is
the SHAPE: correlated-min subquery (Q2), multi-way profit rollup (Q9),
group-HAVING-global-scalar (Q11), CASE-bucketed counts (Q12),
distinct-count with NOT-IN exclusion (Q16), nested correlated semi-joins
(Q20).

Scale notes (100 TB): the derived partsupp is one hash aggregation on
(partkey, suppkey) — the same shuffle key the subsequent joins use, so the
join's partsupp side needs no further exchange.  Only the constant-size
dims (nation=25, region=5 rows) carry broadcast hints; part/supplier/
customer are SF-scaled, so their join strategy is left to AQE's size guard
(broadcast at small SF, shuffle at 100 TB).  Q11's global scalar is a
1-row broadcast cross join, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

# Shared derivation, used by Q2/Q9/Q11/Q20 and mirrored in each oracle.
_PARTSUPP_CTE = """
        partsupp AS (
            SELECT l_partkey AS ps_partkey,
                   l_suppkey AS ps_suppkey,
                   min(l_extendedprice / l_quantity) AS ps_supplycost,
                   CAST(count(*) AS BIGINT) AS ps_availqty
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.count(F.lit(1)).alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH {_PARTSUPP_CTE},
        europe AS (
            SELECT ps_partkey, ps_suppkey, ps_supplycost,
                   s_acctbal, s_name, n_name
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        FROM part JOIN europe ON p_partkey = ps_partkey
        WHERE p_size = 15 AND p_type = 'SMALL'
          AND ps_supplycost = (SELECT min(e2.ps_supplycost) FROM europe e2
                               WHERE e2.ps_partkey = p_partkey)
    """,
    description="TPC-H Q2 minimum-cost supplier: correlated scalar-min "
    "subquery over the in-region supply options of each part, expressed as "
    "a partition window min (one shuffle on ps_partkey) instead of a "
    "re-scan self-join; dims broadcast. partsupp derived from lineitem "
    "(see module docstring). Round 14 (opt guide §2.3/§3.2): the "
    "p_size/p_type filter keeps 0.3% of parts and the correlated min is "
    "per ps_partkey — a group key — so a LEFT SEMI join of lineitem "
    "against the filtered part keys BEFORE the partsupp aggregation is "
    "exact and shrinks the (partkey,suppkey) agg exchange, the supplier "
    "join and the window input by ~300x. The semi's own exchange (when "
    "the key set outgrows broadcast at scale) carries the same rows/width "
    "the pair-agg exchange carried before, so the reshape is never worse. "
    "Measured sf0.1: 1.27 s -> 0.93 s noop median. Ref shape: "
    "appengine-mapreduce has no joins — this is the §2.3 upgrade family.",
    bench=True,
    tags=("analytics", "tpch", "correlated-subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # Exact pre-filter: ps_supplycost/availqty aggregate per (partkey,
    # suppkey) and only partkeys surviving the part join are consumed, so
    # restricting lineitem to those partkeys cannot change any output row.
    li_f = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    ps = li_f.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.count(F.lit(1)).alias("ps_availqty"),
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    europe = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    # Correlated min over the part's in-region options: window, not self-join.
    w = Window.partitionBy("ps_partkey")
    cheapest = europe.withColumn(
        "min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("min_cost"))
    return cheapest.join(
        part, cheapest.ps_partkey == part.p_partkey
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")


@register(
    "q9_profit_by_nation",
    oracle=f"""
        WITH {_PARTSUPP_CTE}
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                                    - ps_supplycost * l_quantity) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000 AS profit_sum
        FROM lineitem
        JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)
    """,
    description="TPC-H Q9 product-type profit: five-way join (fact × derived "
    "partsupp × dims) rolled up by nation and order year. "
    "Nation broadcast (constant-size); part/supplier left to AQE's "
    "size guard; orders co-keyed on orderkey. Round 14 (opt guide §2.3): "
    "the %widget% filter keeps 12.5% of parts, and Spark does not reorder "
    "inner joins, so the part join runs FIRST — every later exchange "
    "(supplier, orders) then carries 12.5% of lineitem instead of 100%. "
    "Round 15 (opt guide §2.4): the separate partsupp derivation is GONE. "
    "ps_supplycost aggregates per (l_partkey, l_suppkey) — and the "
    "%widget% predicate depends only on l_partkey, a group key, so every "
    "row of a surviving pair survives the part join and min over the "
    "part-FILTERED fact rows equals min over full lineitem for every "
    "consumed pair. It is therefore a window min over the joined fact "
    "(exact, bit-identical: same double division, same row multiset per "
    "pair), which deletes the second full-lineitem scan AND its "
    "full-width (partkey,suppkey) aggregation exchange outright. Under "
    "shuffle join the window needs NO exchange of its own: the part "
    "SMJ's HashPartitioning(l_partkey) already satisfies the window's "
    "(l_partkey, l_suppkey) clustering — only a sort-within-partition "
    "remains (plan-asserted). Measured sf0.1: shuffle 10.1 MB -> ~1.5 MB. "
    "Per-row profit is computed in double (bit-identical in any engine), "
    "scaled to integer 1e-4 units, and summed as DECIMAL(38,0) — exact, "
    "order-independent, and with headroom beyond int64 (1e-4-scaled "
    "profits over ~1e12 rows top out near 1e21, vs int64's 9.2e18) — "
    "matching DuckDB's HUGEINT sum.",
    bench=True,
    tags=("analytics", "tpch", "multiway-join"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    # Selective join first; then the pair-min as a window over the
    # filtered fact rows (see description: exact because the part filter
    # is a function of the pair's own group key).
    pair_w = Window.partitionBy("l_partkey", "l_suppkey")
    fact = (
        li.join(part, li.l_partkey == part.p_partkey)
        .withColumn(
            "ps_supplycost",
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).over(pair_w),
        )
    )
    joined = (
        fact.join(supp, fact.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, fact.l_orderkey == orders.o_orderkey)
    )
    profit_i = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("ps_supplycost") * F.col("l_quantity")
        )
        * 10000
    ).cast("bigint")
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        (F.sum(profit_i.cast("decimal(28,0)")).cast("double") / 10000).alias(
            "profit_sum"
        )
    )


@register(
    "q11_important_stock",
    oracle=f"""
        WITH {_PARTSUPP_CTE},
        scoped AS (
            SELECT ps_partkey,
                   CAST(round(ps_supplycost * ps_availqty * 10000) AS BIGINT)
                       AS value_i
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
        )
        SELECT ps_partkey, CAST(sum(value_i) AS DOUBLE) / 10000 AS stock_value
        FROM scoped
        GROUP BY ps_partkey
        HAVING sum(value_i) * 1000 > (SELECT sum(value_i) FROM scoped)
    """,
    description="TPC-H Q11 important stock: per-part value rollup kept only "
    "when above a fraction of the GLOBAL value — the global scalar is the "
    "sum of the per-part sums, so it is derived FROM the grouped aggregate "
    "and broadcast back as a 1-row cross join (no driver collect; the "
    "ps_partkey exchange feeds both branches, eligible for ReusedExchange). "
    "Per-pair values are scaled to integer 1e-4 units and summed as "
    "DECIMAL(38,0) — exact, summation-order-independent, and with headroom "
    "far beyond int64 (a 100 TB corpus sums to ~1e19 in 1e-4 units, vs "
    "1e38 capacity), matching DuckDB's HUGEINT sum; the global-fraction "
    "HAVING compares in the decimal domain too.",
    tags=("analytics", "tpch", "scalar-subquery", "scalar-cross"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    scoped = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "ps_partkey",
            F.round(F.col("ps_supplycost") * F.col("ps_availqty") * 10000)
            .cast("bigint")
            .alias("value_i"),
        )
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum(F.col("value_i").cast("decimal(28,0)")).alias("_sv_i")
    )
    # Global total = sum of the per-part sums: derives from per_part's own
    # exchange instead of re-aggregating scoped, so the lineitem scan and
    # the ps_partkey shuffle are shared between both consumers.
    threshold = per_part.agg(F.sum("_sv_i").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("_sv_i") * F.lit(1000) > F.col("_total"))
        .select(
            "ps_partkey",
            (F.col("_sv_i").cast("double") / 10000).alias("stock_value"),
        )
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
        SELECT l_returnflag AS ship_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    description="TPC-H Q12 shipping-mode priority: CASE-bucketed dual counts "
    "over late lineitems (fixture has no shipmode/receiptdate, so the "
    "documented proxies are l_returnflag for the mode axis and "
    "shipdate > orderdate + 45d for lateness — same proxy family as Q4/Q21). "
    "Single co-keyed join on orderkey, one aggregation.",
    tags=("analytics", "tpch", "conditional-agg"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM pairs JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 15, 23, 30, 41, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0
                                   AND s_suppkey IS NOT NULL)
        GROUP BY p_brand, p_type, p_size
    """,
    description="TPC-H Q16 parts/supplier relationship: distinct supplier "
    "count per (brand, type, size) with a NOT-IN exclusion subquery "
    "(suppliers with negative balance standing in for the comment-complaint "
    "filter) — compiled to an anti-join; the distinct pair set derives from "
    "lineitem as partsupp does. NOT IN and anti-join diverge when the "
    "subquery side contains NULL keys, so the exclusion list filters "
    "s_suppkey IS NOT NULL in BOTH engines — the equivalence is guarded, "
    "not assumed from fixture data.",
    tags=("analytics", "tpch", "anti-join", "distinct-agg"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 30, 41, 49)
    )
    excluded = load(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull()
    )
    return (
        pairs.join(
            excluded,
            pairs.ps_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .join(part, F.col("ps_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    oracle=f"""
        WITH {_PARTSUPP_CTE},
        year_qty AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_1996
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9')
          AND s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            JOIN year_qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'small%')
              AND ps_availqty > 0.01 * qty_1996
          )
    """,
    description="TPC-H Q20 potential part promotion: nested correlated "
    "subqueries — suppliers whose availqty for any 'small%' part exceeds a "
    "fraction of that pair's 1996 shipped quantity — compiled to ONE hash "
    "aggregation on (partkey, suppkey), a broadcast-semi part filter, and "
    "a final semi join into supplier. No per-row subquery execution "
    "anywhere. Round 15 (opt guide §2.4): the former second pair-keyed "
    "aggregation (1996 quantity) and the pair join that recombined it "
    "with partsupp are folded into the SAME aggregation as conditional "
    "sums — availqty = count(*), qty_1996 = sum(CASE WHEN shipdate in "
    "1996 THEN quantity END); a pair with no 1996 rows gets NULL, and "
    "NULL > x is false, which is exactly the old inner join's drop. The "
    "'small%' part semi-filter sits BELOW the aggregation (exact: the "
    "predicate is a function of l_partkey, a group key, so dropped "
    "groups vanish whole and surviving groups keep every row — the same "
    "push Catalyst applied to the OLD form's availqty branch, which a "
    "single-agg form must do by hand). One lineitem scan and one "
    "12.7%-of-pairs exchange replace two scans, two exchanges and a "
    "pair join, bit-identically.",
    tags=("analytics", "tpch", "semi-join", "correlated-subquery"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    small_parts = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li_small = li.join(
        small_parts.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    pair_stats = li_small.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.count(F.lit(1)).alias("ps_availqty"),
        F.sum(F.when(in_1996, F.col("l_quantity"))).alias("qty_1996"),
    )
    qualifying = pair_stats.filter(
        F.col("ps_availqty") > F.lit(0.01) * F.col("qty_1996")
    ).select("ps_suppkey")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal", "n_name")
    )
