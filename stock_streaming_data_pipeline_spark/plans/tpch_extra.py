"""Extended TPC-H-shaped relational coverage (build plan §7 slices 2-4).

The reference job itself has zero joins (SURVEY.md §2.4); this module
completes the classic decision-support operator shapes the engine surface
must offer — scalar subqueries, correlated subqueries, EXISTS / NOT
EXISTS, IN / NOT IN semi-anti forms, disjunctive pushdown predicates,
distribution (left-join + re-aggregate) queries — adapted to the driver's
TPC-H-subset schema (no partsupp table, no commit/receipt dates; see
TESTDATA.md).

Spark-first stance: subqueries are expressed as joins (broadcast where the
inner side is an aggregate of a dimension) rather than literal subquery
translations — Catalyst plans IN/EXISTS as semi joins anyway; writing the
join directly keeps the plan explicit and reviewable. The DuckDB oracles
keep the canonical subquery spelling, so the differential check proves the
two formulations equivalent.

Determinism: parity rules from plans/catalog.py (DECIMAL-exact money sums
surfaced as DOUBLE, round-6 ratios, epoch ints for timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.functions.scalars import epoch_us, money
from stock_streaming_data_pipeline_spark.plans.catalog import register
from stock_streaming_data_pipeline_spark.plans.relational import (
    _REVENUE,
    _dsum_expr,
    _sql_dsum,
)
from stock_streaming_data_pipeline_spark.tables import load_table


def _rev_col() -> F.Column:
    return money(F.col("l_extendedprice")) * money(1 - F.col("l_discount"))


@register(
    "q2_min_cost_supplier",
    tags=("J1", "J2", "A5", "O2"),
    oracle="""
WITH unit_cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit
  FROM lineitem GROUP BY 1, 2
)
SELECT p_partkey, p_name, s_name, n_name, round(unit, 6) AS unit_cost
FROM part
JOIN unit_cost ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10
  AND unit = (SELECT min(unit) FROM unit_cost c2 WHERE c2.l_partkey = p_partkey)
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): cheapest observed unit
    price per part and the supplier(s) achieving it. partsupp does not
    exist in this schema, so supply cost is derived from lineitem
    (min extendedprice/quantity per part-supplier). The correlated
    subquery becomes a per-part window MIN — one shuffle, no rescan.
    Double equality is safe: both engines compare the identical IEEE
    quotient, unaggregated.

    The p_size filter keeps a ~20% FRACTION of the SF-scaled part table,
    so part carries no broadcast hint (stats/AQE decides); only the
    fixed-25-row nation dim is hinted."""
    li = load_table(spark, sf_dir, "lineitem")
    unit_cost = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"))
    best = unit_cost.withColumn(
        "best_unit", F.min("unit").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit") == F.col("best_unit"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("unit", 6).alias("unit_cost"),
        )
    )


@register(
    "q6_forecast_revenue",
    tags=("A1", "F3", "P4"),
    oracle=f"""
SELECT {_sql_dsum('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure selective scan-aggregate — every predicate must reach
    the parquet scan (PushedFilters), no shuffle beyond the final single
    partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        _dsum_expr(
            money(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q8_market_share",
    tags=("J1", "J2", "A1", "C2"),
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_7' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT o_orderdate, n2.n_name AS nation,
         CAST({_REVENUE} AS DECIMAL(18,8)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) all_sales
GROUP BY year(o_orderdate)
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): supplier-nation share of
    revenue by order year, restricted to ASIA customers buying ECONOMY
    parts. 8-way join tree: the two fact tables shuffle-join on orderkey;
    the bounded dimensions (nation x2, region) broadcast; SF-scaled
    customer/supplier/part are left to stats-driven auto-broadcast —
    the p_type filter keeps a constant ~16% fraction of part, which is
    unbounded at scale, so no hint.
    Conditional aggregation over exact decimals; the share division runs
    in doubles identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    rev = _rev_col().cast("decimal(18,8)")
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.c_nkey)
        .join(F.broadcast(region), n1.c_rkey == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.s_nkey)
        .select(
            # year() is int32 in Spark, int64 (BIGINT) in DuckDB — cast so
            # the driver's strict schema compare sees identical dtypes.
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("nation"),
            rev.alias("rev"),
        )
    )
    zero = F.lit(0).cast("decimal(18,8)")
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_7", F.col("rev")).otherwise(zero))
            .cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q11_nation_balance_share",
    tags=("A1", "J2", "O2"),
    oracle="""
SELECT n_name,
       CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) >
       (SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) * 0.05
        FROM supplier)
""",
)
def q11_nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (HAVING > global scalar subquery): nations holding
    more than 5% of worldwide supplier account balance. The scalar
    aggregate is a 1-row broadcast cross join — no driver collect, the
    plan stays fully distributed."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(money(F.col("s_acctbal"))).alias("bal_dec"))
    )
    total = supp.agg(
        (F.sum(money(F.col("s_acctbal"))).cast("double") * F.lit(0.05)).alias(
            "threshold"
        )
    )
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("bal_dec").cast("double") > F.col("threshold"))
        .select(
            "n_name",
            F.round(F.col("bal_dec"), 4).cast("double").alias("total_bal"),
        )
    )


@register(
    "q12_late_shipment_priority",
    tags=("J1", "A1", "C7"),
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional counts over a join): late shipments
    (>90 days after order date — this schema has no commit/receipt dates)
    bucketed by line status, split into high/low order priority. The
    priority CASE runs map-side; only the tiny grouped result shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    tags=("J1", "A1", "A4"),
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left join with an
    extra non-equi ON predicate (the filter belongs to the JOIN, not the
    WHERE — customers with only urgent orders must surface as c_count=0),
    then a second aggregation over the first's result."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    tags=("J1", "A1", "P4"),
    oracle=f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN {_REVENUE}
                                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)
             / CAST(sum({_REVENUE}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue percentage): one month of lineitem joined
    to the part dimension (strategy left to stats/AQE — part is
    SF-scaled and unfiltered here); conditional decimal sums, double
    division at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _rev_col().cast("decimal(18,8)")
    zero = F.lit(0).cast("decimal(18,8)")
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_type"), rev.alias("rev")
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero))
            .cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@register(
    "q15_top_supplier",
    tags=("A1", "J1", "O2"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST({_REVENUE} AS DECIMAL(18,8))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_rev, 4) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier via scalar MAX over a derived view): the
    revenue view feeds both the scalar MAX (reduced to one row and
    broadcast) and the equality filter — no unpartitioned window, so
    nothing ever funnels through a single partition regardless of supplier
    count. DECIMAL equality is exact, so ties surface identically in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col().cast("decimal(18,8)")).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    best = revenue.join(F.broadcast(max_rev)).filter(
        F.col("total_rev") == F.col("max_rev")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return best.join(
        supp, best.supplier_no == supp.s_suppkey
    ).select(
        "s_suppkey",
        "s_name",
        F.round("total_rev", 4).cast("double").alias("total_revenue"),
    )


@register(
    "q16_supplier_part_diversity",
    tags=("J1", "J2", "A4"),
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (COUNT DISTINCT + NOT IN anti-subquery): supplier
    diversity per part attribute bucket, excluding suppliers in bad
    standing. The NOT IN becomes a left_anti join (strategy left to
    stats/AQE — supplier is SF-scaled; safe here:
    s_suppkey is non-null by construction — NOT IN's null trap doesn't
    apply). lineitem stands in for partsupp as the part↔supplier bridge.
    The part filters keep a ~13% fraction of the SF-scaled part table, so
    part carries no broadcast hint (stats/AQE decides)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    tags=("J1", "A1", "A8"),
    oracle="""
SELECT p_brand,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0,
             6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand IN ('Brand#12', 'Brand#23')
  AND l_quantity < (
    SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
GROUP BY p_brand
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (correlated AVG subquery): revenue from orders of less
    than 20% of a part's average quantity. The correlated aggregate is a
    per-part pre-aggregation joined back on partkey — the Spark-native
    decorrelation (one extra shuffle instead of a per-row rescan). The
    average is exact-decimal-sum / count, identical in both engines.
    The brand filter keeps an ~8% fraction of the SF-scaled part table,
    so part carries no broadcast hint (stats/AQE decides)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_pkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(money(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
        ).alias("qty_cut")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.avg_pkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    tags=("J1", "A1", "O2"),
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers, IN over a grouped HAVING): the
    IN-subquery runs as an aggregate-then-semi-join on orderkey; quantity
    sums are decimal-exact on both the filter and output sides."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        li.join(big, li.l_orderkey == big.big_okey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(money(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "q19_bracketed_disjunction",
    tags=("J1", "A1", "F1"),
    oracle=f"""
SELECT CAST(round(sum({_REVENUE}), 4) AS DOUBLE) AS revenue,
       count(*) AS n_matches
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_bracketed_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (disjunctive bracketed predicates across the join): three
    OR'd brand/size/quantity brackets evaluated over lineitem⋈part.
    Catalyst pushes the common-column residuals below the join where
    possible; part is unfiltered and SF-scaled, so its join strategy is
    left to stats-driven auto-broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bracket).agg(
        _dsum_expr(_rev_col()).alias("revenue"),
        F.count(F.lit(1)).alias("n_matches"),
    )


@register(
    "q20_high_volume_part_suppliers",
    tags=("J1", "J2", "A1"),
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 50
)
""",
)
def q20_high_volume_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN over a grouped HAVING): suppliers who
    moved >50 units of any red part in 1996. partsupp's availqty check is
    re-derived from lineitem volume. Aggregate-then-semi-join. The part
    name prefix filter keeps a constant fraction of the SF-scaled part
    table, so the bridge join carries no broadcast hint (stats/AQE
    decides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    tags=("J1", "J2", "A1", "O2"),
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting — EXISTS + NOT EXISTS
    double correlation): the sole late supplier on a finished multi-
    supplier order. Lateness = shipped >90 days after order date (no
    receipt/commit dates in this schema). Both correlated subqueries
    collapse into ONE per-order aggregate (distinct suppliers, distinct
    late suppliers) joined back — two shuffles total, no rescans:
    EXISTS(other supplier)      ⇔ n_suppliers >= 2
    NOT EXISTS(other late supp) ⇔ n_late_suppliers = 1 (l1 itself late)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    with_dates = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).cast("int"),
    )
    order_stats = with_dates.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    l1 = with_dates.filter(F.col("is_late") == 1)
    return (
        l1.join(
            order_stats,
            (l1.l_orderkey == order_stats.okey)
            & (order_stats.n_supp >= 2)
            & (order_stats.n_late_supp == 1),
        )
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    tags=("J2", "A1", "F2"),
    oracle="""
SELECT c_mktsegment, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS totacctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
    FROM customer
    WHERE c_acctbal > 0.0
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_mktsegment
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar AVG subquery + anti-join NOT EXISTS):
    above-average-balance customers in selected segments with no orders
    since 1999 (every customer here has SOME order, so 'dormant' replaces
    Q22's 'never ordered'; c_mktsegment stands in for the phone country
    code). The NOT EXISTS is a left_anti join against the filtered orders
    scan; the scalar average broadcasts."""
    segs = ("BUILDING", "AUTOMOBILE", "MACHINERY")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*segs)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(money(F.col("c_acctbal"))), 4)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "linear_trend_by_key",
    tags=("A1", "A8", "C2"),
    oracle="""
WITH pts AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,0)) AS x,
         CAST(value AS DECIMAL(18,4)) AS y
  FROM events
),
sums AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS sx,
         sum(y) AS sy,
         sum(x * y) AS sxy,
         sum(x * x) AS sxx
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_day
FROM sums
""",
)
def linear_trend_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend (slope of value over time) from the
    closed-form normal equation — regression as EXACT-arithmetic
    aggregates: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with x = epoch
    day and decimal sums, so the result is identical at any parallelism
    in both engines (the built-in regr_slope/covar_samp run in doubles
    and are summation-order-sensitive — unusable for a hash-matched
    differential gate). One partial-aggregated shuffle; the linear
    algebra never leaves the aggregate buffers."""
    ev = load_table(spark, sf_dir, "events")
    x = (epoch_us("ts") / F.lit(86_400_000_000)).cast("long").cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,4)")
    sums = ev.select(
        "event_type", x.alias("x"), y.alias("y")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return sums.select(
        "event_type",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            6,
        ).alias("slope_per_day"),
    )
