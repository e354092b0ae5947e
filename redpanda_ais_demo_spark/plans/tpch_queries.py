"""Relational/OLAP query surface over the TPC-H-ish star schema.

The reference delegates all relational processing to ClickHouse SQL
(SURVEY.md §2/§4); this module is the engine's general-purpose relational
surface, exercising every operator class — multi-way joins, grouped and
rolled-up aggregation, window top-k, semi/anti joins, set ops — with the
physical plans a 100 TB deployment needs:

- fact-side (lineitem/orders/events) never broadcast; dimension sides
  (region/nation/customer/supplier/part) broadcast explicitly so the fact
  table streams through map-side hash joins without a shuffle.
- all measure aggregates use the exact integer-cents trick (see
  plans/registry.py) so cross-engine doubles are bit-identical.
- top-k uses ORDER BY + LIMIT → Spark plans TakeOrderedAndProject
  (per-partition partial top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..sources import load_table
from .registry import query


def _money(col_expr, scale: int):
    """Exact-cents sum of a k-decimal expression, back to double."""
    return F.sum(F.round(col_expr * F.lit(scale), 0).cast("long")).cast("double") / F.lit(float(scale))


# --- Q1: pricing summary (grouped multi-aggregate) -------------------------


@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_price,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby", "flagship", "bench"),
    doc="TPC-H Q1 shape: scan-heavy grouped 8-aggregate — the canonical "
    "map-side-partial-agg workload. Filter pushed to parquet; group keys are "
    "low-cardinality so the final shuffle is tiny.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.col("l_quantity"), 100).alias("sum_qty"),
            _money(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            _money(disc_price, 10000).alias("sum_disc_price"),
            _money(charge, 1000000).alias("sum_charge"),
            (F.sum(cents(F.col("l_quantity"))).cast("double") / F.lit(100.0) / F.count("*")).alias("avg_qty"),
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / F.lit(100.0) / F.count("*")).alias("avg_price"),
            (F.sum(cents(F.col("l_discount"))).cast("double") / F.lit(100.0) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- Q3: shipping priority (join + group + top-k) --------------------------


@query(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1998-06-01'
          AND l_shipdate > DATE '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "limit", "bench"),
    doc="TPC-H Q3 shape: selective dim filter → fact join → grouped revenue → "
    "top-k. customer (filtered) broadcasts; orders⋈lineitem co-shuffles on "
    "orderkey; TakeOrderedAndProject for the limit.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("date"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- Q5: regional multi-way join -------------------------------------------


@query(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        GROUP BY n_name
    """,
    tags=("join", "agg", "bench"),
    doc="TPC-H Q5 shape: 6-way star join with a cross-dimension equality "
    "(c_nationkey = s_nationkey). All dimensions broadcast; the only "
    "shuffles are fact⋈orders co-partitioning and the final tiny groupBy.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )


# --- Q10 shape: top customers by returned revenue --------------------------


@query(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "limit"),
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- Q6: forecast revenue (pure filter-agg) --------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
          AND round(l_discount * 100) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    tags=("agg", "filter", "bench"),
    doc="TPC-H Q6 shape: single-pass filtered scalar aggregate — the purest "
    "scan workload; every predicate pushes to the parquet reader. The "
    "discount band compares rounded cents (floating 0.05/0.07 literals are "
    "not exact).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & F.round(F.col("l_discount") * 100, 0).between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(_money(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("revenue"))


# --- Q14: promo revenue share (conditional aggregate ratio) -----------------


@query(
    "q14_promo_revenue",
    oracle="""
        SELECT 100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 10000.0)
                     / (CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0)
               AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
    """,
    tags=("join", "agg", "conditional"),
    doc="TPC-H Q14 shape: conditional-aggregate ratio over a broadcast dim "
    "join — promo share of one month's revenue.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc_cents).otherwise(F.lit(0))).cast("double") / F.lit(10000.0)
    total = F.sum(disc_cents).cast("double") / F.lit(10000.0)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (F.lit(100.0) * promo / total).alias("promo_pct")
    )


# --- Q18: large-volume orders (HAVING via join-back) ------------------------


@query(
    "q18_large_orders",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("join", "agg", "having", "limit"),
    doc="TPC-H Q18 shape: orders whose total quantity exceeds a threshold — "
    "grouped HAVING as a semi-join of the fact against its own aggregate. "
    "The qualifying-key set is tiny, so it broadcasts back against lineitem; "
    "at scale this is one fact shuffle on orderkey reused by both the "
    "aggregate and the join (co-partitioned).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_cents"))
        .filter(F.col("qty_cents") > 30000)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == big.big_orderkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money(F.col("l_quantity"), 100).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --- Q19: disjunctive multi-band predicates ---------------------------------


@query(
    "q19_banded_revenue",
    oracle="""
        SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("join", "filter", "disjunction"),
    doc="TPC-H Q19 shape: OR-of-conjunctions across both join sides. "
    "Catalyst extracts the common join key so this stays an equi-join with "
    "a post-join disjunctive filter (not a nested-loop).",
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(band).agg(
        _money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue")
    )


# --- Q7 shape: bilateral volume shipping ------------------------------------


@query(
    "q7_volume_shipping",
    oracle="""
        SELECT cust_nation, supp_nation, l_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM (
            SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
                OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
        )
        GROUP BY cust_nation, supp_nation, l_year
    """,
    tags=("join", "agg", "disjunction", "date"),
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
    "ship year — a 6-way join where the nation dimension joins twice "
    "(customer side and supplier side) under a disjunctive pair filter. "
    "Both nation aliases broadcast; year() derives at scan time.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(pair)
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )


# --- Q8/Q9 shape: market share by year --------------------------------------


@query(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                        THEN CAST(round(volume * 10000) AS BIGINT) ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(round(volume * 10000) AS BIGINT)) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n_name AS supp_nation
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
        )
        GROUP BY o_year
    """,
    tags=("join", "agg", "conditional", "date"),
    doc="TPC-H Q8 shape: one nation's share of yearly order volume — "
    "conditional-sum ratio per group over a star join. The share divides "
    "two exact integer-cents sums, so the double is bit-stable.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    vol_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_3", vol_cents).otherwise(F.lit(0))).cast("double")
                / F.sum(vol_cents).cast("double")
            ).alias("mkt_share")
        )
    )


# --- Q4 shape: grouped EXISTS ------------------------------------------------


@query(
    "q4_priority_with_returns",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
    doc="TPC-H Q4 shape (adapted to available columns): per-priority count "
    "of orders with at least one returned item — grouped left-semi join.",
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# --- Q16 shape: supplier variety with NOT-IN exclusion ----------------------


@query(
    "q16_supplier_variety",
    oracle="""
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "anti", "distinct", "agg"),
    doc="TPC-H Q16 shape (adapted: lineitem as the part-supplier "
    "relation): distinct-supplier counts per part class, excluding a "
    "NOT-IN supplier subquery — planned as a broadcast left-anti join, "
    "negated dim predicates pushed to the part scan.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Correlated scalar subquery ---------------------------------------------


@query(
    "above_nation_avg_customers",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal FROM (
            SELECT c_custkey, c_name, c_acctbal,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) OVER (PARTITION BY c_nationkey) AS DOUBLE)
                       / 100.0 / count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
            FROM customer
        ) WHERE c_acctbal > nation_avg
    """,
    tags=("window", "subquery"),
    doc="Correlated scalar subquery (customers above their nation's mean "
    "balance), decorrelated into a partitioned window aggregate — one "
    "shuffle on the correlation key instead of a per-row subquery; the mean "
    "is exact integer cents so the comparison is bit-stable cross-engine.",
)
def above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    nation_avg = F.sum(cents(F.col("c_acctbal"))).over(w).cast("double") / F.lit(100.0) / F.count("*").over(w)
    return (
        cust.withColumn("nation_avg", nation_avg)
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --- Window top-k per group ------------------------------------------------


@query(
    "topk_orders_per_customer",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c_custkey, o_orderkey, o_totalprice, row_number() OVER (
                PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM customer JOIN orders ON c_custkey = o_custkey
        ) WHERE rn <= 3
    """,
    tags=("window", "join"),
    doc="Top-3 orders per customer — ranked window partitioned on the join "
    "key (high cardinality → no reducer hotspot at scale).",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))  # match oracle BIGINT
        .filter(F.col("rn") <= 3)
    )


# --- Semi / anti joins -----------------------------------------------------


@query(
    "anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
    doc="Left-anti join (NOT EXISTS). Spark plans BroadcastHashJoin LeftAnti.",
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "semi_customers_with_urgent_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("join", "semi"),
    doc="Left-semi join (EXISTS with correlated predicate).",
)
def semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select("c_custkey", "c_name")


# --- Set operations --------------------------------------------------------


@query(
    "setop_active_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
    doc="UNION (distinct) of customer and supplier nation keys.",
)
def setop_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return cust.union(supp).distinct()


@query(
    "setop_customer_only_nations",
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
    doc="EXCEPT — nations with customers but no suppliers.",
)
def setop_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return cust.distinct().subtract(supp.distinct())


# --- Grouping sets / rollup ------------------------------------------------


@query(
    "rollup_order_status",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
    doc="ROLLUP hierarchy totals (status, priority) with NULL super-aggregate rows.",
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        _money(F.col("o_totalprice"), 100).alias("total"),
    )


# --- Pivot-style conditional aggregation -----------------------------------


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
    doc="Pivot via conditional aggregation (portable form of groupBy().pivot()).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def n_status(s):
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))

    return orders.groupBy("o_orderpriority").agg(
        n_status("O").alias("n_open"),
        n_status("F").alias("n_filled"),
        n_status("P").alias("n_partial"),
    )


# --- Part/brand stats (dim join + multi-agg) -------------------------------


@query(
    "brand_part_stats",
    oracle="""
        SELECT p_brand, count(*) AS n_items,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
               count(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    tags=("join", "agg", "distinct"),
    doc="Per-brand fact rollup with a count-distinct; part dim broadcasts.",
)
def brand_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            _money(F.col("l_quantity"), 100).alias("sum_qty"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "topk_with_ties_lineitems",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, rnk
        FROM (
            SELECT l_orderkey, l_linenumber, l_quantity, CAST(rank() OVER (
                PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS BIGINT) AS rnk
            FROM lineitem
        ) WHERE rnk <= 2
    """,
    tags=("window", "ties"),
    doc="Top-2 quantities per order WITH TIES (rank(), not row_number): "
    "every row tied at an admitted rank is kept, so the result can "
    "exceed k rows per group — the SQL:2008 FETCH ... WITH TIES "
    "semantics reports need when an arbitrary tie-break would be a "
    "lie. l_quantity is integral (1-50), so ties are common and the "
    "variant is meaningfully different from the row_number top-k "
    "(same one-shuffle ranked-window plan, no tie-break sort key).",
)
def topk_with_ties_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc())
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 2)
    )
