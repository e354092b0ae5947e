"""Remaining TPC-H query shapes (Q2/Q9/Q11/Q12/Q13/Q15/Q17/Q20/Q21/Q22),
adapted to the driver's schema (no partsupp / phone / comment columns —
each shape keeps its defining relational structure on the columns that
exist; see each docstring for the mapping).

Together with tpch_queries.py this completes all 22 TPC-H query *shapes*:
correlated scalar subqueries (decorrelated to aggregate join-backs),
min-per-group join-backs, aggregate-vs-global-scalar HAVING, EXISTS /
NOT-EXISTS pairs, and distribution-of-counts — every decorrelation
pattern Catalyst must handle.

Determinism discipline (see plans/registry.py): every threshold compare
that TPC-H states over floating averages is re-expressed in exact integer
cents cross-multiplied by counts, so Spark and DuckDB take bit-identical
branch decisions; money outputs sum integer cents and divide once.

Scale notes are per-query; the common rules: dimensions broadcast, the
fact table shuffles at most once per distinct key, aggregate join-backs
reuse the fact's own shuffle partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..sources import load_table
from .registry import query


def _money(col_expr, scale: int):
    return F.sum(F.round(col_expr * F.lit(scale), 0).cast("long")).cast("double") / F.lit(float(scale))


# --- Q2 shape: min-per-group join-back --------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
        WITH m AS (
            SELECT l_partkey AS m_partkey, min(l_extendedprice) AS min_price
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p_partkey, p_name, min(l_suppkey) AS cheapest_suppkey, min_price
        FROM lineitem
        JOIN m ON l_partkey = m_partkey AND l_extendedprice = min_price
        JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 15
        GROUP BY p_partkey, p_name, min_price
        ORDER BY p_partkey
    """,
    tags=("join", "subquery", "min-per-group"),
    doc="TPC-H Q2 shape (partsupp→lineitem): for each small part, the "
    "supplier offering the minimum price — the correlated-min subquery "
    "decorrelated into a per-key aggregate joined back on (key, min). "
    "Ties break by min suppkey. Scale: the aggregate and the join-back "
    "share one shuffle on l_partkey (co-partitioned exchange reuse); the "
    "filtered part dim broadcasts. min() returns a stored double, so the "
    "equality join-back is exact on both engines.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    m = li.groupBy(F.col("l_partkey").alias("m_partkey")).agg(F.min("l_extendedprice").alias("min_price"))
    return (
        li.join(
            m,
            (F.col("l_partkey") == F.col("m_partkey")) & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .groupBy("p_partkey", "p_name", "min_price")
        .agg(F.min("l_suppkey").alias("cheapest_suppkey"))
        .select("p_partkey", "p_name", "cheapest_suppkey", "min_price")
        .orderBy("p_partkey")
    )


# --- Q9 shape: product profit by nation and year ----------------------------


@query(
    "q9_product_profit",
    oracle="""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                                    - 0.1 * p_retailprice * l_quantity) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
                   AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)
    """,
    tags=("join", "agg", "date", "like"),
    doc="TPC-H Q9 shape: profit per supplier-nation per order year for one "
    "product line; supply cost proxied as 10% of p_retailprice (no partsupp "
    "table in this schema). LIKE-filtered part broadcasts and prunes the "
    "fact before the orders join; nation/supplier broadcast; one fact "
    "shuffle (orderkey) plus the small grouped shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_money(amount, 10000).alias("profit"))
    )


# --- Q11 shape: group value vs global-scalar threshold ----------------------


@query(
    "q11_important_values",
    oracle="""
        WITH v AS (
            SELECT n_name, l_partkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS val_u
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name, l_partkey
        )
        SELECT n_name, l_partkey, CAST(val_u AS DOUBLE) / 100.0 AS value
        FROM v
        WHERE val_u * 10000 > (SELECT sum(val_u) FROM v)
        ORDER BY n_name, l_partkey
    """,
    tags=("agg", "subquery", "having"),
    doc="TPC-H Q11 shape: (nation, part) groups whose value exceeds "
    "0.0001 of the global total — grouped aggregate filtered against a "
    "scalar aggregate of itself. The threshold compare is integer cents "
    "cross-multiplied (val*10000 > total), so both engines branch "
    "identically. Scale: v is computed once; the scalar total is a "
    "broadcast single-row cross join, not a second scan.",
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("val_u"))
    )
    total = v.agg(F.sum("val_u").alias("total_u"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val_u") * 10000 > F.col("total_u"))
        .select("n_name", "l_partkey", (F.col("val_u").cast("double") / F.lit(100.0)).alias("value"))
        .orderBy("n_name", "l_partkey")
    )


# --- Q13 shape: distribution of per-customer order counts -------------------


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "outer"),
    doc="TPC-H Q13 shape: how many customers placed k (non-urgent) orders, "
    "for each k — a left-outer join whose unmatched rows must survive as "
    "count 0, then a second aggregation over the first's result. The "
    "non-join predicate lives in the ON clause (filtering before the outer "
    "join, not after — the semantic trap of Q13). Scale: both aggs shuffle "
    "on custkey then on the tiny count domain.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q15 shape: argmax against an aggregate of itself -----------------------


@query(
    "q15_top_supplier",
    oracle="""
        WITH r AS (
            SELECT l_suppkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_u
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev_u AS DOUBLE) / 10000.0 AS total_revenue
        FROM supplier JOIN r ON s_suppkey = l_suppkey
        WHERE rev_u = (SELECT max(rev_u) FROM r)
        ORDER BY s_suppkey
    """,
    tags=("agg", "subquery", "argmax"),
    doc="TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals "
    "the maximum — the revenue view joined against its own scalar max "
    "(TPC-H's CREATE VIEW expressed as a CTE). The equality is on exact "
    "integer cents so ties and the max branch are engine-independent. "
    "Scale: r aggregates once; max broadcasts back as a single-row join.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    r = li.groupBy("l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")).alias("rev_u")
    )
    mx = r.agg(F.max("rev_u").alias("max_rev_u"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_u") == F.col("max_rev_u"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_u").cast("double") / F.lit(10000.0)).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- Q17 shape: correlated average threshold --------------------------------


@query(
    "q17_small_qty_revenue",
    oracle="""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0
                   AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
            SELECT l_partkey AS a_partkey,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_u,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_partkey
        ) a ON a_partkey = p_partkey
        WHERE p_brand = 'Brand#5'
          AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt < qty_u
    """,
    tags=("join", "subquery", "agg", "correlated"),
    doc="TPC-H Q17 shape: revenue from lineitems whose quantity is below "
    "20% of their part's average — the correlated AVG subquery "
    "decorrelated into a per-part (sum, count) join-back, with the "
    "threshold `q < 0.2*avg` cross-multiplied to the exact integer test "
    "`q_cents * 5 * cnt < sum_cents` (no float average, no engine drift). "
    "Scale: per-part aggregate and join-back share the l_partkey shuffle; "
    "the Brand filter broadcasts and prunes first.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    a = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(cents(F.col("l_quantity"))).alias("qty_u"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(a, F.col("a_partkey") == F.col("p_partkey"))
        .filter(cents(F.col("l_quantity")) * F.lit(5) * F.col("cnt") < F.col("qty_u"))
        .agg((F.sum(cents(F.col("l_extendedprice"))).cast("double") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly"))
    )


# --- Q20 shape: nested IN with grouped HAVING -------------------------------


@query(
    "q20_excess_suppliers",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'large%'
            GROUP BY l_suppkey
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 50000
        )
        ORDER BY s_suppkey
    """,
    tags=("join", "semi", "having", "like"),
    doc="TPC-H Q20 shape: suppliers who shipped more than a threshold "
    "volume of one product line — IN against a grouped-HAVING subquery, "
    "planned as a semi-join of the dimension against the fact aggregate. "
    "Scale: the qualifying supplier set is tiny and broadcasts; the fact "
    "aggregates once on l_suppkey after the broadcast part prune.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    qualifying = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_u"))
        .filter(F.col("qty_u") > 50000)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


# --- Q21 shape: EXISTS + NOT EXISTS on the same fact ------------------------


@query(
    "q21_single_fault_supplier",
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey AS po_orderkey,
                   count(DISTINCT l_suppkey) AS ns,
                   count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nr
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey
        ),
        fault AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem
            JOIN per_order ON l_orderkey = po_orderkey
            WHERE l_returnflag = 'R' AND ns >= 2 AND nr = 1
        )
        SELECT s_name, count(*) AS numwait
        FROM fault JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    tags=("join", "exists", "anti", "agg", "limit"),
    doc="TPC-H Q21 shape: in finished orders, the lone supplier at fault — "
    "EXISTS(another supplier in the order) AND NOT EXISTS(another faulty "
    "supplier), with returnflag='R' standing in for late receipt (no "
    "receipt/commit dates in this schema). Both correlated quantifiers "
    "decorrelate into one per-order (distinct-supplier, distinct-faulty) "
    "aggregate joined back — one pass over the fact instead of two "
    "self-joins. Scale: everything shuffles on orderkey once; the "
    "supplier dim broadcasts at the end.",
)
def q21_single_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    # Single fact pass: reduce to the (order, supplier) grain once, then
    # answer both quantifiers with a window over the grouped rows — ns =
    # suppliers in the order, nr = faulty suppliers. This avoids a second
    # scan+join of the fact (the naive decorrelation reads it twice); the
    # window's orderkey shuffle moves only the tiny grouped set.
    from pyspark.sql import Window

    per_pair = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    w = Window.partitionBy("l_orderkey")
    fault = (
        per_pair.withColumn("ns", F.count("*").over(w))
        .withColumn("nr", F.sum("has_r").over(w))
        .filter((F.col("has_r") == 1) & (F.col("ns") >= 2) & (F.col("nr") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        fault.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# --- Q22 shape: scalar-average threshold + NOT EXISTS -----------------------


@query(
    "q22_global_sales_opportunity",
    oracle="""
        WITH c AS (
            SELECT substr(c_name, 18, 1) AS cntrycode, c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_u
            FROM customer
            WHERE substr(c_name, 18, 1) IN ('1', '2', '3', '4', '5')
        ),
        avg_s AS (
            SELECT sum(bal_u) AS s, count(*) AS n FROM c WHERE bal_u > 0
        )
        SELECT cntrycode, count(*) AS numcust,
               CAST(sum(bal_u) AS DOUBLE) / 100.0 AS totacctbal
        FROM c, avg_s
        WHERE bal_u * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    tags=("anti", "subquery", "agg", "string"),
    doc="TPC-H Q22 shape: rich customers with no urgent orders, grouped by "
    "'country code' (last digit of c_name — no phone column; the anti-join "
    "is narrowed to urgent orders so it discriminates on this data). The "
    "above-average test is cross-multiplied to exact integers "
    "(bal*n > sum); NOT EXISTS is a left-anti join against orders. "
    "Scale: customer aggregates drive everything; the anti join shuffles "
    "on custkey (orders is the big side — no broadcast), and the scalar "
    "average is a broadcast single row.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    c = cust.select(
        F.substring("c_name", 18, 1).alias("cntrycode"),
        "c_custkey",
        cents(F.col("c_acctbal")).alias("bal_u"),
    ).filter(F.col("cntrycode").isin("1", "2", "3", "4", "5"))
    stats = c.filter(F.col("bal_u") > 0).agg(F.sum("bal_u").alias("s"), F.count("*").alias("n"))
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_u") * F.col("n") > F.col("s"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), (F.sum("bal_u").cast("double") / F.lit(100.0)).alias("totacctbal"))
        .orderBy("cntrycode")
    )


# --- Q12 shape: conditional priority counting over the fact join ------------


@query(
    "q12_priority_by_flag",
    oracle="""
        SELECT l_returnflag AS mode,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_returnflag
        ORDER BY mode
    """,
    tags=("join", "agg", "conditional"),
    doc="TPC-H Q12 shape: line counts split by order-priority class per "
    "line attribute (l_returnflag standing in for l_shipmode, absent from "
    "this schema) — the canonical conditional-count-over-join workload. "
    "Ship-date range pushes to the parquet scan; orders co-shuffles with "
    "the filtered fact on orderkey; the grouped output is 3 rows.",
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("mode")
    )
