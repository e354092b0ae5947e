"""Data-governance declared queries: the t-closeness privacy audit
(completing the k-anonymity / l-diversity / t-closeness trio), the
point-in-time join against an SCD2 dimension (feature-store
correctness: attribute AT event time, never the leaky current value),
and order-invariant column fingerprints (cross-engine table checksums).

Reference parity: the reference demo ships none of these
(BASELINE.md); they are part of the mandated training-data-pipeline
extension — a corpus release needs the privacy screens, a feature
pipeline needs PIT correctness, and a migration needs checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "t_closeness_orders",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority AS q1, o_orderstatus AS q2,
                   CAST(floor(o_totalprice / 30000) AS BIGINT) AS sv,
                   CAST(count(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2, 3
        ),
        gdist AS (SELECT sv, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY sv),
        gcum AS (SELECT sv, CAST(sum(g) OVER (ORDER BY sv
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum FROM gdist),
        tot AS (SELECT CAST(sum(g) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS m FROM gdist),
        sizes AS (SELECT q1, q2, CAST(sum(c) AS BIGINT) AS size
                  FROM cells GROUP BY q1, q2),
        grid AS (SELECT q1, q2, size, sv, gcum FROM sizes, gcum),
        joined AS (
            SELECT g.q1, g.q2, g.size, g.sv, g.gcum,
                   coalesce(c.c, 0) AS c
            FROM grid g LEFT JOIN cells c
              ON g.q1 = c.q1 AND g.q2 = c.q2 AND g.sv = c.sv
        ),
        terms AS (
            SELECT q1, q2, size, gcum,
                   CAST(sum(c) OVER (PARTITION BY q1, q2 ORDER BY sv
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum,
                   n, m
            FROM joined, tot
        ),
        per_class AS (
            SELECT q1, q2, max(size) AS size, max(n) AS n, max(m) AS m,
                   CAST(sum(abs(CAST(ccum AS HUGEINT) * n
                                - CAST(gcum AS HUGEINT) * size)) AS HUGEINT) AS num
            FROM terms GROUP BY q1, q2
        ),
        classes AS (
            SELECT size,
                   CASE WHEN m > 1 THEN
                       CAST(round(CAST(num AS DOUBLE)
                            / (CAST(size AS DOUBLE) * CAST(n AS DOUBLE)
                               * CAST(m - 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS emd_micro
            FROM per_class
        )
        SELECT CAST(10000 AS BIGINT) AS t_threshold_micro,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(max(emd_micro) AS BIGINT) AS max_emd_micro,
               CAST(sum(CASE WHEN emd_micro > 10000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_classes_at_risk,
               CAST(sum(CASE WHEN emd_micro > 10000 THEN size ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk,
               round(CAST(sum(CASE WHEN emd_micro > 10000 THEN size ELSE 0 END)
                          AS DOUBLE) / CAST(sum(size) AS DOUBLE), 6) AS at_risk_rate
        FROM classes
    """,
    tags=("privacy", "governance", "agg", "window"),
    doc="t-closeness audit (Li et al. 2007) of order price brackets "
    "within (priority, status) quasi-identifier classes — the screen "
    "l-diversity misses: a class with l distinct brackets still leaks "
    "if they are all top brackets. Per-class ordered EMD vs the global "
    "bracket distribution, every term the exact integer "
    "|ccum*n - gcum*size| (DECIMAL-summed), one division per class "
    "quantized to micro-units. Shuffles carry distinct cells only; the "
    "per-class window frame is bounded by the bracket count "
    "(operators/validate.py:t_closeness_audit). Completes the privacy "
    "trio with k_anonymity_orders and l_diversity_orders.",
)
def t_closeness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import t_closeness_audit

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_bracket",
        F.floor(F.col("o_totalprice") / 30000).cast("long"),
    )
    return t_closeness_audit(
        orders,
        ["o_orderpriority", "o_orderstatus"],
        "price_bracket",
        t_micro=10_000,
    )


@query(
    "pit_join_purchase_user_state",
    oracle="""
        WITH dim AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                   event_id, event_type
            FROM events WHERE event_type IN ('signup', 'error')
        ),
        probe AS (
            SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT p.event_id, d.event_type,
                   row_number() OVER (PARTITION BY p.event_id
                       ORDER BY d.s DESC, d.event_id DESC) AS rn
            FROM probe p JOIN dim d
              ON p.user_id = d.user_id AND d.s <= p.s
        )
        SELECT p.event_id, p.user_id, j2.event_type AS state
        FROM probe p LEFT JOIN (SELECT event_id, event_type FROM j WHERE rn = 1) j2
          USING (event_id)
    """,
    tags=("join", "asof", "window", "scd2"),
    doc="Point-in-time join: each purchase event gets the user's "
    "signup/error STATE AT purchase time from the SCD2 dimension built "
    "by scd2_intervals — the feature-store correctness join (training "
    "on the current value instead of the at-time value is label "
    "leakage). The plan is the UNION shape, not an inequality join: "
    "version-start rows union into the probe stream and one per-key "
    "last(ignorenulls) window carries the state forward — one shuffle "
    "of probes+versions, zero join blow-up at any version count "
    "(operators/joins.py:pit_join). The oracle is the brute-force "
    "inequality-join formulation, so the hash match proves the union "
    "shape equivalent.",
)
def pit_join_purchase_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import pit_join
    from ..operators.timeseries import scd2_intervals

    events = load_table(spark, sf_dir, "events")
    dim = scd2_intervals(
        events.filter(F.col("event_type").isin("signup", "error")),
        "user_id",
        "ts",
        "event_type",
        "event_id",
    )
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("pts"),
    )
    return pit_join(
        probe,
        dim,
        key_col="user_id",
        probe_ts_col="pts",
        valid_from_col="valid_from",
        attr_col="event_type",
        probe_cols=["event_id", "user_id"],
        dim_tiebreak_col="version",
    ).withColumnRenamed("event_type", "state")


@query(
    "fingerprint_orders_columns",
    oracle="""
        WITH v AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS c0,
                   CAST(o_custkey AS VARCHAR) AS c1,
                   o_orderstatus AS c2,
                   CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) AS c3,
                   strftime(o_orderdate, '%Y-%m-%d') AS c4,
                   o_orderpriority AS c5
            FROM orders
        ),
        one AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN c0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn0,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_orderkey:' || coalesce(c0, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp0,
                   CAST(sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_custkey:' || coalesce(c1, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp1,
                   CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_orderstatus:' || coalesce(c2, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp2,
                   CAST(sum(CASE WHEN c3 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_totalprice_cents:' || coalesce(c3, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp3,
                   CAST(sum(CASE WHEN c4 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_orderdate_day:' || coalesce(c4, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp4,
                   CAST(sum(CASE WHEN c5 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn5,
                   CAST(sum(CAST(CAST('0x' || substring(md5('o_orderpriority:' || coalesce(c5, chr(1) || 'NULL')), 1, 8) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS fp5
            FROM v
        )
        SELECT col AS "column", n AS n_rows, nn AS n_nulls,
               CAST(fp AS VARCHAR) AS fp_sum
        FROM one, (VALUES (0), (1), (2), (3), (4), (5)) t(i),
        LATERAL (SELECT CASE i WHEN 0 THEN 'o_orderkey' WHEN 1 THEN 'o_custkey'
                               WHEN 2 THEN 'o_orderstatus' WHEN 3 THEN 'o_totalprice_cents'
                               WHEN 4 THEN 'o_orderdate_day' ELSE 'o_orderpriority' END AS col,
                        CASE i WHEN 0 THEN nn0 WHEN 1 THEN nn1 WHEN 2 THEN nn2
                               WHEN 3 THEN nn3 WHEN 4 THEN nn4 ELSE nn5 END AS nn,
                        CASE i WHEN 0 THEN fp0 WHEN 1 THEN fp1 WHEN 2 THEN fp2
                               WHEN 3 THEN fp3 WHEN 4 THEN fp4 ELSE fp5 END AS fp)
    """,
    tags=("governance", "validate", "agg"),
    doc="Order-invariant per-column content checksums of the orders "
    "table — the cross-engine 'is this copy identical' audit a "
    "migration or replica check needs without sorting anything: 32-bit "
    "md5 of 'col:value' per cell (engine-portable normalizations: "
    "cents for doubles, yyyy-MM-dd for dates, chr(1)-sentinel NULLs) "
    "summed per column in DECIMAL(38,0). ONE scan computes every "
    "column's (n_rows, n_nulls, fp_sum) — commutative sums make the "
    "result partitioning- and order-independent "
    "(operators/validate.py:column_fingerprints).",
)
def fingerprint_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import column_fingerprints

    orders = load_table(spark, sf_dir, "orders")
    return column_fingerprints(
        orders,
        {
            "o_orderkey": F.col("o_orderkey"),
            "o_custkey": F.col("o_custkey"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice_cents": F.round(F.col("o_totalprice") * 100).cast("long"),
            "o_orderdate_day": F.date_format("o_orderdate", "yyyy-MM-dd"),
            "o_orderpriority": F.col("o_orderpriority"),
        },
    )


@query(
    "ivm_join_orders_lineitem",
    oracle="""
        WITH j AS (
            SELECT o.o_orderstatus,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM j GROUP BY o_orderstatus
    """,
    tags=("ivm", "join", "agg", "incremental"),
    doc="Incremental JOIN view maintenance: the orders x lineitem view "
    "is materialized from the pre-delta base (o_orderkey % 7 != 0), "
    "then the held-out rows arrive as append deltas on BOTH sides and "
    "the view refreshes via the delta-join identity V u dA*B u A*dB "
    "u dA*dB (operators/ivm.py:merge_join) — three delta-sized joins, "
    "never a recompute. The oracle aggregates the FULL join, so the "
    "hash match proves the maintained view is row-for-row the "
    "recomputed one (count + exact cents per status are "
    "multiplicity-sensitive).",
)
def ivm_join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import merge_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_linenumber"
    )
    is_delta_a = F.col("o_orderkey") % 7 == 0
    is_delta_b = F.col("o_orderkey") % 5 == 0
    a_old, delta_a = orders.filter(~is_delta_a), orders.filter(is_delta_a)
    b_old, delta_b = lineitem.filter(~is_delta_b), lineitem.filter(is_delta_b)
    view = a_old.join(b_old, ["o_orderkey"])
    refreshed = merge_join(view, a_old, delta_a, b_old, delta_b, ["o_orderkey"])
    return refreshed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@query(
    "dp_counts_customers_by_nation",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY 1
        ),
        z AS (
            SELECT g, n,
                   (CAST(CAST('0x' || substring(md5('dp-r10:'
                        || CAST(g AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)
                    + 0.5) / 4503599627370496.0 AS u
            FROM c
        )
        SELECT g AS c_nationkey,
               round(CAST(n AS DOUBLE)
                     + (-1.0) * sign(u - 0.5)
                       * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_count,
               1.0 AS epsilon,
               CAST(1 AS BIGINT) AS sensitivity
        FROM z
    """,
    tags=("governance", "privacy", "agg"),
    doc="epsilon-DP customer counts per nation (Laplace mechanism, "
    "eps=1, sensitivity 1) — the privacy family's release MECHANISM "
    "next to its k-anon/l-div/t-closeness audits. Noise comes from a "
    "keyed PRG (md5 over a salt that must be secret+fresh in a real "
    "release; the fixture salt is public by necessity), making the "
    "release replayable and oracle-checkable. One partial-agg groupBy; "
    "noise is a k-row expression "
    "(operators/validate.py:dp_laplace_counts).",
)
def dp_counts_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import dp_laplace_counts

    customer = load_table(spark, sf_dir, "customer")
    return dp_laplace_counts(
        customer, "c_nationkey", salt="dp-r10", epsilon=1.0, sensitivity=1
    )
