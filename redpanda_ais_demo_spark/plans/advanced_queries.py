"""Advanced relational operators beyond the reference's own surface:
as-of join, range join, exact quantiles, deterministic dispersion stats,
grouping sets via the SQL API. These close out the operator classes a
general analytics engine needs (the reference delegates all of this to
ClickHouse SQL, SURVEY.md §2/§4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, register_views
from .registry import query

# --- As-of join ------------------------------------------------------------


@query(
    "asof_last_order_per_event",
    oracle="""
        SELECT event_id, user_id, o_orderkey AS last_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
        FROM (
            SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        ) WHERE rn = 1
    """,
    tags=("join", "asof", "window"),
    doc="As-of join (Spark has no native one — pyspark guide pattern): for "
    "each event, the user's most recent order at event time. Implemented "
    "as its canonical composition: inequality join + per-event "
    "row_number()=1 with a deterministic tiebreak. At scale the join "
    "co-partitions on the equality key (user), so the window never "
    "crosses partitions.",
)
def asof_last_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = events.join(
        orders,
        (events.user_id == orders.o_custkey) & (orders.o_orderdate <= events.ts),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
    )


# --- Gap-fill resample (hypertable forward-fill) ----------------------------


@query(
    "gapfill_user_value",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) // 21600 * 21600 AS bucket_ts,
                   value,
                   row_number() OVER (PARTITION BY user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 21600 * 21600
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        last_vals AS (SELECT user_id, bucket_ts, value FROM b WHERE rn = 1),
        bounds AS (SELECT user_id, min(bucket_ts) AS t0, max(bucket_ts) AS t1
                   FROM b GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(t0, t1, 21600)) AS bucket_ts
                 FROM bounds)
        SELECT g.user_id, g.bucket_ts,
               last_value(lv.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        FROM grid g LEFT JOIN last_vals lv
          ON g.user_id = lv.user_id AND g.bucket_ts = lv.bucket_ts
    """,
    tags=("timeseries", "gapfill", "window"),
    doc="Regular-grid resample + forward fill (the hypertable gap-fill "
    "companion to the bucketed rollups): per user, 6-hour buckets from "
    "the user's first to last event, last observation per bucket "
    "(ts + event_id tie-break), empty buckets carry the previous value. "
    "Every stage is keyed on user — per-key bounds partial-agg, narrow "
    "sequence() grid explode, keyed last-per-bucket window, per-key "
    "running last(ignorenulls) — no global sort at any scale.",
)
def gapfill_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_forward

    events = load_table(spark, sf_dir, "events")
    return gap_fill_forward(events, "user_id", "ts", "value", 21600, "event_id")


# --- Range join (band classification) --------------------------------------

_BANDS = [
    (0, 0.0, 10.0, "low"),
    (1, 10.0, 50.0, "mid"),
    (2, 50.0, 200.0, "high"),
    (3, 200.0, 1e9, "extreme"),
]


@query(
    "range_join_value_bands",
    oracle="""
        WITH bands(band_id, lo, hi, label) AS (
            VALUES (0, 0.0, 10.0, 'low'), (1, 10.0, 50.0, 'mid'),
                   (2, 50.0, 200.0, 'high'), (3, 200.0, 1000000000.0, 'extreme')
        )
        SELECT label, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY label
    """,
    tags=("join", "range"),
    doc="Range (interval) join: classify events into value bands via an "
    "inequality join against a tiny broadcast dimension — the band table "
    "is a nested-loop broadcast join (rows x 4), which Catalyst plans as "
    "BroadcastNestedLoopJoin; at any scale the fact side streams.",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "band_id int, lo double, hi double, label string")
    return (
        events.join(
            F.broadcast(bands),
            (events.value >= bands.lo) & (events.value < bands.hi),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )


# --- Interval-overlap join (session concurrency) ---------------------------


@query(
    "concurrent_session_pairs",
    oracle="""
        WITH e AS (
            SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t
            FROM events),
        flagged AS (
            SELECT u, t,
                   CASE WHEN lag(t) OVER w IS NULL
                             OR t - lag(t) OVER w > 600 THEN 1 ELSE 0 END AS new
            FROM e WINDOW w AS (PARTITION BY u ORDER BY t)),
        sess AS (
            SELECT u, t,
                   CAST(sum(new) OVER (PARTITION BY u ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM flagged),
        iv AS (
            SELECT u, sid, min(t) AS lo, max(t) + 1 AS hi
            FROM sess GROUP BY u, sid)
        SELECT a.u AS user_a, b.u AS user_b,
               CAST(count(*) AS BIGINT) AS n_session_pairs,
               CAST(sum(least(a.hi, b.hi) - greatest(a.lo, b.lo)) AS BIGINT)
                   AS overlap_sec
        FROM iv a JOIN iv b
          ON a.u < b.u AND a.lo < b.hi AND b.lo < a.hi
        GROUP BY a.u, b.u
    """,
    tags=("join", "interval", "timeseries", "scale-path"),
    doc="Interval x interval OVERLAP join — the concurrency analysis "
    "('whose sessions coincided, for how long'): per-user activity "
    "sessions (10-min gap rule, the sessionize mechanism), then every "
    "cross-user overlapping session pair with total overlap seconds. "
    "The naive form is an inequality join (cartesian at scale); the "
    "operator explodes both sides onto a 600 s grid, hash-joins on the "
    "cell, and counts each true pair exactly once at the canonical "
    "cell containing the overlap start — candidates are per-cell "
    "occupancy products, never |sessions|^2; the oracle IS the "
    "brute-force inequality join, proving the grid lossless "
    "(operators/joins.py:interval_overlap_join).",
)
def concurrent_session_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.joins import interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        F.col("user_id").alias("u"), F.unix_timestamp("ts").cast("long").alias("t")
    )
    w = Window.partitionBy("u").orderBy("t")
    flagged = e.withColumn(
        "new",
        F.when(
            F.lag("t").over(w).isNull() | (F.col("t") - F.lag("t").over(w) > 600),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    iv = sess.groupBy("u", "sid").agg(
        F.min("t").alias("lo"), (F.max("t") + 1).alias("hi")
    )
    a = iv.select(
        F.col("u").alias("user_a"), F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a")
    )
    b = iv.select(
        F.col("u").alias("user_b"), F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b")
    )
    pairs = interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 600).filter(
        F.col("user_a") < F.col("user_b")
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_session_pairs"),
        F.sum(
            F.least(F.col("hi_a"), F.col("hi_b"))
            - F.greatest(F.col("lo_a"), F.col("lo_b"))
        )
        .cast("long")
        .alias("overlap_sec"),
    )


# --- Exact quantiles -------------------------------------------------------


@query(
    "value_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    tags=("agg", "quantile"),
    doc="Exact interpolated percentiles per group (Spark percentile() == "
    "DuckDB quantile_cont, both linear interpolation). The approximate "
    "scale path is value_percentiles_approx (t-digest style sketch).",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@query(
    "value_percentiles_approx",
    oracle=None,  # sketch-based, approximate by design
    tags=("agg", "quantile", "approx", "scale-path"),
    doc="Percentiles at 100 TB: percentile_approx sketch (mergeable, "
    "single pass, bounded memory) — no global sort, no exact buffer.",
)
def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.9, 10000).alias("p90"),
        F.percentile_approx("value", 0.99, 10000).alias("p99"),
    )


@query(
    "value_quantiles_global_exact",
    oracle="""
        WITH r AS (
            SELECT value, row_number() OVER (ORDER BY value) AS rn,
                   count(*) OVER () AS n
            FROM events WHERE value IS NOT NULL
        )
        SELECT p, value FROM r
        JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p) t
          ON rn = CAST(ceil(p * n) AS BIGINT)
    """,
    tags=("agg", "quantile", "scale-path"),
    doc="EXACT global discrete quantiles (PERCENTILE_DISC) with neither "
    "a whole-column memory buffer (what percentile() does per group) "
    "nor sketch error (percentile_approx): one distributed rank via "
    "operators/ordered.py's range-partitioned prefix machinery, then a "
    "broadcast join against the ceil(p*n) target ranks. The missing "
    "exact-at-scale member of the percentile family.",
)
def value_quantiles_global_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import quantiles_disc

    events = load_table(spark, sf_dir, "events")
    return quantiles_disc(events, "value", [0.5, 0.9, 0.99])


@query(
    "weighted_median_price_by_qty",
    oracle="""
        WITH pv AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
            FROM lineitem GROUP BY 1
        ), c AS (
            SELECT v, w,
                   CAST(sum(w) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cw,
                   CAST(sum(w) OVER () AS BIGINT) AS tw
            FROM pv
        )
        SELECT p, min(v) AS value_cents,
               CAST(min_by(cw, v) AS BIGINT) AS cum_weight
        FROM c
        JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS p) t
          ON cw >= p * tw
        GROUP BY p
    """,
    tags=("agg", "quantile", "scale-path"),
    doc="Exact weighted quantiles (weighted median at p=0.5) of line "
    "price weighted by quantity — the smallest value whose cumulative "
    "weight reaches p*W. Integer cents + BIGINT weights for "
    "bit-determinism; cumulative weights via the distributed prefix-sum "
    "(operators/ordered.py), qualifying rows broadcast-joined per p and "
    "resolved with one struct-min aggregation.",
)
def weighted_median_price_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import weighted_quantiles

    lineitem = load_table(spark, sf_dir, "lineitem")
    staged = lineitem.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    out = weighted_quantiles(staged, "v", "w", [0.25, 0.5, 0.75])
    return out.select(
        "p",
        F.col("value").alias("value_cents"),
        F.col("cum_weight").cast("long").alias("cum_weight"),
    )


# --- Deterministic dispersion stats ----------------------------------------


@query(
    "order_price_dispersion",
    oracle="""
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS mean_price,
               round(sqrt((count(*) * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) * CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                            - CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE))
                           / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) / 100.0, 4) AS stddev_price
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "stats"),
    doc="Sample standard deviation via exact integer sums-of-squares "
    "(sqrt((n*Σx²−(Σx)²)/(n(n−1)))): order-independent, bit-deterministic "
    "cross-engine — unlike naive stddev whose partial-merge order drifts.",
)
def order_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    n = F.count("*")
    s1 = F.sum(c).cast("double")
    # Σc² must widen BEFORE the sum: per-row c·c fits a long, but the
    # group sum passes 2⁶³ around 150k orders (sf0.1) — DECIMAL(38,0)
    # matches the oracle's HUGEINT accumulator exactly
    s2 = F.sum((c * c).cast("decimal(38,0)")).cast("double")
    return orders.groupBy("o_orderpriority").agg(
        n.alias("n"),
        (F.sum(c).cast("double") / F.lit(100.0) / F.count("*")).alias("mean_price"),
        F.round(
            F.sqrt((n * s2 - s1 * s1) / (n.cast("double") * (n - 1))) / F.lit(100.0), 4
        ).alias("stddev_price"),
    )


# --- Map type: JSON → map, explode, aggregate --------------------------------


@query(
    "map_props_stats",
    oracle="""
        -- no json extension in the oracle env; the fixture's props are
        -- single-key objects, so regex extraction is equivalent
        WITH kv AS (
            SELECT regexp_extract(props, '"([^"]+)"', 1) AS key,
                   CAST(regexp_extract(props, ': *(-?[0-9]+)', 1) AS BIGINT) AS value
            FROM events
        )
        SELECT key, count(*) AS n, CAST(sum(value) AS BIGINT) AS total
        FROM kv GROUP BY key
    """,
    tags=("map", "json", "explode"),
    doc="Map-typed processing: props JSON parses to map<string,long>, "
    "explode emits (key, value) pairs, grouped stats per key — the "
    "schema-on-read path for semi-structured columns (from_json stays in "
    "codegen; no Python).",
)
def map_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    kv = events.select(F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "value"))
    return kv.groupBy("key").agg(F.count("*").alias("n"), F.sum("value").alias("total"))


# --- Analytic windows: frames and offsets -----------------------------------


@query(
    "running_revenue_by_customer",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100.0 AS running_total
        FROM orders
    """,
    tags=("window", "frame"),
    doc="Running per-customer revenue — cumulative-sum frame "
    "(UNBOUNDED PRECEDING → CURRENT ROW) ordered by date with a "
    "deterministic orderkey tiebreak; partitions on the high-cardinality "
    "customer key so no reducer hotspot. Exact cents inside the frame.",
)
def running_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / F.lit(100.0)).alias("running_total"),
    )


@query(
    "moving_avg_order_total",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE)
                   / (100.0 * COUNT(*) OVER w) AS moving_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "bounded-frame"),
    doc="3-row moving average of order totals per customer — the "
    "BOUNDED window frame class (ROWS 2 PRECEDING), next to the "
    "unbounded running total. Exact integer cents inside the frame, one "
    "division at the end, so the double is bit-identical across "
    "engines; partitions on the customer key.",
)
def moving_avg_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w).cast("double") / (F.lit(100.0) * F.count("*").over(w))
        ).alias("moving_avg"),
    )


@query(
    "order_gap_days",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS gap_days
        FROM orders
        QUALIFY gap_days IS NOT NULL
    """,
    tags=("window", "lag"),
    doc="Days since the customer's previous order — lag() offset window "
    "with deterministic ordering; first order per customer drops (NULL "
    "lag), matching DuckDB's QUALIFY form.",
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long").alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


# --- Hypertable-style cascading rollup --------------------------------------


@query(
    "rollup_cascade_traffic",
    oracle="""
        SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS bucket_10m,
               count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        FROM events GROUP BY 1
    """,
    tags=("agg", "rollup", "timeseries"),
    doc="Hypertable-style cascading rollup: the 10-minute buckets are "
    "re-aggregated FROM the 1-minute rollup, not the raw events — the "
    "oracle aggregates raw directly, proving the partials merge exactly "
    "(counts and integer-cent sums are associative). At scale the fine "
    "rollup is the continuously maintained table and every coarser "
    "resolution derives from it at 1/600th the input size.",
)
def rollup_cascade_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    fine = (
        events.groupBy(F.floor(F.unix_timestamp("ts") / 60).alias("bucket_1m"))
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
    )
    return (
        fine.groupBy(F.floor(F.col("bucket_1m") / 10).alias("bucket_10m"))
        .agg(
            F.sum("n").alias("n"),
            (F.sum("sum_cents").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )


@query(
    "cube_status_priority",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
    doc="CUBE over (status, priority) — all 2^2 grouping combinations in "
    "one pass, completing the grouping-shape family next to ROLLUP "
    "(rollup_cascade_traffic) and GROUPING SETS (grouping_sets_sql). "
    "Spark expands the cube map-side and partial-aggregates, so the "
    "shuffle carries one partial row per (combination, group), not the "
    "fact. NULL group markers are coalesced to 'ALL' in both engines "
    "(fixture columns are non-null, so the marker is unambiguous).",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
        )
    )


# --- Salted skew join -------------------------------------------------------


@query(
    "salted_join_segment_traffic",
    oracle="""
        SELECT c_mktsegment, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "skew", "salted"),
    doc="Skew-mitigated equi-join (operators/joins.py): the fact's keys "
    "scatter over 8 salts, the dim replicates per salt, (key, salt) "
    "equality reassembles the exact join — hash-identical to the plain "
    "join, which is the point: salting must never change semantics.",
)
def salted_join_segment_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        salted_join(events, cust, "user_id", "c_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )


# --- Grouping sets through the SQL API -------------------------------------


@query(
    "grouping_sets_sql",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "groupingsets", "sql-api"),
    doc="GROUPING SETS issued through spark.sql() — exercises the engine's "
    "SQL surface (parser → analyzer → same Catalyst plan as the DataFrame "
    "path, SURVEY.md §3.3).",
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- Unpivot: wide → long reshaping ------------------------------------------


@query(
    "unpivot_part_measures",
    oracle="""
        WITH u AS (
            SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
        )
        SELECT measure, count(*) AS n,
               min(value) AS min_value, max(value) AS max_value,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM u GROUP BY measure ORDER BY measure
    """,
    tags=("unpivot", "agg"),
    doc="Unpivot (wide→long, the inverse of pivot_status_by_priority): "
    "part's measure columns melt into (measure, value) rows via "
    "DataFrame.unpivot — a narrow Expand, no shuffle until the tiny "
    "per-measure rollup. The SQL form is the portable UNION ALL.",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    long = part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / F.lit(100.0)).alias("total"),
        )
        .orderBy("measure")
    )


# --- Distribution analytics ------------------------------------------------


@query(
    "order_value_ntiles",
    oracle="""
        SELECT o_orderkey, quartile, pct_rank, cume
        FROM (
            SELECT o_orderkey,
                   ntile(4) OVER w AS quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume
            FROM orders
            WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        ) WHERE quartile = 4 AND pct_rank >= 0.99
    """,
    tags=("window", "analytics"),
    doc="Distribution-position analytics — ntile / percent_rank / "
    "cume_dist over a total order (price, key-tiebroken so every rank "
    "function is deterministic); emits the top percentile of the top "
    "quartile. Under a TOTAL order all three reduce to closed forms of "
    "the global rank — percent_rank = (rank-1)/(n-1), cume_dist = "
    "rank/n, ntile from the ANSI bucket formula — so the whole query "
    "runs on the distributed rank (operators/ordered.py), parallel "
    "range sorts instead of the single global window sort.",
)
def order_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import rank_cumsum

    orders = load_table(spark, sf_dir, "orders")
    ranked = rank_cumsum(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_col="__rk",
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    r = F.col("__rk")
    n = F.col("__n")
    base = F.floor(n / 4)
    extra = n % 4
    fat = (base + 1) * extra
    quartile = F.when(base == 0, r).otherwise(
        F.when(r <= fat, F.floor((r - 1) / (base + 1)) + 1).otherwise(
            extra + F.floor((r - fat - 1) / base) + 1
        )
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            quartile.cast("int").alias("quartile"),
            # n=1 guard: percent_rank() is defined as 0.0 for a single
            # row, where the closed form's (n-1) denominator is 0
            F.round(
                F.when(n > 1, (r - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
            ).alias("pct_rank"),
            F.round(r / n, 6).alias("cume"),
        )
        .filter((F.col("quartile") == 4) & (F.col("pct_rank") >= 0.99))
    )


@query(
    "skew_key_profile",
    oracle="""
        SELECT user_id, n, share FROM (
            SELECT user_id, n,
                   round(n / CAST(total AS DOUBLE), 6) AS share,
                   row_number() OVER (ORDER BY n DESC, user_id) AS rn
            FROM (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(count(*)) OVER () AS BIGINT) AS total
                FROM events GROUP BY user_id
            )
        ) WHERE rn <= 20
    """,
    tags=("agg", "diagnostics"),
    doc="Join-key skew profile — the diagnostic run before choosing "
    "broadcast/salt/AQE strategy for a hot-key join: top-20 heaviest "
    "keys with their share of all rows. Partial-agg counts, then a "
    "20-row top-k; only the per-key counts shuffle.",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("__total"))
    # sort-limit FIRST (TakeOrderedAndProject) so no SinglePartition
    # window ever sees the full per-key count table
    top = counts.orderBy(F.col("n").desc(), "user_id").limit(20)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("__total").cast("double"), 6))
        .select("user_id", "n", "share")
    )


# --- Physical layout: Z-order clustering -----------------------------------


def _zorder_oracle() -> str:
    from ..operators.layout import interleave_sql

    fracs = ", ".join(str(i / 256) for i in range(1, 256))
    return f"""
        SELECT event_id, bx, by, {interleave_sql(["bx", "by"], 8)} AS zvalue
        FROM (
            SELECT e.event_id,
                   len(list_filter(d.ev, x -> x <= e.value)) AS bx,
                   len(list_filter(d.eu, x -> x <= e.user_id)) AS by
            FROM events e,
                 (SELECT list_transform(quantile_cont(value, [{fracs}]), x -> round(x, 6)) AS ev,
                         list_transform(quantile_cont(user_id, [{fracs}]), x -> round(x, 6)) AS eu
                  FROM events) d
        )
    """


@query(
    "zorder_events",
    oracle=_zorder_oracle(),
    tags=("layout", "scale-path"),
    doc="Z-order clustering key over (value, user_id): each dimension "
    "quantile-bucketed into 256 rank-space buckets (skew-proof) against "
    "precomputed broadcast bin edges — ONE mergeable percentile "
    "aggregate plus a codegen-friendly branchless binary search over "
    "the 255-entry edge array (8 chained projections; measured 4x "
    "faster than an interpreted lambda filter), no global ntile() "
    "window, so the layout job has no single-partition sort at any "
    "scale (the operator's default path swaps the exact percentile for "
    "the percentile_approx sketch; operators/layout.py:quantile_edges). "
    "Bits interleaved into one sort key; writing range-partitioned + "
    "sorted on it (operators/layout.py:write_zordered) gives every "
    "clustered column tight per-file min/max stats, so parquet "
    "row-group pruning works for predicates on ANY clustered dimension "
    "— the data-skipping layout step of a 100 TB table build. Exact "
    "interpolated percentiles match DuckDB quantile_cont after both "
    "engines round edges to 6 decimals (in practice — see "
    "layout.quantile_edges for the ULP caveat and the |x| ≲ 9e9 "
    "magnitude bound on DuckDB's round); ties at an edge go to the "
    "upper bucket in both engines.",
)
def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import bucket_by_edges, interleave_sql

    events = load_table(spark, sf_dir, "events")
    keyed, _ = bucket_by_edges(events, ["value", "user_id"], bits=8, exact=True)
    return keyed.select(
        "event_id",
        F.col("__b_value").alias("bx"),
        F.col("__b_user_id").alias("by"),
    ).withColumn("zvalue", F.expr(interleave_sql(["bx", "by"], 8)))


# --- Frequency sketch: count-min --------------------------------------------


@query(
    "cms_token_estimates",
    oracle=None,  # engine-internal hashing; error bounds pytest-verified
    tags=("sketch", "approx", "scale-path"),
    doc="Count-min sketch (depth 4 x width 1024) over the corpus token "
    "stream, probed for the 20 most frequent tokens: (term, est_count). "
    "The sketch is <= depth*width counter rows no matter the corpus size "
    "- constant-size shuffle + broadcast where exact counts are a "
    "vocabulary-sized shuffle. One-sided error (never undercounts) "
    "bounded in tests/test_sketches.py against exact counts.",
)
def cms_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT
    from ..operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TXT.tokens(F.col("text"))).alias("term"))
    sketch = sketches.cms_build(toks, "term")
    top = (
        toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
        .select("term")
    )
    return sketches.cms_estimate(sketch, top, "term").orderBy("term")


# --- Bucketed (storage-co-located) join -------------------------------------


@query(
    "bucketed_join_segment_sales",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "layout", "scale-path"),
    doc="Fact-fact join over storage-bucketed tables: both sides are "
    "persisted hash-bucketed on the join key (write_bucketed), so the "
    "join itself needs NO Exchange - the shuffle is paid once at ingest "
    "and amortized over every downstream query, the decisive layout for "
    "the largest recurring join at 100 TB. Exchange-free plan pinned by "
    "tests/test_plan_shapes.py::test_bucketed_join_has_no_exchange "
    "(operators/joins.py:write_bucketed).",
)
def bucketed_join_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re

    from ..operators import joins
    from .tpch_queries import _money

    tag = re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(sf_dir.rstrip("/"))) or "default"
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".bucketed",
        tag,
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joins.write_bucketed(
        orders, f"bkt_orders_{tag}", os.path.join(base, "orders"), ["o_custkey"], 8, ["o_custkey"]
    )
    joins.write_bucketed(
        cust, f"bkt_customer_{tag}", os.path.join(base, "customer"), ["c_custkey"], 8, ["c_custkey"]
    )
    j = joins.colocated_join(
        spark,
        f"bkt_orders_{tag}",
        f"bkt_customer_{tag}",
        spark.table(f"bkt_orders_{tag}")["o_custkey"]
        == spark.table(f"bkt_customer_{tag}")["c_custkey"],
    )
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        _money(F.col("o_totalprice"), 100).alias("revenue"),
    )


@query(
    "interval_join_order_bands",
    oracle="""
        SELECT o.o_orderkey,
               count(*) AS n_events,
               min(e.value) AS min_value,
               max(e.value) AS max_value
        FROM orders o JOIN events e
          ON o.o_totalprice / 1000.0 - 0.1 <= e.value
         AND e.value < o.o_totalprice / 1000.0 + 0.1
        GROUP BY o.o_orderkey
    """,
    tags=("join", "range", "scale-path"),
    doc="Interval join at scale: every order defines a value band "
    "[price/1000 - 0.1, price/1000 + 0.1) and matches the events inside "
    "it. "
    "Unlike range_join_value_bands (broadcast nested loop over a tiny "
    "band table), the interval side here is the full orders table, so "
    "the join reduces to a grid-cell equi-join: intervals explode into "
    "the ~2 cells they cover, points hash to one cell, exact "
    "containment filters after the cell match - O(points + intervals + "
    "matches), AQE/salting-compatible "
    "(operators/joins.py:interval_join_bucketed).",
)
def interval_join_order_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import joins

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") / 1000.0 - 0.1).alias("lo"),
        (F.col("o_totalprice") / 1000.0 + 0.1).alias("hi"),
    )
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    j = joins.interval_join_bucketed(events, orders, "value", "lo", "hi", cell_size=0.25)
    return j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "value_quantiles_cont_exact",
    oracle="""
        SELECT p, round(value, 6) AS value FROM (
            SELECT 0.5 AS p, quantile_cont(value, 0.5) AS value FROM events
            UNION ALL
            SELECT 0.9, quantile_cont(value, 0.9) FROM events
            UNION ALL
            SELECT 0.99, quantile_cont(value, 0.99) FROM events
        )
    """,
    tags=("agg", "quantile", "scale-path"),
    doc="EXACT interpolated global quantiles (PERCENTILE_CONT — the "
    "same value percentile()/quantile_cont compute) without the "
    "whole-column memory buffer: one distributed rank, then a "
    "broadcast join picks the two bracketing ranks per p and "
    "interpolates. Completes the quantile family: disc "
    "(value_quantiles_global_exact), cont (this), approx sketch, "
    "per-group exact (operators/ordered.py:quantiles_cont).",
)
def value_quantiles_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import quantiles_cont

    events = load_table(spark, sf_dir, "events")
    out = quantiles_cont(events, "value", [0.5, 0.9, 0.99])
    return out.select("p", F.round("value", 6).alias("value"))


@query(
    "value_quantiles_disc_by_type",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_type, p, value FROM r
        JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p) t
          ON rn = CAST(ceil(p * n) AS BIGINT)
    """,
    tags=("agg", "quantile", "window", "scale-path"),
    doc="Per-group exact discrete quantiles WITHOUT percentile()'s "
    "per-group memory buffer: partitioned rank + per-group count, pick "
    "rank == ceil(p*n_g). A giant skewed group costs one partition "
    "sort, never an executor-memory array — the grouped member of the "
    "exact-quantile family (operators/ordered.py:quantiles_disc_grouped).",
)
def value_quantiles_disc_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import quantiles_disc_grouped

    events = load_table(spark, sf_dir, "events")
    return quantiles_disc_grouped(events, "event_type", "value", [0.5, 0.9, 0.99])


@query(
    "value_quantiles_cont_by_type",
    oracle="""
        SELECT event_type, p, round(value, 6) AS value FROM (
            SELECT event_type, 0.5 AS p, quantile_cont(value, 0.5) AS value
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.9, quantile_cont(value, 0.9)
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.99, quantile_cont(value, 0.99)
            FROM events GROUP BY event_type
        )
    """,
    tags=("agg", "quantile", "window", "scale-path"),
    doc="Per-group exact interpolated quantiles WITHOUT percentile()'s "
    "per-group buffer — the last cell of the {disc, cont} x {global, "
    "grouped} buffer-free matrix: partitioned rank + group count, two "
    "bracketing rows per (group, p), one interpolation "
    "(operators/ordered.py:quantiles_cont_grouped).",
)
def value_quantiles_cont_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordered import quantiles_cont_grouped

    events = load_table(spark, sf_dir, "events")
    out = quantiles_cont_grouped(events, "event_type", "value", [0.5, 0.9, 0.99])
    return out.select("event_type", "p", F.round("value", 6).alias("value"))


def _hilbert_oracle() -> str:
    from ..operators.layout import hilbert_oracle_wrap

    fracs = ", ".join(str(i / 256) for i in range(1, 256))
    inner = f"""
            SELECT e.event_id,
                   len(list_filter(d.ev, x -> x <= e.value)) AS bx,
                   len(list_filter(d.eu, x -> x <= e.user_id)) AS by
            FROM events e,
                 (SELECT list_transform(quantile_cont(value, [{fracs}]), x -> round(x, 6)) AS ev,
                         list_transform(quantile_cont(user_id, [{fracs}]), x -> round(x, 6)) AS eu
                  FROM events) d
    """
    return hilbert_oracle_wrap(inner, "bx", "by", 8, keep=["event_id"])


@query(
    "hilbert_order_events",
    oracle=_hilbert_oracle(),
    tags=("layout", "scale-path"),
    doc="Hilbert-curve clustering key over (value, user_id) — the "
    "locality upgrade over zorder_events for the SAME layout job: "
    "consecutive Hilbert addresses are always unit grid steps (no "
    "Z-shape jumps across the key space; exhaustively pinned in "
    "tests), so a sort-key range maps to a tighter 2-D region and "
    "parquet min/max pruning clips fewer false row groups on 2-D "
    "range predicates. Same skew-proof rank-space bucketing as the Z "
    "key (one mergeable percentile aggregate, no global window), then "
    "the classic xy2d bit loop UNROLLED into 8 chained integer-CASE "
    "projections mirrored verbatim by the oracle's nested derived "
    "tables (operators/layout.py:hilbert_from_buckets).",
)
def hilbert_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import bucket_by_edges, hilbert_from_buckets

    events = load_table(spark, sf_dir, "events")
    keyed, _ = bucket_by_edges(events, ["value", "user_id"], bits=8, exact=True)
    b = keyed.select(
        "event_id",
        F.col("__b_value").alias("bx"),
        F.col("__b_user_id").alias("by"),
    )
    return hilbert_from_buckets(b, "bx", "by", bits=8, out="hvalue")
