"""AIS-pipeline query surface (SURVEY.md §2) expressed over the driver's
test tables: ``events`` plays the high-rate keyed position stream
(ship_position / ship_position_with_weather), ``customer`` plays the
``ship_info`` dimension (FIXTURES.md §5 mapping).

Each query cites the reference operator(s) it reproduces. Scale stance:
- count-distincts shuffle once on the distinct key with partial aggregation
  (Catalyst does two-phase automatically); an ``approx_*`` HLL variant is
  registered for the 100 TB path.
- the dashboard join broadcasts the dimension side (ship_info/customer is
  tiny relative to positions at any scale).
- window functions partition on the stream key (user_id/mmsi) — the natural
  high-cardinality partitioning that avoids any single-reducer hotspot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalar
from ..sources import load_table
from .registry import query


# --- A1/A2: dashboard metrics (lib/console.py:34-42) -----------------------


@query(
    "a1_total_ships",
    oracle="SELECT count(DISTINCT user_id) AS ship_count FROM events",
    tags=("agg", "distinct"),
    doc="A1 — global exact count-distinct ('Total ships', lib/console.py:34-37).",
)
def a1_total_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(F.countDistinct("user_id").alias("ship_count"))


@query(
    "a2_moving_ships",
    oracle="SELECT count(DISTINCT user_id) AS ship_count FROM events WHERE value > 10",
    tags=("agg", "distinct", "filter"),
    doc="A2 — filtered count-distinct ('Ships moving > 10 knots', lib/console.py:39-42; predicate P9).",
)
def a2_moving_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("value") > 10).agg(F.countDistinct("user_id").alias("ship_count"))


@query(
    "a1_total_ships_approx",
    oracle=None,  # HLL sketch: approximate by design; driver does rows-only
    tags=("agg", "distinct", "approx", "scale-path"),
    doc="A1 at 100 TB — HLL approx_count_distinct; one pass, no exact-distinct shuffle.",
)
def a1_total_ships_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(F.approx_count_distinct("user_id", rsd=0.01).alias("ship_count_approx"))


# --- A3/A4: map centering / bounding box (lib/console.py:59-60,102-105) ----


@query(
    "a3_map_center",
    oracle="""
        SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_value,
               CAST(sum(user_id) AS DOUBLE) / count(*) AS avg_user
        FROM events
    """,
    tags=("agg",),
    doc="A3 — two-column mean (pandas df[['lat','lon']].mean(), lib/console.py:59-60). "
    "Exact integer-cents sum => order-independent double.",
)
def a3_map_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        (F.sum(scalar.cents(F.col("value"))).cast("double") / F.lit(100.0) / F.count("*")).alias("avg_value"),
        (F.sum("user_id").cast("double") / F.count("*")).alias("avg_user"),
    )


@query(
    "a4_bounding_box",
    oracle="""
        SELECT min(value) AS min_value, max(value) AS max_value,
               min(user_id) AS min_user, max(user_id) AS max_user
        FROM events
    """,
    tags=("agg",),
    doc="A4 — min/max bounding box for fit_bounds (lib/console.py:102-105).",
)
def a4_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )


# --- P1/P2: router + validity filter (lib/producer-from-ais-api.py:35-61) --


@query(
    "p1_route_positions",
    oracle="""
        SELECT event_id, CAST(user_id AS VARCHAR) AS key, event_type, value
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
    """,
    tags=("filter", "project"),
    doc="P1 — message-type router, position branch (msg_type 1|3|18, "
    "lib/producer-from-ais-api.py:37-38); F3 key cast (str(mmsi), :49).",
)
def p1_route_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("click", "view", "purchase")).select(
        "event_id",
        F.col("user_id").cast("string").alias("key"),
        "event_type",
        "value",
    )


@query(
    "p1_route_info",
    oracle="""
        SELECT event_id, CAST(user_id AS VARCHAR) AS key, event_type, value
        FROM events WHERE event_type = 'signup'
    """,
    tags=("filter", "project"),
    doc="P1 — router, ship-info branch (msg_type 5, lib/producer-from-ais-api.py:78).",
)
def p1_route_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "signup").select(
        "event_id",
        F.col("user_id").cast("string").alias("key"),
        "event_type",
        "value",
    )


@query(
    "p2_validity_filter",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE value > 2 AND value < 75 AND user_id <= 90
    """,
    tags=("filter",),
    doc="P2 — conjunctive validity/range predicate (speed>2 AND speed<75 AND "
    "lat<=90 ..., lib/producer-from-ais-api.py:54-61). Pushed to the parquet scan.",
)
def p2_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter((F.col("value") > 2) & (F.col("value") < 75) & (F.col("user_id") <= 90)).select(
        "event_id", "user_id", "event_type", "value"
    )


# --- F4-F9: scalar display functions (lib/console.py:86-100, utils.py:114) -

_EVENT_COLOR_MAP = {
    "cl": "blue",  # click*
    "pu": "green",  # purchase*
    "si": "orange",  # signup*
    "er": "red",  # error*
}


@query(
    "f_scalar_display",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
               CASE WHEN value > 245 THEN 'N' ELSE 'S' END AS hemi,
               event_type || '@' || CAST(user_id AS VARCHAR) AS label,
               CASE WHEN event_type LIKE 'cl%' THEN 'blue'
                    WHEN event_type LIKE 'pu%' THEN 'green'
                    WHEN event_type LIKE 'si%' THEN 'orange'
                    WHEN event_type LIKE 'er%' THEN 'red'
                    ELSE 'lightgray' END AS color
        FROM events
    """,
    tags=("scalar",),
    doc="F4 ISO-8601 UTC format (lib/utils.py:114-115); F7 hemisphere label "
    "(lib/console.py:89-90); F8 string interpolation (:91-92); F9 prefix-match "
    "categorical lookup with default (:62-98).",
)
def f_scalar_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        scalar.iso_utc(F.col("ts")).alias("iso_ts"),
        scalar.hemisphere(F.col("value") - 245, "N", "S").alias("hemi"),
        F.concat(F.col("event_type"), F.lit("@"), F.col("user_id").cast("string")).alias("label"),
        scalar.prefix_map(F.col("event_type"), _EVENT_COLOR_MAP, "lightgray").alias("color"),
    )


@query(
    "f6_json_extract",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    tags=("scalar", "json"),
    doc="F6 — JSON parse + nested key access (json.loads(weather)['condition']..., "
    "lib/consumer-and-producer-enrich-position-with-weather.py:39-57).",
)
def f6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        scalar.json_string(F.col("props"), "$.k").cast("long").alias("k"),
    )


# --- J1 + P7 + P8 + L1: the flagship dashboard join ------------------------

_J1_ORACLE = """
    SELECT e.event_id, e.user_id, c.c_name AS shipname, c.c_mktsegment AS shiptype,
           c.c_acctbal AS acctbal, c.c_nationkey AS nationkey,
           e.event_type, e.value, strftime(e.ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
    FROM events e LEFT OUTER JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_name <> ''
    ORDER BY e.event_id
    LIMIT 600
"""


@query(
    "j1_dashboard_join",
    oracle=_J1_ORACLE,
    tags=("join", "filter", "project", "limit", "flagship"),
    doc="J1 — left-outer equi-join on the stream key + P8 non-empty post-filter "
    "+ P7 wide projection + L1 LIMIT 600 (sql/clickhouse-dml.sql:11-14, "
    "lib/console.py:44-51). NULL-vs-empty-string semantics per SURVEY.md §2.4: "
    "Spark's NULL shipname rows are dropped by the <> '' predicate exactly like "
    "ClickHouse's '' fill. Dimension side is broadcast (ship_info ≪ positions at "
    "every scale); LIMIT is made deterministic with ORDER BY (SURVEY §7 risk 5).",
)
def j1_dashboard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey, "left_outer")
        .filter(F.col("c_name") != "")
        .select(
            "event_id",
            "user_id",
            F.col("c_name").alias("shipname"),
            F.col("c_mktsegment").alias("shiptype"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").alias("nationkey"),
            "event_type",
            "value",
            scalar.iso_utc(F.col("ts")).alias("iso_ts"),
        )
        .orderBy("event_id")
        .limit(600)
    )


# --- W1: latest-per-key (compacted-topic semantics, README.md:199-200) -----


@query(
    "w1_latest_per_key",
    oracle="""
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               value AS last_value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("window", "dedup"),
    doc="W1 — latest row per key by timestamp: the explicit form of the "
    "compacted ship-info topic's latest-per-mmsi semantics (README.md:199-200; "
    "SURVEY.md §2.6). event_id tiebreak makes it deterministic.",
)
def w1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


# --- L1: deterministic top-N (lib/console.py:44,50) ------------------------


@query(
    "l1_top_events",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events ORDER BY value DESC, event_id LIMIT 600
    """,
    tags=("sort", "limit"),
    doc="L1 — LIMIT 600 result cap (lib/console.py:44,50), made deterministic "
    "with a total order (TakeOrderedAndProject: per-partition top-k, no full sort).",
)
def l1_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("event_id", "user_id", "event_type", "value").orderBy(
        F.col("value").desc(), F.col("event_id")
    ).limit(600)


# --- Streaming-shaped analytics (batch-equivalent declared forms) ----------


@query(
    "st_window_traffic",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    tags=("agg", "time", "streaming-equivalent"),
    doc="Tumbling-window traffic aggregate — the batch-equivalent of the "
    "Structured Streaming windowed agg in streaming/materialize.py (ST1). "
    "Partial aggregation map-side; one shuffle on (hour, event_type).",
)
def st_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(scalar.cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )


@query(
    "st_sliding_traffic",
    oracle="""
        SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n
        FROM (
            SELECT ts, event_type,
                   -- floor, not CAST: CAST(double AS BIGINT) rounds, which
                   -- would shift sub-second events near an 1800s boundary
                   unnest([
                       to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) // 1800 * 1800),
                       to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) // 1800 * 1800) - INTERVAL 30 MINUTE
                   ]) AS w_start
            FROM events
        )
        WHERE ts >= w_start AND ts < w_start + INTERVAL 60 MINUTE
        GROUP BY 1, 2
    """,
    tags=("agg", "time", "streaming-equivalent", "sliding-window"),
    doc="Hopping-window traffic (1-hour window, 30-minute slide) — the "
    "third window class next to tumbling (st_window_traffic) and session "
    "(st_sessionize). Each event expands to window/slide buckets map-side "
    "(Spark's window() generates the copies; the oracle unnests the two "
    "epoch-aligned starts), then one partial-agg shuffle on "
    "(window_start, event_type).",
)
def st_sliding_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


@query(
    "st_sessionize",
    oracle="""
        SELECT user_id, count(*) AS n_sessions
        FROM (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) WHERE new_session = 1
        GROUP BY user_id
    """,
    tags=("window", "time", "sessionization"),
    doc="Gap-based sessionization (30-min inactivity): lag + flag + count. "
    "Batch equivalent of session_window in streaming. Partitions on the "
    "stream key — embarrassingly parallel per user.",
)
def st_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = 30 * 60
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")) > gap_sec),
            1,
        ).otherwise(0),
    )
    return flagged.filter(F.col("new_session") == 1).groupBy("user_id").agg(F.count("*").alias("n_sessions"))
