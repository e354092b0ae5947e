"""Reference-parity unit tests: every operator edge case SURVEY.md §5.2
calls out — router drops, P2 boundary values, F1 defaults, empty-shipname
join semantics (NULL vs ''), info-row multiplication, prefix-map order,
and the enrichment gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_ais_demo_spark import console
from redpanda_ais_demo_spark.streaming import enrich, ingest

from .ais_fixtures import decoded_messages


def test_route_positions_boundaries(spark):
    pos = ingest.route_positions(decoded_messages(spark)).collect()
    by_mmsi = {}
    for r in pos:
        by_mmsi.setdefault(r.mmsi, []).append(r)
    # ship 1: all three positions pass
    assert len(by_mmsi["257000001"]) == 3
    # ship 2: speed==2 and speed==75 dropped, speed==3 kept (P2 strict bounds)
    assert [r.speed for r in by_mmsi["257000002"]] == [3]
    # ship 3: heading==360 dropped, 359 kept
    assert [r.heading for r in by_mmsi["257000003"]] == [359]
    # msg types 4/24, missing tag block, lat>90 all dropped
    for gone in ("257000006", "257000007", "257000008"):
        assert gone not in by_mmsi
    # F1: NULL status becomes NotReported
    assert by_mmsi["257000003"][0].status == "NotReported"
    # P3: nested location struct
    assert by_mmsi["257000001"][0].location.lat == 60.1


def test_route_ship_info(spark):
    info = ingest.route_ship_info(decoded_messages(spark)).collect()
    assert {r.mmsi for r in info} == {"257000001", "257000002", "257000003", "257000005"}
    # two info events for ship 1 (changelog), int timestamp type
    ship1 = sorted([r for r in info if r.mmsi == "257000001"], key=lambda r: r.timestamp)
    assert [r.destination for r in ship1] == ["BERGEN", "OSLO"]


def test_enrichment_gates_and_flatten(spark):
    pos = ingest.route_positions(decoded_messages(spark))
    out = enrich.enrich_with_weather(pos, fetch=enrich.stub_weather_fetch).collect()
    # flattened columns present, nested struct gone
    assert {"lat", "lon", "locale", "condition", "temp_f"} <= set(out[0].asDict())
    # the stub returns error/missing shapes for some (lat,lon) keys; all
    # surviving rows must have complete weather
    assert all(r.locale is not None and r.condition is not None for r in out)
    # P6 actually dropped something (fixture keys hit the error branch)
    assert len(out) <= pos.count()


def test_enrichment_error_gate_drops(spark):
    # craft a position whose rounded (lat,lon) key hits the stub's error
    # branch: key = round(lat*10)+round(lon*10) ≡ 0 (mod 19) → lat=1.9,lon=0
    df = spark.createDataFrame(
        [("999", "X", 1, {"lat": 1.9, "lon": 0.0}, 10, 10)],
        "mmsi string, status string, timestamp long, location struct<lat:double,lon:double>, speed int, heading int",
    )
    assert enrich.enrich_with_weather(df).count() == 0


def test_dashboard_join_semantics(spark):
    """J1: inner-join-on-deduped-dimension == reference's left-outer +
    shipname != '' final set, WITHOUT the row multiplication the
    reference tolerates (SURVEY.md §2.4)."""
    decoded = decoded_messages(spark)
    pos = enrich.enrich_with_weather(ingest.route_positions(decoded))
    info = ingest.route_ship_info(decoded)

    ours = console.dashboard_grid(pos, info)
    # reference-literal form: left outer join against the FULL info history
    ref = (
        pos.join(info.withColumnRenamed("timestamp", "info_ts"), "mmsi", "left_outer")
        .filter(F.col("shipname") != "")
    )
    # same set of ships survive (empty-name 257000003 and no-info 257000004 gone)
    ours_ships = {r.mmsi for r in ours.select("mmsi").distinct().collect()}
    ref_ships = {r.mmsi for r in ref.select("mmsi").distinct().collect()}
    assert ours_ships == ref_ships
    assert "257000003" not in ours_ships  # empty shipname filtered (P8)
    assert "257000004" not in ours_ships  # no info row → dropped by inner/'' filter
    assert "257000005" not in ours_ships  # info-only ship has no positions
    # reference form multiplies ship-1 positions by its 2 info rows; ours must not
    n_pos_ship1 = pos.filter(F.col("mmsi") == "257000001").count()
    assert ours.filter(F.col("mmsi") == "257000001").count() == n_pos_ship1
    assert ref.filter(F.col("mmsi") == "257000001").count() == 2 * n_pos_ship1
    # W1: the surviving join rows carry the LATEST destination
    dests = {r.destination for r in ours.filter(F.col("mmsi") == "257000001").collect()}
    assert dests == {"OSLO"}


def test_latest_info_dedup(spark):
    info = ingest.route_ship_info(decoded_messages(spark))
    latest = console.latest_info(info)
    assert latest.count() == info.select("mmsi").distinct().count()
    row = latest.filter(F.col("mmsi") == "257000001").collect()[0]
    assert row.destination == "OSLO" and row.timestamp == 1700000200


def test_console_metrics(spark):
    decoded = decoded_messages(spark)
    pos = enrich.enrich_with_weather(ingest.route_positions(decoded))
    total = console.total_ships(pos).collect()[0].ship_count
    moving = console.moving_ships(pos, knots=10).collect()[0].ship_count
    assert total >= moving  # A2 ⊆ A1
    # ship 257000004 (8 kn) must not count as moving; ship 1 (12-15 kn) must
    moving_ships = {
        r.mmsi for r in pos.filter(F.col("speed") > 10).select("mmsi").distinct().collect()
    }
    assert "257000001" in moving_ships and "257000004" not in moving_ships


def test_map_markers_and_view(spark):
    decoded = decoded_messages(spark)
    pos = enrich.enrich_with_weather(ingest.route_positions(decoded))
    info = ingest.route_ship_info(decoded)
    grid = console.dashboard_grid(pos, info)
    markers = console.map_markers(grid).collect()
    for m in markers:
        assert m.lat_label.endswith("°N")  # all fixture ships in the north
        assert m.icon_color != ""
    # F9 prefix semantics: Tanker → red for ship 1
    ship1 = [m for m in markers if m.mmsi == "257000001"]
    assert all(m.icon_color == "red" for m in ship1)
    view = console.map_view(grid).collect()[0]
    assert view.min_lat <= view.center_lat <= view.max_lat


def test_prefix_map_order_and_default(spark):
    from redpanda_ais_demo_spark.functions.scalar import prefix_map

    df = spark.createDataFrame(
        [("CargoHazardousA",), ("Tug",), ("Tanker",), ("UnknownKind",), ("SearchAndRescue",)],
        "shiptype string",
    )
    out = {
        r.shiptype: r.color
        for r in df.select(
            "shiptype", prefix_map(F.col("shiptype"), console.ICON_COLOR_MAP, console.DEFAULT_ICON_COLOR).alias("color")
        ).collect()
    }
    assert out["CargoHazardousA"] == "purple"  # prefix match, not equality
    assert out["Tug"] == "black" and out["Tanker"] == "red"  # no T-prefix clash
    assert out["UnknownKind"] == "lightgray"  # default branch
    assert out["SearchAndRescue"] == "orange"
