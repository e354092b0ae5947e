"""Custom Python DataSource (Spark 4 API): batch + stream reads, bounded
micro-batches, exactly-once replay from a checkpointed offset."""

from __future__ import annotations

import os

from redpanda_ais_demo_spark.sources import nmea_datasource

LINES = [f"!AIVDM,1,1,,A,SENTENCE{i:04d},0*00" for i in range(250)]


def _write_log(tmp_path):
    p = tmp_path / "feed.nmea"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_batch_read_covers_all_lines_in_parallel(spark, tmp_path):
    log = _write_log(tmp_path)
    nmea_datasource.register(spark)
    df = spark.read.format("nmea_replay").option("path", log).option("numpartitions", "4").load()
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 250
    assert {r.line_no for r in rows} == set(range(250))
    assert all(r.nmea == LINES[r.line_no] for r in rows)


def test_stream_delivers_in_bounded_batches_exactly_once(spark, tmp_path):
    log = _write_log(tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    nmea_datasource.register(spark)
    stream = (
        spark.readStream.format("nmea_replay")
        .option("path", log)
        .option("numpartitions", "2")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out).collect()
    assert len(got) == 250  # every line exactly once
    assert {r.line_no for r in got} == set(range(250))
    assert os.listdir(os.path.join(ckpt, "offsets"))  # offsets checkpointed

    # append more lines; a restarted query resumes from the checkpoint
    with open(log, "a") as f:
        for i in range(250, 300):
            f.write(f"!AIVDM,1,1,,A,SENTENCE{i:04d},0*00\n")
    stream2 = spark.readStream.format("nmea_replay").option("path", log).load()
    q2 = (
        stream2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == 300  # no re-delivery of the first 250
    assert {r.line_no for r in got2} == set(range(300))
