"""S1/U2 — the raw AIS feed edge (SURVEY.md §2.1 S1, §2.10 U2).

The reference connects pyais's TCPConnection to the Norwegian Coastal
Administration feed and decodes NMEA sentences in the producer process
(lib/producer-from-ais-api.py:23-27). Here the same boundary is a Spark
socket streaming source of raw NMEA lines plus a decode stage; the
engine-facing contract is simply "a DataFrame shaped like AIS_DECODED",
which is also what the file/Kafka ingest paths produce — so everything
downstream (ingest.route_*) is source-agnostic.

Decode runs as a mapInPandas kernel (one parser per batch, not per
row). With ``pyais`` installed the kernel uses it for reference parity;
otherwise the native ITU-R M.1371 codec (``sources/ais_codec.py``)
decodes types 1/2/3/18/5 with the same AIS_DECODED output contract —
U2 executes in every environment.

The socket source is at-most-once by nature (no offsets). For durable
feeds, ``sources/nmea_datasource.py`` provides the same NMEA lines as a
replayable Spark 4 Python DataSource with checkpointed line offsets —
exactly-once through restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def pyais_available() -> bool:
    try:
        import pyais  # noqa: F401

        return True
    except ImportError:
        return False


def read_nmea_socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Raw NMEA sentences from a TCP feed as a streaming DataFrame of
    lines (S1 transport). Connection opens when the query starts, not at
    declaration."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "nmea")
    )


def decode_nmea(lines: DataFrame) -> DataFrame:
    """U2 — NMEA sentences → AIS_DECODED rows as an Arrow-batched
    kernel. pyais when installed (reference parity, lib/producer-from-
    ais-api.py:26-27); otherwise the native ITU-R M.1371 codec — same
    output contract, so downstream routing is decoder-agnostic.

    Malformed sentences drop (the producer's skip behavior). Multi-
    fragment assembly spans the WHOLE partition (one assembly buffer
    over all Arrow batches — a per-batch buffer would drop every pair
    straddling a ~10k-row batch boundary); a pair split across
    partitions drops rather than corrupts — at scale, keep fragments of
    one message in one partition (the replay source's line-range splits
    preserve adjacency within a range).
    """
    import pandas as pd

    from ..dist import ensure_shipped
    from ..schemas import AIS_DECODED

    ensure_shipped(lines.sparkSession)

    fields = [f.name for f in AIS_DECODED.fields]
    use_pyais = pyais_available()

    def kernel(batches):
        if use_pyais:
            import pyais

            for pdf in batches:
                rows = []
                for sentence in pdf["nmea"]:
                    try:
                        msg = pyais.decode(sentence.encode()).asdict()
                    except Exception:
                        continue  # malformed sentences drop
                    rec = {f: msg.get(f) for f in fields}
                    # pyais yields fractional knots; the reference pipes
                    # that float into an Avro "int" field, and the Avro
                    # writer's int cast TRUNCATES (producer-from-ais-api
                    # .py:67 + schemas/ship-position-event.avsc "speed":
                    # "int"). The native codec floors the raw tenths
                    # (sog // 10) — the same value for every sentence,
                    # since sog/10.0's float error (~1e-16) never crosses
                    # an integer boundary. Truncate here too so both
                    # decode paths and the reference agree exactly
                    # (test_ais_codec.py::test_sog_rule_cross_path_parity).
                    if rec.get("speed") is not None:
                        rec["speed"] = int(rec["speed"])
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=fields)
        else:
            from . import ais_codec

            def all_lines():
                for pdf in batches:
                    yield from pdf["nmea"]

            rows = []
            for m in ais_codec.decode_lines(all_lines()):
                rows.append({f: m.get(f) for f in fields})
                if len(rows) >= 10_000:
                    yield pd.DataFrame(rows, columns=fields)
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=fields)

    return lines.mapInPandas(kernel, AIS_DECODED)
