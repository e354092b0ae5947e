"""S1/U2 — the raw AIS feed edge (SURVEY.md §2.1 S1, §2.10 U2).

The reference connects pyais's TCPConnection to the Norwegian Coastal
Administration feed and decodes NMEA sentences in the producer process
(lib/producer-from-ais-api.py:23-27). Here the same boundary is a Spark
socket streaming source of raw NMEA lines plus a decode stage; the
engine-facing contract is simply "a DataFrame shaped like AIS_DECODED",
which is also what the file/Kafka ingest paths produce — so everything
downstream (ingest.route_*) is source-agnostic.

Decode is gated: ``pyais`` is not in this container. When available the
decoder runs as a mapInPandas kernel (one parser per batch, not per
row); without it, callers get an informative error rather than a silent
fake — the raw-line source itself still works for transport tests.

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
    """U2 — NMEA sentences → AIS_DECODED rows via pyais, as an
    Arrow-batched kernel. Raises if no decoder is installed."""
    if not pyais_available():
        raise NotImplementedError(
            "NMEA decode requires the pyais package, which is not installed "
            "in this environment; feed AIS_DECODED-shaped rows via the "
            "file/Kafka ingest paths instead"
        )
    import pandas as pd
    import pyais

    from ..dist import ensure_shipped
    from ..schemas import AIS_DECODED

    ensure_shipped(lines.sparkSession)

    fields = [f.name for f in AIS_DECODED.fields]

    def kernel(batches):
        for pdf in batches:
            rows = []
            for sentence in pdf["nmea"]:
                try:
                    msg = pyais.decode(sentence.encode()).asdict()
                except Exception:
                    continue  # malformed sentences drop, matching the producer's skip
                rows.append({f: msg.get(f) for f in fields})
            yield pd.DataFrame(rows, columns=fields)

    return lines.mapInPandas(kernel, AIS_DECODED)
