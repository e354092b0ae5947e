"""JSONL corpus source/sink — the interchange format training corpora
actually ship in (one JSON document per line, usually gzipped).

Read path: schema is REQUIRED. Schema inference scans the whole input
once before the real job — at 100 TB that is a second full pass, so this
module refuses to infer. Malformed lines are quarantined, not dropped:
PERMISSIVE mode routes them to a ``_corrupt_record`` column so a
pipeline can count/inspect them (``split_corrupt``) instead of silently
losing data — at corpus scale there are ALWAYS malformed lines.

Write path: one JSON object per line, optional gzip, sized by
``target_files`` (a round-robin repartition — JSONL consumers want
similar-sized shards, not hash-clustered ones).

Both paths are plain Spark DataFrameReader/Writer plans: predicate/
column pruning still applies after parsing, and the line-split read
parallelizes per HDFS/object-store block like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str | list[str], schema: StructType | str
) -> DataFrame:
    """Read JSONL (a directory, file, or explicit file list) with an
    explicit schema + corrupt-line quarantine column."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, corrupt_lines). Spark requires
    caching the parsed frame before referencing the corrupt column alone
    (SPARK-21610: the parser prunes to nothing otherwise) — done here so
    callers can't hit the silent-empty trap."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def write_jsonl(
    df: DataFrame, path: str, target_files: int | None = None, gzip: bool = False
) -> None:
    """Write one JSON object per line; ``target_files`` round-robins rows
    into similar-sized shards."""
    out = df.repartition(target_files) if target_files else df
    writer = out.write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.json(path)
