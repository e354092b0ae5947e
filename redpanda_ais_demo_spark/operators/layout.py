"""Physical-layout operators: Z-order clustering for multi-dimensional
data skipping.

At 100 TB the scan you avoid is the cheapest scan: parquet readers prune
row groups on min/max column statistics, but a table sorted on one column
has useless stats for every other column. Z-ordering interleaves the bits
of several columns' rank-buckets into one sort key, so rows close in ANY
clustered dimension land close in the file — range predicates on each
dimension prune row groups instead of scanning everything.

All arithmetic (bucket ranks + bit interleave) is integer-exact and
generated as one SQL expression per engine, so the z-values are
bit-deterministic and oracle-checkable — DuckDB evaluates the identical
interleave formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interleave_sql(cols: list[str], bits: int) -> str:
    """One integer expression interleaving ``bits`` low bits of each
    column round-robin (col i's bit r lands at position r*len+i).
    Pure shifts/masks/OR — ANSI-safe, valid in both Spark SQL and DuckDB
    (`shiftleft`/`shiftright` spelled via operators there)."""
    n = len(cols)
    terms = [
        f"(((({c} >> {r}) & 1) << {r * n + i}))"
        for r in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_keys(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append ``__z``: the Z-order key over ``cols``.

    Each column is first rank-bucketed into 2^bits quantile buckets with
    ntile() — rank-space interleaving, so skewed value distributions
    still spread evenly across buckets (raw-value bit interleaving would
    collapse under skew). The ntile windows are one total sort per
    column; at scale substitute a pre-computed bucket (approx-quantile
    bin edges broadcast as a range join) to avoid the global windows —
    the interleave stays identical.
    """
    zdf = df
    bucket_cols = []
    for c in cols:
        w = Window.orderBy(*([F.col(c), F.col(order_tiebreak)] if order_tiebreak else [F.col(c)]))
        b = f"__b_{c}"
        # ntile is 1-based; shift to 0-based so bucket fits in `bits` bits
        zdf = zdf.withColumn(b, F.ntile(1 << bits).over(w) - 1)
        bucket_cols.append(b)
    return zdf.withColumn("__z", F.expr(interleave_sql(bucket_cols, bits))).drop(*bucket_cols)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
) -> int:
    """Small-file compaction — the maintenance job every streamed table
    needs: micro-batch sinks produce file confetti, and at 100 TB the
    per-file open/footer overhead and scheduler pressure of millions of
    tiny files dominate scan cost. Rewrites ``src_dir`` into
    ``ceil(input_bytes / target_mb)`` similar-sized files (round-robin
    repartition — compaction balances sizes; co-location belongs to
    ``write_zordered``/bucketing). Returns the output file count.

    Sizing reads filesystem metadata only (no data pass); the single
    data pass is the rewrite itself.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / (target_mb << 20)))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    order_tiebreak: str | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the z-key (each output file owns a contiguous
    z-range → tight per-file min/max stats on every clustered column),
    sort within partitions, drop the key."""
    keyed = zorder_keys(df, cols, bits, order_tiebreak)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
