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

from pyspark.sql import DataFrame
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


def quantile_edges(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row DataFrame with, per column ``c``, an array ``__e_{c}`` of
    the 2^bits - 1 interior quantile bin edges of ``c``.

    This is the scale fix for rank-space bucketing: instead of a global
    ``ntile()`` window (an all-data single-partition sort per dimension —
    the plan you cannot run at 100 TB), the edges are ONE map-side-partial
    aggregate. ``exact=False`` (default, the scale path) uses
    ``percentile_approx`` — a mergeable fixed-size sketch, constant
    executor memory, and every edge is an actual data value (no
    interpolation). ``exact=True`` uses the exact interpolated
    ``percentile`` aggregate (cost ~ a sort of the column inside one
    aggregation buffer) and exists so oracle-scale results are
    reproducible by DuckDB's ``quantile_cont``; because the two engines'
    linear interpolation can differ in the last ULP, interpolated edges
    are rounded to 6 decimals (the oracle SQL applies the identical
    round) so the ``<=`` bucket comparison agrees in practice. Not a
    hard guarantee: Spark's round (HALF_UP on the double's shortest
    decimal form) and DuckDB's (std::round(x*1e6)/1e6) are different
    algorithms, so an edge whose 6th-decimal half-boundary sits within
    an ULP could still round apart — none do on the fixtures (the
    oracle hash gate verifies). Magnitude bound on the rounding trick:
    DuckDB's form loses integer precision once |x| > ~9e9 (x*1e6
    exceeds 2^53), so for larger-magnitude clustered columns compare
    raw interpolated edges instead — or use the default
    ``percentile_approx`` path, whose edges are actual data values and
    need no rounding at all.
    """
    k = 1 << bits
    fracs = F.lit([i / k for i in range(1, k)])
    aggs = []
    for c in cols:
        if exact:
            fn = F.transform(F.percentile(F.col(c), fracs), lambda e: F.round(e, 6))
        else:
            fn = F.percentile_approx(F.col(c), fracs, F.lit(accuracy))
        aggs.append(fn.alias(f"__e_{c}"))
    return df.agg(*aggs)


def bucket_by_edges(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    exact: bool = False,
    accuracy: int = 10_000,
) -> tuple[DataFrame, list[str]]:
    """Append a 0-based quantile-bucket column ``__b_{c}`` per clustered
    column: bucket = number of bin edges <= value, computed by a
    branchless binary search over the broadcast one-row edge table — no
    shuffle of the fact side, no window. The sorted edge array has
    exactly 2^bits - 1 entries, so the classic power-of-two rank search
    applies: starting from pos = 0, for step = 2^(bits-1) .. 1, take
    pos += step iff edges[pos + step] <= value (1-indexed). The
    predicate i -> edges[i] <= value is monotone on a non-decreasing
    array (duplicates included), so the final pos is exactly the count
    of edges <= value — identical to the naive filter-count, which an
    equivalence test pins (tests/test_advanced_ops.py). bits chained
    small projections keep the expression tree linear and inside
    whole-stage codegen; a lambda ``filter()`` over the 255-entry array
    is an interpreted higher-order function and measured 4x slower on
    the same plan. Rank-space edges spread distinct-value skew
    evenly, but ties are value-deterministic: every duplicate of a value
    lands in one bucket, so a single value covering more than 2^-bits of
    the rows collapses into that bucket (the price of an oracle-checkable
    key; ntile-style tie-splitting would be nondeterministic).
    Returns (df, bucket cols).
    """
    edges = quantile_edges(df, cols, bits, exact=exact, accuracy=accuracy)
    keyed = df.crossJoin(F.broadcast(edges))
    bucket_cols = []
    for c in cols:
        prev: str | None = None
        for level in range(bits):
            step = 1 << (bits - 1 - level)
            cur = f"__p_{c}_{level}"
            base = F.lit(0).cast("long") if prev is None else F.col(prev)
            keyed = keyed.withColumn(
                cur,
                F.when(
                    F.element_at(F.col(f"__e_{c}"), (base + step).cast("int")) <= F.col(c),
                    base + step,
                ).otherwise(base),
            )
            prev = cur
        b = f"__b_{c}"
        keyed = keyed.withColumn(b, F.col(prev)).drop(*[f"__p_{c}_{lv}" for lv in range(bits)])
        bucket_cols.append(b)
    return keyed.drop(*[f"__e_{c}" for c in cols]), bucket_cols


def zorder_keys(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Append ``__z``: the Z-order key over ``cols``.

    Each column is quantile-bucketed into 2^bits rank-space buckets via
    precomputed broadcast bin edges (see ``quantile_edges`` — one
    mergeable aggregate, no global window), then the bucket bits are
    interleaved. Rows whose value ties an edge go to the upper bucket in
    both engines, so the key is deterministic and oracle-checkable.
    """
    keyed, bucket_cols = bucket_by_edges(df, cols, bits, exact=exact, accuracy=accuracy)
    return keyed.withColumn("__z", F.expr(interleave_sql(bucket_cols, bits))).drop(*bucket_cols)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: float = 128,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    bits: int = 8,
) -> int:
    """Small-file compaction — the maintenance job every streamed table
    needs: micro-batch sinks produce file confetti, and at 100 TB the
    per-file open/footer overhead and scheduler pressure of millions of
    tiny files dominate scan cost. Rewrites ``src_dir`` into
    ``ceil(input_bytes / target_mb)`` similar-sized files and returns the
    output file count.

    Layout preservation — compaction must never silently destroy the
    clustering a previous ``write_zordered``/sorted write paid for (a
    round-robin rewrite resets every per-file min/max statistic, so row-
    group pruning dies the first time the maintenance job runs):

    - ``zorder_cols``: recompute the z-key and range-partition + sort on
      it (the ``write_zordered`` shape) — multi-dimensional clustering
      survives the rewrite.
    - ``sort_cols``: ``repartitionByRange`` + ``sortWithinPartitions``
      on the given columns — linear clustering survives.
    - neither (default): round-robin ``repartition``, size balancing
      only — correct for tables that were never clustered.

    Sizing reads filesystem metadata only (no data pass); the single
    data pass is the rewrite itself.
    """
    import math
    import os

    if sort_cols and zorder_cols:
        raise ValueError("compact_parquet: pass sort_cols or zorder_cols, not both")

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / (target_mb * (1 << 20))))
    df = spark.read.parquet(src_dir)
    if zorder_cols:
        keyed = zorder_keys(df, zorder_cols, bits)
        out = keyed.repartitionByRange(n_files, "__z").sortWithinPartitions("__z").drop("__z")
    elif sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    exact: bool = False,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the z-key (each output file owns a contiguous
    z-range → tight per-file min/max stats on every clustered column),
    sort within partitions, drop the key."""
    keyed = zorder_keys(df, cols, bits, exact=exact)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic: bool = True,
) -> None:
    """Hive-partitioned parquet write with DYNAMIC partition overwrite —
    the idempotent-backfill primitive: re-running a job for one day
    replaces ONLY the day-partitions present in ``df``; every other
    partition's files are untouched (static overwrite mode would wipe
    the whole table root — the classic backfill footgun).

    At scale this is what makes partition-scoped reprocessing safe and
    cheap: a backfill touches exactly the partitions it recomputes, and
    readers prune to partitions via the directory layout
    (PartitionFilters in the scan, no file listing outside the pruned
    set).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode",
            "dynamic" if dynamic else "static",
        )
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def expire_partitions(
    spark,
    table_dir: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Retention expiry for a Hive-partitioned table: drop every
    ``{partition_col}={value}`` directory whose value sorts strictly
    below ``keep_from`` — the TTL companion to dynamic-partition
    backfill (``write_partitioned``) and compaction
    (``compact_parquet``): together they are the maintenance loop of a
    partitioned 100 TB table (append today, backfill yesterday, expire
    last year).

    Deletion is partition-directory-scoped — a metadata/filesystem
    operation, NO data pass and no rewrite of surviving partitions
    (a filter-and-rewrite "delete" would cost a full table scan and
    reset every file statistic). Values compare as strings, which is
    correct for the canonical zero-padded date/hour partition values
    this repo writes (e.g. ``d=2024-01-15``). Returns the dropped
    partition values (sorted) for the caller's audit log.

    Safety rails: refuses a directory with no ``{partition_col}=``
    subdirectories (wrong root or unpartitioned table — deleting would
    be data loss, the caller must look), and ignores non-partition
    entries (_SUCCESS, stray files).
    """
    import os
    import shutil

    prefix = f"{partition_col}="
    parts = [
        d for d in os.listdir(table_dir)
        if d.startswith(prefix) and os.path.isdir(os.path.join(table_dir, d))
    ]
    if not parts:
        raise ValueError(
            f"{table_dir} has no {prefix}* partition directories — refusing to expire"
        )
    dropped = sorted(
        d[len(prefix):] for d in parts if d[len(prefix):] < keep_from
    )
    for v in dropped:
        shutil.rmtree(os.path.join(table_dir, f"{prefix}{v}"))
    return dropped


def _hilbert_level_exprs(
    x: str, y: str, d: str, b: int, n: int, dialect: str
) -> tuple[str, str, str]:
    """One unrolled level of the Hilbert xy2d transform (the classic
    bitwise algorithm, e.g. Wikipedia 'Hilbert curve'): returns SQL for
    (x', y', d') after consuming bit ``b``. Pure integer CASE/div/mod
    arithmetic — the only dialect difference is integer division
    (Spark ``div`` vs DuckDB ``//``); the (3·rx)⊕ry quadrant index is
    spelled as a CASE (DuckDB's ``^`` is exponentiation, so no XOR)."""
    s = 1 << b
    div = "div" if dialect == "spark" else "//"
    rx = f"(({x} {div} {s}) % 2)"
    ry = f"(({y} {div} {s}) % 2)"
    quad = f"(CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END)"
    nd = f"({d} + {s * s} * {quad})"
    nx = f"(CASE WHEN {ry} = 1 THEN {x} WHEN {rx} = 1 THEN {n - 1} - {y} ELSE {y} END)"
    ny = f"(CASE WHEN {ry} = 1 THEN {y} WHEN {rx} = 1 THEN {n - 1} - {x} ELSE {x} END)"
    return nx, ny, nd


def hilbert_from_buckets(
    df: DataFrame, bx: str, by: str, bits: int = 8, out: str = "__h"
) -> DataFrame:
    """Append ``out``: the Hilbert-curve index of two rank-space bucket
    columns in [0, 2^bits) — the locality upgrade over the Z-order
    interleave for the SAME layout job: consecutive Hilbert addresses
    are always GRID NEIGHBORS (unit steps — no Z-shape jumps across the
    key space), so a range of the sort key maps to a tighter spatial
    region and parquet min/max pruning clips fewer false row groups on
    2-D range predicates (Hilbert beats Z on locality; Z generalizes
    to N dimensions more cheaply — both live here).

    The transform is the standard xy2d bit loop UNROLLED into ``bits``
    chained projections (each level's (x,y,d) feeds the next — nesting
    as one expression would double per level). All integer CASE
    arithmetic, identical in both engines (``hilbert_oracle_wrap``
    spells the same levels as nested derived tables), so the key is
    bit-deterministic and oracle-checkable like the Z key.
    """
    if bits < 1 or bits > 16:
        raise ValueError(f"bits must be in 1..16, got {bits}")
    n = 1 << bits
    x, y, d = bx, by, "0"
    keyed = df
    for b in range(bits - 1, -1, -1):
        nx, ny, nd = _hilbert_level_exprs(x, y, d, b, n, "spark")
        keyed = keyed.selectExpr(
            "*", f"{nx} AS __hx_{b}", f"{ny} AS __hy_{b}", f"{nd} AS __hd_{b}"
        )
        x, y, d = f"__hx_{b}", f"__hy_{b}", f"__hd_{b}"
    keyed = keyed.withColumn(out, F.col(d).cast("long"))
    return keyed.drop(
        *[f"__hx_{b}" for b in range(bits)],
        *[f"__hy_{b}" for b in range(bits)],
        *[f"__hd_{b}" for b in range(bits)],
    )


def hilbert_oracle_wrap(
    inner_sql: str, bx: str, by: str, bits: int, keep: list[str]
) -> str:
    """Wrap ``inner_sql`` (which must yield columns ``bx``/``by`` plus
    ``keep``) in the unrolled Hilbert levels as nested derived tables —
    the DuckDB mirror of ``hilbert_from_buckets``."""
    n = 1 << bits
    x, y, d = bx, by, "0"
    sql = f"({inner_sql})"
    cols = ", ".join(keep + [bx, by])
    for b in range(bits - 1, -1, -1):
        nx, ny, nd = _hilbert_level_exprs(x, y, d, b, n, "duckdb")
        sql = (
            f"(SELECT {cols}, {nx} AS __hx_{b}, {ny} AS __hy_{b}, "
            f"{nd} AS __hd_{b} FROM {sql})"
        )
        x, y, d = f"__hx_{b}", f"__hy_{b}", f"__hd_{b}"
    return f"SELECT {cols}, CAST({d} AS BIGINT) AS hvalue FROM {sql}"


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 8,
    exact: bool = False,
) -> None:
    """Write ``df`` as parquet clustered by the Hilbert index of two
    columns — ``write_zordered``'s 2-D locality upgrade: each output
    file owns a contiguous Hilbert range, and because consecutive
    addresses are unit grid steps, that range is a COMPACT 2-D region
    (tighter per-file min/max boxes than the Z key's jump-prone
    ranges — measured in tests/test_storage_layout.py's pruning
    comparison)."""
    keyed, bcols = bucket_by_edges(df, [x_col, y_col], bits, exact=exact)
    keyed = hilbert_from_buckets(keyed, bcols[0], bcols[1], bits, out="__h")
    (
        keyed.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h", *bcols)
        .write.mode("overwrite")
        .parquet(path)
    )
