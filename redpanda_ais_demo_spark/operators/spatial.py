"""Spatio-temporal proximity join — close-encounter detection over a
position stream (the classic AIS collision-risk / rendezvous analytic the
reference's dashboard never computes; its console stops at per-ship latest
position, ``lib/console.py:48``).

Problem shape: given N timestamped fixes, find all pairs of fixes from
*different* keys within ``dist_km`` great-circle kilometres and
``window_s`` seconds of each other. A naive self-join is O(N²) — at 100 TB
that is never an option. The scale path here is the published grid-file /
spatial-bucketing pattern (Šidlauskas & Jensen, VLDB 2014 family):

1. Assign every fix an integer grid cell ``(cx, cy)`` of ``cell_deg``
   degrees and a time bucket ``tb`` of ``window_s`` seconds. Longitude
   cells are MODULAR (360 / cell_deg cells) so the antimeridian seam
   pairs up correctly.
2. Replicate ONE side into its 3×3 neighbor cells × 2 adjacent time
   buckets (18× on the probe side only — the build side stays single-copy)
   and hash-join on the equality key ``(tb, cx, cy)``. Any pair within the
   thresholds must share a join key: ``|Δt| <= window_s`` implies same or
   adjacent bucket, and ``cell_deg`` is validated so one cell spans
   ``>= dist_km`` in BOTH axes over the data's latitude band, hence a
   qualifying pair is never more than one cell apart.
3. Exact refine: haversine <= dist_km, |Δt| <= window_s, canonical
   ordering (id_a < id_b) and a distinct() to collapse the multi-path
   candidates (a pair can surface via several (offset, bucket) routes).

The only corpus-sized shuffle is the (tb, cx, cy) hash partition; the time
bucket inside the key bounds hotspot skew (a busy strait spreads over
time), and the refine runs cell-locally. Partial aggregation applies to
any per-pair rollup stacked on top. Distances quantize to integer
micro-km BEFORE min/sum aggregation (repo-standard exact-compare rule).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import haversine_km

KM_PER_DEG = 111.3195  # 2*pi*R/360 for R=6371.0 — mean great-circle degree


def close_pairs(
    fixes: DataFrame,
    id_col: str,
    key_col: str,
    ts_us_col: str,
    lat_col: str,
    lon_col: str,
    dist_km: float = 50.0,
    window_s: int = 3600,
    cell_deg: float = 1.0,
    max_abs_lat: float = 70.0,
) -> DataFrame:
    """All cross-key fix pairs within ``dist_km`` and ``window_s``.

    Output: one row per qualifying unordered pair of fixes —
    (id_a, id_b, key_a, key_b, dist_micro_km, dt_us), id_a < id_b.

    ``max_abs_lat`` declares the data's latitude band; the constructor
    refuses cell sizes too small for the neighbor-cell guarantee there
    (lon degrees shrink by cos(lat) toward the poles).
    """
    if not dist_km > 0 or not window_s > 0:
        raise ValueError(f"need dist_km > 0 and window_s > 0, got {dist_km}, {window_s}")
    lat_span_km = cell_deg * KM_PER_DEG
    lon_span_km = cell_deg * KM_PER_DEG * math.cos(math.radians(max_abs_lat))
    if lat_span_km < dist_km or lon_span_km < dist_km:
        raise ValueError(
            f"cell_deg={cell_deg} spans ({lat_span_km:.1f}, {lon_span_km:.1f}) km "
            f"at |lat|<={max_abs_lat} — must be >= dist_km={dist_km} on both axes "
            "for the 3x3 neighbor join to be exhaustive; raise cell_deg"
        )
    n_lon_cells = int(round(360.0 / cell_deg))
    # The r14 direction-predicate dedup (below) assumes each (offset,
    # direction) discovers a pair through EXACTLY one (dx, dy) cell pair.
    # A longitude ring of <= 2 cells breaks that: pmod maps dx=-1 and
    # dx=+1 to the SAME jx, so one probe row joins the same build row
    # twice and the output would carry duplicate pairs the removed
    # .distinct() used to collapse. Degenerate by construction (the span
    # guard above already demands a huge dist_km to get here) — refuse.
    if n_lon_cells < 3:
        raise ValueError(
            f"cell_deg={cell_deg} leaves only {n_lon_cells} longitude cells "
            "— the 3x3 neighbor join needs >= 3 (cell_deg < 120) so the "
            "wraparound offsets stay distinct; lower cell_deg"
        )

    win_us = F.lit(int(window_s) * 1_000_000)
    base = fixes.select(
        F.col(id_col).alias("fid"),
        F.col(key_col).alias("fkey"),
        F.col(ts_us_col).cast("long").alias("us"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).withColumns(
        {
            # pmod folds any out-of-range longitude (e.g. 180.4 from an
            # unnormalized feed) into the modular cell ring — haversine is
            # already periodic in Δlon, so cells must be too.
            "cx": F.pmod(
                F.floor((F.col("lon") + 180.0) / cell_deg).cast("long"),
                F.lit(n_lon_cells),
            ),
            "cy": F.floor((F.col("lat") + 90.0) / cell_deg).cast("long"),
            "tb": F.floor(F.col("us") / (int(window_s) * 1_000_000)).cast("long"),
        }
    )

    # Probe side: explode into the 9 neighbor offsets x 2 time buckets.
    # (dx, dy) targets the neighbor's cell; dt targets same/next bucket —
    # together with the build side's single copy this covers Δtb in
    # {-1, 0, +1} exactly once per (offset, direction).
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dt).alias("dt"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dt in (0, 1)
        ]
    )
    probe = (
        base.withColumn("o", F.explode(offsets))
        .select(
            F.col("fid").alias("id_a"),
            F.col("fkey").alias("key_a"),
            F.col("us").alias("us_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            F.col("tb").alias("tb_a"),
            F.pmod(F.col("cx") + F.col("o.dx"), F.lit(n_lon_cells)).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
            (F.col("tb") + F.col("o.dt")).alias("jt"),
        )
    )
    build = base.select(
        F.col("fid").alias("id_b"),
        F.col("fkey").alias("key_b"),
        F.col("us").alias("us_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
        F.col("tb").alias("jt"),
    )

    d_km = haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    # Direction predicate instead of a pair-level distinct (r14): a
    # qualifying unordered pair surfaces TWICE when both fixes share a
    # time bucket (each probes the other) and once when the buckets
    # differ by 1 (only the earlier bucket probes forward); keeping the
    # (earlier-bucket, or same-bucket lower-id, probe) copy yields
    # exactly one row per pair — the shuffle the .distinct() paid to
    # dedup the same rows is gone, bit-identical output.
    keep_one = (F.col("tb_a") < F.col("jt")) | (
        (F.col("tb_a") == F.col("jt")) & (F.col("id_a") < F.col("id_b"))
    )
    pairs = (
        probe.join(build, on=["jt", "jx", "jy"])
        .filter(F.col("key_a") != F.col("key_b"))
        .filter(keep_one)
        .filter(F.abs(F.col("us_a") - F.col("us_b")) <= win_us)
        .filter(d_km <= F.lit(float(dist_km)))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("key_a")).otherwise(F.col("key_b")).alias("key_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("key_b")).otherwise(F.col("key_a")).alias("key_b"),
            F.round(d_km * 1e6).cast("long").alias("dist_micro_km"),
            F.abs(F.col("us_a") - F.col("us_b")).alias("dt_us"),
        )
    )
    return pairs


def encounter_summary(pairs: DataFrame) -> DataFrame:
    """Roll qualifying fix pairs up to unordered key pairs:
    (key_a, key_b, n_encounters, min_dist_micro_km). Partial-aggregable
    groupBy — the heavy lifting already happened in close_pairs."""
    ka = F.least("key_a", "key_b")
    kb = F.greatest("key_a", "key_b")
    return (
        pairs.select(ka.alias("key_a"), kb.alias("key_b"), "dist_micro_km")
        .groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).alias("n_encounters"),
            F.min("dist_micro_km").alias("min_dist_micro_km"),
        )
    )


def cell_density(
    fixes: DataFrame,
    lat_col: str,
    lon_col: str,
    key_col: str,
    cell_deg: float = 1.0,
    top_n: int = 20,
) -> DataFrame:
    """Traffic heat-map: fix count + distinct-key count per grid cell,
    top-N densest cells — the density layer an AIS dashboard draws
    under its markers (the reference's map shows raw markers only,
    `lib/console.py:98`). Cells use the same modular (cx, cy) space as
    close_pairs, so the heat-map and the proximity join share one
    layout vocabulary.

    ONE partial-aggregable groupBy(cell) over a narrow projection, then
    a global top-N (TakeOrderedAndProject — never a full sort). At
    100 TB the distinct-key count per cell is the only non-algebraic
    piece; swap in approx_count_distinct (HLL) when exactness is not
    required.
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    n_lon_cells = int(round(360.0 / cell_deg))
    cx = F.pmod(
        F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("long"), F.lit(n_lon_cells)
    )
    cy = F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("long")
    return (
        fixes.select(cx.alias("cx"), cy.alias("cy"), F.col(key_col).alias("k"))
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.count_distinct("k").alias("n_keys"),
        )
        .orderBy(F.col("n_fixes").desc(), F.col("cx").asc(), F.col("cy").asc())
        .limit(top_n)
    )


def track_compact(
    fixes: DataFrame,
    key_col: str,
    ts_us_col: str,
    lat_col: str,
    lon_col: str,
    eps_km: float = 1.0,
) -> DataFrame:
    """Trajectory compaction by linear-prediction pruning — the
    dead-reckoning filter AIS archiving pipelines run before long-term
    storage: a fix is REDUNDANT when its position lies within
    ``eps_km`` of the time-linear interpolation between its previous
    and next fix (the vessel was where a straight track predicted — no
    information). First/last fix per key always survive.

    This is the windowed single pass of Douglas-Peucker's spirit
    (per-point deviation against the local chord, not the recursive
    global split — the recursion is sequential by nature; the one-pass
    form is embarrassingly parallel per key and removes the bulk of
    straight-line steaming).

    Determinism: deviation quantizes to integer micro-km BEFORE the
    threshold compare (repo rule). Interpolation is done per axis in
    degrees then measured with haversine against the actual fix —
    exact same arithmetic on both engines. Plan: one per-key window
    (lag/lead), narrow projection, no joins.
    """
    if eps_km <= 0:
        raise ValueError(f"eps_km must be positive, got {eps_km}")
    # lat/lon tie-breaks keep lag/lead deterministic if two fixes of a
    # key share a timestamp
    w = Window.partitionBy("k").orderBy("us", "lat", "lon")
    t = fixes.select(
        F.col(key_col).alias("k"),
        F.col(ts_us_col).cast("long").alias("us"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).select(
        "*",
        F.lag("us").over(w).alias("pus"),
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lead("us").over(w).alias("nus"),
        F.lead("lat").over(w).alias("nlat"),
        F.lead("lon").over(w).alias("nlon"),
    )
    # fraction of the way from prev to next, in time
    frac = (F.col("us") - F.col("pus")).cast("double") / (
        F.col("nus") - F.col("pus")
    ).cast("double")
    ilat = F.col("plat") + frac * (F.col("nlat") - F.col("plat"))
    ilon = F.col("plon") + frac * (F.col("nlon") - F.col("plon"))
    dev_micro = F.round(
        haversine_km(F.col("lat"), F.col("lon"), ilat, ilon) * 1e6
    ).cast("long")
    endpoint = F.col("pus").isNull() | F.col("nus").isNull()
    # zero-duration chord (duplicate timestamps): keep the fix
    degenerate = ~endpoint & (F.col("nus") == F.col("pus"))
    keep = endpoint | degenerate | (dev_micro > int(eps_km * 1e6))
    return t.filter(keep).select(
        F.col("k").alias(key_col), "us", "lat", "lon"
    )


def grid_dbscan(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    n_col: str = "n",
    min_points: int = 10,
    grid_w: int = 360,
) -> DataFrame:
    """Grid-DBSCAN spatial clustering — density clusters from a cell
    census: a cell is DENSE when it holds ≥ ``min_points`` points;
    dense cells that touch (8-neighborhood, modular in x for the
    antimeridian) merge into one cluster. The grid-quantized form of
    DBSCAN every telemetry stack actually runs at scale: the raw-point
    ε-graph is quadratic, the cell graph is linear in OCCUPIED cells.

    Plan: dense-cell filter → per-cell 8-neighbor key explode (bounded
    ×8, map-side) → equi-join back on the cell key to form edges →
    the large-star/small-star CC closure (diameter-independent —
    dense-cell chains along a coastline are exactly the long-diameter
    case; ``operators/dedup.py``). Isolated
    dense cells are their own single-cell clusters (left join back).

    Output: (cluster_id = min member cell key, n_cells, n_points) —
    one row per cluster. Cell key = cx·100000 + cy (collision-free for
    any earthly grid).
    """
    if min_points < 1:
        raise ValueError("min_points must be positive")
    if grid_w < 3:
        raise ValueError("grid_w must be >= 3")
    from .dedup import connected_components_two_phase

    # pinned: three consumers (probe explode, edge equi-join right side,
    # final cluster labeling) — unpinned, the caller's cell-census
    # aggregation replayed three times (r14 plan audit). Pinned rows are
    # one per occupied dense cell.
    dense = cells.filter(F.col(n_col) >= min_points).select(
        F.col(cx_col).alias("cx"),
        F.col(cy_col).alias("cy"),
        F.col(n_col).alias("n"),
        (F.col(cx_col) * 100000 + F.col(cy_col)).cast("long").alias("cell_id"),
    ).localCheckpoint(eager=False)
    offsets = F.array(
        *[
            F.struct(
                ((F.col("cx") + dx + grid_w) % grid_w).alias("ncx"),
                (F.col("cy") + dy).alias("ncy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    probes = dense.select("cell_id", F.explode(offsets).alias("nb")).select(
        F.col("cell_id").alias("id_a"), F.col("nb.ncx").alias("cx"), F.col("nb.ncy").alias("cy")
    )
    edges = (
        probes.join(dense.select("cx", "cy", F.col("cell_id").alias("id_b")), ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # cells along a road/coast form LONG CHAINS — diameter-bound
    # min-label propagation stalls; the large-star/small-star closure
    # converges in ~log(component size) rounds regardless of diameter
    comp = connected_components_two_phase(edges)
    labeled = dense.join(
        comp.withColumnRenamed("node", "cell_id"), "cell_id", "left"
    ).withColumn("cluster_id", F.coalesce("component", "cell_id"))
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
        )
        .select(F.col("cluster_id").cast("long").alias("cluster_id"), "n_cells", "n_points")
    )


def pnpoly_sql(lat_expr: str, lon_expr: str, vertices) -> str:
    """Render the even-odd ray-casting point-in-polygon test (the
    classic PNPOLY crossing rule: count edges whose latitude span
    straddles the point and whose crossing longitude lies east of it;
    odd count = inside) as ONE portable SQL boolean over ``lat_expr``/
    ``lon_expr``.

    The polygon is a QUERY CONSTANT, so the test compiles to a narrow
    whole-stage-codegen projection — no join, no shuffle, no UDF; at
    100 TB it is a free tag on the scan. Shared verbatim by the Spark
    plan (``selectExpr``) and the DuckDB oracle, which also pins
    cross-engine float determinism: per-edge deltas are folded to
    Python double literals HERE (not left to each engine's constant
    folding), every literal is CAST AS DOUBLE, and the only runtime
    float ops are one guarded multiply-divide-add chain per edge.
    Horizontal edges (dlat = 0) are DROPPED at generation time — they
    can never satisfy the straddle guard, and leaving their division
    in the SQL trips ANSI mode anyway: Spark's whole-stage codegen
    hoists common subexpressions OUT of the lazy CASE, so the guarded
    x/0 still evaluates (the welch_ttest lesson — guard IN the
    expression, or here, never emit it). Vertices are (lat, lon); the
    closing edge is implicit. Works for concave and self-touching
    rings (even-odd rule); same-vertex consecutive points are
    rejected.
    """
    verts = [(float(a), float(b)) for a, b in vertices]
    if len(verts) < 3:
        raise ValueError("a polygon needs at least 3 vertices")
    cases = []
    for i, (lat_i, lon_i) in enumerate(verts):
        lat_j, lon_j = verts[(i + 1) % len(verts)]
        if lat_i == lat_j and lon_i == lon_j:
            raise ValueError("degenerate zero-length edge")
        dlat, dlon = lat_j - lat_i, lon_j - lon_i
        if dlat == 0.0:
            continue  # never a crossing; keeps ANSI codegen division-safe
        cases.append(
            f"(CASE WHEN ((CAST({lat_i!r} AS DOUBLE) > ({lat_expr}))"
            f" <> (CAST({lat_j!r} AS DOUBLE) > ({lat_expr})))"
            f" AND ({lon_expr}) < CAST({dlon!r} AS DOUBLE)"
            f" * (({lat_expr}) - CAST({lat_i!r} AS DOUBLE))"
            f" / CAST({dlat!r} AS DOUBLE) + CAST({lon_i!r} AS DOUBLE)"
            " THEN 1 ELSE 0 END)"
        )
    if not cases:  # zero-area all-horizontal ring: nothing is inside
        return "(1 = 0)"
    return "(" + " + ".join(cases) + ") % 2 = 1"


def geofence_tag(
    points: DataFrame,
    lat_col: str,
    lon_col: str,
    fences,
) -> DataFrame:
    """Tag every point with one boolean column ``in_<name>`` per named
    geofence polygon (``fences``: name -> [(lat, lon), ...]) — the
    relational form of a geofence membership join when the fence set is
    small enough to inline (dashboards, compliance zones, port
    boundaries: tens of polygons, not millions).

    Entirely a generated-SQL projection (``pnpoly_sql``): zero
    shuffle/join/UDF, scan-speed at any corpus size, and overlapping
    fences tag independently (a point can be in several). Fence names
    must be SQL-identifier-safe.
    """
    exprs = []
    for name, verts in fences.items():
        if not str(name).replace("_", "").isalnum():
            raise ValueError(f"fence name not identifier-safe: {name!r}")
        exprs.append(
            f"{pnpoly_sql(lat_col, lon_col, verts)} AS in_{name}"
        )
    return points.selectExpr("*", *exprs)


def simplify_track_radial(
    points: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    qlat_col: str,
    qlon_col: str,
    eps_micro: int,
) -> DataFrame:
    """Radial-distance polyline simplification — the O(n) trajectory
    compressor every AIS/GPS pipeline runs before storing tracks
    (``track_compact`` in-tree fixes ORDER; this drops REDUNDANT
    points): walk each track in time order, keep a point iff its
    squared planar distance from the LAST KEPT point exceeds
    ``eps_micro``², and always keep the first and final points so the
    track's endpoints survive. The classic cheap pre-pass before
    Douglas-Peucker-grade shape simplification.

    Coordinates arrive as integer micro-degrees (quantize upstream),
    so the keep decision is exact BIGINT arithmetic and the kept set
    is bit-identical cross-engine — the oracle replays the identical
    walk as a recursive CTE. The walk is inherently sequential per
    track, so each track folds through ONE ``aggregate`` lambda over
    its collected time-ordered points (the holt/ewma contract: feed
    per-key series that are calendar/track-bounded; the collect is
    per-key, never corpus-wide). The kept list is array state
    appended per accepted point — state is output-sized by
    construction.

    Output: one row per kept point (key, ts, tiebreak, qlat, qlon).
    """
    if eps_micro < 1:
        raise ValueError(f"eps_micro must be >= 1, got {eps_micro}")
    eps2 = int(eps_micro) * int(eps_micro)
    series = (
        points.select(
            F.col(key_col).alias("g"),
            F.col(ts_col).cast("long").alias("t"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(qlat_col).cast("long").alias("qlat"),
            F.col(qlon_col).cast("long").alias("qlon"),
        )
        .groupBy("g")
        .agg(F.sort_array(F.collect_list(F.struct("t", "tb", "qlat", "qlon"))).alias("arr"))
    )
    # typed empty array of the element struct: filter-all on the input
    empty = F.filter(F.col("arr"), lambda x: F.lit(False))
    init = F.struct(
        F.lit(0).alias("i"),
        F.lit(0).cast("long").alias("llat"),
        F.lit(0).cast("long").alias("llon"),
        empty.alias("kept"),
    )

    def step(acc, e):
        d2 = (e["qlat"] - acc["llat"]) * (e["qlat"] - acc["llat"]) + (
            e["qlon"] - acc["llon"]
        ) * (e["qlon"] - acc["llon"])
        take = (acc["i"] == 0) | (d2 > F.lit(eps2))
        return F.struct(
            (acc["i"] + 1).alias("i"),
            F.when(take, e["qlat"]).otherwise(acc["llat"]).alias("llat"),
            F.when(take, e["qlon"]).otherwise(acc["llon"]).alias("llon"),
            F.when(take, F.concat(acc["kept"], F.array(e)))
            .otherwise(acc["kept"])
            .alias("kept"),
        )

    folded = series.select(
        "g",
        F.element_at("arr", -1).alias("last_pt"),
        F.aggregate("arr", init, step).alias("acc"),
    )
    # endpoints survive: force-append the final point when the walk
    # dropped it (it does NOT become a new reference — no points follow)
    kept = F.when(
        F.element_at(F.col("acc.kept"), -1) == F.col("last_pt"), F.col("acc.kept")
    ).otherwise(F.concat(F.col("acc.kept"), F.array(F.col("last_pt"))))
    return folded.select("g", F.explode(kept).alias("p")).select(
        F.col("g").alias(key_col),
        F.col("p.t").alias(ts_col),
        F.col("p.tb").alias(tiebreak_col),
        F.col("p.qlat").alias(qlat_col),
        F.col("p.qlon").alias(qlon_col),
    )
