"""close_pairs grid proximity join — crafted edge cases (antimeridian,
cell boundary, time-bucket boundary, same-key exclusion) plus brute-force
parity on a deterministic scatter."""

from __future__ import annotations

import math

import pytest

from redpanda_ais_demo_spark.operators.spatial import close_pairs, encounter_summary

DIST_KM = 50.0
WINDOW_S = 3600


def _haversine(lat1, lon1, lat2, lon2):
    s1 = math.sin(math.radians(lat2 - lat1) / 2)
    s2 = math.sin(math.radians(lon2 - lon1) / 2)
    a = s1 * s1 + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * s2 * s2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def _fixes_df(spark, rows):
    return spark.createDataFrame(rows, "fid long, fkey string, us long, lat double, lon double")


def _run(spark, rows, **kw):
    df = _fixes_df(spark, rows)
    kw.setdefault("max_abs_lat", 60.0)
    out = close_pairs(
        df, "fid", "fkey", "us", "lat", "lon", dist_km=DIST_KM, window_s=WINDOW_S, **kw
    )
    return {(r.id_a, r.id_b) for r in out.collect()}


H = 3600 * 1_000_000  # one window in µs


def test_crafted_pairs(spark):
    rows = [
        # pair 1: ~15 km apart, same hour — qualifies
        (1, "a", 0, 10.0, 20.0),
        (2, "b", 60_000_000, 10.1, 20.1),
        # 3 is ~300 km from 1/2 — excluded by distance
        (3, "c", 0, 12.7, 20.0),
        # 4 near 1 spatially but 2 windows later — excluded by time
        (4, "d", 2 * H + 1, 10.0, 20.0),
        # antimeridian: 5/6 straddle ±180 at lat 0 — ~11 km apart, qualifies
        (5, "e", 0, 0.0, 179.95),
        (6, "f", 0, 0.0, -179.95),
        # cell boundary: 7/8 sit either side of the lon=21 cell line, ~2 km apart
        (7, "g", 0, 10.0, 20.999),
        (8, "h", 0, 10.0, 21.001),
        # time-bucket boundary: 9 at end of bucket 0, 10 at start of bucket 1,
        # Δt << window — qualifies across the bucket seam
        (9, "i", H - 1_000_000, 50.0, 100.0),
        (10, "j", H + 1_000_000, 50.0, 100.0),
        # same key twice, co-located — cross-key only, excluded
        (11, "k", 0, -30.0, 5.0),
        (12, "k", 1, -30.0, 5.0),
    ]
    got = _run(spark, rows)
    assert got == {(1, 2), (5, 6), (7, 8), (9, 10)}


def test_exact_window_edge_inclusive(spark):
    rows = [
        (1, "a", 0, 0.0, 0.0),
        (2, "b", WINDOW_S * 1_000_000, 0.0, 0.0),  # Δt == window exactly
        (3, "c", WINDOW_S * 1_000_000 + 1, 0.01, 0.0),  # one µs past
    ]
    got = _run(spark, rows)
    assert (1, 2) in got and (1, 3) not in got


def test_brute_force_parity(spark):
    # deterministic scatter: 120 fixes, 8 keys, clustered around 4 hot spots
    rows = []
    for i in range(120):
        spot = i % 4
        lat = [10.0, 10.3, -40.0, 59.5][spot] + (i * 7 % 13) * 0.05
        lon = [20.0, 20.3, 179.8, -5.0][spot] + (i * 11 % 17) * 0.06
        if spot == 2 and i % 2:
            lon = -179.9 + (i * 11 % 17) * 0.05  # wrap partners
        rows.append((i, f"k{i % 8}", (i * 977_000_003) % (5 * H), lat, lon))
    expect = set()
    for a in rows:
        for b in rows:
            if a[0] >= b[0] or a[1] == b[1]:
                continue
            if abs(a[2] - b[2]) <= WINDOW_S * 1_000_000 and _haversine(a[3], a[4], b[3], b[4]) <= DIST_KM:
                expect.add((a[0], b[0]))
    got = _run(spark, rows)
    assert got == expect
    # summary invariant: encounter counts sum to the pair count
    df = _fixes_df(spark, rows)
    pairs = close_pairs(
        df, "fid", "fkey", "us", "lat", "lon",
        dist_km=DIST_KM, window_s=WINDOW_S, max_abs_lat=60.0,
    )
    summ = encounter_summary(pairs).collect()
    assert sum(r.n_encounters for r in summ) == len(expect)
    for r in summ:
        assert r.key_a < r.key_b


def test_cell_too_small_refused(spark):
    df = _fixes_df(spark, [(1, "a", 0, 0.0, 0.0)])
    with pytest.raises(ValueError, match="cell_deg"):
        close_pairs(
            df, "fid", "fkey", "us", "lat", "lon",
            dist_km=100.0, window_s=60, cell_deg=0.5, max_abs_lat=70.0,
        )
    with pytest.raises(ValueError, match="dist_km"):
        close_pairs(df, "fid", "fkey", "us", "lat", "lon", dist_km=0.0, window_s=60)


def test_degenerate_lon_ring_refused(spark):
    """cell_deg >= 120 leaves <= 3 longitude cells; at 180 the pmod
    wraparound maps dx=-1 and dx=+1 to the same neighbor cell, so the
    r15 constructor guard must refuse before the direction-predicate
    dedup (which replaced .distinct() in r14) can double-emit pairs."""
    df = _fixes_df(spark, [(1, "a", 0, 0.0, 0.0)])
    with pytest.raises(ValueError, match="longitude cells"):
        close_pairs(
            df, "fid", "fkey", "us", "lat", "lon",
            dist_km=DIST_KM, window_s=60, cell_deg=180.0, max_abs_lat=60.0,
        )


def test_antimeridian_pair_emitted_exactly_once(spark):
    """Wraparound seam multiplicity: a qualifying pair straddling ±180
    must surface as ONE row (the r14 change removed the pair-level
    distinct; double discovery through the seam would now survive)."""
    rows = [
        (1, "a", 0, 0.0, 179.95),
        (2, "b", 10, 0.0, -179.95),
        # same-bucket, same-cell neighbors away from the seam
        (3, "c", 0, 10.0, 20.0),
        (4, "d", 5, 10.05, 20.05),
    ]
    df = _fixes_df(spark, rows)
    out = close_pairs(
        df, "fid", "fkey", "us", "lat", "lon",
        dist_km=DIST_KM, window_s=WINDOW_S, max_abs_lat=60.0,
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert sorted(pairs) == [(1, 2), (3, 4)]  # each exactly once


def test_cell_density_counts(spark):
    from redpanda_ais_demo_spark.operators.spatial import cell_density

    rows = [
        ("u1", 10.5, 20.5), ("u1", 10.6, 20.6), ("u2", 10.4, 20.4),  # cell (200,100)
        ("u3", -40.5, 100.5),  # cell (280, 49)
        ("u4", 0.0, 180.4),    # out-of-range lon folds modularly -> cx 0
    ]
    df = spark.createDataFrame(rows, "k string, lat double, lon double")
    out = {(r.cx, r.cy): (r.n_fixes, r.n_keys) for r in cell_density(df, "lat", "lon", "k").collect()}
    assert out[(200, 100)] == (3, 2)
    assert out[(280, 49)] == (1, 1)
    assert out[(0, 90)] == (1, 1)


def test_track_compact_prunes_straight_line(spark):
    from redpanda_ais_demo_spark.operators.spatial import track_compact

    M = 60_000_000  # one minute in µs
    rows = [
        # straight equator track at constant speed: interior fixes redundant
        ("a", 0 * M, 0.0, 10.0),
        ("a", 1 * M, 0.0, 10.1),
        ("a", 2 * M, 0.0, 10.2),
        ("a", 3 * M, 0.0, 10.3),
        # a detour fix well off the chord: kept
        ("b", 0 * M, 0.0, 20.0),
        ("b", 1 * M, 1.0, 20.1),
        ("b", 2 * M, 0.0, 20.2),
        # duplicate-timestamp chord: kept
        ("c", 0, 5.0, 5.0),
        ("c", 0, 5.5, 5.0),
        ("c", 0, 6.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, us long, lat double, lon double")
    kept = {(r.user_id if hasattr(r, "user_id") else r.k, r.us, r.lat, r.lon)
            for r in track_compact(df, "k", "us", "lat", "lon", eps_km=1.0).collect()}
    keys = {(k, us) for (k, us, _, _) in kept}
    # a: only endpoints survive
    assert (("a", 0 * M) in keys and ("a", 3 * M) in keys)
    assert ("a", 1 * M) not in keys and ("a", 2 * M) not in keys
    # b: the detour survives along with endpoints
    assert sum(1 for (k, _) in keys if k == "b") == 3
    # c: all three survive (degenerate chords) — count full tuples, the
    # three fixes share one timestamp
    assert sum(1 for (k, _, _, _) in kept if k == "c") == 3

    import pytest

    with pytest.raises(ValueError, match="eps_km"):
        track_compact(df, "k", "us", "lat", "lon", eps_km=0)


def test_geofence_tag_box_triangle_concave(spark):
    from redpanda_ais_demo_spark.operators.spatial import geofence_tag

    fences = {
        "box": [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
        "tri": [(0.0, 20.0), (10.0, 25.0), (0.0, 30.0)],
        # C-shape: notch carved out of lat 4..10 between lon 44..50
        "cshape": [
            (0.0, 40.0), (10.0, 40.0), (10.0, 50.0),
            (4.0, 50.0), (4.0, 44.0), (0.0, 44.0),
        ],
    }
    pts = [
        # (lat, lon, in_box, in_tri, in_cshape)
        (5.0, 5.0, True, False, False),       # box center
        (5.0, 15.0, False, False, False),     # between fences
        (11.0, 5.0, False, False, False),     # just north of box
        (5.0, 24.0, True if False else False, True, False),  # triangle center
        (9.0, 24.9, False, True, False),      # near triangle apex, inside
        (9.0, 20.5, False, False, False),     # above the left sloped edge
        (5.0, 42.0, False, False, True),      # C: west arm (lat>4, lon<44)
        (2.0, 47.0, False, False, False),     # C: inside the notch -> OUT
        (8.0, 47.0, False, False, True),      # C: north of notch roof -> IN
        (2.0, 41.0, False, False, True),      # C: south-west foot -> IN
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo, *_) in enumerate(pts)],
        "id long, lat double, lon double",
    )
    out = {r.id: r for r in geofence_tag(df, "lat", "lon", fences).collect()}
    for i, (la, lo, b, t, c) in enumerate(pts):
        r = out[i]
        assert (r.in_box, r.in_tri, r.in_cshape) == (b, t, c), (i, la, lo, r)

    # horizontal edges never divide by zero (box top/bottom are flat)
    # and the plan stays a pure projection: no exchange anywhere
    plan = geofence_tag(df, "lat", "lon", fences)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    import pytest

    with pytest.raises(ValueError):
        geofence_tag(df, "lat", "lon", {"bad name": fences["box"]})
    with pytest.raises(ValueError):
        geofence_tag(df, "lat", "lon", {"two": [(0.0, 0.0), (1.0, 1.0)]})


def test_simplify_track_radial_walk_and_endpoints(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.spatial import simplify_track_radial

    # track 1: points at x = 0, 3, 4, 9, 10 (y = 0), eps = 4:
    # keep 0 (first); 3 (d=3 <= 4? 9 <= 16 -> drop); 4 (d=4, 16 !> 16
    # -> drop); 9 (d=9 > 4 -> keep, new ref); 10 (d=1 -> drop, but
    # forced as final point)
    rows = [(1, t, t, x, 0) for t, x in enumerate([0, 3, 4, 9, 10])]
    # track 2: single point — kept once, not duplicated by the
    # final-point rule
    rows += [(2, 0, 99, 5, 5)]
    df = spark.createDataFrame(rows, "k long, t long, tb long, qlat long, qlon long")
    out = simplify_track_radial(df, "k", "t", "tb", "qlat", "qlon", eps_micro=4)
    got = [(r.k, r.qlat) for r in out.orderBy("k", "t").collect()]
    assert got == [(1, 0), (1, 9), (1, 10), (2, 5)]
    with pytest.raises(ValueError):
        simplify_track_radial(df, "k", "t", "tb", "qlat", "qlon", eps_micro=0)
