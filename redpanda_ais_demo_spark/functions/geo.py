"""Geospatial scalar functions for position streams (the AIS domain's
distance math; reference's console only interpolates positions —
`lib/console.py:98` — it never measures them).

Determinism note: trig runs on identical doubles in both engines
(radians/sin/cos/asin are libm calls; the per-segment result quantizes to
integer micro-kilometres BEFORE any aggregation, the repo-standard
exact-sum trick, so per-track totals are associativity-free BIGINT sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) points —
    the haversine formula, written with the exact operation order the
    SQL oracle mirrors (left-associative products, radians before the
    half-angle division)."""
    s1 = F.sin(F.radians(lat2 - lat1) / 2)
    s2 = F.sin(F.radians(lon2 - lon1) / 2)
    a = s1 * s1 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * s2 * s2
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))
