"""Geo queries — the LatLonPoint role (``document/LatLonPoint.java``
``newBoxQuery`` / ``newDistanceQuery``, ``search/
LatLonPointDistanceQuery.java``, ``geo/GeoUtils.java``,
``util/SloppyMath.java`` haversinMeters; tests
``document/TestLatLonPointQueries.java``, ``geo/TestGeoUtils.java``).

Built on the repo's BKD points analog (``index/points.py``): a 2-D
(lat, lon) point index per segment. The box query is a straight
``point_box_docs`` call. The distance query does what the reference
does — derive the circle's lat/lon BOUNDING BOX, run it through the
tree (leaf-cell predicate pushdown), then refine survivors with the
exact vectorized haversine. Longitude windows that would cross the
antimeridian fall back to the full lon range (still exact after
refine; the reference splits the box instead — a pure candidate-count
optimization, documented here as the simplification).
"""

from __future__ import annotations

import numpy as np

# GeoUtils.EARTH_MEAN_RADIUS_METERS (IUGG mean radius)
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714


def haversin_meters(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in meters (haversine formula,
    SloppyMath.haversinMeters role — computed with full-precision numpy
    trig rather than the reference's table-sloppy variant)."""
    p1, p2 = np.radians(lat1), np.radians(np.asarray(lat2, np.float64))
    dphi = np.radians(np.asarray(lat2, np.float64) - lat1)
    dlam = np.radians(np.asarray(lon2, np.float64) - lon1)
    h = (np.sin(dphi / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2)
    return 2 * EARTH_MEAN_RADIUS_METERS * np.arcsin(np.sqrt(h))


def distance_bounding_box(lat: float, lon: float, radius_m: float):
    """((lat_lo, lat_hi), (lon_lo, lon_hi)) enclosing the circle
    (GeoUtils.circleToBbox): latitude delta is exact; longitude delta
    widens by 1/cos(lat) and clamps at the poles / antimeridian."""
    dlat = np.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    lat_lo, lat_hi = max(lat - dlat, -90.0), min(lat + dlat, 90.0)
    if lat_lo <= -90.0 + 1e-9 or lat_hi >= 90.0 - 1e-9:
        return (lat_lo, lat_hi), (-180.0, 180.0)  # circle covers a pole
    max_abs_lat = np.radians(max(abs(lat_lo), abs(lat_hi)))
    dlon = np.degrees(radius_m / EARTH_MEAN_RADIUS_METERS) \
        / max(np.cos(max_abs_lat), 1e-12)
    if dlon >= 180.0 or lon - dlon < -180.0 or lon + dlon > 180.0:
        return (lat_lo, lat_hi), (-180.0, 180.0)  # antimeridian fallback
    return (lat_lo, lat_hi), (lon - dlon, lon + dlon)


def geo_box_docs(index_dir: str, min_lat: float, max_lat: float,
                 min_lon: float, max_lon: float) -> np.ndarray:
    """LatLonPoint.newBoxQuery: ids inside the lat/lon box (inclusive),
    sorted. The index must have dims (lat, lon)."""
    from ..index.points import point_box_docs
    return point_box_docs(index_dir, [(min_lat, max_lat),
                                      (min_lon, max_lon)])


def geo_distance_docs(index_dir: str, lat: float, lon: float,
                      radius_m: float, return_distance: bool = False):
    """LatLonPoint.newDistanceQuery: ids within ``radius_m`` meters of
    (lat, lon), sorted — BKD bounding-box candidates + exact haversine
    refine (<= radius, matching LatLonPointDistanceQuery)."""
    from ..index.points import point_box_docs
    (lat_lo, lat_hi), (lon_lo, lon_hi) = \
        distance_bounding_box(lat, lon, radius_m)
    ids, coords = point_box_docs(
        index_dir, [(lat_lo, lat_hi), (lon_lo, lon_hi)],
        return_coords=True)
    if len(ids) == 0:
        return (ids, np.empty(0)) if return_distance else ids
    d = haversin_meters(lat, lon, coords[:, 0], coords[:, 1])
    keep = d <= radius_m
    if return_distance:
        return ids[keep], d[keep]
    return ids[keep]


def geo_nearest_docs(index_dir: str, lat: float, lon: float, k: int):
    """``LatLonPoint.nearest`` / ``search/NearestNeighbor.java`` role:
    the k documents closest to (lat, lon) by haversine distance, ties
    broken by ascending id. The reference walks BKD cells with a
    priority queue ordered by cell-to-point distance; here the same
    pruning comes from expanding-radius distance queries (each one a
    row-group-pruned box read + exact refine): grow the radius until
    >= k hits, then one final EXACT pass at the k-th candidate
    distance guarantees no closer point was outside the earlier
    bounding box. Returns (ids, distances) sorted by (distance, id)."""
    # half the earth's circumference: one query at this radius is total
    max_r = np.pi * EARTH_MEAN_RADIUS_METERS
    r = 10_000.0
    while True:
        ids, d = geo_distance_docs(index_dir, lat, lon, r,
                                   return_distance=True)
        if len(ids) >= k or r >= max_r:
            break
        r *= 4.0
    # the distance query is EXACT (every point with d <= r is in the
    # candidate set), so once it holds >= k points — or r covers the
    # whole sphere — its top-k IS the global top-k
    order = np.lexsort((ids, d))[:k]
    return ids[order], d[order]


def point_in_polygon(lats: np.ndarray, lons: np.ndarray,
                     poly: list[tuple]) -> np.ndarray:
    """Vectorized even-odd ray casting (``geo/Polygon.java`` contains
    semantics): True where (lat, lon) is inside the polygon given as
    [(lat, lon), ...] (closed implicitly). Points exactly on a
    horizontal-crossing edge follow the half-open rule."""
    lats = np.asarray(lats, np.float64)
    lons = np.asarray(lons, np.float64)
    inside = np.zeros(len(lats), dtype=bool)
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        crosses = (y1 > lats) != (y2 > lats)
        if not crosses.any():
            continue
        xint = x1 + (lats - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (lons < xint)
    return inside


def point_in_convex_polygon(lats: np.ndarray, lons: np.ndarray,
                            poly: list[tuple]) -> np.ndarray:
    """Half-plane conjunction for CONVEX counter-clockwise polygons
    (boundary inclusive): inside iff every edge cross product >= 0.
    This form is exactly expressible in ANSI SQL (the oracle gate)."""
    lats = np.asarray(lats, np.float64)
    lons = np.asarray(lons, np.float64)
    ok = np.ones(len(lats), dtype=bool)
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        ok &= (x2 - x1) * (lats - y1) - (y2 - y1) * (lons - x1) >= 0
    return ok


def geo_polygon_docs(index_dir: str, poly: list[tuple],
                     convex: bool = False) -> np.ndarray:
    """LatLonPoint.newPolygonQuery role: the polygon's bounding box
    runs through the BKD tree (leaf-cell pushdown), survivors refine
    with the exact point-in-polygon test."""
    from ..index.points import point_box_docs
    lat_lo = min(p[0] for p in poly)
    lat_hi = max(p[0] for p in poly)
    lon_lo = min(p[1] for p in poly)
    lon_hi = max(p[1] for p in poly)
    ids, coords = point_box_docs(
        index_dir, [(lat_lo, lat_hi), (lon_lo, lon_hi)],
        return_coords=True)
    if len(ids) == 0:
        return ids
    fn = point_in_convex_polygon if convex else point_in_polygon
    keep = fn(coords[:, 0], coords[:, 1], poly)
    return ids[keep]
