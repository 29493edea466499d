"""Geo queries (LatLonPoint analog): haversine sanity, box/distance
vs brute force over the BKD points index, bbox clamping."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search.geo import (
    EARTH_MEAN_RADIUS_METERS,
    distance_bounding_box,
    geo_box_docs,
    geo_distance_docs,
    haversin_meters,
)


def test_haversine_known_values():
    # quarter circumference: pole to equator
    d = haversin_meters(0.0, 0.0, 90.0, 0.0)
    assert d == pytest.approx(np.pi / 2 * EARTH_MEAN_RADIUS_METERS,
                              rel=1e-12)
    # one degree of longitude at the equator
    d = haversin_meters(0.0, 0.0, 0.0, 1.0)
    assert d == pytest.approx(np.pi / 180 * EARTH_MEAN_RADIUS_METERS,
                              rel=1e-12)
    assert haversin_meters(37.0, -122.0, 37.0, -122.0) == 0.0


def test_bounding_box_contains_circle():
    rng = np.random.default_rng(3)
    for _ in range(200):
        lat = float(rng.uniform(-80, 80))
        lon = float(rng.uniform(-170, 170))
        r = float(rng.uniform(1e3, 3e6))
        (lat_lo, lat_hi), (lon_lo, lon_hi) = \
            distance_bounding_box(lat, lon, r)
        # random points ON the circle must fall inside the box
        bearing = rng.uniform(0, 2 * np.pi, 64)
        ang = r / EARTH_MEAN_RADIUS_METERS
        p1 = np.radians(lat)
        lat2 = np.arcsin(np.sin(p1) * np.cos(ang)
                         + np.cos(p1) * np.sin(ang) * np.cos(bearing))
        lon2 = np.radians(lon) + np.arctan2(
            np.sin(bearing) * np.sin(ang) * np.cos(p1),
            np.cos(ang) - np.sin(p1) * np.sin(lat2))
        lat2d, lon2d = np.degrees(lat2), np.degrees(lon2)
        in_lon = ((lon2d >= lon_lo) & (lon2d <= lon_hi)) | \
            (lon_lo <= -180.0)  # full-range fallback
        assert ((lat2d >= lat_lo - 1e-9) & (lat2d <= lat_hi + 1e-9)).all()
        if lon_lo > -180.0:
            assert in_lon.all()


def test_polar_circle_full_lon_range():
    (_lo, hi), (lon_lo, lon_hi) = distance_bounding_box(89.0, 10.0, 5e5)
    assert hi == 90.0 and (lon_lo, lon_hi) == (-180.0, 180.0)


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    from lucene_ray.index.points import build_point_index
    rng = np.random.default_rng(17)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    t = pa.table({"pid": ids, "lat": lat, "lon": lon})
    d = tmp_path_factory.mktemp("geo")
    src = str(d / "points.parquet")
    import pyarrow.parquet as pq
    pq.write_table(t, src)
    out = str(d / "geoidx")
    build_point_index(src, out, dims=("lat", "lon"), id_col="pid",
                      batch_size=1024)
    return out, ids, lat, lon


def test_geo_box_vs_brute(geo_index):
    out, ids, lat, lon = geo_index
    for box in [(-10, 30, 0, 60), (50, 90, -180, 180), (0, 1, 0, 1)]:
        got = geo_box_docs(out, *[float(x) for x in box])
        want = ids[(lat >= box[0]) & (lat <= box[1])
                   & (lon >= box[2]) & (lon <= box[3])]
        np.testing.assert_array_equal(got, np.sort(want))


def test_geo_distance_vs_brute(geo_index):
    out, ids, lat, lon = geo_index
    rng = np.random.default_rng(19)
    for _ in range(10):
        clat = float(rng.uniform(-85, 85))
        clon = float(rng.uniform(-180, 180))
        r = float(rng.uniform(1e5, 5e6))
        got = geo_distance_docs(out, clat, clon, r)
        want = ids[haversin_meters(clat, clon, lat, lon) <= r]
        np.testing.assert_array_equal(got, np.sort(want))


def test_geo_distance_returns_distances(geo_index):
    out, ids, lat, lon = geo_index
    got, dist = geo_distance_docs(out, 10.0, 20.0, 2e6,
                                  return_distance=True)
    assert (dist <= 2e6).all()
    d_all = haversin_meters(10.0, 20.0, lat, lon)
    np.testing.assert_allclose(dist, d_all[np.isin(ids, got)])
