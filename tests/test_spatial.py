"""operators/spatial.py — grid-binned proximity join: must return exactly
the brute-force haversine pair set (cell binning is an optimization, never
a semantics change), including pairs straddling cell boundaries."""

import math

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.spatial import (
    EARTH_RADIUS_KM,
    haversine_km,
    proximity_join,
)


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def points(spark):
    # deterministic scatter over ~100x100 km, including boundary-straddlers
    pts = [
        (i, (i * 37 % 100) / 100.0, (i * 61 % 100) / 100.0)
        for i in range(80)
    ]
    a = spark.createDataFrame(pts[:50], "id long, lat double, lon double")
    b = spark.createDataFrame(pts[50:], "id long, lat double, lon double")
    return a, b, pts


def test_matches_bruteforce(spark, points):
    a, b, pts = points
    r = 15.0
    got = {
        (x.id_a, x.id_b)
        for x in proximity_join(a, b, r).collect()
    }
    want = {
        (i, j)
        for i, la, lo in pts[:50]
        for j, lb, lb2 in pts[50:]
        if _hav(la, lo, lb, lb2) <= r
    }
    assert got == want
    assert want  # non-vacuous


def test_distance_column_exact(spark, points):
    a, b, pts = points
    rows = proximity_join(a, b, 15.0).collect()
    by_id = {p[0]: p for p in pts}
    for x in rows:
        pa, pb = by_id[x.id_a], by_id[x.id_b]
        assert x.dist_km == pytest.approx(
            _hav(pa[1], pa[2], pb[1], pb[2]), abs=1e-9
        )


def test_haversine_known_value(spark):
    # Paris -> London ~ 343.5 km
    df = spark.range(1).select(
        haversine_km(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    )
    assert df.collect()[0].d == pytest.approx(343.5, abs=1.0)


def test_nearest_supplier_is_argmin(spark):
    from vptstools_spark.analytics.spatial_q import (
        q_geo_nearest_supplier,
        q_geo_proximity_join,
    )

    sf = "/root/testdata/sf0.001"
    pairs = q_geo_proximity_join(spark, sf).collect()
    nearest = q_geo_nearest_supplier(spark, sf).collect()
    best = {}
    for p in pairs:
        cur = best.get(p.custkey)
        if cur is None or (p.dist_km, p.suppkey) < (cur.dist_km, cur.suppkey):
            best[p.custkey] = p
    assert {(r.custkey, r.suppkey) for r in nearest} == {
        (p.custkey, p.suppkey) for p in best.values()
    }


def test_high_latitude_pairs_not_missed(spark):
    """Longitude degrees shrink by cos(lat): two points at lat 60 deg
    separated by almost the full radius IN LONGITUDE must still pair
    (the bug the lon-cell widening fixes)."""
    from vptstools_spark.operators.spatial import proximity_join

    # at lat 60, 10 km east-west is ~0.1799 deg of longitude: ~2 equator
    # cells wide for r=10 (cell 0.0899 deg)
    a = spark.createDataFrame(
        [(1, 60.0, 10.00001)], "id long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(2, 60.0, 10.17)], "id long, lat double, lon double"
    )
    got = proximity_join(a, b, 10.0).collect()
    assert len(got) == 1 and got[0].dist_km <= 10.0


def test_antimeridian_pairs_found(spark):
    """A pair straddling ±180° sits in lon cells at opposite ends of the
    index range; the modular wrap must still pair them."""
    from vptstools_spark.operators.spatial import proximity_join

    a = spark.createDataFrame(
        [(1, 10.0, 179.99)], "id long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(2, 10.0, -179.99)], "id long, lat double, lon double"
    )
    got = proximity_join(a, b, 10.0).collect()
    # 0.02 deg of lon at lat 10 ~ 2.2 km < 10 km
    assert len(got) == 1 and got[0].dist_km <= 10.0


def test_antimeridian_no_duplicate_pairs(spark):
    """The wrap must not double-count: each qualifying pair exactly once
    even when a left cell's ±1 neighbors alias under pmod."""
    from vptstools_spark.operators.spatial import proximity_join

    a = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 179.95)], "id long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(3, 0.0, 0.05), (4, 0.0, -179.95)], "id long, lat double, lon double"
    )
    got = proximity_join(a, b, 20.0).collect()
    keys = sorted((r.id_a, r.id_b) for r in got)
    assert keys == [(1, 3), (2, 4)]


def test_lat_bound_enforced(spark):
    """|lat| beyond max_abs_lat_deg would silently MISS true pairs (lon
    cells too narrow there) — the join must raise, not drop."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from vptstools_spark.operators.spatial import proximity_join

    a = spark.createDataFrame(
        [(1, 80.0, 0.0)], "id long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(2, 80.0, 0.01)], "id long, lat double, lon double"
    )
    with pytest.raises(Exception) as ei:
        proximity_join(a, b, 10.0).collect()
    assert "max_abs_lat_deg" in str(ei.value)


def test_huge_radius_single_lon_cell(spark):
    """Radius so large the circle has <3 lon cells: offsets collapse to
    the distinct residues — correct pairs, no duplicates."""
    from vptstools_spark.operators.spatial import proximity_join

    a = spark.createDataFrame(
        [(1, 0.0, -170.0)], "id long, lat double, lon double"
    )
    b = spark.createDataFrame(
        [(2, 0.0, 170.0)], "id long, lat double, lon double"
    )
    # 20 deg across the antimeridian ~ 2224 km
    got = proximity_join(a, b, 3000.0).collect()
    assert len(got) == 1
