"""GeoSimilarity — haversine proximity over (lat, lon) structs:
known-distance goldens, face parity (scalar == batch == expr),
clamping at d_max, NULL handling, antipodal/identical points,
ThresholdMatcher fusion, validation."""

import math

import pytest
from pyspark.sql import functions as F

from datamatch_spark import GeoSimilarity

# (name, lat, lon); distances below are well-established city pairs
PARIS = (48.8566, 2.3522)
LONDON = (51.5074, -0.1278)
NYC = (40.7128, -74.0060)


def _dist_km(a, b):
    s = GeoSimilarity(d_max_km=1.0)
    # sim = 1 - d/1 -> d = 1 - sim (only valid within 1 km; recompute
    # from the formula directly instead)
    p1, p2 = math.radians(a[0]), math.radians(b[0])
    h = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1)
        * math.cos(p2)
        * math.sin((math.radians(b[1]) - math.radians(a[1])) / 2) ** 2
    )
    del s
    return 2 * GeoSimilarity.EARTH_RADIUS_KM * math.asin(min(1, math.sqrt(h)))


def test_known_distances_and_goldens():
    # Paris-London ~343-344 km; Paris-NYC ~5837 km
    assert _dist_km(PARIS, LONDON) == pytest.approx(343.6, abs=1.5)
    assert _dist_km(PARIS, NYC) == pytest.approx(5837, abs=10)
    s = GeoSimilarity(d_max_km=500.0)
    assert s.sim(PARIS, LONDON) == pytest.approx(1 - 343.6 / 500, abs=0.01)
    assert s.sim(PARIS, NYC) == 0.0  # clamped
    assert s.sim(PARIS, PARIS) == 1.0
    # antipodal-ish: half circumference, clamped to 0
    assert s.sim((90.0, 0.0), (-90.0, 0.0)) == 0.0
    assert math.isnan(s.sim(None, PARIS))


def test_face_parity(spark):
    import pandas as pd

    pts = [PARIS, LONDON, NYC, (0.0, 0.0), (12.34, -56.78), (-33.9, 151.2)]
    pairs = [(i, pts[i % len(pts)], pts[(i * 2 + 1) % len(pts)]) for i in range(12)]
    rows = [
        (i, {"lat": a[0], "lon": a[1]}, {"lat": b[0], "lon": b[1]})
        for i, a, b in pairs
    ]
    df = spark.createDataFrame(
        rows,
        "i long, a struct<lat:double,lon:double>, b struct<lat:double,lon:double>",
    )
    s = GeoSimilarity(d_max_km=1000.0)
    got = {
        r["i"]: r["v"]
        for r in df.select("i", s.expr(F.col("a"), F.col("b")).alias("v")).collect()
    }
    batch = s.batch(
        pd.Series([r[1] for r in rows]), pd.Series([r[2] for r in rows])
    )
    for i, a, b in pairs:
        assert got[i] == pytest.approx(s.sim(a, b), abs=1e-12)
        assert batch[i] == pytest.approx(s.sim(a, b), abs=1e-12)


def test_null_handling(spark):
    s = GeoSimilarity(d_max_km=100.0)
    df = spark.createDataFrame(
        [
            (0, None, {"lat": 1.0, "lon": 1.0}),
            (1, {"lat": None, "lon": 2.0}, {"lat": 1.0, "lon": 1.0}),
        ],
        "i long, a struct<lat:double,lon:double>, b struct<lat:double,lon:double>",
    )
    out = df.select(s.expr(F.col("a"), F.col("b")).alias("v")).collect()
    assert all(r["v"] is None for r in out)


def test_in_threshold_matcher(spark):
    from datamatch_spark import NoopIndex, ThresholdMatcher

    df = spark.createDataFrame(
        [
            (0, {"lat": PARIS[0], "lon": PARIS[1]}),
            (1, {"lat": LONDON[0], "lon": LONDON[1]}),
            (2, {"lat": NYC[0], "lon": NYC[1]}),
        ],
        "row_key long, pos struct<lat:double,lon:double>",
    )
    m = ThresholdMatcher(NoopIndex(), {"pos": GeoSimilarity(500.0)}, df)
    got = {(r["idx_a"], r["idx_b"]): r["sim_score"] for r in m.scored_pairs.collect()}
    assert got[(0, 1)] == pytest.approx(1 - 343.6 / 500, abs=0.01)
    assert got[(0, 2)] == 0.0


def test_validation():
    with pytest.raises(ValueError):
        GeoSimilarity(0)
    with pytest.raises(ValueError):
        GeoSimilarity(-5)
