"""GeoGridIndex — shifted-grid chord-metric blocking: the LOSSLESS
guarantee (every pair within d_km shares >= 1 bucket) against a
brute-force haversine check on random points, constant 8-bucket
fan-out, NULL/NaN exclusion, end-to-end blocking+scoring, and
validation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from datamatch_spark import GeoGridIndex, GeoSimilarity
from datamatch_spark.pairing import candidate_pairs


def _hav_km(a, b):
    p1, p2 = math.radians(a[0]), math.radians(b[0])
    h = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1)
        * math.cos(p2)
        * math.sin((math.radians(b[1]) - math.radians(a[1])) / 2) ** 2
    )
    return 2 * GeoGridIndex.EARTH_RADIUS_KM * math.asin(min(1, math.sqrt(h)))


def _random_points(n, seed):
    rng = random.Random(seed)
    pts = []
    for _ in range(n):
        # clusters around a few cities + global scatter, incl. high
        # latitudes and the antimeridian neighborhood
        if rng.random() < 0.6:
            base = rng.choice(
                [(48.85, 2.35), (69.6, 18.9), (-33.9, 151.2), (0.0, 179.9)]
            )
            pts.append(
                (
                    base[0] + rng.uniform(-0.3, 0.3),
                    base[1] + rng.uniform(-0.3, 0.3),
                )
            )
        else:
            pts.append((rng.uniform(-89, 89), rng.uniform(-180, 180)))
    return pts


@pytest.mark.parametrize("d_km", [5.0, 50.0])
def test_lossless_within_d(spark, d_km):
    pts = _random_points(150, seed=int(d_km))
    df = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)],
        "row_key long, lat double, lon double",
    )
    got = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(
            df, GeoGridIndex("lat", "lon", d_km), "row_key", []
        ).collect()
    }
    want = {
        (i, j)
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if _hav_km(pts[i], pts[j]) <= d_km
    }
    missing = want - got
    assert not missing, f"lost {len(missing)} true-close pairs: {sorted(missing)[:5]}"


def test_fanout_is_eight_and_nulls_excluded(spark):
    df = spark.createDataFrame(
        [
            (0, 10.0, 20.0),
            (1, None, 20.0),
            (2, 10.0, None),
            (3, float("nan"), 20.0),
        ],
        "row_key long, lat double, lon double",
    )
    keys = GeoGridIndex("lat", "lon", 10.0).key_df(df, "row_key").collect()
    assert len(keys) == 8 and all(r["row_key"] == 0 for r in keys)
    assert len({r["block_key"] for r in keys}) == 8  # distinct grids


def test_block_then_score(spark):
    # the intended composition: grid blocking bounds candidates, the
    # haversine similarity scores them
    pts = [(48.8566, 2.3522), (48.8570, 2.3530), (51.5074, -0.1278)]
    df = spark.createDataFrame(
        [(i, {"lat": p[0], "lon": p[1]}, p[0], p[1]) for i, p in enumerate(pts)],
        "row_key long, pos struct<lat:double,lon:double>, lat double, lon double",
    )
    pairs = candidate_pairs(
        df, GeoGridIndex("lat", "lon", 5.0), "row_key", ["pos"]
    )
    scored = pairs.select(
        "idx_a", "idx_b",
        GeoSimilarity(5.0).expr(F.col("a.pos"), F.col("b.pos")).alias("s"),
    ).collect()
    got = {(r["idx_a"], r["idx_b"]): r["s"] for r in scored}
    assert (0, 1) in got and got[(0, 1)] > 0.9  # ~60 m apart
    assert all(k == (0, 1) for k in got)  # London never a candidate at 5 km


def test_validation(spark):
    with pytest.raises(ValueError):
        GeoGridIndex("lat", "lon", 0)
    df = spark.createDataFrame([(0, 1.0)], "row_key long, lat double")
    with pytest.raises(KeyError):
        GeoGridIndex("lat", "lon", 5.0).key_df(df, "row_key")


def test_match_mode_cross_dataset(spark):
    # absolute grids -> keys comparable across datasets: two-dataset
    # linkage works with no special casing
    a = spark.createDataFrame(
        [(0, 48.8566, 2.3522), (1, 40.7128, -74.0060)],
        "row_key long, lat double, lon double",
    )
    b = spark.createDataFrame(
        [(10, 48.8570, 2.3530), (11, 51.5074, -0.1278)],
        "row_key long, lat double, lon double",
    )
    got = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(
            a, GeoGridIndex("lat", "lon", 5.0), "row_key", [], dfb=b
        ).collect()
    }
    assert (0, 10) in got          # ~60 m apart
    assert (1, 11) not in got      # NYC vs London
    assert (0, 11) not in got
