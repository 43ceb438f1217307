"""TokenSetSimilarity: hand-computed goldens for all three modes,
face parity (scalar == batch == expr to float64), set semantics
(dedup, order-insensitivity, case-folding), empty/NULL handling,
ThresholdMatcher integration, and validation. No reference counterpart
(/root/reference/datamatch/similarities.py has no token-level class)."""

import math

import pytest
from pyspark.sql import functions as F

from datamatch_spark import TokenSetSimilarity

CASES = [
    # (a, b, jaccard, dice, overlap)
    ("the big cat", "big cat hat", 2 / 4, 4 / 6, 2 / 3),
    ("a b c d", "a b c d", 1.0, 1.0, 1.0),
    ("x y", "p q", 0.0, 0.0, 0.0),
    ("Big  CAT", "cat big", 1.0, 1.0, 1.0),          # case + order + runs
    ("cat cat cat", "cat", 1.0, 1.0, 1.0),            # dedup
    ("deep learning", "deep learning models", 2 / 3, 4 / 5, 1.0),  # subset
    ("", "", 0.0, 0.0, 0.0),
    ("", "cat", 0.0, 0.0, 0.0),
]


@pytest.mark.parametrize("mode,col", [("jaccard", 2), ("dice", 3), ("overlap", 4)])
def test_scalar_goldens(mode, col):
    s = TokenSetSimilarity(mode)
    for case in CASES:
        assert s.sim(case[0], case[1]) == pytest.approx(case[col]), case


def test_face_parity(spark):
    import pandas as pd

    rows = [(i, a, b) for i, (a, b, *_) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    for mode in ("jaccard", "dice", "overlap"):
        s = TokenSetSimilarity(mode)
        got = {
            r["i"]: r["s"]
            for r in df.select("i", s.expr(F.col("a"), F.col("b")).alias("s")).collect()
        }
        batch = s.batch(
            pd.Series([a for _, a, _ in rows]), pd.Series([b for _, _, b in rows])
        )
        for i, (a, b, *_) in enumerate(CASES):
            assert got[i] == s.sim(a, b) == batch[i], (mode, a, b)


def test_null_handling(spark):
    s = TokenSetSimilarity()
    assert math.isnan(s.sim(None, "x"))
    df = spark.createDataFrame([(None, "x"), ("x", None)], "a string, b string")
    out = df.select(s.expr(F.col("a"), F.col("b")).alias("s")).collect()
    assert all(r["s"] is None for r in out)


def test_in_threshold_matcher(spark):
    from datamatch_spark import NoopIndex, ThresholdMatcher

    df = spark.createDataFrame(
        [
            (0, "annual revenue report 2024"),
            (1, "2024 annual revenue report"),
            (2, "quarterly loss statement"),
        ],
        "row_key long, title string",
    )
    m = ThresholdMatcher(NoopIndex(), {"title": TokenSetSimilarity()}, df)
    pairs = {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m.scored_pairs.collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(0, 2)] == pytest.approx(0.0)


def test_validation():
    with pytest.raises(ValueError):
        TokenSetSimilarity("cosine")
