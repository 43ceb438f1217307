"""best_matches — per-record argmax enrichment join: hand-computed
fixture, tie-to-smallest-winner determinism, NULL-score exclusion,
string-id support, both directions, repartition invariance."""

import pytest
from pyspark.sql import functions as F

from datamatch_spark.clustering import best_matches

PAIRS = [
    # (idx_a, idx_b, score)
    (0, 10, 0.9),
    (0, 11, 0.95),
    (1, 10, 0.8),
    (1, 12, 0.8),    # tie -> smaller idx_b (10)
    (2, 13, None),   # only refused candidates -> dropped
    (3, 10, 0.7),
    (3, 11, None),
]


def _df(spark):
    return spark.createDataFrame(
        PAIRS, "idx_a long, idx_b long, sim_score double"
    )


def test_argmax_and_ties(spark):
    got = {
        r["idx_a"]: (r["idx_b"], r["sim_score"])
        for r in best_matches(_df(spark)).collect()
    }
    assert got == {0: (11, 0.95), 1: (10, 0.8), 3: (10, 0.7)}


def test_other_direction(spark):
    got = {
        r["idx_b"]: (r["idx_a"], r["sim_score"])
        for r in best_matches(_df(spark), by="idx_b").collect()
    }
    # 10 is sought by 0 (0.9), 1 (0.8), 3 (0.7) -> keeps 0
    assert got[10] == (0, 0.9)
    assert got[11] == (0, 0.95)
    assert got[12] == (1, 0.8)
    assert 13 not in got


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "x", 0.5), ("a", "w", 0.5), ("b", "z", 0.9)],
        "idx_a string, idx_b string, sim_score double",
    )
    got = {r["idx_a"]: r["idx_b"] for r in best_matches(df).collect()}
    assert got == {"a": "w", "b": "z"}  # tie -> lexicographically smaller


def test_repartition_invariant(spark):
    base = sorted(map(tuple, best_matches(_df(spark)).collect()))
    for n in (1, 3, 7):
        got = sorted(map(tuple, best_matches(_df(spark).repartition(n)).collect()))
        assert got == base, n


def test_validation(spark):
    with pytest.raises(KeyError):
        best_matches(_df(spark).drop("sim_score"))
    with pytest.raises(KeyError):
        best_matches(_df(spark), by="nope")
