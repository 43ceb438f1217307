"""Monge-Elkan hybrid similarity: scalar-vs-batch bit parity, golden
values against a hand-rolled reference, symmetry variants, truncation,
expr face, and the fused-scorer path."""

import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datamatch_spark.kernels import jaro_winkler, unidecode_ascii
from datamatch_spark.similarities import MongeElkanSimilarity


def _ref_me(a, b, symmetry="mean", max_tokens=None):
    """Independent scalar reference (per-token jaro_winkler calls)."""
    ta = unidecode_ascii(a).split() if a is not None else []
    tb = unidecode_ascii(b).split() if b is not None else []
    if max_tokens is not None:
        ta, tb = ta[:max_tokens], tb[:max_tokens]
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    ab = sum(max(jaro_winkler(x, y) for y in tb) for x in ta) / len(ta)
    ba = sum(max(jaro_winkler(x, y) for x in ta) for y in tb) / len(tb)
    if symmetry == "mean":
        return (ab + ba) / 2.0
    if symmetry == "max":
        return max(ab, ba)
    return ab


WORDS = ["martha", "marhta", "jonathan", "jon", "smith", "smyth", "qu", "x", "lopez"]


def _rand_text(rng):
    if rng.random() < 0.05:
        return None
    if rng.random() < 0.05:
        return "   "
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 5)))


@pytest.mark.parametrize("symmetry", ["mean", "max", "none"])
def test_scalar_matches_independent_reference(symmetry):
    me = MongeElkanSimilarity(symmetry=symmetry)
    rng = random.Random(5)
    for _ in range(300):
        a, b = _rand_text(rng), _rand_text(rng)
        assert me.sim(a, b) == pytest.approx(
            _ref_me(a, b, symmetry), abs=1e-12
        ), (a, b)


def test_batch_bit_identical_to_scalar():
    me = MongeElkanSimilarity()
    rng = random.Random(6)
    xs = [_rand_text(rng) for _ in range(500)]
    ys = [_rand_text(rng) for _ in range(500)]
    got = me.batch(pd.Series(xs), pd.Series(ys))
    want = np.array([me.sim(a, b) for a, b in zip(xs, ys)])
    assert np.array_equal(got, want)


def test_golden_values():
    me = MongeElkanSimilarity()
    assert me.sim("john q public", "public john") == pytest.approx(5 / 6)
    assert me.sim("martha", "martha") == 1.0
    assert me.sim("", "") == 1.0
    assert me.sim("a", "") == 0.0
    assert me.sim(None, "x") == 0.0
    # asymmetry: every token of "john" matches perfectly into the
    # longer name, the reverse direction pays for "quincy"
    asym = MongeElkanSimilarity(symmetry="none")
    assert asym.sim("john", "john quincy") == 1.0
    assert asym.sim("john quincy", "john") < 1.0


def test_max_tokens_truncates():
    me = MongeElkanSimilarity(max_tokens=2)
    full = MongeElkanSimilarity()
    assert me.sim("aa bb zzzz", "aa bb") == 1.0  # third token ignored
    assert full.sim("aa bb zzzz", "aa bb") < 1.0


def test_validation():
    with pytest.raises(ValueError, match="symmetry"):
        MongeElkanSimilarity(symmetry="avg")
    with pytest.raises(ValueError, match="max_tokens"):
        MongeElkanSimilarity(max_tokens=500)


def test_expr_face_matches_scalar(spark):
    me = MongeElkanSimilarity()
    rng = random.Random(7)
    rows = [(i, _rand_text(rng), _rand_text(rng)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", me.expr(F.col("a"), F.col("b")).alias("s")).collect()
    }
    for i, a, b in rows:
        assert got[i] == me.sim(a, b), (a, b)


def test_fused_scorer_path(spark):
    """ME declares .batch, so SimSumScorer fuses it; the matcher's
    scored pairs must equal the scalar composition."""
    from datamatch_spark import NoopIndex, ThresholdMatcher

    rows = [
        (0, "john q public"),
        (1, "public john"),
        (2, "martha lopez"),
        (3, "marhta lopez"),
    ]
    df = spark.createDataFrame(rows, "row_key long, name string")
    m = ThresholdMatcher(
        NoopIndex(), {"name": MongeElkanSimilarity()}, df, validate=False
    )
    got = {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m.scored_pairs.collect()
    }
    me = MongeElkanSimilarity()
    names = dict(rows)
    for (ia, ib), s in got.items():
        assert s == pytest.approx(me.sim(names[ia], names[ib]), abs=1e-12)
    assert got[(2, 3)] > 0.9
