"""term_frequencies / tf_adjust — Splink-style term-frequency
adjustment of Fellegi-Sunter scores: hand-computed frequencies, scalar
float64 reimplementation parity, rare-boost/common-penalty direction,
NULL / unknown-value passthrough, damping, and validation."""

import math

import pytest
from pyspark.sql import functions as F

from datamatch_spark.linkage import (
    FellegiSunterModel,
    term_frequencies,
    tf_adjust,
)

MODEL = FellegiSunterModel(
    gamma_cols=("g_name", "g_dob"),
    m=(0.95, 0.9),
    u=(0.2, 0.05),
    lam=0.3,
    n_iter=0,
)


def _records(spark):
    names = ["smith"] * 6 + ["jones"] * 3 + ["zzyzx"]
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )


def _scored(spark, rows):
    """rows: (idx_a, idx_b, g_name, g_dob, v_name)."""
    df = spark.createDataFrame(
        rows, "idx_a long, idx_b long, g_name int, g_dob int, v_name string"
    )
    return MODEL.score(df)


def _expected(g_name, g_dob, tf_v, tf_weight=1.0):
    """Scalar float64 replay of score + tf_adjust."""
    w, v = MODEL.lam, 1.0 - MODEL.lam
    weight = 0.0
    for k, g in enumerate((g_name, g_dob)):
        w *= MODEL.m[k] if g else 1.0 - MODEL.m[k]
        v *= MODEL.u[k] if g else 1.0 - MODEL.u[k]
        weight += (
            math.log2(MODEL.m[k] / MODEL.u[k])
            if g
            else math.log2((1.0 - MODEL.m[k]) / (1.0 - MODEL.u[k]))
        )
    if g_name and tf_v is not None:
        ratio = MODEL.u[0] / tf_v
        weight += tf_weight * math.log2(ratio)
        w *= ratio**tf_weight
    return weight, w / (w + v)


def test_term_frequencies(spark):
    tf = {r["value"]: r["tf"] for r in term_frequencies(_records(spark), "name").collect()}
    assert tf == {"smith": 0.6, "jones": 0.3, "zzyzx": 0.1}
    # NULLs excluded from both numerator and denominator
    with_null = _records(spark).unionByName(
        spark.createDataFrame([(99, None)], "id long, name string")
    )
    tf2 = {r["value"]: r["tf"] for r in term_frequencies(with_null, "name").collect()}
    assert tf2 == tf


def test_scalar_parity_and_direction(spark):
    tf = term_frequencies(_records(spark), "name")
    rows = [
        (0, 1, 1, 1, "smith"),  # common value: penalty (tf 0.6 > u 0.2)
        (2, 3, 1, 0, "zzyzx"),  # rare value: boost (tf 0.1 < u 0.2)
        (4, 5, 0, 1, "smith"),  # disagreement: untouched
    ]
    out = {
        (r["idx_a"], r["idx_b"]): r
        for r in tf_adjust(_scored(spark, rows), MODEL, "g_name", "v_name", tf).collect()
    }
    tfs = {"smith": 0.6, "zzyzx": 0.1}
    for a, b, gn, gd, vn in rows:
        ew, ep = _expected(gn, gd, tfs.get(vn) if gn else None)
        r = out[(a, b)]
        assert r["match_weight_tf"] == pytest.approx(ew, abs=1e-12)
        assert r["match_probability_tf"] == pytest.approx(ep, abs=1e-12)
    # direction
    assert out[(0, 1)]["match_weight_tf"] < out[(0, 1)]["match_weight"]
    assert out[(2, 3)]["match_weight_tf"] > out[(2, 3)]["match_weight"]
    assert out[(4, 5)]["match_weight_tf"] == out[(4, 5)]["match_weight"]


def test_null_and_unknown_values_pass_through(spark):
    tf = term_frequencies(_records(spark), "name")
    rows = [(0, 1, 1, 1, None), (2, 3, 1, 1, "unseen")]
    out = tf_adjust(_scored(spark, rows), MODEL, "g_name", "v_name", tf).collect()
    for r in out:
        assert r["match_weight_tf"] == r["match_weight"]
        assert r["match_probability_tf"] == pytest.approx(
            r["match_probability"], abs=1e-12
        )


def test_damping_weight(spark):
    tf = term_frequencies(_records(spark), "name")
    rows = [(0, 1, 1, 1, "zzyzx")]
    half = tf_adjust(
        _scored(spark, rows), MODEL, "g_name", "v_name", tf, tf_weight=0.5
    ).collect()[0]
    ew, ep = _expected(1, 1, 0.1, tf_weight=0.5)
    assert half["match_weight_tf"] == pytest.approx(ew, abs=1e-12)
    assert half["match_probability_tf"] == pytest.approx(ep, abs=1e-12)
    zero = tf_adjust(
        _scored(spark, rows), MODEL, "g_name", "v_name", tf, tf_weight=0.0
    ).collect()[0]
    assert zero["match_weight_tf"] == zero["match_weight"]


def test_validation(spark):
    tf = term_frequencies(_records(spark), "name")
    scored = _scored(spark, [(0, 1, 1, 1, "smith")])
    with pytest.raises(ValueError):
        tf_adjust(scored, MODEL, "g_nope", "v_name", tf)
    with pytest.raises(KeyError):
        tf_adjust(scored, MODEL, "g_name", "v_missing", tf)
    with pytest.raises(KeyError):
        tf_adjust(scored.drop("match_weight"), MODEL, "g_name", "v_name", tf)


def test_u_probability_and_model_roundtrip(spark):
    import json

    from datamatch_spark.linkage import u_probability

    # smith 6, jones 3, zzyzx 1, N=10: sum n(n-1) = 30+6+0 = 36; /90
    assert u_probability(_records(spark), "name") == pytest.approx(0.4)
    with_null = _records(spark).unionByName(
        spark.createDataFrame([(99, None)], "id long, name string")
    )
    assert u_probability(with_null, "name") == pytest.approx(0.4)
    with pytest.raises(ValueError):
        u_probability(
            spark.createDataFrame([(0, "x")], "id long, name string"), "name"
        )

    m2 = type(MODEL).from_dict(json.loads(json.dumps(MODEL.to_dict())))
    assert m2 == MODEL  # floats round-trip exactly through json
