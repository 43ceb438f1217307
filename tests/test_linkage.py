"""Fellegi-Sunter EM linkage: independent-reimpl parity, separable-data
recovery, scoring-column math, determinism, and input validation."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from datamatch_spark.linkage import FellegiSunterModel, _em, estimate_fs


def _em_numpy(patterns, k, n_iter, init_m, init_u, init_lambda):
    """Vectorized EM with numpy's own summation order — an independent
    check of the math, not the fold order."""
    G = np.array([g for g, _ in patterns], dtype=float)  # (P, k)
    c = np.array([n for _, n in patterns], dtype=float)  # (P,)
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    lam = init_lambda
    eps = 1e-6
    for _ in range(n_iter):
        w = lam * np.prod(np.where(G == 1, m, 1 - m), axis=1)
        v = (1 - lam) * np.prod(np.where(G == 1, u, 1 - u), axis=1)
        p = w / (w + v)
        cp, cq = c * p, c * (1 - p)
        lam = np.clip(cp.sum() / c.sum(), eps, 1 - eps)
        m = np.clip((cp[:, None] * G).sum(axis=0) / cp.sum(), eps, 1 - eps)
        u = np.clip((cq[:, None] * G).sum(axis=0) / cq.sum(), eps, 1 - eps)
    return m, u, lam


def test_em_matches_independent_numpy_reimpl():
    rng = random.Random(7)
    for trial in range(5):
        k = rng.choice([2, 3, 4])
        pats = sorted(
            {tuple(rng.randint(0, 1) for _ in range(k)) for _ in range(2**k)}
        )
        patterns = [(g, rng.randint(1, 5000)) for g in pats]
        m, u, lam = _em(patterns, k, 15, 0.9, 0.1, 0.5)
        m2, u2, lam2 = _em_numpy(patterns, k, 15, 0.9, 0.1, 0.5)
        assert np.allclose(m, m2, rtol=0, atol=1e-9), (trial, m, m2)
        assert np.allclose(u, u2, rtol=0, atol=1e-9)
        assert abs(lam - lam2) < 1e-9


def test_em_recovers_separable_mixture(spark):
    """Planted duplicates agree on all three fields with high
    probability; random pairs rarely. EM must recover m >> u and rank
    planted pairs' posterior far above background. Three fields, not
    two: a 2-class latent model over k binary gammas has 2k+1 free
    parameters vs 2^k data degrees of freedom, so k >= 3 is the
    classic Fellegi-Sunter identifiability floor."""
    rng = random.Random(42)
    rows = []
    for i in range(400):  # planted matches
        g1 = 1 if rng.random() < 0.95 else 0
        g2 = 1 if rng.random() < 0.9 else 0
        g3 = 1 if rng.random() < 0.85 else 0
        rows.append((i, 100000 + i, g1, g2, g3, 1))
    for i in range(8000):  # background non-matches
        g1 = 1 if rng.random() < 0.05 else 0
        g2 = 1 if rng.random() < 0.1 else 0
        g3 = 1 if rng.random() < 0.08 else 0
        rows.append((200000 + i, 300000 + i, g1, g2, g3, 0))
    df = spark.createDataFrame(
        rows, "idx_a long, idx_b long, g1 int, g2 int, g3 int, is_match int"
    )
    model = estimate_fs(df, ["g1", "g2", "g3"], n_iter=60)
    assert model.m[0] > 0.8 and model.m[1] > 0.7 and model.m[2] > 0.65
    assert model.u[0] < 0.15 and model.u[1] < 0.2 and model.u[2] < 0.2
    assert 0.02 < model.lam < 0.1
    scored = model.score(df).groupBy("is_match").agg(
        F.avg("match_probability").alias("p")
    )
    by = {r["is_match"]: r["p"] for r in scored.collect()}
    assert by[1] > 0.6 > 0.2 > by[0]


def test_score_columns_match_scalar_math(spark):
    patterns = [((0, 0), 500), ((0, 1), 60), ((1, 0), 40), ((1, 1), 90)]
    rows = [(i, g[0], g[1]) for i, (g, _) in enumerate(patterns)]
    df = spark.createDataFrame(rows, "pair_id long, ga int, gb int")
    model = estimate_fs(
        df.withColumn("n", F.lit(1)), ["ga", "gb"], n_iter=10
    )
    got = {
        r["pair_id"]: (r["match_weight"], r["match_probability"])
        for r in model.score(df).collect()
    }
    for pid, (g, _) in enumerate(patterns):
        w = model.lam
        v = 1.0 - model.lam
        wt = 0.0
        for j in range(2):
            w = w * (model.m[j] if g[j] else 1.0 - model.m[j])
            v = v * (model.u[j] if g[j] else 1.0 - model.u[j])
            wt = wt + (
                math.log2(model.m[j] / model.u[j])
                if g[j]
                else math.log2((1.0 - model.m[j]) / (1.0 - model.u[j]))
            )
        assert got[pid][0] == pytest.approx(wt, abs=1e-12)
        assert got[pid][1] == pytest.approx(w / (w + v), abs=1e-12)


def test_estimate_deterministic_under_repartition(spark):
    rng = random.Random(3)
    rows = [
        (i, rng.randint(0, 1), rng.randint(0, 1), rng.randint(0, 1))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "i long, g1 int, g2 int, g3 int")
    a = estimate_fs(df, ["g1", "g2", "g3"], n_iter=12)
    b = estimate_fs(df.repartition(13, "g2"), ["g1", "g2", "g3"], n_iter=12)
    assert a == b  # frozen dataclass: bit-identical params


def test_params_df_weights(spark):
    model = FellegiSunterModel(("x",), (0.8,), (0.2,), 0.3, 5)
    row = model.params_df(spark).collect()[0]
    assert row["field"] == "x"
    assert row["w_agree"] == pytest.approx(math.log2(4.0))
    assert row["w_disagree"] == pytest.approx(math.log2(0.25))


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, 1), (2, 0)], "i long, g int")
    with pytest.raises(ValueError, match="at least one gamma"):
        estimate_fs(df, [])
    with pytest.raises(ValueError, match="init_lambda"):
        estimate_fs(df, ["g"], init_lambda=1.5)
    with pytest.raises(ValueError, match="no candidate pairs"):
        estimate_fs(df.where(F.col("i") < 0), ["g"])
    bad = spark.createDataFrame([(1, 2)], "i long, g int")
    with pytest.raises(ValueError, match="non-binary"):
        estimate_fs(bad, ["g"])
    withnull = spark.createDataFrame([(1, None), (2, 1)], "i long, g int")
    with pytest.raises(ValueError, match="non-binary"):
        estimate_fs(withnull, ["g"])


def test_driver_query_runs_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod_fs", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.queries()["fs_em_pairs"](spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {
        "idx_a",
        "idx_b",
        "g_source",
        "g_len",
        "g_tok",
        "match_weight",
        "match_probability",
    }
    assert pdf["match_probability"].between(0, 1).all()
