"""Randomized reference-parity sweep: generate random small frames
(nulls, typo-pool names, dates, continuous numerics), run the REFERENCE
implementation and the Spark engine on identical data across the full
similarity zoo, and compare every scored pair's score to 1e-9 — in
dedup mode, dedup+Swap, and match mode (greedy 1:1 pruning included).

Ties: the reference's greedy prune breaks score ties by pair-generation
order (hash-dependent) while this engine imposes (score DESC, idx_a,
idx_b) — SURVEY §8.2. The fixture avoids exact ties by construction:
every row carries a continuous `wt` column scored with
RelativeNumericalSimilarity inside its pc_max band, making pair-score
collisions measure-zero.
"""

import datetime
import random

import pytest

from test_reference_parity import reference_datamatch  # noqa: F401 - fixture

LASTS = ["smith", "smyth", "garcia", "garzia", "lee", "leigh",
         "oneil", "o'neil", "nguyen", "wong", None]
FIRSTS = ["jon", "john", "johnny", "ann", "anne", "bob", "robert",
          "maria", "mario", None]

SCHEMA = ("rk long, last string, first string, dob date, age double, "
          "wt double, blk string")


def _rand_rows(rng, n):
    rows = []
    for i in range(n):
        d0 = datetime.date(2000, 1, 1) + datetime.timedelta(
            days=rng.randint(0, 90)
        )
        rows.append(
            {
                "rk": i,
                "last": rng.choice(LASTS),
                "first": rng.choice(FIRSTS),
                "dob": rng.choice([None, d0]),
                "age": rng.choice(
                    [None, float(rng.randint(20, 60)) + rng.random()]
                ),
                # 100-110: always inside RelativeNumericalSimilarity(30)'s
                # band -> continuous nonzero sim -> no exact score ties
                "wt": rng.uniform(100.0, 110.0),
                "blk": rng.choice(["a", "b"]),
            }
        )
    return rows


def _sims(mod):
    return {
        "last": mod.JaroWinklerSimilarity(),
        "first": mod.StringSimilarity(),
        "dob": mod.DateSimilarity(),
        "age": mod.AbsoluteNumericalSimilarity(20),
        "wt": mod.RelativeNumericalSimilarity(30),
    }


def _ref_pandas(rows):
    import pandas as pd

    return pd.DataFrame(rows).set_index("rk")[
        ["last", "first", "dob", "age", "wt", "blk"]
    ]


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [
            (r["rk"], r["last"], r["first"], r["dob"], r["age"], r["wt"], r["blk"])
            for r in rows
        ],
        SCHEMA,
    )


def _spark_scored(m):
    return {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m.scored_pairs.collect()
    }


def _assert_scores_equal(got: dict, want: dict, norm=None):
    norm = norm or (lambda p: p)
    got_n = {norm(p): s for p, s in got.items()}
    want_n = {norm(p): s for p, s in want.items()}
    assert set(got_n) == set(want_n), (
        sorted(set(got_n) ^ set(want_n))[:10],
        len(got_n),
        len(want_n),
    )
    for p, s in want_n.items():
        assert abs(got_n[p] - s) < 1e-9, (p, got_n[p], s)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_dedup_scores_match_reference(spark, reference_datamatch, seed):
    import datamatch_spark as eng

    ref = reference_datamatch
    rows = _rand_rows(random.Random(100 + seed), 40)
    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"), _sims(ref), _ref_pandas(rows)
    )
    want = {(a, b): s for s, a, b in m_ref._pairs}
    m = eng.ThresholdMatcher(
        eng.ColumnsIndex("blk"),
        _sims(eng),
        _spark_df(spark, rows),
        row_key="rk",
        validate=False,
    )
    _assert_scores_equal(
        _spark_scored(m), want, norm=lambda p: (min(p), max(p))
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_dedup_swap_scores_match_reference(spark, reference_datamatch, seed):
    import datamatch_spark as eng

    ref = reference_datamatch
    rows = _rand_rows(random.Random(200 + seed), 30)
    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"),
        _sims(ref),
        _ref_pandas(rows),
        variator=ref.Swap("last", "first"),
    )
    want = {(a, b): s for s, a, b in m_ref._pairs}
    m = eng.ThresholdMatcher(
        eng.ColumnsIndex("blk"),
        _sims(eng),
        _spark_df(spark, rows),
        row_key="rk",
        validate=False,
        variator=eng.Swap("last", "first"),
    )
    _assert_scores_equal(
        _spark_scored(m), want, norm=lambda p: (min(p), max(p))
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_match_mode_pruned_scores_match_reference(
    spark, reference_datamatch, seed
):
    from pyspark.sql import functions as F

    import datamatch_spark as eng

    ref = reference_datamatch
    rows = _rand_rows(random.Random(300 + seed), 40)
    pdf = _ref_pandas(rows)
    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"),
        _sims(ref),
        pdf[pdf.index % 2 == 0],
        pdf[pdf.index % 2 == 1],
    )
    want = {(a, b): s for s, a, b in m_ref._pairs}  # post greedy prune
    sdf = _spark_df(spark, rows)
    m = eng.ThresholdMatcher(
        eng.ColumnsIndex("blk"),
        _sims(eng),
        sdf.where(F.col("rk") % 2 == 0),
        sdf.where(F.col("rk") % 2 == 1),
        row_key="rk",
        validate=False,
    )
    _assert_scores_equal(_spark_scored(m), want)
