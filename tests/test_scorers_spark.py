"""Ports of /root/reference/datamatch/test_scorers.py (golden floats)
and test_similarities.py through the Spark Column/UDF path.

A scorer is exercised by compiling it over a tiny pair frame; a NULL
result is the Spark face of RefuseToScoreException.
"""

import pytest
from pyspark.sql import functions as F

from datamatch_spark import (
    AbsoluteNumericalSimilarity,
    AbsoluteScorer,
    AlterScorer,
    DateSimilarity,
    FuncScorer,
    JaroWinklerSimilarity,
    MaxScorer,
    MinScorer,
    RelativeNumericalSimilarity,
    SimSumScorer,
    StringSimilarity,
)
from datamatch_spark.scorers import CompileCtx

TOL = 1e-9


def run_scorer(spark, scorer, schema: str, rec_a: tuple, rec_b: tuple, ia=1, ib=2):
    df = spark.createDataFrame(
        [(ia, ib, rec_a, rec_b)],
        f"idx_a long, idx_b long, a struct<{schema}>, b struct<{schema}>",
    )
    ctx = CompileCtx(df=df)
    col = scorer.compile(ctx)
    return ctx.df.select(col.cast("double").alias("s")).collect()[0]["s"]


def run_sim(spark, sim, schema: str, va, vb):
    df = spark.createDataFrame([(va, vb)], f"a {schema}, b {schema}")
    return df.select(sim.expr(F.col("a"), F.col("b")).alias("s")).collect()[0]["s"]


# ---------------------------------------------------------------- sims


def test_string_similarity_expr(spark):
    assert run_sim(spark, StringSimilarity(), "string", "abce", "abcd") == 0.75
    assert run_sim(spark, StringSimilarity(), "string", "thang", "thăng") == 1.0


def test_jaro_winkler_expr(spark):
    got = run_sim(spark, JaroWinklerSimilarity(0.2), "string", "abce", "abcd")
    assert abs(got - 0.9333333333333333) < TOL


def test_numeric_exprs(spark):
    assert run_sim(spark, AbsoluteNumericalSimilarity(10), "double", 10.0, 5.0) == 0.5
    assert (
        abs(run_sim(spark, AbsoluteNumericalSimilarity(10), "double", 8.2, 3.1) - 0.49)
        < TOL
    )
    assert run_sim(spark, AbsoluteNumericalSimilarity(10), "double", 40.0, 10.0) == 0.0
    assert (
        run_sim(spark, RelativeNumericalSimilarity(30), "double", 10000.0, 8500.0)
        == 0.5
    )
    assert run_sim(spark, RelativeNumericalSimilarity(30), "double", 8.2, 3.1) == 0.0
    assert (
        run_sim(spark, RelativeNumericalSimilarity(30), "double", 10000.0, 7000.0)
        == 0.0
    )


def test_date_expr_all_branches(spark):
    import datetime

    d = datetime.date
    cases = [
        (d(2000, 10, 11), d(2000, 10, 11), 1.0),
        (d(2000, 10, 11), d(2000, 10, 5), 0.8),
        (d(2000, 10, 11), d(2000, 11, 5), 0.16666666666666663),
        (d(2000, 10, 11), d(2001, 3, 15), 0.0),
        (d(2000, 9, 11), d(2000, 11, 9), 0.5),
        (d(2000, 3, 20), d(2000, 8, 20), 0.875),
    ]
    for a, b, want in cases:
        got = run_sim(spark, DateSimilarity(30), "date", a, b)
        assert abs(got - want) < TOL, (a, b, got, want)


def test_date_expr_string_typed_columns(spark):
    # ADVICE r4 (high): STRING-typed date columns ('2000-10-11') must
    # score like DateType — raw unix_timestamp would throw
    # CANNOT_PARSE_TIMESTAMP under ANSI (Spark 4 default) or silently
    # NULL every stage-1 pair with ANSI off
    cases = [
        ("2000-10-11", "2000-10-11", 1.0),
        ("2000-10-11", "2000-10-05", 0.8),
        ("2000-10-11", "2000-11-05", 0.16666666666666663),
        ("2000-10-11", "2001-03-15", 0.0),
        ("2000-09-11", "2000-11-09", 0.5),
        ("2000-03-20", "2000-08-20", 0.875),
    ]
    for a, b, want in cases:
        got = run_sim(spark, DateSimilarity(30), "string", a, b)
        assert abs(got - want) < TOL, (a, b, got, want)
    # timestamp STRINGS keep time-of-day: 29.96 days apart floors to
    # 29 days -> stage 1 (a calendar datediff would say 30 -> 0.0)
    got = run_sim(
        spark,
        DateSimilarity(30),
        "string",
        "2000-10-01 00:30:00",
        "2000-10-30 23:30:00",
    )
    assert abs(got - (1.0 - 29.0 / 30.0)) < TOL


# ------------------------------------------------------------- scorers


def test_simsum_golden(spark):
    scorer = SimSumScorer(
        {"first_name": JaroWinklerSimilarity(), "age": AbsoluteNumericalSimilarity(10)}
    )
    schema = "first_name string, age long"
    assert run_scorer(spark, scorer, schema, ("john", 41), ("john", 41)) == 1.0
    got = run_scorer(spark, scorer, schema, ("jim", 41), ("jimm", 43))
    assert abs(got - 0.8737093656105305) < TOL


def test_simsum_null_contributes_zero(spark):
    scorer = SimSumScorer({"age": AbsoluteNumericalSimilarity(10)})
    assert run_scorer(spark, scorer, "age long", (None,), (41,)) == 0.0


def test_absolute_scorer(spark):
    schema = "attract_id long"
    s = AbsoluteScorer("attract_id", 1)
    assert run_scorer(spark, s, schema, (1234,), (1234,)) == 1.0
    assert run_scorer(spark, s, schema, (1234,), (2345,)) is None  # refuse
    assert run_scorer(spark, s, schema, (1234,), (None,)) is None
    assert run_scorer(spark, s, schema, (None,), (1234,)) is None


def test_absolute_scorer_key_error(spark):
    with pytest.raises(KeyError):
        run_scorer(spark, AbsoluteScorer("b", 1), "a long", (1,), (2,))
    got = run_scorer(
        spark, AbsoluteScorer("b", 1, ignore_key_error=True), "a long", (1,), (2,)
    )
    assert got is None  # refuses instead


def test_max_scorer_golden(spark):
    scorer = MaxScorer(
        [
            AbsoluteScorer("attract_id", 1),
            SimSumScorer({"first_name": JaroWinklerSimilarity()}),
        ]
    )
    schema = "first_name string, attract_id long"
    assert run_scorer(spark, scorer, schema, ("john", 5), ("jim", 5)) == 1.0
    got = run_scorer(spark, scorer, schema, ("john", 5), ("jim", 4))
    assert abs(got - 0.575) < TOL


def test_min_scorer_golden(spark):
    scorer = MinScorer(
        [
            AbsoluteScorer("repell_id", 0),
            SimSumScorer({"first_name": JaroWinklerSimilarity()}),
        ]
    )
    schema = "first_name string, repell_id long"
    assert run_scorer(spark, scorer, schema, ("john", 5), ("jim", 5)) == 0.0
    got = run_scorer(spark, scorer, schema, ("john", 5), ("jim", 4))
    assert abs(got - 0.575) < TOL


def test_all_refuse_is_null(spark):
    scorer = MaxScorer([AbsoluteScorer("a", 1)])
    assert run_scorer(spark, scorer, "a long", (1,), (2,)) is None


def test_alter_scorer_golden(spark):
    import pandas as pd

    base = SimSumScorer(
        {"name": JaroWinklerSimilarity(), "age": RelativeNumericalSimilarity(100)}
    )
    values = pd.Series([1, 2, 1, 3], index=[1, 2, 3, 4])
    scorer = AlterScorer(base, values, lambda x: x / 2)
    schema = "name string, age long"
    got = run_scorer(spark, scorer, schema, ("john", 20), ("jim", 21), ia=2, ib=4)
    assert abs(got - 0.7866557310723826) < TOL  # values differ -> unaltered
    got = run_scorer(spark, scorer, schema, ("john", 20), ("jim", 21), ia=1, ib=3)
    assert abs(got - 0.3933278655361913) < TOL  # equal values -> halved
    got = run_scorer(spark, scorer, schema, ("john", 20), ("jim", 21), ia=5, ib=6)
    assert abs(got - 0.7866557310723826) < TOL  # keys absent -> unaltered


def test_func_scorer_per_row(spark):
    scorer = FuncScorer(lambda a, b: 1.0 if a.age == b.age else 0.5, per_row=True)
    schema = "name string, age long"
    assert run_scorer(spark, scorer, schema, ("john", 20), ("jim", 21)) == 0.5
    assert run_scorer(spark, scorer, schema, ("john", 20), ("jim", 20)) == 1.0


def test_func_scorer_batch(spark):
    def batch(a, b):
        return (a["age"] == b["age"]).map({True: 1.0, False: 0.5})

    scorer = FuncScorer(batch, columns={"age"})
    schema = "name string, age long"
    assert run_scorer(spark, scorer, schema, ("john", 20), ("jim", 21)) == 0.5


def test_absolute_scorer_nan_refuses(spark):
    """Spark NaN = NaN is TRUE and NaN is not NULL — two missing-as-NaN
    float values must REFUSE (reference pd.isnull semantics), never
    count as an exact match."""
    import math

    from datamatch_spark import AbsoluteScorer, NoopIndex, ThresholdMatcher

    rows = [(0, float("nan")), (1, float("nan")), (2, 7.0), (3, 7.0), (4, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    m = ThresholdMatcher(
        NoopIndex(), AbsoluteScorer("v", 1.0), df, row_key="id",
        validate=False, defer=True,
    )
    got = {(r["idx_a"], r["idx_b"]) for r in m.scored_pairs.collect()}
    assert got == {(2, 3)}  # NaN/NaN and NULL/NULL pairs refused


def test_func_scorer_batch_sees_full_record(spark):
    """Batch-mode FuncScorer with no declared columns receives the
    WHOLE record, not a pruned single column."""
    from datamatch_spark import FuncScorer, NoopIndex, ThresholdMatcher

    def cb(a, b):
        assert set(a.columns) == {"x", "y"}, a.columns
        return (a["x"] == b["x"]).astype(float) * 0.5 + (
            a["y"] == b["y"]
        ).astype(float) * 0.5

    rows = [(0, "p", 1), (1, "p", 1), (2, "q", 2)]
    df = spark.createDataFrame(rows, "id long, x string, y long")
    m = ThresholdMatcher(
        NoopIndex(), FuncScorer(cb), df, row_key="id", validate=False,
        defer=True,
    )
    got = {(r["idx_a"], r["idx_b"]): r["sim_score"] for r in m.scored_pairs.collect()}
    assert got[(0, 1)] == 1.0 and got[(0, 2)] == 0.0


def test_alter_scorer_duplicate_keys_raise(spark):
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        AlterScorer,
        NoopIndex,
        SimSumScorer,
        ThresholdMatcher,
    )

    df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, v double")
    vals = spark.createDataFrame([(0, "g"), (0, "g"), (1, "h")], "k long, grp string")
    inner = SimSumScorer({"v": AbsoluteNumericalSimilarity(10)})
    with pytest.raises(ValueError, match="duplicate keys"):
        ThresholdMatcher(
            NoopIndex(), AlterScorer(inner, vals, lambda c: c / 2), df,
            row_key="id", validate=False, defer=True,
        )._build_scored()
    with pytest.raises(ValueError, match="duplicate keys"):
        import pandas as pd
        ThresholdMatcher(
            NoopIndex(),
            AlterScorer(inner, pd.Series(["g", "g"], index=[0, 0]), lambda c: c),
            df, row_key="id", validate=False, defer=True,
        )._build_scored()


def test_swap_on_float_columns_fused_with_exact_null_semantics(spark):
    """VERDICT r4 #4: float swap columns stay on the FUSED path — the
    swap gate is computed JVM-side (~eqNullSafe boolean UDF inputs), so
    the Arrow NULL-vs-NaN ambiguity no longer forces the 4x inline
    path. Plan shape: ONE ArrowEvalPython, no __va/__vb variant slots;
    scores bit-identical to the inline-combo path on NULL-vs-NaN,
    NaN-vs-NaN, and plain swap rows."""
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        JaroWinklerSimilarity,
        NoopIndex,
        SimSumScorer,
        Swap,
        ThresholdMatcher,
    )

    rows = [
        (0, 5.0, 50.0, "ann"),
        (1, 50.0, 5.0, "ann"),      # swapped copy of 0 -> max combo = 1.0
        (2, None, float("nan"), "bob"),   # both missing (pd.isna) -> no swap
        (3, float("nan"), None, "bob"),   # (reference variator gate)
        (4, float("nan"), float("nan"), "cal"),  # NaN<=>NaN true -> no swap
        (5, 7.0, 7.0, "cal"),       # equal -> no swap
    ]
    schema = "id long, p double, q double, name string"
    sims = {
        "p": AbsoluteNumericalSimilarity(100),
        "q": AbsoluteNumericalSimilarity(100),
        "name": JaroWinklerSimilarity(),
    }
    df = spark.createDataFrame(rows, schema)

    def build(scorer):
        return ThresholdMatcher(
            NoopIndex(), scorer, df, row_key="id", validate=False,
            defer=True, variator=Swap("p", "q"),
        )

    m_fused = build(SimSumScorer(sims))
    scored = m_fused._build_scored()
    plan = scored._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "__va" not in plan, plan[:2000]
    # formatted explain prints each node in the tree AND a "(n) Node"
    # detail header; count the headers -> exactly one Arrow UDF node
    assert plan.count(") ArrowEvalPython") == 1, plan[:2000]
    fused = {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m_fused.scored_pairs.collect()
    }
    assert fused[(0, 1)] == 1.0  # swap recovers the exchanged fields

    # bit-identical parity vs the inline-combo path (forced by
    # disabling the fuse capability on the scorer instance)
    inline_scorer = SimSumScorer(sims)
    inline_scorer.can_swap_fuse = lambda: False
    m_inline = build(inline_scorer)
    plan_i = m_inline._build_scored()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "__va" in plan_i
    inline = {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m_inline.scored_pairs.collect()
    }
    assert fused == inline


def test_score_partitions_string_rejected(spark):
    from datamatch_spark import AbsoluteNumericalSimilarity, NoopIndex, ThresholdMatcher

    df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="score_partitions"):
        ThresholdMatcher(
            NoopIndex(), {"v": AbsoluteNumericalSimilarity(10)}, df,
            row_key="id", validate=False, defer=True, score_partitions="64",
        )._build_scored()


def test_nan_func_scorer_does_not_poison_match_mode(spark):
    """Review r5: Arrow turns a NaN pandas-UDF output into NULL; with a
    non-refusing scorer that NULL used to sort FIRST in the greedy 1:1
    rank struct and claim both endpoints. It must coerce to 0.0 so the
    real above-threshold match survives."""
    import numpy as np

    from datamatch_spark import FuncScorer, NoopIndex, ThresholdMatcher

    def cb(a, b):
        out = (a["x"] == b["x"]).astype(float)
        # NaN for exactly one pair: ids 0-3 (x mismatch marker 'z')
        out[(a["x"] == "z") | (b["x"] == "z")] = np.nan
        return out

    dfa = spark.createDataFrame([(0, "p"), (2, "z")], "id long, x string")
    dfb = spark.createDataFrame([(1, "p"), (3, "q")], "id long, x string")
    m = ThresholdMatcher(
        NoopIndex(), FuncScorer(cb), dfa, dfb, row_key="id", validate=False,
        defer=True,
    )
    got = {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m.scored_pairs.collect()
    }
    # the real match (0,1)=1.0 must be kept by greedy pruning; the NaN
    # pairs coerce to 0.0 instead of NULL-dominating
    assert got[(0, 1)] == 1.0
    assert all(v is not None for v in got.values())


def test_alter_scorer_nan_values_not_equal(spark):
    """Two NaN side-table values must NOT count as equal (Python
    NaN == NaN is False in the reference) — Spark's NaN = NaN is TRUE
    and used to apply the alteration (review r5)."""
    import pandas as pd

    base = SimSumScorer({"name": JaroWinklerSimilarity()})
    values = pd.Series([float("nan"), float("nan"), 7.0, 7.0], index=[1, 2, 3, 4])
    scorer = AlterScorer(base, values, lambda x: x / 2)
    got_nan = run_scorer(spark, scorer, "name string", ("john",), ("john",), ia=1, ib=2)
    got_eq = run_scorer(spark, scorer, "name string", ("john",), ("john",), ia=3, ib=4)
    assert got_nan == 1.0  # NaN values -> unaltered
    assert got_eq == 0.5   # genuinely equal values -> altered


def test_date_expr_dst_timezone_consistent(spark):
    """Review r5 (confirmed live): under a DST session timezone,
    unix_timestamp-of-midnight loses an hour across spring-forward and
    a 30-day gap floored to 29 days (stage-1 hit instead of 0.0). The
    NTZ wall-clock subtraction must match the scalar/batch faces in
    ANY session timezone."""
    import datetime

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = run_sim(
            spark, DateSimilarity(30), "date",
            datetime.date(2024, 3, 1), datetime.date(2024, 3, 31),
        )
        assert got == 0.0  # exactly 30 days: no stage matches
        got29 = run_sim(
            spark, DateSimilarity(30), "date",
            datetime.date(2024, 3, 1), datetime.date(2024, 3, 30),
        )
        assert abs(got29 - (1.0 - 29.0 / 30.0)) < TOL
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_string_similarity_scalar_face_respects_max_len(spark):
    from datamatch_spark import StringSimilarity

    s = StringSimilarity(max_len=4)
    a, b = "abcdXXXX", "abcdYYYY"
    assert s.sim(a, b) == 1.0  # truncated to 'abcd' == 'abcd'
    assert s.sim(a, b) == run_sim(spark, s, "string", a, b)
