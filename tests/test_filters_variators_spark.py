"""Ports of test_filters.py (boundary semantics) and test_variators.py."""

import pytest
from pyspark.sql import functions as F

from datamatch_spark import DissimilarFilter, NonOverlappingFilter, Swap, Variator


def keep(spark, flt, schema, rec_a, rec_b):
    df = spark.createDataFrame(
        [(rec_a, rec_b)], f"a struct<{schema}>, b struct<{schema}>"
    )
    return df.where(flt.predicate("a", "b", df.schema["a"].dataType)).count() == 1


def test_dissimilar_filter(spark):
    f = DissimilarFilter("agency")
    schema = "agency string, uid string"
    assert not keep(spark, f, schema, ("slidell pd", "1"), ("slidell pd", "2"))
    assert keep(spark, f, schema, ("slidell pd", "1"), ("gretna pd", "2"))
    # nulls pass (reference filters.py:63-64)
    assert keep(spark, f, schema, (None, "1"), ("gretna pd", "2"))
    assert keep(spark, f, schema, (None, "1"), (None, "2"))


def test_dissimilar_filter_key_error(spark):
    df = spark.createDataFrame([((1,), (1,))], "a struct<x long>, b struct<x long>")
    with pytest.raises(KeyError):
        DissimilarFilter("agency").predicate("a", "b", df.schema["a"].dataType)
    flt = DissimilarFilter("agency", ignore_key_error=True)
    assert df.where(flt.predicate("a", "b", df.schema["a"].dataType)).count() == 1


@pytest.mark.parametrize(
    "ra,rb,kept",
    [
        # reference test_filters.py:34-65 — 7 boundary cases
        ((0, 10), (11, 20), True),  # disjoint
        ((11, 20), (0, 10), True),  # disjoint reversed
        ((0, 10), (10, 20), False),  # touching endpoints = overlap
        ((10, 20), (0, 10), False),
        ((0, 10), (5, 15), False),  # partial overlap
        ((5, 15), (0, 10), False),
        ((0, 10), (2, 8), False),  # containment
    ],
)
def test_non_overlapping_filter(spark, ra, rb, kept):
    f = NonOverlappingFilter("start", "end")
    schema = "start long, end long"
    assert keep(spark, f, schema, ra, rb) == kept


def variants_of(spark, variator, schema, rec):
    df = spark.createDataFrame([(rec,)], f"a struct<{schema}>")
    fields = df.schema["a"].dataType.fieldNames()
    rows = df.select(
        F.explode(variator.variants(F.col("a"), fields)).alias("v")
    ).collect()
    return [tuple(r["v"]) for r in rows]


def test_noop_variator(spark):
    assert variants_of(spark, Variator(), "x long, y long", (1, 2)) == [(1, 2)]


def test_swap_variator(spark):
    # (1,2,3) -> two variants; (2,2,3) -> one (reference test_variators.py:24-35)
    got = variants_of(spark, Swap("x", "y"), "x long, y long, z long", (1, 2, 3))
    assert got == [(1, 2, 3), (2, 1, 3)]
    got = variants_of(spark, Swap("x", "y"), "x long, y long, z long", (2, 2, 3))
    assert got == [(2, 2, 3)]


def test_swap_variator_one_null(spark):
    # one-sided null still swaps (reference: NaN != value is True)
    got = variants_of(spark, Swap("x", "y"), "x long, y long", (None, 2))
    assert got == [(None, 2), (2, None)]
    # both null: no swap
    got = variants_of(spark, Swap("x", "y"), "x long, y long", (None, None))
    assert got == [(None, None)]


def test_custom_variator_explode_fallback_equals_inline(spark):
    """A user variator subclass that does not declare max_variants
    falls back to explode + per-pair max; with Swap-identical variants
    the result must equal the inline (greatest-of-combos) path."""
    from pyspark.sql import functions as F

    from datamatch_spark import ColumnsIndex, JaroWinklerSimilarity, Swap, ThresholdMatcher
    from datamatch_spark.variators import Variator

    class SwapLike(Variator):  # no max_variants -> unknown bound
        def __init__(self, a, b):
            self._a, self._b = a, b

        def required_columns(self):
            return {self._a, self._b}

        def variants(self, struct_col, fields):
            return Swap(self._a, self._b).variants(struct_col, fields)

    assert SwapLike.max_variants is None  # __init_subclass__ guard
    rows = [
        (i, f"n{i % 7}a", f"m{(i * 3) % 5}b", f"g{i % 4}") for i in range(80)
    ] + [(100, "same", "same", "g0"), (101, None, "x", "g0")]
    df = spark.createDataFrame(rows, "row_key long, first string, last string, g string")
    kw = dict(row_key="row_key", validate=False)
    scorer = {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()}
    inline = ThresholdMatcher(
        ColumnsIndex("g"), scorer, df, variator=Swap("first", "last"), **kw
    )
    fallback = ThresholdMatcher(
        ColumnsIndex("g"), scorer, df, variator=SwapLike("first", "last"), **kw
    )
    a = {(r["idx_a"], r["idx_b"]): round(r["sim_score"], 9)
         for r in inline.scored_pairs.collect()}
    b = {(r["idx_a"], r["idx_b"]): round(r["sim_score"], 9)
         for r in fallback.scored_pairs.collect()}
    assert a == b


def test_swap_null_vs_nan_is_both_missing_no_swap(spark):
    """Reference gate: pd.isna(a) and pd.isna(b) -> NO swap. In a
    pandas float column None IS NaN, so a NULL-vs-NaN pair is
    both-missing and must not produce a variant — eqNullSafe alone
    says NULL <=> NaN is false and would swap (review r5)."""
    from pyspark.sql import functions as F

    from datamatch_spark import Swap

    df = spark.createDataFrame(
        [(0, None, float("nan")), (1, 1.0, None), (2, 1.0, 2.0)],
        "id long, p double, q double",
    )
    v = Swap("p", "q").variants(
        F.struct("p", "q").alias("r"), ["p", "q"], schema=df.select("p", "q").schema
    )
    sizes = {r["id"]: r["n"] for r in df.select("id", F.size(v).alias("n")).collect()}
    assert sizes == {0: 1, 1: 2, 2: 2}  # both-missing: no swap; one-null: swap


def test_dissimilar_filter_nan_is_missing(spark):
    """Both-NaN pairs must PASS (reference pd.isnull treats NaN as
    missing); Spark's NaN = NaN is TRUE and used to drop them."""
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        DissimilarFilter,
        NoopIndex,
        ThresholdMatcher,
    )

    nan = float("nan")
    df = spark.createDataFrame(
        [(0, nan, 1.0), (1, nan, 2.0), (2, 5.0, 3.0), (3, 5.0, 4.0)],
        "id long, agency double, v double",
    )
    m = ThresholdMatcher(
        NoopIndex(), {"v": AbsoluteNumericalSimilarity(10)}, df,
        row_key="id", validate=False, defer=True,
        filters=[DissimilarFilter("agency")],
    )
    got = {(r["idx_a"], r["idx_b"]) for r in m.scored_pairs.collect()}
    assert (0, 1) in got        # both NaN -> missing -> passes
    assert (2, 3) not in got    # equal non-missing -> filtered
