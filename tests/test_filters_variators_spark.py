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
