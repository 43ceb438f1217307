"""global_rank must reproduce the single-partition window rank exactly."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from datamatch_spark.ranking import global_rank


def test_global_rank_matches_window(spark):
    rng = random.Random(7)
    rows = [
        (i, round(rng.choice([0.7, 0.8, 0.9]), 2), rng.randint(0, 5))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, s double, k long")
    order = [F.col("s").desc(), F.col("k").asc(), F.col("id").asc()]
    want = {
        r["id"]: r["r"]
        for r in df.withColumn(
            "r", F.row_number().over(Window.orderBy(*order)) - 1
        ).collect()
    }
    got = {r["id"]: r["r"] for r in global_rank(df, order, "r", partitions=7).collect()}
    assert got == want


def test_global_rank_empty(spark):
    df = spark.createDataFrame([], "id long, s double")
    out = global_rank(df, [F.col("s").desc()], "r")
    assert out.count() == 0
    assert "r" in out.columns
