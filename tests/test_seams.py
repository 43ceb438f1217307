"""Extension-seam coverage: user predicates, Spark-DF side tables,
single-probe LSH, batch FuncScorer inside composites."""

from pyspark.sql import functions as F

from datamatch_spark import (
    AlterScorer,
    ColumnFilter,
    ColumnsIndex,
    FuncScorer,
    JaroWinklerSimilarity,
    MaxScorer,
    NoopIndex,
    SimSumScorer,
    ThresholdMatcher,
)


def test_column_filter(spark):
    df = spark.createDataFrame(
        [(0, "a", 1), (1, "a", 2), (2, "a", 9)], "row_key long, g string, v long"
    )
    flt = ColumnFilter(lambda a, b: F.abs(a["v"] - b["v"]) <= 1, columns={"v"})
    m = ThresholdMatcher(
        ColumnsIndex("g"),
        FuncScorer(lambda pa, pb: [1.0] * len(pa), columns={"v"}),
        df,
        filters=[flt],
    )
    assert m.collect_index_pairs_within_thresholds(0.0, 1.0) == [(0, 1)]


def test_alter_scorer_spark_df_values(spark):
    df = spark.createDataFrame(
        [(1, "john", 20), (2, "jon", 21)], "row_key long, name string, age long"
    )
    values = spark.createDataFrame([(1, 7), (2, 7)], "k long, v long")
    scorer = AlterScorer(
        SimSumScorer({"name": JaroWinklerSimilarity()}), values, lambda x: x / 2
    )
    m = ThresholdMatcher(NoopIndex(), scorer, df)
    [(s, a, b)] = [
        (round(r["sim_score"], 6), r["idx_a"], r["idx_b"])
        for r in m.scored_pairs.collect()
    ]
    # equal side-table values -> halved score
    base = SimSumScorer({"name": JaroWinklerSimilarity()})
    m2 = ThresholdMatcher(NoopIndex(), base, df)
    [(s2, _, _)] = [
        (round(r["sim_score"], 6), r["idx_a"], r["idx_b"])
        for r in m2.scored_pairs.collect()
    ]
    assert abs(s - s2 / 2) < 1e-6


def test_lsh_topk_single_probe(spark):
    import numpy as np

    from datamatch_spark.extras.simsearch import cosine_topk, lsh_topk

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((10, 8))
    vecs = (centers[rng.randint(0, 10, 120)] + 0.1 * rng.standard_normal((120, 8))).astype(
        "float32"
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    q = df.where("vec_id < 5")
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, q, k=3, n_planes=4, multiprobe=False).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, q, k=3, n_planes=4, multiprobe=True).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, q, k=3).collect()
    }
    # multiprobe recall dominates single-probe recall
    assert len(multi & brute) >= len(single & brute)
    assert len(multi & brute) / len(brute) >= 0.6


def test_batch_func_scorer_in_composite(spark):
    df = spark.createDataFrame(
        [(0, "x", 5), (1, "x", 5), (2, "y", 1)], "row_key long, g string, v long"
    )

    def batch(pa, pb):
        return (pa["v"] == pb["v"]).map({True: 0.9, False: 0.1})

    m = ThresholdMatcher(
        NoopIndex(),
        MaxScorer([FuncScorer(batch, columns={"v"})]),
        df,
    )
    got = {
        (r["idx_a"], r["idx_b"]): round(r["sim_score"], 6)
        for r in m.scored_pairs.collect()
    }
    assert got == {(0, 1): 0.9, (0, 2): 0.1, (1, 2): 0.1}
