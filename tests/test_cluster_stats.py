"""cluster_stats — per-cluster edge density / score-spread diagnostics
for transitive clustering: hand-computed chain-vs-clique fixture,
singleton exclusion, cross-cluster-edge drop, scoreless mode,
composition with groups_from_pairs, and validation."""

import pytest
from pyspark.sql import functions as F

from datamatch_spark.clustering import groups_from_pairs
from datamatch_spark.metrics import cluster_stats


def _fixture(spark):
    # cluster A = chain 0-1-2 (2 edges of 3 possible), cluster B =
    # clique 3-4-5 (3 of 3), 6 = singleton
    ids = spark.createDataFrame([(i,) for i in range(7)], "id long")
    pairs = spark.createDataFrame(
        [
            (0, 1, 0.9),
            (1, 2, 0.6),
            (3, 4, 0.95),
            (3, 5, 0.85),
            (4, 5, 0.9),
        ],
        "idx_a long, idx_b long, sim_score double",
    )
    assign = groups_from_pairs(ids, "id", pairs.select("idx_a", "idx_b"))
    return pairs, assign.select(F.col("id"), "group_id")


def test_chain_vs_clique(spark):
    pairs, assign = _fixture(spark)
    got = {
        r["group_id"]: r.asDict()
        for r in cluster_stats(pairs, assign, "id").collect()
    }
    assert set(got) == {0, 3}  # singleton 6 excluded
    a, b = got[0], got[3]
    assert (a["cluster_size"], a["n_edges"]) == (3, 2)
    assert a["density"] == pytest.approx(2 / 3)
    assert a["min_score"] == pytest.approx(0.6)
    assert a["avg_score"] == pytest.approx(0.75)
    assert (b["cluster_size"], b["n_edges"]) == (3, 3)
    assert b["density"] == pytest.approx(1.0)
    assert b["max_score"] == pytest.approx(0.95)


def test_cross_cluster_edges_dropped_and_zero_edge_cluster(spark):
    # assignment splits {0,1,2} as {0,1} vs {2}: the 1-2 edge crosses
    assign = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id long, group_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.6)], "idx_a long, idx_b long, sim_score double"
    )
    got = {
        r["group_id"]: r.asDict()
        for r in cluster_stats(pairs, assign, "id").collect()
    }
    assert got[10]["n_edges"] == 1
    # cluster 20 has size 2 but no surviving edge: density 0, NULL scores
    assert got[20]["n_edges"] == 0
    assert got[20]["density"] == pytest.approx(0.0)
    assert got[20]["min_score"] is None


def test_scoreless_mode(spark):
    pairs, assign = _fixture(spark)
    got = cluster_stats(
        pairs.select("idx_a", "idx_b"), assign, "id", score_col=None
    ).collect()
    assert all(r["min_score"] is None for r in got)
    assert {r["group_id"]: r["density"] for r in got}[3] == pytest.approx(1.0)


def test_validation(spark):
    pairs, assign = _fixture(spark)
    with pytest.raises(KeyError):
        cluster_stats(pairs, assign.drop("group_id"), "id")
    with pytest.raises(KeyError):
        cluster_stats(pairs.drop("sim_score"), assign, "id")
    with pytest.raises(KeyError):
        cluster_stats(pairs, assign, "missing")
