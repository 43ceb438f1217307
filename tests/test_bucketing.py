"""Bucketed keyed-side tables: the blocked pair join must read the
buckets co-located — NO Exchange in the plan — and produce the exact
same pair set as the runtime (shuffling) path."""

import pytest
from pyspark.sql import functions as F

from datamatch_spark import ColumnsIndex
from datamatch_spark.bucketing import (
    bucketed_candidate_pairs,
    save_bucketed_keyed_side,
)
from datamatch_spark.pairing import candidate_pairs, keyed_side


@pytest.fixture()
def warehouse(spark, tmp_path):
    # in-memory catalog writes to spark.sql.warehouse.dir; point table
    # paths at tmp explicitly instead of relying on session-level conf
    return str(tmp_path)


def test_bucketed_dedup_join_is_exchange_free_and_exact(spark, warehouse):
    rows = [(i, f"g{i % 13}", i * 10) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    side = keyed_side(df, ColumnsIndex("g"), "id", ["v"], "idx", "rec")
    spark.sql("DROP TABLE IF EXISTS keyed_t")
    save_bucketed_keyed_side(side, "keyed_t", n_buckets=8, path=f"{warehouse}/keyed_t")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        pairs = bucketed_candidate_pairs(spark, "keyed_t")
        plan = pairs._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning" not in plan, plan  # no shuffle exchange
    got = {(r["idx_a"], r["idx_b"]) for r in pairs.collect()}
    want = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(df, ColumnsIndex("g"), "id", ["v"]).collect()
    }
    assert got == want
    spark.sql("DROP TABLE keyed_t")


def test_bucketed_match_join_is_exchange_free_and_exact(spark, warehouse):
    rows_a = [(i, f"g{i % 7}", i) for i in range(0, 100, 2)]
    rows_b = [(i, f"g{i % 7}", i) for i in range(1, 100, 2)]
    dfa = spark.createDataFrame(rows_a, "id long, g string, v long")
    dfb = spark.createDataFrame(rows_b, "id long, g string, v long")
    sa = keyed_side(dfa, ColumnsIndex("g"), "id", ["v"], "idx", "rec")
    sb = keyed_side(dfb, ColumnsIndex("g"), "id", ["v"], "idx", "rec")
    for t in ("keyed_a", "keyed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    save_bucketed_keyed_side(sa, "keyed_a", n_buckets=4, path=f"{warehouse}/ka")
    save_bucketed_keyed_side(sb, "keyed_b", n_buckets=4, path=f"{warehouse}/kb")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        pairs = bucketed_candidate_pairs(spark, "keyed_a", "keyed_b")
        plan = pairs._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning" not in plan, plan  # no shuffle exchange
    got = {(r["idx_a"], r["idx_b"]) for r in pairs.collect()}
    want = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(dfa, ColumnsIndex("g"), "id", ["v"], dfb=dfb).collect()
    }
    assert got == want
    for t in ("keyed_a", "keyed_b"):
        spark.sql(f"DROP TABLE {t}")


def test_multi_bucket_flag_persisted_and_deduped(spark, warehouse):
    # multi-bucket index (index_elements=True): each row lands in one
    # bucket per array element, so pairs sharing >1 element would
    # duplicate without the persisted-flag dedup.
    rows = [(i, [f"t{i % 5}", f"t{(i + 1) % 5}"], i) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, toks array<string>, v long")
    idx = ColumnsIndex("toks", index_elements=True)
    side = keyed_side(df, idx, "id", ["v"], "idx", "rec")
    spark.sql("DROP TABLE IF EXISTS keyed_mb")
    save_bucketed_keyed_side(
        side, "keyed_mb", n_buckets=4, path=f"{warehouse}/kmb",
        multi_bucket=idx.multi_bucket,
    )
    pairs = bucketed_candidate_pairs(spark, "keyed_mb")  # default: read flag
    got = [(r["idx_a"], r["idx_b"]) for r in pairs.collect()]
    assert len(got) == len(set(got)), "duplicate pairs despite persisted flag"
    want = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(df, idx, "id", ["v"]).collect()
    }
    assert set(got) == want
    # explicit override still wins
    raw = bucketed_candidate_pairs(spark, "keyed_mb", dedupe_multi_bucket=False)
    assert raw.count() > len(got)
    spark.sql("DROP TABLE keyed_mb")


def test_matcher_accepts_bucketed_keyed_tables(spark, warehouse):
    """End-to-end ThresholdMatcher over a pre-bucketed keyed side:
    scored pairs identical to the runtime path, and the candidate join
    in the plan has no shuffle exchange."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ThresholdMatcher

    rows = [(i, f"g{i % 11}", float(i % 97)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    idx = ColumnsIndex("g")
    side = keyed_side(df, idx, "id", ["v"], "idx", "rec")
    spark.sql("DROP TABLE IF EXISTS keyed_m")
    save_bucketed_keyed_side(side, "keyed_m", n_buckets=8, path=f"{warehouse}/km")
    scorer = {"v": AbsoluteNumericalSimilarity(100)}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        m = ThresholdMatcher(
            idx, scorer, df, row_key="id", validate=False, defer=True,
            keyed_tables="keyed_m",
        )
        plan = m._build_scored()._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "hashpartitioning" not in plan, plan
        got = {
            (r["idx_a"], r["idx_b"], round(r["sim_score"], 9))
            for r in m.scored_pairs.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    base = ThresholdMatcher(idx, scorer, df, row_key="id", validate=False)
    want = {
        (r["idx_a"], r["idx_b"], round(r["sim_score"], 9))
        for r in base.scored_pairs.collect()
    }
    assert got == want
    # missing scorer column is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lacks"):
        ThresholdMatcher(
            idx, {"missing_col": AbsoluteNumericalSimilarity(1)}, df,
            row_key="id", validate=False, defer=True, keyed_tables="keyed_m",
        )._build_scored()
    spark.sql("DROP TABLE keyed_m")


def test_matcher_validates_all_keyed_tables(spark, warehouse):
    """Match mode: a needed rec column missing from the SECOND keyed
    table must raise the loud ValueError up front, not surface later
    as an opaque AnalysisException inside the pair join."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ThresholdMatcher

    rows_a = [(i, f"g{i % 5}", float(i)) for i in range(50)]
    rows_b = [(i + 1000, f"g{i % 5}", float(i)) for i in range(50)]
    dfa = spark.createDataFrame(rows_a, "id long, g string, v double")
    dfb = spark.createDataFrame(rows_b, "id long, g string, v double")
    idx = ColumnsIndex("g")
    sa = keyed_side(dfa, idx, "id", ["v"], "idx", "rec")
    sb = keyed_side(dfb, idx, "id", ["g"], "idx", "rec")  # rec lacks v
    spark.sql("DROP TABLE IF EXISTS keyed_va")
    spark.sql("DROP TABLE IF EXISTS keyed_vb")
    save_bucketed_keyed_side(sa, "keyed_va", n_buckets=4, path=f"{warehouse}/kva")
    save_bucketed_keyed_side(sb, "keyed_vb", n_buckets=4, path=f"{warehouse}/kvb")
    try:
        with pytest.raises(ValueError, match="keyed_vb.*lacks"):
            ThresholdMatcher(
                idx, {"v": AbsoluteNumericalSimilarity(10)}, dfa, dfb=dfb,
                row_key="id", validate=False, defer=True,
                keyed_tables=("keyed_va", "keyed_vb"),
            )._build_scored()
    finally:
        spark.sql("DROP TABLE keyed_va")
        spark.sql("DROP TABLE keyed_vb")


def test_bucketed_grouped_dedup_zero_exchange_and_parity(spark, warehouse):
    """Grouped scoring off a bucketed table: ZERO exchanges in the plan
    (bucket HashPartitioning satisfies the group clustering) and
    bit-identical scores vs the bucketed JOIN path."""
    from datamatch_spark import JaroWinklerSimilarity, ThresholdMatcher
    from datamatch_spark.pairing import PairingConfig

    rows = [(i, f"g{i % 7}", f"n{i % 19}", f"f{i % 11}") for i in range(250)]
    df = spark.createDataFrame(rows, "id long, g string, last string, first string")
    side = keyed_side(df, ColumnsIndex("g"), "id", ["last", "first"], "idx", "rec")
    spark.sql("DROP TABLE IF EXISTS keyed_gb")
    save_bucketed_keyed_side(side, "keyed_gb", n_buckets=8, path=f"{warehouse}/keyed_gb")
    sims = {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()}

    def build(grouped):
        m = ThresholdMatcher(
            ColumnsIndex("g"), sims, df, row_key="id", validate=False,
            keyed_tables="keyed_gb", defer=True,
            pairing_config=PairingConfig(grouped_scoring=grouped),
        )
        return m._build_scored()

    scored = build(True)
    plan = scored._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning" not in plan, plan  # ZERO exchanges
    got = {(r["idx_a"], r["idx_b"]): r["sim_score"] for r in scored.collect()}
    want = {
        (r["idx_a"], r["idx_b"]): r["sim_score"] for r in build(False).collect()
    }
    assert got == want and len(got) > 1000
    spark.sql("DROP TABLE keyed_gb")


def test_bucketed_grouped_match_parity(spark, warehouse):
    from datamatch_spark import JaroWinklerSimilarity, ThresholdMatcher
    from datamatch_spark.pairing import PairingConfig

    rows_a = [(i, f"g{i % 5}", f"n{i % 13}") for i in range(120)]
    rows_b = [(j + 500, f"g{j % 5}", f"n{j % 17}") for j in range(80)]
    dfa = spark.createDataFrame(rows_a, "id long, g string, last string")
    dfb = spark.createDataFrame(rows_b, "id long, g string, last string")
    sa = keyed_side(dfa, ColumnsIndex("g"), "id", ["last"], "idx", "rec")
    sb = keyed_side(dfb, ColumnsIndex("g"), "id", ["last"], "idx", "rec")
    spark.sql("DROP TABLE IF EXISTS keyed_ga")
    spark.sql("DROP TABLE IF EXISTS keyed_gbm")
    save_bucketed_keyed_side(sa, "keyed_ga", n_buckets=4, path=f"{warehouse}/keyed_ga")
    save_bucketed_keyed_side(sb, "keyed_gbm", n_buckets=4, path=f"{warehouse}/keyed_gbm")
    sims = {"last": JaroWinklerSimilarity()}

    def build(grouped):
        m = ThresholdMatcher(
            ColumnsIndex("g"), sims, dfa, dfb, row_key="id", validate=False,
            keyed_tables=("keyed_ga", "keyed_gbm"), defer=True,
            pairing_config=PairingConfig(grouped_scoring=grouped),
        )
        return m._build_scored()

    scored = build(True)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # r6: bucketed MATCH mode repartitions by block and so uses the
    # merged MapInPandas scorer (dedup keeps FlatMapGroupsInPandas)
    assert "score_partition" in plan
    got = {(r["idx_a"], r["idx_b"]): r["sim_score"] for r in scored.collect()}
    want = {
        (r["idx_a"], r["idx_b"]): r["sim_score"] for r in build(False).collect()
    }
    assert got == want and len(got) > 1000
    assert all(a < 500 <= b for a, b in got)
    spark.sql("DROP TABLE keyed_ga")
    spark.sql("DROP TABLE keyed_gbm")
