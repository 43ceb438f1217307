"""Physical-plan regression guards: the optimizations this engine
depends on must stay visible in the plan (a future change that
reintroduces an explode, an aggregation shuffle, or an IN-list hot-key
filter would silently wreck the 100×-scale story long before any
correctness test notices)."""

from pyspark.sql import functions as F

from datamatch_spark import (
    ColumnsIndex,
    JaroWinklerSimilarity,
    Swap,
    ThresholdMatcher,
)
from datamatch_spark.pairing import PairingConfig, candidate_pairs


def _formatted(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_swap_plan_has_no_explode_or_agg_exchange(spark):
    rows = [(i, f"l{i % 5}", f"f{i % 7}", f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "row_key long, last string, first string, g string")
    sims = {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()}
    # join path (grouped off): the fused swap UDF must not regress to
    # exploding 4 variants + a per-pair max aggregate
    m = ThresholdMatcher(
        ColumnsIndex("g"), sims, df,
        variator=Swap("first", "last"), validate=False, defer=True,
        pairing_config=PairingConfig(grouped_scoring=False),
    )
    plan = _formatted(m._build_scored())
    assert "Generate" not in plan  # no explode
    assert "HashAggregate" not in plan  # no per-pair max shuffle

    # grouped path: swap scoring stays inside ONE FlatMapGroupsInPandas
    # (the only Generate allowed is the grid-cell membership explode;
    # a per-pair max aggregate must never appear)
    mg = ThresholdMatcher(
        ColumnsIndex("g"), sims, df,
        variator=Swap("first", "last"), validate=False, defer=True,
    )
    plan_g = _formatted(mg._build_scored())
    assert "score_partition" in plan_g  # r6: merged MapInPandas scorer
    assert "ArrowEvalPython" not in plan_g  # no second scoring UDF pass


def test_salted_pairing_uses_broadcast_anti_join(spark):
    rows = [(i, "hot" if i < 300 else f"g{i % 23}") for i in range(600)]
    df = spark.createDataFrame(rows, "row_key long, g string")
    pairs = candidate_pairs(
        df,
        ColumnsIndex("g"),
        "row_key",
        ["g"],
        cfg=PairingConfig(salt_threshold=100, rows_per_shard=50),
    )
    plan = _formatted(pairs)
    assert "LeftAnti" in plan
    # the cold-side split must not be an IN-list literal over hot keys
    assert "g IN (" not in plan and "block_key IN" not in plan


def test_parquet_scan_pushdown(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _formatted(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_salted_hot_join_no_triangular_partitioning(spark):
    """Both salted regimes must avoid triangular per-target load (a
    measured 40x-median straggler): broadcast regime — the hot side is
    broadcast and the explicit left repartition carries __shard_l;
    big-hot regime — the JOIN KEY itself carries the shard pair, so
    even a SortMergeJoin exchange partitions by uniform cells. Both
    regimes must emit the identical pair set as unsalted."""
    import re

    rows = [(i, "hot" if i < 80 else f"c{i % 7}") for i in range(120)]
    df = spark.createDataFrame(rows, "row_key long, blk string")

    def pairs_with(cfg):
        return candidate_pairs(df, ColumnsIndex("blk"), "row_key", [], cfg=cfg)

    bc = pairs_with(PairingConfig(salt_threshold=20, rows_per_shard=10))
    plan = _formatted(bc)
    assert "BroadcastHashJoin" in plan
    reparts = [
        m for m in re.findall(r"hashpartitioning\([^)]*\)", plan)
        if "__tgt" in m
    ]
    assert reparts and all("__shard_l" in m for m in reparts), reparts

    big = pairs_with(PairingConfig(salt_threshold=20, rows_per_shard=10,
                                   broadcast_hot_rows=0))
    plan_big = _formatted(big)
    for m in re.findall(r"hashpartitioning\([^)]*__tgt[^)]*\)", plan_big):
        assert "__shard_l" in m, (m, plan_big)

    want = {
        (r["idx_a"], r["idx_b"])
        for r in pairs_with(PairingConfig(salt_enabled=False)).collect()
    }
    assert {(r["idx_a"], r["idx_b"]) for r in bc.collect()} == want
    assert {(r["idx_a"], r["idx_b"]) for r in big.collect()} == want


def test_wide_rec_disables_hot_broadcast(spark):
    """The broadcast-vs-replicate decision is byte-aware: a wide rec
    struct (long text columns) must flip the salted join into the
    shard-pair SMJ regime even when the ROW count looks broadcastable
    — 1M wide rows can be multi-GB. Pair set stays identical."""
    from datamatch_spark.pairing import _est_row_bytes

    rows = [
        (i, "hot" if i < 80 else f"c{i % 7}", "x" * 50)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "row_key long, blk string, text string")

    def pairs_with(cfg):
        return candidate_pairs(df, ColumnsIndex("blk"), "row_key", ["text"], cfg=cfg)

    # row cap generous, byte cap tiny -> no broadcast of the hot side;
    # the join key must carry the shard pair (no triangular targets)
    cfg = PairingConfig(salt_threshold=20, rows_per_shard=10,
                        broadcast_hot_rows=10**9, broadcast_hot_bytes=64)
    plan = _formatted(pairs_with(cfg))
    import re
    tgt_joins = re.findall(r"hashpartitioning\([^)]*__tgt[^)]*\)", plan)
    assert tgt_joins and all("__shard_l" in m for m in tgt_joins), plan

    want = {
        (r["idx_a"], r["idx_b"])
        for r in pairs_with(PairingConfig(salt_enabled=False)).collect()
    }
    got = {(r["idx_a"], r["idx_b"]) for r in pairs_with(cfg).collect()}
    assert got == want

    # static width estimate: struct<text:string> ~ 48+8; sanity-check
    # the estimator orders types correctly
    from pyspark.sql import types as T
    assert _est_row_bytes(T.StringType()) > _est_row_bytes(T.LongType())
    wide = T.StructType([T.StructField("t", T.StringType())] * 20)
    narrow = T.StructType([T.StructField("v", T.IntegerType())])
    assert _est_row_bytes(wide) > 10 * _est_row_bytes(narrow)


def test_match_salting_grid_shards_both_sides(spark):
    """Asymmetric hot match block (tiny A side, large B side): sharding
    only A cannot bound per-task pairs (~nb pairs in one task); the
    grid puts BOTH shard ids in the join key. Pair set identical to
    unsalted."""
    import re

    rows_a = [(i, "hot" if i < 6 else f"c{i % 5}") for i in range(30)]
    rows_b = [(1000 + i, "hot" if i < 300 else f"c{i % 5}") for i in range(400)]
    dfa = spark.createDataFrame(rows_a, "row_key long, blk string")
    dfb = spark.createDataFrame(rows_b, "row_key long, blk string")

    def pairs_with(cfg):
        return candidate_pairs(
            dfa, ColumnsIndex("blk"), "row_key", [], dfb=dfb, cfg=cfg
        )

    cfg = PairingConfig(salt_threshold=10, rows_per_shard=20)
    salted = pairs_with(cfg)
    plan = _formatted(salted)
    grid = re.findall(r"hashpartitioning\([^)]*__ia[^)]*\)", plan)
    assert grid and all("__ib" in m for m in grid), plan
    want = {
        (r["idx_a"], r["idx_b"])
        for r in pairs_with(PairingConfig(salt_enabled=False)).collect()
    }
    got = {(r["idx_a"], r["idx_b"]) for r in salted.collect()}
    assert got == want and len(want) == 6 * 300 + 24 * 20


def test_dedup_self_join_shuffles_corpus_once(spark):
    """The dedup self-join must shuffle the keyed corpus ONCE: a single
    upfront hash-partition on block_key that the stats agg and BOTH
    join children share (ReusedExchange / AQE stage reuse). A second
    REPARTITION exchange in the final plan means the corpus is being
    shuffled twice per pairing run — the regression this guards."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = candidate_pairs(
        docs, ColumnsIndex("lang"), "doc_id", ["lang"],
        cfg=PairingConfig(salt_enabled=False),
    )
    qe = pairs._jdf.queryExecution()
    qe.executedPlan().execute().count()  # materialize THIS plan tree (AQE final)
    final = qe.executedPlan().toString().split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final
    live = [
        ln for ln in final.splitlines()
        if "REPARTITION_BY_NUM" in ln and "ReusedExchange" not in ln
    ]
    assert len(live) == 1, final


def test_hot_key_tables_are_jvm_literals(spark):
    """Salted-path hot-key tables must be JVM literal plans, not
    pickled-Python RDDs: a `Scan ExistingRDD` for a 50-row hot list
    spins up a Python worker on every executor core — a measured
    multi-second anti-scaling constant in every salted join."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = candidate_pairs(
        docs, ColumnsIndex("lang"), "doc_id", ["lang"],
        cfg=PairingConfig(salt_threshold=50, rows_per_shard=25),
    )
    plan = _formatted(pairs)
    assert "LeftAnti" in plan  # the salted split is active
    assert "ExistingRDD" not in plan, plan
