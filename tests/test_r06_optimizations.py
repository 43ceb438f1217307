"""Focused pins for the round-6 optimization internals:

* merged grouped scorer: groups spanning Arrow batch boundaries are
  carried whole (results independent of arrow batch size, and equal to
  the join path bit-for-bit);
* bucket-grouped MinHash verify: results independent of arrow batch
  size (carry logic) and of the first-band gate (equal to brute-force
  jaccard over LSH-candidate pairs);
* DateSimilarity factorized batch: golden values incl. mixed/garbage
  strings, NaT and swapped month/day;
* driver connected components: numpy label propagation == union-find
  on graphs with duplicate edges, self-loops and string ids.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from datamatch_spark import (
    ColumnsIndex,
    JaroWinklerSimilarity,
    StringSimilarity,
    ThresholdMatcher,
)
from datamatch_spark.pairing import PairingConfig


@pytest.fixture
def tiny_arrow_batches(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")  # groups of 10+ MUST span batches
    yield spark
    spark.conf.set(key, old)


def _er_scores(spark, grouped):
    rows = [
        (i, f"b{i % 4}", ["smith", "smyth", "jones", None][i % 4] and
         f"{['smith', 'smyth', 'jones', 'jon'][i % 4]}{i % 3}",
         f"f{i % 5}")
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "row_key long, blk string, last string, first string"
    )
    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": StringSimilarity()},
        df, row_key="row_key", validate=False,
        pairing_config=PairingConfig(grouped_scoring=grouped), defer=True,
    )
    return {
        (r["idx_a"], r["idx_b"]): r["sim_score"]
        for r in m._build_scored().collect()
    }


def test_merged_scorer_survives_batch_boundaries(tiny_arrow_batches):
    spark = tiny_arrow_batches
    got = _er_scores(spark, True)
    want = _er_scores(spark, False)
    assert set(got) == set(want) and len(got) > 400
    for k, v in want.items():
        g = got[k]
        assert (g == v) or (math.isnan(g) and math.isnan(v)), (k, g, v)


def test_minhash_bucket_kernel_survives_batch_boundaries(tiny_arrow_batches):
    spark = tiny_arrow_batches
    from datamatch_spark.extras import dedup as D

    texts = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(40):
        words = base.split()
        if i % 3 == 0:
            words[-1] = f"tail{i}"
        texts.append((i, " ".join(words)))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["idx_a"], r["idx_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=16, threshold=0.5
        ).collect()
    }
    # brute-force exact jaccard restricted to LSH-candidate pairs of
    # the SAME banding (threshold semantics incl. the est prefilter are
    # covered by test_minhash_verification_matches_bruteforce; here we
    # pin that tiny Arrow batches change nothing)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
    want = {
        (r["idx_a"], r["idx_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=16, threshold=0.5
        ).collect()
    }
    assert got == want and got


def test_minhash_first_band_gate_emits_each_pair_once(spark):
    from datamatch_spark.extras import dedup as D

    # near-identical docs collide in EVERY band; without the
    # first-band gate (and with no output dedup) each pair would
    # appear once per band
    rows = [(i, "one two three four five six seven eight") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.minhash_lsh_pairs(df, "doc_id", n=2, n_perm=16, threshold=0.9)
    pairs = [(r["idx_a"], r["idx_b"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs)) == 12 * 11 // 2


def test_date_similarity_factorized_golden():
    from datamatch_spark.similarities import DateSimilarity

    ds = DateSimilarity()
    a = pd.Series(
        [
            dt.date(2000, 1, 1),          # 10 days apart -> stage 1
            dt.date(2000, 9, 2),          # month/day swap -> stage 2
            dt.date(2000, 5, 4),          # same year+day -> stage 3
            None,                          # null -> 0 after nan_to_num
            "2001-07-09",                 # string dates parse
            "garbage",                    # unparseable -> 0
            dt.date(1999, 12, 31),        # cross-year near -> stage 1
        ],
        dtype=object,
    )
    b = pd.Series(
        [
            dt.date(2000, 1, 11),
            dt.date(2000, 2, 9),
            dt.date(2000, 9, 4),
            dt.date(2000, 1, 1),
            "2001-07-29",
            "2001-07-29",
            dt.date(2000, 1, 5),
        ],
        dtype=object,
    )
    got = ds.batch(a, b)
    exp = [
        1.0 - 10 / 30,
        0.5,
        # lev ratio of '20000504' vs '20000904' = 2*7/16
        2.0 * 7 / 16,
        0.0,
        1.0 - 20 / 30,
        0.0,
        1.0 - 5 / 30,
    ]
    assert np.allclose(got, exp, rtol=0, atol=0), (got, exp)
    # scalar face agrees on the date-typed rows
    assert got[0] == ds.sim(a[0], b[0])
    assert got[2] == ds.sim(a[2], b[2])


def test_driver_cc_matches_union_find(spark):
    from datamatch_spark.clustering import connected_components

    rng = np.random.RandomState(11)
    edges = [(int(rng.randint(300)), int(rng.randint(300))) for _ in range(500)]
    edges += [(5, 5), (7, 7)]           # self-loops dropped
    edges += edges[:50]                  # duplicate edges harmless
    df = spark.createDataFrame(edges, "idx_a long, idx_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in parent}
    assert got == want

    sdf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "idx_a string, idx_b string"
    )
    got_s = {
        r["node"]: r["component"] for r in connected_components(sdf).collect()
    }
    assert got_s == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_checkpoint_storage_level_default_and_override(monkeypatch):
    """Checkpoint level defaults to Spark's own (deserialized) — the
    serialized variant lost an interleaved same-JVM wall-time A/B by
    30-60% despite far lower GC task-seconds — and the env override
    (DISK_ONLY for heap-capped clusters) must be honored."""
    from pyspark.storagelevel import StorageLevel

    from datamatch_spark.session import checkpoint_storage_level

    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_LEVEL", raising=False)
    lvl = checkpoint_storage_level()
    assert lvl == StorageLevel.MEMORY_AND_DISK_DESER
    assert lvl.useDisk  # must spill, never evict a truncated lineage

    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_LEVEL", "DISK_ONLY")
    assert checkpoint_storage_level() == StorageLevel.DISK_ONLY


def test_materialized_scored_pairs_honors_level_env(spark, monkeypatch):
    """The matcher's scored-pairs checkpoint takes its storage level
    from the env knob (the wiring, not just the helper)."""
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_LEVEL", "MEMORY_AND_DISK")
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    rows = [(i, "smith", "ann") for i in range(6)]
    df = spark.createDataFrame(rows, "row_key long, last string, first string")
    m = ThresholdMatcher(
        ColumnsIndex("last"),
        {"first": JaroWinklerSimilarity()},
        df,
        validate=False,
    )
    m.scored_pairs.count()
    jlevels = [
        rdd.getStorageLevel()
        for rid, rdd in spark.sparkContext._jsc.getPersistentRDDs().items()
        if rid not in before
    ]
    assert jlevels, "scored_pairs localCheckpoint should persist an RDD"
    assert all(not lv.deserialized() for lv in jlevels), (
        "env knob must reach the checkpointed blocks: " + str(jlevels)
    )
