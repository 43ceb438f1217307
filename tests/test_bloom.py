"""Bloom-filter decontamination (extras/bloom.py): position parity vs
hashlib, distributed build vs a naive local bitset, superset-of-exact
semantics, edge cases, and parameter validation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from datamatch_spark.extras.bloom import (
    BloomFilter,
    _positions_array,
    bloom_decontaminate,
    bloom_positions,
    build_bloom,
)
from datamatch_spark.extras.decontam import decontaminate

M = 1 << 12  # small filter so collisions/FPs are reachable in tests
K = 4


def _py_positions(gram: str, m_bits: int, k: int) -> list[int]:
    h = hashlib.md5(gram.encode()).hexdigest()
    return [int(h[8 * j : 8 * j + 8], 16) % m_bits for j in range(k)]


def _words(rng: np.random.RandomState, n: int) -> str:
    vocab = [f"w{i}" for i in range(40)]
    return " ".join(vocab[i] for i in rng.randint(0, len(vocab), n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(7)
    rows = [(i, _words(rng, int(rng.randint(3, 30)))) for i in range(120)]
    # inject exact-overlap docs so exact contamination is non-empty
    rows += [(200 + i, rows[i][1]) for i in range(6)]
    rows += [(300, None), (301, "a b"), (302, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positions_match_hashlib(spark):
    grams = ["a b c d e", "the quick brown fox jumps", "x y z w v"]
    df = spark.createDataFrame([(g,) for g in grams], "gram string").select(
        F.col("gram"), *bloom_positions(F.col("gram"), M, K)
    )
    for row in df.collect():
        assert [row[f"p{j}"] for j in range(K)] == _py_positions(row["gram"], M, K)
    # the fused single-digest array form must agree with the reference
    arr = spark.createDataFrame([(g,) for g in grams], "gram string").select(
        F.col("gram"), _positions_array("gram", M, K).alias("ps")
    )
    for row in arr.collect():
        assert list(row["ps"]) == _py_positions(row["gram"], M, K)


def test_build_matches_naive_bitset(spark, corpus):
    ev = corpus.where(F.col("doc_id") % 5 == 0)
    bloom = build_bloom(ev, n=3, m_bits=M, k=K)
    # naive: collect gram strings, hash locally
    grams = [
        r["g"]
        for r in ev.select(
            F.explode(
                F.expr(
                    "case when size(split(text,' ')) < 3 then array() else "
                    "array_distinct(transform(sequence(1, size(split(text,' '))-2),"
                    " i -> concat_ws(' ', slice(split(text,' '), i, 3)))) end"
                )
            ).alias("g")
        ).collect()
    ]
    want = np.zeros(M // 8, dtype=np.uint8)
    for g in set(grams):
        for p in _py_positions(g, M, K):
            want[p >> 3] |= np.uint8(1 << (p & 7))
    assert np.array_equal(bloom.bits, want)
    assert bloom.n_set == int(np.unpackbits(want).sum())
    assert 0.0 < bloom.fill_ratio < 1.0
    assert bloom.fp_rate == pytest.approx(bloom.fill_ratio**K)


def test_superset_of_exact(spark, corpus):
    ev = corpus.where(F.col("doc_id") % 5 == 0)
    tr = corpus.where(F.col("doc_id") % 5 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(tr, ev, n=3, hash_grams=False).collect()
        if r["contaminated"]
    }
    bl = bloom_decontaminate(tr, ev, n=3, m_bits=M, k=K)
    rows = {r["doc_id"]: r for r in bl.collect()}
    flagged = {d for d, r in rows.items() if r["contaminated"]}
    assert exact, "fixture must produce exact contamination"
    assert exact <= flagged
    # every train row present, counts bound the exact hit counts
    assert set(rows) == {r["doc_id"] for r in tr.select("doc_id").collect()}
    exact_counts = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in decontaminate(tr, ev, n=3, hash_grams=False).collect()
    }
    for d, r in rows.items():
        assert r["n_flagged_ngrams"] >= exact_counts[d]


def test_empty_eval_flags_nothing(spark, corpus):
    ev = corpus.where(F.lit(False))
    tr = corpus.limit(10)
    out = bloom_decontaminate(tr, ev, n=3, m_bits=M, k=K).collect()
    assert len(out) == 10
    assert all(not r["contaminated"] and r["n_flagged_ngrams"] == 0 for r in out)


def test_short_and_null_docs_not_flagged(spark, corpus):
    ev = corpus.where(F.col("doc_id") % 5 == 0)
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(
            corpus.where(F.col("doc_id") >= 300), ev, n=3, m_bits=M, k=K
        ).collect()
    }
    assert set(out) == {300, 301, 302}
    assert all(not r["contaminated"] for r in out.values())


def test_prebuilt_filter_reuse_and_mismatch(spark, corpus):
    ev = corpus.where(F.col("doc_id") % 5 == 0)
    tr = corpus.where(F.col("doc_id") % 5 != 0)
    bloom = build_bloom(ev, n=3, m_bits=M, k=K)
    a = sorted(
        bloom_decontaminate(tr, bloom, n=3, m_bits=M, k=K).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        bloom_decontaminate(tr, ev, n=3, m_bits=M, k=K).collect(),
        key=lambda r: r["doc_id"],
    )
    assert a == b
    with pytest.raises(ValueError, match="prebuilt filter"):
        bloom_decontaminate(tr, bloom, n=3, m_bits=M * 2, k=K)


def test_param_validation(spark, corpus):
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(corpus, n=3, m_bits=M, k=5)
    with pytest.raises(ValueError, match="m_bits"):
        build_bloom(corpus, n=3, m_bits=4, k=2)
    with pytest.raises(ValueError, match="2\\^32"):
        build_bloom(corpus, n=3, m_bits=(1 << 32) + 8, k=2)
    assert isinstance(
        BloomFilter(np.zeros(1, np.uint8), 8, 1, 0).fp_rate, float
    )
