"""Tests for extras/packing.py (token-budget sharding) and
extras/lm.py (unigram log-prob scoring)."""

import math

import pytest

from datamatch_spark.extras.lm import unigram_counts, unigram_logprob
from datamatch_spark.extras.packing import pack_greedy, pack_quota


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


DOCS = [
    (i, " ".join(["tok"] * n))
    for i, n in enumerate([40, 10, 500, 3, 120, 700, 60, 60, 60, 1, 5, 250])
]


def _greedy_ref(items, budget):
    """Independent scalar reimplementation of the first-fit rule."""
    out = {}
    running, shard = 0, 0
    for doc_id, tok in sorted(items):
        if running > 0 and running + tok > budget:
            shard += 1
            running = 0
        out[doc_id] = shard
        running += tok
    return out


def test_pack_greedy_matches_scalar_reference(spark):
    df = _docs(spark, DOCS)
    got = pack_greedy(df, 100, n_buckets=3).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r.bucket, []).append((r.doc_id, r.n_tokens))
    for b, items in by_bucket.items():
        ref = _greedy_ref(items, 100)
        for r in got:
            if r.bucket == b:
                assert r.shard == ref[r.doc_id], (b, r.doc_id)


def test_pack_greedy_budget_invariant(spark):
    df = _docs(spark, DOCS)
    got = pack_greedy(df, 100, n_buckets=2).collect()
    sums = {}
    sizes = {}
    for r in got:
        key = (r.bucket, r.shard)
        sums[key] = sums.get(key, 0) + r.n_tokens
        sizes[key] = sizes.get(key, 0) + 1
    for key, total in sums.items():
        # a shard only exceeds the budget when it is one oversized doc
        assert total <= 100 or sizes[key] == 1, (key, total, sizes[key])
    # shard ids are contiguous from 0 within each bucket
    per_bucket = {}
    for b, s in sums:
        per_bucket.setdefault(b, set()).add(s)
    for b, shards in per_bucket.items():
        assert shards == set(range(len(shards))), (b, shards)


def test_pack_quota_matches_cumsum(spark):
    df = _docs(spark, DOCS)
    got = pack_quota(df, 100, n_buckets=2).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r.bucket, []).append((r.doc_id, r.n_tokens, r.shard))
    for b, items in by_bucket.items():
        cum = 0
        for doc_id, tok, shard in sorted(items):
            assert shard == cum // 100, (b, doc_id)
            cum += tok


def test_pack_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")], ["doc_id", "text"]
    )
    for fn in (pack_quota, pack_greedy):
        rows = {r.doc_id: r for r in fn(df, 10, n_buckets=1).collect()}
        assert rows[1].n_tokens == 0  # NULL text -> 0 tokens, still packed
        assert rows[2].n_tokens == 1  # '' splits to [''] like token_count
        assert rows[3].n_tokens == 3
        assert len(rows) == 3


def test_pack_validation(spark):
    df = _docs(spark, DOCS[:2])
    with pytest.raises(ValueError):
        pack_quota(df, 0)
    with pytest.raises(ValueError):
        pack_greedy(df, 5, n_buckets=0)


def test_unigram_logprob_hand_computed(spark):
    # corpus: 'a a b' + 'a c' -> counts a:3 b:1 c:1, N=5
    df = _docs(spark, [(1, "a a b"), (2, "a c")])
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    n = 5.0
    lp1 = (2 * math.log(3 / n) + 1 * math.log(1 / n)) / 3
    lp2 = (math.log(3 / n) + math.log(1 / n)) / 2
    assert got[1].n_tokens == 3
    assert got[2].n_tokens == 2
    assert got[1].avg_logprob == pytest.approx(lp1, abs=1e-12)
    assert got[2].avg_logprob == pytest.approx(lp2, abs=1e-12)


def test_unigram_logprob_external_counts_oov(spark):
    model = _docs(spark, [(0, "x x y")])  # counts x:2 y:1, N=3
    df = _docs(spark, [(1, "x z")])  # z is OOV -> ln(0.5 / 3)
    got = unigram_logprob(
        df, counts=unigram_counts(model)
    ).collect()[0]
    expect = (math.log(2 / 3) + math.log(0.5 / 3)) / 2
    assert got.avg_logprob == pytest.approx(expect, abs=1e-12)


def test_unigram_logprob_skips_empty_docs(spark):
    df = spark.createDataFrame([(1, "a"), (2, ""), (3, None)], ["doc_id", "text"])
    ids = {r.doc_id for r in unigram_logprob(df).collect()}
    assert ids == {1}


def test_unigram_logprob_empty_model_raises(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        unigram_logprob(df)


def test_unigram_logprob_nonpositive_oov_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="oov_count"):
            unigram_logprob(df, oov_count=bad)


def test_chunk_documents_scalar_parity(spark):
    """Engine chunks == a python reference on mixed lengths, with and
    without overlap."""
    from datamatch_spark.extras.packing import chunk_documents

    def ref(text, max_tokens, overlap):
        t = text.split(" ")
        stride = max_tokens - overlap
        out = []
        for s in range(1, len(t) + 1, stride):
            if s != 1 and s + overlap > len(t):
                continue
            piece = t[s - 1 : s - 1 + max_tokens]
            out.append(((s - 1) // stride, " ".join(piece), len(piece)))
        return out

    rows = [
        (0, " ".join(f"w{i}" for i in range(25))),
        (1, " ".join(f"w{i}" for i in range(8))),  # single chunk
        (2, "only three tokens"),
        (3, ""),  # split('') -> one empty token -> one chunk
        (4, None),  # no chunks
        (5, " ".join(f"w{i}" for i in range(16))),  # exact multiple
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for max_tokens, overlap in [(8, 0), (8, 4), (5, 2), (1, 0)]:
        got = {
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(
                df, max_tokens=max_tokens, overlap=overlap
            ).collect()
        }
        want = {
            (d, ci, ct, nt)
            for d, text in rows
            if text is not None
            for ci, ct, nt in ref(text, max_tokens, overlap)
        }
        assert got == want, (max_tokens, overlap)


def test_chunk_documents_invariants(spark):
    """Every token is covered; consecutive chunks overlap by exactly
    `overlap` (except a shorter final chunk); reassembling stride
    prefixes reproduces the document."""
    from datamatch_spark.extras.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(103))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, max_tokens=16, overlap=5).collect(),
        key=lambda r: r["chunk_idx"],
    )
    stride = 16 - 5
    toks = []
    for r in rows:
        piece = r["chunk_text"].split(" ")
        assert len(piece) == r["n_tokens"] <= 16
        toks.extend(piece[: stride] if r is not rows[-1] else piece)
    assert " ".join(toks) == text
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"].split(" ")[stride:] == b["chunk_text"].split(" ")[:5]


def test_chunk_documents_validation(spark):
    from datamatch_spark.extras.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
