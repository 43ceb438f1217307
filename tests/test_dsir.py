"""extras/dsir.py: DSIR importance resampling — scalar-reference
parity (md5 path), self-scoring null result, determinism under
repartitioning, Gumbel top-k contracts, validation edges."""

from __future__ import annotations

import hashlib
import math

import pytest

from datamatch_spark.extras.dsir import (
    dsir_logweights,
    gumbel_topk,
    hashed_ngram_counts,
)

TARGET = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the dog barks at the quick fox"),
    (3, "lazy afternoons with a quick brown dog"),
]
RAW = [
    (10, "stock prices fell sharply on tuesday amid inflation fears"),
    (11, "the quick brown fox is a classic pangram sentence"),
    (12, "garbage tokens zzz qqq xxx vvv kkk jjj"),
    (13, "the lazy dog sleeps while the quick fox runs"),
    (14, ""),
    (15, "   "),
]
BUCKETS = 101  # small + prime: forces bucket collisions through the math
N_MAX = 2
ALPHA = 0.7


def _py_grams(text: str, n_max: int) -> list[str]:
    toks = [t for t in text.lower().split(" ") if t]
    out = []
    for n in range(1, n_max + 1):
        out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % BUCKETS


def _py_counts(rows) -> dict[int, int]:
    c: dict[int, int] = {}
    for _, text in rows:
        for g in _py_grams(text, N_MAX):
            b = _py_bucket(g)
            c[b] = c.get(b, 0) + 1
    return c


def _py_logweights(raw_rows, tgt_rows):
    ct, cr = _py_counts(tgt_rows), _py_counts(raw_rows)
    dt = sum(ct.values()) + ALPHA * BUCKETS
    dr = sum(cr.values()) + ALPHA * BUCKETS
    out = {}
    for doc_id, text in raw_rows:
        grams = _py_grams(text, N_MAX)
        if not grams:
            continue
        lw = 0.0
        for g in grams:
            b = _py_bucket(g)
            lw += math.log((ct.get(b, 0) + ALPHA) / dt) - math.log(
                (cr.get(b, 0) + ALPHA) / dr
            )
        out[doc_id] = (len(grams), lw)
    return out


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_logweights_match_scalar_reference(spark):
    raw, tgt = _dfs(spark)
    got = {
        r.doc_id: r
        for r in dsir_logweights(
            raw,
            hashed_ngram_counts(tgt, n_max=N_MAX, buckets=BUCKETS, hash_fn="md5"),
            n_max=N_MAX,
            buckets=BUCKETS,
            alpha=ALPHA,
            hash_fn="md5",
        ).collect()
    }
    want = _py_logweights(RAW, TARGET)
    assert set(got) == set(want)  # empty/whitespace docs absent
    for doc_id, (n_feats, lw) in want.items():
        assert got[doc_id].n_feats == n_feats
        assert got[doc_id].log_weight == pytest.approx(lw, abs=1e-9)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_self_scoring_is_zero(spark, hash_fn):
    """target model == raw model => every term's log-ratio is 0."""
    raw, _ = _dfs(spark)
    counts = hashed_ngram_counts(raw, buckets=BUCKETS, hash_fn=hash_fn)
    for r in dsir_logweights(
        raw, counts, counts, buckets=BUCKETS, hash_fn=hash_fn
    ).collect():
        assert r.log_weight == pytest.approx(0.0, abs=1e-9)


def test_layout_invariance(spark):
    raw, tgt = _dfs(spark)
    kw = dict(n_max=N_MAX, buckets=BUCKETS, alpha=ALPHA, hash_fn="md5")
    tc = hashed_ngram_counts(tgt, n_max=N_MAX, buckets=BUCKETS, hash_fn="md5")
    base = dsir_logweights(raw, tc, **kw)
    resh = dsir_logweights(raw.repartition(7), tc, **kw)
    a = sorted((r.doc_id, r.n_feats, round(r.log_weight, 9)) for r in base.collect())
    b = sorted((r.doc_id, r.n_feats, round(r.log_weight, 9)) for r in resh.collect())
    assert a == b
    s1 = sorted(r.doc_id for r in gumbel_topk(base, 2, salt="s").collect())
    s2 = sorted(r.doc_id for r in gumbel_topk(resh.repartition(5), 2, salt="s").collect())
    assert s1 == s2


def test_gumbel_topk_contracts(spark):
    raw, tgt = _dfs(spark)
    tc = hashed_ngram_counts(tgt, n_max=N_MAX, buckets=BUCKETS, hash_fn="md5")
    w = dsir_logweights(raw, tc, n_max=N_MAX, buckets=BUCKETS, hash_fn="md5")
    n = w.count()
    # k >= n returns everything; gumbel_key matches the scalar formula
    allrows = gumbel_topk(w, k=n + 5, salt="z").collect()
    assert len(allrows) == n
    for r in allrows:
        u = (int(hashlib.md5(f"z\x1f{r.doc_id}".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        assert r.gumbel_key == pytest.approx(
            r.log_weight + -math.log(-math.log(u)), abs=1e-9
        )
    # a huge weight dominates any gumbel draw (noise spread ~ tens)
    boosted = w.withColumn(
        "log_weight",
        w.log_weight + (w.doc_id == 12).cast("double") * 1e6,
    )
    assert 12 in {r.doc_id for r in gumbel_topk(boosted, 1, salt="any").collect()}
    # different salts redraw: keys change
    k1 = {r.doc_id: r.gumbel_key for r in gumbel_topk(w, n, salt="a").collect()}
    k2 = {r.doc_id: r.gumbel_key for r in gumbel_topk(w, n, salt="b").collect()}
    assert any(k1[d] != k2[d] for d in k1)


def test_validation_edges(spark):
    raw, tgt = _dfs(spark)
    tc = hashed_ngram_counts(tgt, buckets=BUCKETS, hash_fn="md5")
    with pytest.raises(ValueError, match="alpha"):
        dsir_logweights(raw, tc, alpha=0.0, buckets=BUCKETS, hash_fn="md5")
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_ngram_counts(raw, hash_fn="sha1")
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_counts(raw, buckets=0)
    with pytest.raises(ValueError, match="n_max"):
        hashed_ngram_counts(raw, n_max=0)
    with pytest.raises(ValueError, match="k must be"):
        gumbel_topk(raw.withColumn("log_weight", raw.doc_id * 0.0), 0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="target model is empty"):
        dsir_logweights(
            raw, hashed_ngram_counts(empty, buckets=BUCKETS), buckets=BUCKETS
        )
