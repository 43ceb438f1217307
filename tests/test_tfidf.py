"""TF-IDF cosine similarity join: independent-reimplementation parity
(numpy brute force), prefix-filter losslessness, and edge cases."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datamatch_spark.extras.tfidf import tfidf_cosine_pairs, tfidf_postings


def _brute_force(rows, threshold):
    """Plain-python TF-IDF cosine over all pairs (the spec)."""
    docs = {i: [t for t in text.lower().split(" ") if t] for i, text in rows}
    docs = {i: ts for i, ts in docs.items()}
    n = len(docs)
    dfreq = {}
    for ts in docs.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    vecs = {}
    for i, ts in docs.items():
        w = {}
        for t in ts:
            w[t] = w.get(t, 0) + 1
        w = {
            t: c * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)
            for t, c in w.items()
        }
        norm = math.sqrt(sum(v * v for v in w.values()))
        if norm > 0:
            vecs[i] = {t: v / norm for t, v in w.items()}
    out = {}
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            dot = sum(
                va * vecs[b][t] for t, va in vecs[a].items() if t in vecs[b]
            )
            if dot >= threshold:
                out[(a, b)] = dot
    return out


FIXTURE = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox leaps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "lorem ipsum dolor sit amet consectetur"),
    (5, "entirely different words altogether here"),
    (6, "the the the the the"),
    (7, "the the the the the the"),
    (8, "quick dog"),
    (9, ""),
    (10, "   "),
    (11, "singleton"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_matches_brute_force(spark, fixture_df, threshold):
    got = {
        (r["idx_a"], r["idx_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            fixture_df, "doc_id", threshold=threshold
        ).collect()
    }
    want = _brute_force(FIXTURE, threshold)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_prefix_filter_is_lossless(spark, fixture_df):
    """The prefix index must return the exact same pairs and scores as
    the full inverted index — the AllPairs bound is recall-lossless."""
    for threshold in (0.3, 0.7):
        on = {
            (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
            for r in tfidf_cosine_pairs(
                fixture_df, "doc_id", threshold=threshold, prefix_filter=True
            ).collect()
        }
        off = {
            (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
            for r in tfidf_cosine_pairs(
                fixture_df, "doc_id", threshold=threshold, prefix_filter=False
            ).collect()
        }
        assert on == off and on


def test_prefix_filter_lossless_on_corpus(spark):
    """Same losslessness on real data (sf0.001 documents)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    on = {
        (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
        for r in tfidf_cosine_pairs(docs, "doc_id", threshold=0.5).collect()
    }
    off = {
        (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
        for r in tfidf_cosine_pairs(
            docs, "doc_id", threshold=0.5, prefix_filter=False
        ).collect()
    }
    assert on == off


def test_prefix_index_prunes_hot_terms(spark):
    """On a corpus where every doc shares one hot token, the prefix
    index must carry far fewer postings than the full index — the
    whole point of the rarest-first prefix."""
    rows = [(i, f"common tok{i} tok{i + 1}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    post = tfidf_postings(df, "doc_id")
    from pyspark.sql import Window

    order = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("term").asc())
    rev = F.sum(F.col("w") * F.col("w")).over(
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    threshold = 0.6
    prefix_n = post.withColumn("rev", rev).where(
        F.sqrt(F.col("rev")) >= threshold
    ).count()
    full_n = post.count()
    # 'common' has df=200 and tiny idf weight: it must sit in the
    # suffix of essentially every doc
    assert prefix_n < full_n
    hot_in_prefix = (
        post.withColumn("rev", rev)
        .where(F.sqrt(F.col("rev")) >= threshold)
        .where(F.col("term") == "common")
        .count()
    )
    assert hot_in_prefix == 0


def test_empty_and_null_docs_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, ""), (3, None), (None, "a b")],
        "doc_id long, text string",
    )
    pairs = tfidf_cosine_pairs(df, "doc_id", threshold=0.1).collect()
    ids = {x for r in pairs for x in (r["idx_a"], r["idx_b"])}
    assert ids == {0, 1}


def test_threshold_validation(spark, fixture_df):
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(fixture_df, "doc_id", threshold=0.0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(fixture_df, "doc_id", threshold=1.5)


def test_postings_are_unit_vectors(spark, fixture_df):
    post = tfidf_postings(fixture_df, "doc_id")
    norms = (
        post.groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
        .collect()
    )
    assert norms
    for r in norms:
        assert abs(r["n2"] - 1.0) < 1e-12


def test_precomputed_postings_seam(spark, fixture_df):
    """Passing a precomputed (persisted) posting list must give the
    identical result — the scale path for recurring runs."""
    post = tfidf_postings(fixture_df, "doc_id").persist()
    try:
        base = {
            (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
            for r in tfidf_cosine_pairs(
                fixture_df, "doc_id", threshold=0.3
            ).collect()
        }
        via = {
            (r["idx_a"], r["idx_b"]): round(r["cosine"], 9)
            for r in tfidf_cosine_pairs(
                fixture_df, "doc_id", threshold=0.3, postings=post
            ).collect()
        }
        assert via == base and via
    finally:
        post.unpersist()
