"""Meta-blocking: scalar-reference parity for every (weight, scheme)
combo, purging, token/bigram block construction, validation."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from datamatch_spark.metablocking import meta_block, token_blocks


def _scalar_meta_block(assign, weight, scheme, max_block_size):
    """Plain-Python reference: assign = [(eid, bkey), ...]."""
    asg = sorted(set(assign))
    bsize = {}
    for _, b in asg:
        bsize[b] = bsize.get(b, 0) + 1
    kept = [(e, b) for e, b in asg if bsize[b] <= max_block_size]
    blocks_of = {}
    for e, b in kept:
        blocks_of.setdefault(e, set()).add(b)
    members = {}
    for e, b in kept:
        members.setdefault(b, []).append(e)
    cbs = {}
    for b, es in members.items():
        for x, y in itertools.combinations(sorted(es), 2):
            cbs[(x, y)] = cbs.get((x, y), 0) + 1
    if weight == "js":
        edges = {
            p: c / (len(blocks_of[p[0]]) + len(blocks_of[p[1]]) - c)
            for p, c in cbs.items()
        }
    else:
        edges = {p: float(c) for p, c in cbs.items()}
    if scheme == "wep":
        thr = sum(edges.values()) / len(edges)
        return {p: w for p, w in edges.items() if w >= thr}
    node_w = {}
    for (x, y), w in edges.items():
        node_w.setdefault(x, []).append(w)
        node_w.setdefault(y, []).append(w)
    avg = {e: sum(ws) / len(ws) for e, ws in node_w.items()}
    return {
        (x, y): w
        for (x, y), w in edges.items()
        if w >= avg[x] or w >= avg[y]
    }


@pytest.mark.parametrize("weight", ["cbs", "js"])
@pytest.mark.parametrize("scheme", ["wnp", "wep"])
def test_matches_scalar_reference(spark, weight, scheme):
    rng = random.Random(11)
    assign = []
    for e in range(60):
        for b in rng.sample(range(25), rng.randint(1, 6)):
            assign.append((e, f"b{b}"))
    df = spark.createDataFrame(assign, "doc_id long, block_key string")
    got = {
        (r["idx_a"], r["idx_b"]): r["weight"]
        for r in meta_block(
            df, weight=weight, scheme=scheme, max_block_size=20
        ).collect()
    }
    want = _scalar_meta_block(assign, weight, scheme, 20)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-9)


def test_block_purging_drops_oversized(spark):
    # one giant block (all 50 entities) + pair blocks; the giant block
    # must contribute no edges
    assign = [(e, "giant") for e in range(50)]
    assign += [(0, "p1"), (1, "p1"), (2, "p2"), (3, "p2")]
    df = spark.createDataFrame(assign, "doc_id long, block_key string")
    got = meta_block(df, max_block_size=10).collect()
    assert {(r["idx_a"], r["idx_b"]) for r in got} == {(0, 1), (2, 3)}


def test_duplicate_assignments_ignored(spark):
    assign = [(0, "b"), (0, "b"), (1, "b"), (1, "b")]
    df = spark.createDataFrame(assign, "doc_id long, block_key string")
    rows = meta_block(df).collect()
    assert len(rows) == 1 and rows[0]["weight"] == 1.0


def test_token_blocks_unigram_and_bigram(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "a  quick brown dog"), (3, None)],
        "doc_id long, text string",
    )
    uni = {
        (r["doc_id"], r["block_key"])
        for r in token_blocks(df, min_token_len=3).collect()
    }
    assert uni == {
        (1, "the"), (1, "quick"), (1, "brown"), (1, "fox"),
        (2, "quick"), (2, "brown"), (2, "dog"),
    }
    bi = {
        (r["doc_id"], r["block_key"])
        for r in token_blocks(df, min_token_len=3, ngram=2).collect()
    }
    # doc 2: "a" is too short, and adjacency is judged on the RAW
    # sequence, so "a quick" and any gram spanning it are dropped
    assert bi == {
        (1, "the quick"), (1, "quick brown"), (1, "brown fox"),
        (2, "quick brown"), (2, "brown dog"),
    }


def test_token_blocks_dedups_repeated_tokens(spark):
    df = spark.createDataFrame([(1, "ha ha ha")], "doc_id long, text string")
    assert token_blocks(df).count() == 1
    assert token_blocks(df, ngram=2).count() == 1


def test_reduction_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blocks = token_blocks(docs, min_token_len=2, ngram=2)
    pruned = meta_block(blocks, max_block_size=32)
    # sanity: the pruned graph is a strict, non-empty subset of the
    # full comparison graph, and a second run reproduces it exactly
    again = meta_block(blocks, max_block_size=32, scheme="wnp")
    full_edges = (
        blocks.alias("a")
        .join(blocks.alias("b"), "block_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    n = pruned.count()
    assert 0 < n < full_edges
    assert n == again.count()


def test_validation(spark):
    df = spark.createDataFrame([(1, "b")], "doc_id long, block_key string")
    with pytest.raises(ValueError, match="weight"):
        meta_block(df, weight="nope")
    with pytest.raises(ValueError, match="scheme"):
        meta_block(df, scheme="nope")
    with pytest.raises(ValueError, match="max_block_size"):
        meta_block(df, max_block_size=1)
    with pytest.raises(ValueError, match="ngram"):
        token_blocks(spark.createDataFrame([(1, "x")], "doc_id long, text string"), ngram=3)
