#!/usr/bin/env python
"""Dump .explain('formatted') for the bench queries this round touched
into plans/r06/<query>_<tag>.txt.

Usage: python scripts/dump_r06_plans.py <tag>
Run with PYTHONPATH pointing at the round-start tree for tag=before.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
# tree to import the engine from (round-start worktree for tag=before)
TREE = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, TREE)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r06")
os.makedirs(OUT, exist_ok=True)
SF_DIR = "/root/testdata/sf0.01"


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump(name, df):
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(formatted(df))
    print("wrote", path, flush=True)


def main():
    from pyspark.sql import functions as F

    from datamatch_spark import (
        ColumnsIndex,
        DateSimilarity,
        JaroWinklerSimilarity,
        PairingConfig,
        Swap,
        ThresholdMatcher,
    )
    from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields
    from datamatch_spark.extras.cleaning import dedup_lines
    from datamatch_spark.extras.decontam import dup_ngram_stats
    from datamatch_spark.extras.dedup import minhash_lsh_pairs
    from datamatch_spark.extras.simsearch import lsh_topk
    from datamatch_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    cfg = CorpusConfig(n_docs=3000, seed=42, profile="clean", blk_buckets=120, hot_pct=4)
    fields = project_fields(generate_documents(spark, cfg)).drop("spans").localCheckpoint()
    sims = {
        "last": JaroWinklerSimilarity(),
        "first": JaroWinklerSimilarity(),
        "dob": DateSimilarity(),
    }
    m = ThresholdMatcher(
        ColumnsIndex("blk"), sims, fields, row_key="doc_id", validate=False,
        pairing_config=PairingConfig(salt_threshold=1000), defer=True,
    )
    dump("er_dedup_scored", m._build_scored())

    msw = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        fields, row_key="doc_id", validate=False, variator=Swap("first", "last"),
        pairing_config=PairingConfig(salt_threshold=1000), defer=True,
    )
    dump("er_swap_scored", msw._build_scored())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(2000).localCheckpoint()
    dump("minhash_pairs", minhash_lsh_pairs(docs, "doc_id", n=3, n_perm=64, threshold=0.9))
    dump("hygiene_dup_ngram_stats", dup_ngram_stats(docs, n=8))
    big = docs.select(
        "doc_id", F.expr("replace(text, ' table ', '\\n')").alias("text")
    )
    dump("line_dedup", dedup_lines(big))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()
    queries = emb.limit(20).localCheckpoint()
    dump("lsh_ann", lsh_topk(emb, queries, k=5, n_planes=16))

    # cc_cluster: the driver-side hybrid runs eagerly inside
    # get_cluster_assignments; the plan below shows the downstream
    # members-direct clique walk over the labeled slice
    m2 = ThresholdMatcher(
        ColumnsIndex("blk"), sims, fields, row_key="doc_id", validate=False,
        pairing_config=PairingConfig(salt_threshold=1000),
    )
    dump("cc_cluster_assignments", m2.get_cluster_assignments(0.8, 1.0))


if __name__ == "__main__":
    main()
