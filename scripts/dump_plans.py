#!/usr/bin/env python
"""Dump the physical plans of the engine's key operators to PLANS.md —
the artifact for checking that each plan is the one we want: filter/
projection pushdown into the parquet scan, broadcast joins for the
keyed sides, a single ArrowEvalPython scoring stage running after the
explicit pre-blowup repartition (never before it), and whole-stage
codegen everywhere else."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from datamatch_spark import (
        ColumnsIndex,
        DateSimilarity,
        JaroWinklerSimilarity,
        ThresholdMatcher,
        get_spark,
    )
    from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    sections = []

    # 1. parquet scan pushdown
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "n_chars")
    sections.append(
        (
            "Parquet scan: filter + projection pushdown",
            "`PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]` and "
            "`ReadSchema` limited to the two projected columns — the scan "
            "never reads `text`.",
            formatted(q),
        )
    )

    # 2. the flagship scoring plan
    cfg = CorpusConfig(n_docs=3000, seed=42, profile="clean", blk_buckets=75)
    fields = project_fields(generate_documents(spark, cfg)).drop("spans").localCheckpoint()
    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {
            "last": JaroWinklerSimilarity(),
            "first": JaroWinklerSimilarity(),
            "dob": DateSimilarity(),
        },
        fields,
        row_key="doc_id",
        validate=False,
        defer=True,
    )
    scored_plan = m._build_scored()
    sections.append(
        (
            "ER dedup scoring plan (block → salted self-join → fused scoring)",
            "What to check: (a) both join sides of the blocked self-join are "
            "BroadcastHashJoin/BroadcastExchange over the SMALL keyed frames "
            "(ids + keys), never the pair rows; (b) exactly ONE "
            "ArrowEvalPython node (the fused SimSum UDF) sitting ABOVE the "
            "explicit `REPARTITION_BY_NUM` exchange of the pre-blowup side, "
            "so every scoring partition is busy; (c) no NULL-score Filter "
            "below that exchange (it would double-evaluate the UDF); "
            "(d) everything else inside WholeStageCodegen spans.",
            formatted(scored_plan),
        )
    )

    # 3. threshold slice over materialized scores
    m.scored_pairs  # materialize
    sliced = m.get_index_pairs_within_thresholds(0.8, 1.0)
    sections.append(
        (
            "Threshold slice + total-order sort over the materialized score table",
            "A plain range Filter over the checkpointed (idx_a, idx_b, "
            "sim_score) rows — the bisect-slicing equivalent; on a real "
            "deployment this reads an Iceberg/parquet table sorted-on-write, "
            "so min-max stats prune row groups.",
            formatted(sliced),
        )
    )

    # 4. hot-block salting: cold split must be a broadcast ANTI join
    from datamatch_spark.pairing import PairingConfig, candidate_pairs

    hot_rows = [(i, "hot" if i < 500 else f"g{i % 37}") for i in range(1000)]
    hot_df = spark.createDataFrame(hot_rows, "row_key long, g string")
    salted = candidate_pairs(
        hot_df,
        ColumnsIndex("g"),
        "row_key",
        ["g"],
        cfg=PairingConfig(salt_threshold=100, rows_per_shard=50),
    )
    sections.append(
        (
            "Salted dedup pairing (hot block present)",
            "What to check: the cold-side split is a BroadcastHashJoin "
            "**LeftAnti** against the broadcast hot-key table (never an "
            "IN-list literal in a Filter — that bloats the plan/codegen at "
            "max_hot_keys scale), unioned with the triangular shard-pair "
            "branch for the hot keys.",
            formatted(salted),
        )
    )

    # 5. Swap variator: inline variant-combination max, no added shuffle
    from datamatch_spark import Swap

    m_swap = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        fields,
        row_key="doc_id",
        variator=Swap("first", "last"),
        validate=False,
        defer=True,
    )
    swap_plan = m_swap._build_scored()
    sections.append(
        (
            "Swap variator scoring (fused max-over-variants UDF)",
            "What to check: NO Generate/explode node, NO aggregation "
            "Exchange, and exactly ONE ArrowEvalPython above the pair join "
            "— the max over all 4 Swap variant combos is a single fused "
            "UDF that scores invariant fields once and the swapped pair's "
            "cross-similarities only on swap rows (scorers.py "
            "compile_swap_max).",
            formatted(swap_plan),
        )
    )

    # 6. match-mode sorted-neighborhood: tagged-union rank, cross-side pairs
    from datamatch_spark import SortedNeighborhoodIndex

    dfa = docs.where(F.col("doc_id") % 40 < 20)
    dfb = docs.where(F.col("doc_id") % 40 >= 20)
    sni_pairs = candidate_pairs(
        dfa, SortedNeighborhoodIndex(["n_chars"], window=5), "doc_id", [],
        dfb=dfb,
    )
    sections.append(
        (
            "Match-mode sorted-neighborhood pairing (tagged-union rank)",
            "What to check: ONE RangePartitioning exchange (global_rank's "
            "repartitionByRange over the union — rows never funnel into a "
            "single-task global window), the rank pass reading the "
            "localCheckpoint, and the window-bucket pair join running as a "
            "hash join on the bucket key like any equality index; no "
            "cartesian product, no full-frame Window without partitioning.",
            formatted(sni_pairs),
        )
    )

    # 7. QGramIndex with the stop-gram cap: pruning stays broadcast-side
    from datamatch_spark import QGramIndex

    qg_pairs = candidate_pairs(
        docs.select("doc_id", F.split("text", " ").getItem(0).alias("w0")),
        QGramIndex("w0", q=3, max_df=30),
        "doc_id",
        [],
    )
    sections.append(
        (
            "Q-gram pairing with the max_df stop-gram cap",
            "What to check: the hot-gram exclusion is a BroadcastHashJoin "
            "LeftAnti against the (small by construction) over-cap gram "
            "set — the document-frequency aggregation never shuffles the "
            "full key frame twice, and no IN-list literal appears.",
            formatted(qg_pairs),
        )
    )

    with open(OUT, "w") as f:
        f.write(
            "# PLANS — physical plans of the key operators\n\n"
            "Generated by `python scripts/dump_plans.py` "
            "(`.explain(\"formatted\")`). Each section notes what the plan\n"
            "must show; regenerate after planner-affecting changes.\n"
        )
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan}```\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
