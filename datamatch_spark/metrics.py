"""Per-partition lineage + pair-count metrics sink (north rule:
"per-partition lineage and pair-count metrics written alongside
results").

Design: metrics are ordinary append-only parquet tables next to the
results (the Iceberg-table analogue in this sandbox). Each ``record``
call runs one cheap aggregation over the (already materialized) stage
output — ``groupBy(spark_partition_id())`` — so the numbers are exact
per-partition row counts, and block-level candidate-pair counts come
from the same aggregation pairing.py uses for hot-key detection.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import checkpoint_storage_level as _ckpt_level

__all__ = [
    "MetricsSink",
    "partition_stats",
    "blocking_quality",
    "pairwise_f1",
    "bcubed",
    "cluster_stats",
    "threshold_sweep",
]


def partition_stats(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows, n_partitions_total) for the DataFrame's
    current partitioning. The groupBy cannot emit 0-row partitions, so
    the TOTAL partition count rides along — a lineage reader can infer
    the empties (review r5: 50 empty of 64 would otherwise read as a
    healthy 14-partition layout)."""
    n_total = df.rdd.getNumPartitions()
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).withColumn("n_partitions_total", F.lit(n_total))


class MetricsSink:
    """Append-only metrics tables under ``path``:

    * ``partitions/`` — (run_id, stage, partition_id, n_rows, wall_ms,
      recorded_at)
    * ``blocks/``     — (run_id, stage, block_key, n_rows, n_pairs,
      recorded_at)
    """

    def __init__(self, spark: SparkSession, path: str, run_id: str | None = None) -> None:
        self._spark = spark
        self._path = path.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def record_partitions(self, stage: str, df: DataFrame, wall_ms: float | None = None) -> None:
        t0 = time.time()
        stats = partition_stats(df).withColumns(
            {
                "run_id": F.lit(self.run_id),
                "stage": F.lit(stage),
                "wall_ms": F.lit(float(wall_ms) if wall_ms is not None else -1.0),
                "recorded_at": F.lit(t0),
            }
        )
        stats.write.mode("append").parquet(f"{self._path}/partitions")

    def record_blocks(self, stage: str, block_stats: DataFrame) -> None:
        out = block_stats.withColumns(
            {
                "run_id": F.lit(self.run_id),
                "stage": F.lit(stage),
                "recorded_at": F.lit(time.time()),
            }
        )
        out.write.mode("append").parquet(f"{self._path}/blocks")

    def partitions(self) -> DataFrame:
        return self._spark.read.parquet(f"{self._path}/partitions")

    def blocks(self) -> DataFrame:
        return self._spark.read.parquet(f"{self._path}/blocks")


def blocking_quality(
    df: DataFrame,
    index,
    row_key: str,
    truth_pairs: DataFrame,
    cfg=None,
) -> DataFrame:
    """Standard blocking-evaluation metrics (Christen 2012, ch. 7) for a
    candidate blocking ``index`` against labeled ground truth.

    ``truth_pairs`` is a DataFrame (idx_a, idx_b) of true-match row-key
    pairs, idx_a < idx_b. Returns ONE row:

    * ``n_rows``             — |df|
    * ``n_candidates``       — |C|, candidate pairs the index generates
    * ``n_truth``            — |M|
    * ``n_truth_covered``    — |C ∩ M|
    * ``reduction_ratio``    — 1 − |C| / (n·(n−1)/2): how much of the
      quadratic comparison space the blocking prunes
    * ``pairs_completeness`` — |C ∩ M| / |M|: recall of the blocking
    * ``pairs_quality``      — |C ∩ M| / |C|: precision of the blocking

    Scale: candidates are generated id-only (no record payload), so the
    blowup rows are (long, long); the intersection is one equi-join on
    the pair key and every output is a scalar aggregate. The quadratic
    term n·(n−1)/2 is arithmetic, never materialized.
    """
    from .pairing import candidate_pairs

    n = df.count()
    # materialize the candidate set ONCE: it feeds two counts (|C| and
    # the truth intersection) and the blocked self-join behind it is
    # the expensive step this function exists to measure (review r5)
    cand = (
        candidate_pairs(df, index, row_key, [], cfg=cfg)
        .select("idx_a", "idx_b")
        .localCheckpoint(storageLevel=_ckpt_level())
    )
    n_cand = cand.count()
    n_truth = truth_pairs.count()
    covered = cand.join(
        truth_pairs.select("idx_a", "idx_b"), on=["idx_a", "idx_b"]
    ).count()
    total = n * (n - 1) / 2.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            n,
            n_cand,
            n_truth,
            covered,
            round(1.0 - n_cand / total, 6) if total else None,
            round(covered / n_truth, 6) if n_truth else None,
            round(covered / n_cand, 6) if n_cand else None,
        )],
        schema=(
            "n_rows long, n_candidates long, n_truth long, "
            "n_truth_covered long, reduction_ratio double, "
            "pairs_completeness double, pairs_quality double"
        ),
    )


def _joined_labels(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    pred_col: str,
    truth_col: str,
) -> DataFrame:
    """(pred_col, truth_col) per labeled row — the contingency input.
    Inner join: only rows present in BOTH labelings are evaluated (each
    frame must carry one row per id; ``groups_from_pairs`` /
    ``connected_components`` output has that shape, singletons
    included)."""
    for c, df, name in (
        (pred_col, pred, "pred"),
        (truth_col, truth, "truth"),
    ):
        if c not in df.columns:
            raise KeyError(f"{name} is missing column {c!r}")
        if id_col not in df.columns:
            raise KeyError(f"{name} is missing column {id_col!r}")
    if pred_col == truth_col:
        raise ValueError(
            f"pred_col and truth_col are both {pred_col!r}; alias one side"
        )
    return pred.select(id_col, pred_col).join(
        truth.select(id_col, truth_col), on=id_col, how="inner"
    )


def pairwise_f1(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    pred_col: str = "group_id",
    truth_col: str = "true_id",
) -> DataFrame:
    """Pairwise precision / recall / F1 of a predicted clustering
    against gold labels — the linkage-evaluation metric of record
    (Menestrina, Whang & Garcia-Molina, VLDB 2010; the north rule's
    acceptance criterion is pairwise F1 >= 0.99).

    Both inputs map ``id_col`` to a cluster label; a row with a NULL
    label on EITHER side is excluded from every count (an unlabeled row
    asserts nothing — the evaluation universe is the doubly-labeled
    rows, same convention as :func:`bcubed`). Returns ONE row:
    ``pred_pairs`` (P), ``true_pairs`` (T), ``common_pairs`` (P ∩ T),
    ``precision``, ``recall``, ``f1`` (NULL where the denominator is
    zero, e.g. an all-singleton prediction has undefined precision).

    Scale shape: the three pair counts come from the CONTINGENCY
    formulation — sum of n·(n−1)/2 over predicted clusters, over true
    clusters, and over (pred, truth) cells — so no pair set is ever
    materialized: three groupBy aggregations over label cardinalities,
    then a 1-row×1-row×1-row join. C(n, 2) divides the EVEN factor
    first, so the arithmetic is overflow-free as long as the pair
    count itself fits a BIGINT — exact for clusters up to ~4.3×10^9
    members (beyond that Spark's ANSI mode fails loudly rather than
    wrapping).
    """
    j = _joined_labels(pred, truth, id_col, pred_col, truth_col).where(
        F.col(pred_col).isNotNull() & F.col(truth_col).isNotNull()
    )

    def _n_pairs(df: DataFrame, cols: list[str], alias: str) -> DataFrame:
        return (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.coalesce(
                    # C(n,2) dividing the even factor first: no n²
                    # intermediate, so no BIGINT overflow until the
                    # PAIR COUNT itself exceeds the type (n ~ 4.3e9)
                    F.sum(
                        F.expr(
                            "CASE WHEN n % 2 = 0 THEN (n DIV 2) * (n - 1) "
                            "ELSE n * ((n - 1) DIV 2) END"
                        )
                    ),
                    F.lit(0),
                ).alias(alias)
            )
        )

    p = _n_pairs(j, [pred_col], "pred_pairs")
    t = _n_pairs(j, [truth_col], "true_pairs")
    c = _n_pairs(j, [pred_col, truth_col], "common_pairs")
    out = p.crossJoin(t).crossJoin(c)
    prec = F.col("common_pairs") / F.nullif(F.col("pred_pairs"), F.lit(0))
    rec = F.col("common_pairs") / F.nullif(F.col("true_pairs"), F.lit(0))
    return out.select(
        "pred_pairs",
        "true_pairs",
        "common_pairs",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.nullif(prec + rec, F.lit(0.0))).alias("f1"),
    )


def bcubed(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    pred_col: str = "group_id",
    truth_col: str = "true_id",
) -> DataFrame:
    """B-cubed precision / recall / F1 (Bagga & Baldwin 1998; Amigó et
    al. 2009 showed it is the clustering metric satisfying all four
    formal constraints): per-row precision is |cell(pred_i, truth_i)| /
    |pred cluster_i|, recall divides by the true cluster instead, both
    averaged over rows. Complements :func:`pairwise_f1` — pairwise F1
    over-weights large clusters (quadratic in size), B-cubed is
    per-item.

    Rows with a NULL label on either side are excluded. Returns ONE
    row: ``n_rows``, ``bcubed_precision``, ``bcubed_recall``,
    ``bcubed_f1``.

    Scale shape: the row-average collapses onto the contingency cells —
    Σ over (pred, truth) cells of n_pt² / n_p (resp. n_pt² / n_t), all
    divided by N — so the cost is one (pred, truth) aggregation plus
    two cluster-size aggregations joined on their cluster keys; nothing
    per-row leaves the first groupBy.
    """
    j = _joined_labels(pred, truth, id_col, pred_col, truth_col).where(
        F.col(pred_col).isNotNull() & F.col(truth_col).isNotNull()
    )
    cells = j.groupBy(pred_col, truth_col).agg(
        F.count(F.lit(1)).alias("n_pt")
    )
    p_sizes = j.groupBy(pred_col).agg(F.count(F.lit(1)).alias("n_p"))
    t_sizes = j.groupBy(truth_col).agg(F.count(F.lit(1)).alias("n_t"))
    return (
        cells.join(p_sizes, on=pred_col)
        .join(t_sizes, on=truth_col)
        .agg(
            F.sum("n_pt").alias("n_rows"),
            (
                F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p"))
                / F.sum("n_pt")
            ).alias("bcubed_precision"),
            (
                F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t"))
                / F.sum("n_pt")
            ).alias("bcubed_recall"),
        )
        .select(
            "n_rows",
            "bcubed_precision",
            "bcubed_recall",
            (
                2
                * F.col("bcubed_precision")
                * F.col("bcubed_recall")
                / F.nullif(
                    F.col("bcubed_precision") + F.col("bcubed_recall"),
                    F.lit(0.0),
                )
            ).alias("bcubed_f1"),
        )
    )


def cluster_stats(
    pairs: DataFrame,
    assignment: DataFrame,
    id_col: str,
    cluster_col: str = "group_id",
    score_col: str | None = "sim_score",
) -> DataFrame:
    """Per-cluster diagnostics over the scored-pair graph — the
    standard review tool for transitive-closure clustering, where one
    borderline edge can glue two unrelated groups into a chain: low
    ``density`` / low ``min_score`` clusters are the ones to audit
    (Hassanzadeh & Miller, VLDB J. 2009 use exactly these signals).

    ``pairs``: (idx_a, idx_b[, score_col]) match edges; ``assignment``:
    (id_col, cluster_col), one row per record (``groups_from_pairs``
    shape). Returns one row per cluster of size >= 2:

    * ``cluster_size``, ``n_edges`` — members and surviving edges
    * ``density``   — n_edges / C(size, 2): 1.0 = clique (every member
      pair was independently matched), → 0 = a fragile chain
    * ``min_score`` / ``avg_score`` / ``max_score`` — edge-score spread
      (NULL when ``score_col`` is None or all edges are NULL-scored)

    Cross-cluster edges (endpoints assigned to different clusters —
    possible when pairs were pruned AFTER clustering) are dropped.

    Scale shape: two id-keyed joins tag the edge endpoints, then ONE
    cluster-key aggregation joined to the size aggregation on the same
    key; C(size, 2) is arithmetic, never materialized.
    """
    for c in (id_col, cluster_col):
        if c not in assignment.columns:
            raise KeyError(f"assignment is missing column {c!r}")
    cols = ["idx_a", "idx_b"] + ([score_col] if score_col else [])
    for c in cols:
        if c not in pairs.columns:
            raise KeyError(f"pairs is missing column {c!r}")

    amap = assignment.select(id_col, cluster_col)
    e = (
        pairs.select(*cols)
        .join(
            amap.select(
                F.col(id_col).alias("idx_a"), F.col(cluster_col).alias("__ca")
            ),
            on="idx_a",
        )
        .join(
            amap.select(
                F.col(id_col).alias("idx_b"), F.col(cluster_col).alias("__cb")
            ),
            on="idx_b",
        )
        .where(F.col("__ca") == F.col("__cb"))
    )
    score = F.col(score_col) if score_col else F.lit(None).cast("double")
    edges = e.groupBy(F.col("__ca").alias(cluster_col)).agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.min(score).alias("min_score"),
        F.avg(score).alias("avg_score"),
        F.max(score).alias("max_score"),
    )
    sizes = (
        amap.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") >= 2)
    )
    return sizes.join(edges, on=cluster_col, how="left").select(
        cluster_col,
        "cluster_size",
        F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
        (
            F.coalesce(F.col("n_edges"), F.lit(0))
            / (F.col("cluster_size") * (F.col("cluster_size") - 1) / F.lit(2.0))
        ).alias("density"),
        "min_score",
        "avg_score",
        "max_score",
    )


def threshold_sweep(
    scored_pairs: DataFrame,
    truth_pairs: DataFrame,
    thresholds: list[float],
    score_col: str = "sim_score",
) -> DataFrame:
    """Pair-classification precision/recall/F1 at each candidate
    threshold — the threshold-picking tool (the reference's tutorial
    eyeballs one cutoff against the perfect mapping; this sweeps the
    whole grid in one pass). A pair counts as predicted-match at
    threshold t iff ``score_col`` >= t; NULL scores (refused) never
    match.

    ``truth_pairs``: (idx_a, idx_b) true matches, idx_a < idx_b, same
    orientation as the scored pairs. Truth pairs NEVER scored (blocked
    away) count as false negatives at every threshold — blocking
    recall loss is not hidden. Returns one row per threshold:
    ``threshold, tp, fp, fn, precision, recall, f1`` (NULL ratios on
    zero denominators).

    Scale shape: one full-outer equi-join on the pair key, then an
    explode over the |thresholds| literal array (map-side, linear
    blowup bounded by the grid size) into a single groupBy(threshold)
    aggregation — no per-threshold rescans of the pair set.
    """
    if not thresholds:
        raise ValueError("thresholds must be a non-empty list")
    if score_col not in scored_pairs.columns:
        raise KeyError(score_col)
    ts = sorted({float(t) for t in thresholds})
    joined = (
        scored_pairs.select("idx_a", "idx_b", F.col(score_col).alias("__s"))
        .join(
            truth_pairs.select("idx_a", "idx_b").withColumn(
                "__truth", F.lit(True)
            ),
            on=["idx_a", "idx_b"],
            how="full_outer",
        )
        .select(
            F.coalesce(F.col("__truth"), F.lit(False)).alias("__t"),
            "__s",
        )
    )
    e = joined.select(
        "__t",
        "__s",
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("threshold"),
    )
    pred = F.col("__s").isNotNull() & (F.col("__s") >= F.col("threshold"))
    agg = e.groupBy("threshold").agg(
        F.sum(F.when(pred & F.col("__t"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~F.col("__t"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & F.col("__t"), 1).otherwise(0)).alias("fn"),
    )
    p = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    r = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / F.nullif(p + r, F.lit(0.0))).alias("f1"),
    )
