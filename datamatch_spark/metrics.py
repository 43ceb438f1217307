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

__all__ = ["MetricsSink", "partition_stats", "blocking_quality"]


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
        .localCheckpoint()
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
