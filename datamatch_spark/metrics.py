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

__all__ = ["MetricsSink", "partition_stats"]


def partition_stats(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) for the DataFrame's current partitioning."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


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
