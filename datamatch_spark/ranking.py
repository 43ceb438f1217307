"""Distributed contiguous ranking.

``row_number().over(Window.orderBy(...))`` with no partition key pulls
EVERY row into one task — fine for a 10k-row report, a wall at 10^9
ranked rows. ``global_rank`` produces the identical contiguous 0-based
rank distributively:

1. ``repartitionByRange`` on the order keys (equal keys land in one
   partition; partition ids ascend with the key ranges),
2. rank within each partition with an ordinary partitioned window,
3. add per-partition offsets (one tiny count aggregation, broadcast
   back as a join on the partition id).

Two passes over the frame being ranked — which in this engine is
always a report-sized slice (threshold pairs, cluster stats), orders
of magnitude smaller than the raw pair set — in exchange for no
single-task sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .session import checkpoint_storage_level as _ckpt_level

__all__ = ["global_rank"]


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col``: contiguous 0-based rank of each row under the
    total order ``order_cols`` (which must BE total — ties across rows
    make the rank nondeterministic, same contract as a raw window).

    The input is locally checkpointed (partition ids must be identical
    between the count pass and the rank pass).
    """
    spark = df.sparkSession
    from .session import effective_parallelism

    n_parts = partitions or 2 * effective_parallelism(spark)
    parted = df.repartitionByRange(n_parts, *order_cols).localCheckpoint(storageLevel=_ckpt_level())
    parted = parted.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        (r["__pid"], r["n"])
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long")).limit(0)
    off_df = F.broadcast(
        spark.createDataFrame(offsets, schema="__pid int, __off long")
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        parted.join(off_df, on="__pid")
        .withColumn(
            out_col,
            # long, not int: this ranks 10^9+-row frames; int overflows
            # past 2^31-1 (wraps with ANSI off, throws with ANSI on).
            (F.row_number().over(w) - 1 + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )
    return ranked
