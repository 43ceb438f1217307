"""Structured Streaming operators: continuous ingest for the same
pipeline the batch engine runs.

The reference library is batch-only; these operators extend the same
semantics to unbounded document streams the Spark-native way
(``readStream`` → transformations → ``writeStream``), so a training-
data ingest job can dedup and link documents as they arrive instead of
re-scanning the corpus:

* ``streaming_exact_dedup`` — drop documents whose content fingerprint
  was already seen, with watermarked state eviction
  (``dropDuplicatesWithinWatermark``) so state is bounded by the
  late-data horizon rather than corpus size.
* ``incremental_link_batch`` — one micro-batch of match-mode linkage:
  new documents against a static (broadcast-sized or bucketed)
  reference table, reusing the batch engine's blocking + scoring spine
  end-to-end. Designed for ``foreachBatch``:
  ``stream.writeStream.foreachBatch(make_link_batch_fn(...))``.

State design at scale: exact-dedup state is one fingerprint per
in-horizon document (bytes, not text) hash-partitioned by the state
store; linkage keeps NO cross-batch state — each micro-batch joins
against the reference table, so the only growing artifact is the
output sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "streaming_exact_dedup",
    "incremental_link_batch",
    "make_link_batch_fn",
]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival of each distinct (lowercased) text.

    With ``event_time_col``, a watermark bounds the dedup state to the
    ``delay`` horizon (documents repeating later than the horizon are
    emitted again — the standard streaming-dedup contract). Without
    it, state grows with the number of distinct documents: exact
    global dedup, only for bounded backfills.
    """
    out = stream.withColumn(
        "__fp", F.md5(F.lower(F.col(text_col)))
    )
    if event_time_col is not None:
        out = out.withWatermark(event_time_col, delay)
        return out.dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")
    return out.dropDuplicates(["__fp"]).drop("__fp")


def incremental_link_batch(
    batch: DataFrame,
    reference: DataFrame,
    index,
    scorer,
    row_key: str,
    lower_bound: float = 0.7,
    upper_bound: float = 1.0,
    pairing_config=None,
) -> DataFrame:
    """Match-mode linkage of ONE micro-batch against a static
    reference: returns (idx_a=batch key, idx_b=reference key,
    sim_score) within the threshold band, greedily 1:1-pruned — the
    same spine as the batch ThresholdMatcher in match mode.

    The batch side is tiny relative to the reference, so blocking keys
    derived from the batch prune the reference scan; at deployment
    scale the reference should be bucketed/partitioned on the blocking
    key columns so each micro-batch touches only matching buckets.
    """
    from .matchers import ThresholdMatcher

    if batch.isEmpty():
        return batch.sparkSession.createDataFrame(
            [], "idx_a long, idx_b long, sim_score double"
        )
    m = ThresholdMatcher(
        index,
        scorer,
        batch,
        reference,
        row_key=row_key,
        validate=False,
        pairing_config=pairing_config,
    )
    return m.get_index_pairs_within_thresholds(lower_bound, upper_bound)


def make_link_batch_fn(
    reference: DataFrame,
    index,
    scorer,
    row_key: str,
    sink_path: str,
    lower_bound: float = 0.7,
    upper_bound: float = 1.0,
    pairing_config=None,
):
    """``foreachBatch`` adapter: links each micro-batch against the
    reference and appends matches to a parquet sink —
    ``stream.writeStream.foreachBatch(make_link_batch_fn(...))``."""

    def _fn(batch: DataFrame, batch_id: int) -> None:
        out = incremental_link_batch(
            batch,
            reference,
            index,
            scorer,
            row_key,
            lower_bound,
            upper_bound,
            pairing_config,
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            sink_path
        )

    return _fn
