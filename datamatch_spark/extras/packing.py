"""Token-budget shard packing for training-data pipelines.

Pre-training data loaders consume documents in fixed-token shards;
assigning every document to a shard under a token budget is the last
step of most corpus pipelines. Two deterministic strategies:

* :func:`pack_quota` — fully declarative: shard =
  ``floor(tokens_before_this_doc / max_tokens)`` within a hash
  bucket. Every shard receives ~``max_tokens`` tokens on average but
  a boundary document "straddles" (its tokens count toward the quota
  of the shard it lands in, which may overshoot by up to one
  document). Pure window cumsum — whole-stage codegen, no Python.
* :func:`pack_greedy` — the classic first-fit-in-order rule: a shard
  closes when the NEXT document would push it past ``max_tokens``,
  so no shard ever exceeds the budget (except a single oversized
  document, which gets a shard of its own). The running-sum-with-
  reset state is inherently sequential, so it runs per hash bucket
  inside one Arrow ``applyInPandas`` batch (a single O(rows) pass
  over int64 arrays — no similarity kernels, no per-row Spark UDF).

Both are deterministic and layout-independent: the bucket comes from
an md5 content hash of the document id (same construction as
extras/sampling.py) and the order within a bucket is the id order —
the same document always lands in the same shard on any cluster, any
partitioning, any retry. Scale: one shuffle by bucket; parallelism ==
``n_buckets`` (set it to a few thousand at 100 TB so each bucket is
one comfortable task); shard ids are (bucket, local) pairs so no
global coordination or second pass is needed. Both strategies are
reproduced exactly by DuckDB oracles (pack_quota via the same window
cumsum; pack_greedy via a recursive CTE stepping the per-bucket
greedy state) — __spark_entry__.oracle_sql().

No counterpart in the reference library; "operations a large-scale
training-data pipeline needs" tier.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_quota", "pack_greedy", "chunk_documents"]


def _bucket(key: Column, n_buckets: int, salt: str) -> Column:
    """Stable bucket in [0, n_buckets) from md5 of (salt, key) — the
    extras/sampling.py construction, DuckDB-reproducible."""
    h = F.md5(F.concat_ws("\x1f", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets


def _with_bucket_tokens(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, salt: str
) -> DataFrame:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    n_tok = F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0))
    return df.select(
        F.col(id_col),
        _bucket(F.col(id_col), n_buckets, salt).alias("bucket"),
        n_tok.cast("long").alias("n_tokens"),
    ).where(F.col(id_col).isNotNull())


def pack_quota(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Quota packing: ``(id_col, bucket, n_tokens, shard)`` with
    ``shard = floor(cum_tokens_before / max_tokens)`` in id order
    within the document's hash bucket. Shards average ``max_tokens``
    tokens; a boundary document may overshoot its shard by up to its
    own length (use :func:`pack_greedy` for a hard cap)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = _with_bucket_tokens(df, id_col, text_col, n_buckets, salt)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("double")
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(cum_before / F.lit(float(max_tokens))).cast("long").alias("shard"),
    )


def pack_greedy(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """First-fit greedy packing: ``(id_col, bucket, n_tokens, shard)``.

    Within each hash bucket, documents are visited in id order; a
    document that would push the open shard past ``max_tokens``
    closes it and starts the next. Invariant: every shard's token sum
    is <= ``max_tokens`` unless the shard is a single document longer
    than the budget (which sits alone). One Arrow batch per bucket;
    state is a single sequential int64 pass."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = _with_bucket_tokens(df, id_col, text_col, n_buckets, salt)
    budget = int(max_tokens)
    schema = f"{id_col} {dict(base.dtypes)[id_col]}, bucket long, n_tokens long, shard long"

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        shards = [0] * len(toks)
        running = 0
        shard = 0
        for i, t in enumerate(toks):
            t = int(t)
            if running > 0 and running + t > budget:
                shard += 1
                running = 0
            shards[i] = shard
            running += t
        pdf["shard"] = pd.array(shards, dtype="int64")
        return pdf

    return base.groupBy("bucket").applyInPandas(assign, schema=schema)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Sliding-window sequence chunking (training-loader prep): split
    each document's whitespace token stream into chunks of at most
    ``max_tokens`` tokens, consecutive chunks sharing ``overlap``
    tokens (stride = ``max_tokens - overlap`` — the BERT-style
    sliding window; ``overlap=0`` is plain fixed-length grouping).

    Returns ``(id, chunk_idx, chunk_text, n_tokens)``. A chunk is
    emitted only if it is the first OR contributes at least one token
    not covered by the previous chunk (``start + overlap <= n``), so
    no trailing all-overlap chunk appears. NULL-text rows yield no
    chunks; note Spark and SQL split('') both give one empty token,
    so an empty string yields one 1-token chunk of ''.

    Entirely pure Column (split once via a let-binding, start
    sequence, slice + concat_ws, one explode) — whole-stage codegen,
    no Python, no shuffle at all: chunking is embarrassingly
    row-local, the 100 TB shape is scan -> Generate -> scan-side
    projection. DuckDB-oracle-reproducible token arithmetic.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} for "
            f"max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    chunks = F.expr(
        f"""transform(array(split({text_col}, ' ')), t ->
              transform(
                filter(sequence(1, size(t), {stride}),
                       s -> s = 1 OR s + {overlap} <= size(t)),
                s -> struct(
                  cast((s - 1) div {stride} as int) as chunk_idx,
                  concat_ws(' ', slice(t, s, {max_tokens})) as chunk_text,
                  cast(least({max_tokens}, size(t) - s + 1) as int)
                    as n_tokens)))[0]"""
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("__c")).select(
        id_col,
        F.col("__c.chunk_idx").alias("chunk_idx"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").alias("n_tokens"),
    )
