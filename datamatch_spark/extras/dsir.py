"""DSIR-style importance resampling for training-data selection.

Implements the hashed-n-gram importance-resampling recipe of Xie et
al., "Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): fit bag-of-hashed-n-gram unigram models over a small
TARGET corpus (the distribution you want more of) and the RAW corpus
(what you have), score every raw document by its importance log-weight
``sum_f tf_f * (ln p_target(f) - ln p_raw(f))``, then draw k documents
without replacement proportionally to the weights via the Gumbel
top-k trick.

Scale story at 100 TB:

* features are hashed into a FIXED number of buckets (default 10,000),
  so both model tables are tiny by construction and are always
  broadcast — fitting is one (bucket, count) groupBy per corpus whose
  shuffle carries at most ``buckets`` keys after map-side combine.
* scoring joins per-document (bucket, tf) rows — one row per distinct
  bucket per doc, never the raw gram stream — against the broadcast
  models; there is NO shuffle by feature key at any corpus size.
* selection is deterministic Gumbel top-k: the noise is derived from
  ``md5(salt, id)``, not an RNG, so the chosen set is identical under
  any partitioning, task retry, or engine (the same reproducibility
  contract as extras/sampling.py), and the global top-k runs as
  Spark's TakeOrderedAndProject (per-partition heaps, k rows to the
  driver — no global sort).

Hash seam: ``hash_fn="xxhash64"`` (default) buckets grams JVM-side
with no string round-trip beyond the gram itself; ``hash_fn="md5"``
derives the bucket from the first 8 hex chars of ``md5(gram)`` —
slower but reproducible in any SQL engine, which is what the driver's
DuckDB oracle runs (same pattern as extras/dedup.py GRAM_HASH_FNS).

No counterpart in the reference library (pckhoi/datamatch has no
corpus-selection operators); this belongs to the "operations a
large-scale training-data pipeline needs" tier alongside
extras/lm.py and extras/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_ngram_counts",
    "dsir_logweights",
    "gumbel_topk",
]

BUCKET_HASH_FNS = ("xxhash64", "md5")

#: md5-derived uniform granularity: first 8 hex chars = 32 bits.
_U32 = float(1 << 32)


def _grams_expr(text_col: str, n_max: int) -> Column:
    """ALL word n-grams (n = 1..n_max, duplicates kept — DSIR counts
    feature occurrences, unlike the distinct-shingle dedup family) of
    lower-cased space tokens, empty tokens dropped."""
    toks = f"filter(split(lower({text_col}), ' '), t -> t != '')"
    parts = []
    for n in range(1, n_max + 1):
        if n == 1:
            parts.append(toks)
        else:
            # sequence(1, 0) would generate DESCENDING [1, 0]; guard
            # short docs to an empty list instead (same as dedup.py)
            parts.append(
                f"case when size({toks}) < {n} then array() "
                f"else transform(sequence(1, size({toks}) - {n - 1}), "
                f"i -> concat_ws(' ', slice({toks}, i, {n}))) end"
            )
    return F.expr(" || ".join(f"({p})" for p in parts))


def _bucket(gram: Column, buckets: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        # first 8 hex chars of md5 -> int in [0, 2^32) -> mod buckets;
        # reproducible in DuckDB: CAST('0x' || substr(md5(g),1,8) AS
        # BIGINT) % buckets
        return (
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
            % buckets
        )
    return F.pmod(F.xxhash64(gram), F.lit(buckets))


def _check(buckets: int, hash_fn: str, n_max: int) -> None:
    if buckets <= 0:
        raise ValueError(f"buckets must be > 0, got {buckets}")
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    if hash_fn not in BUCKET_HASH_FNS:
        raise ValueError(f"hash_fn must be one of {BUCKET_HASH_FNS}, got {hash_fn!r}")


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 10_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Corpus feature counts ``(bucket, c)`` over hashed word
    n-grams (n = 1..``n_max``). Output has at most ``buckets`` rows —
    one partial-agg shuffle whose reduce side is model-sized, not
    corpus-sized."""
    _check(buckets, hash_fn, n_max)
    grams = df.select(
        F.explode(_grams_expr(text_col, n_max)).alias("gram")
    )
    return grams.select(
        _bucket(F.col("gram"), buckets, hash_fn).alias("bucket")
    ).groupBy("bucket").agg(F.count("*").alias("c"))


def dsir_logweights(
    df: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 10_000,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document DSIR importance log-weight.

    Returns ``(id_col, n_feats, log_weight)`` for every document with
    at least one token, where ``log_weight = sum_f tf_f *
    (ln((c_t(f)+alpha)/(N_t+alpha*B)) - ln((c_r(f)+alpha)/(N_r+alpha*B)))``
    over the document's hashed n-gram features (Laplace-``alpha``
    smoothed bucket models; natural log, float64 — the determinism
    contract the DuckDB oracle hard-checks) and ``n_feats`` is the
    document's total feature count ``sum_f tf_f``. Documents with no
    tokens have no features and are absent from the output (same
    contract as extras/lm.unigram_logprob).

    ``target_counts`` / ``raw_counts`` are ``(bucket, c)`` tables from
    :func:`hashed_ngram_counts` — built with the SAME ``n_max`` /
    ``buckets`` / ``hash_fn`` (this function cannot verify that; mixed
    parameters silently mis-score). ``raw_counts`` defaults to fitting
    the raw model on ``df`` itself (the standard DSIR setup).
    Both model tables are bounded by ``buckets`` rows and are
    broadcast unconditionally.
    """
    _check(buckets, hash_fn, n_max)
    if not alpha > 0:
        # ln(0) is NULL under ANSI mode - unsmoothed empty buckets
        # would silently drop their terms from the sum
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if raw_counts is None:
        raw_counts = hashed_ngram_counts(df, text_col, n_max, buckets, hash_fn)

    def _model(counts: DataFrame, side: str, name: str) -> tuple[DataFrame, float]:
        # collect ONCE (bounded by `buckets` rows) and rebuild the
        # broadcast side from the local rows: summing via .agg() and
        # then broadcasting the un-cached plan would re-execute the
        # full corpus scan behind a default raw model a second time
        rows = counts.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("c").cast("long").alias(f"c_{side}"),
        ).collect()
        if len(rows) > buckets:
            raise ValueError(
                f"{name} counts has {len(rows)} rows for buckets={buckets}; "
                "it was not built with these parameters"
            )
        bad = next((r for r in rows if r[0] is None or not 0 <= r[0] < buckets), None)
        if bad is not None:
            raise ValueError(
                f"{name} counts bucket {bad[0]!r} outside [0, {buckets}); "
                "it was not built with these parameters"
            )
        total = sum(r[1] for r in rows if r[1] is not None)
        if total <= 0:
            raise ValueError(f"{name} model is empty (no features in counts)")
        local = df.sparkSession.createDataFrame(
            rows, f"bucket long, c_{side} long"
        )
        return F.broadcast(local), float(total) + alpha * buckets

    tgt, denom_t = _model(target_counts, "t", "target")
    raw, denom_r = _model(raw_counts, "r", "raw")

    tf = (
        df.where(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.explode(_grams_expr(text_col, n_max)).alias("gram"))
        .select(F.col(id_col), _bucket(F.col("gram"), buckets, hash_fn).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )
    lr = F.log(
        (F.coalesce(F.col("c_t").cast("double"), F.lit(0.0)) + F.lit(float(alpha)))
        / F.lit(denom_t)
    ) - F.log(
        (F.coalesce(F.col("c_r").cast("double"), F.lit(0.0)) + F.lit(float(alpha)))
        / F.lit(denom_r)
    )
    scored = (
        tf.join(tgt, "bucket", "left")
        .join(raw, "bucket", "left")
        .select(F.col(id_col), F.col("tf"), (F.col("tf").cast("double") * lr).alias("lw"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_feats"),
        F.sum("lw").alias("log_weight"),
    )


def gumbel_topk(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "",
) -> DataFrame:
    """Sample ``k`` rows without replacement with probability
    proportional to ``exp(weight_col)`` via the Gumbel top-k trick
    (Vieira 2014): perturb each log-weight with Gumbel noise and keep
    the k largest.

    The "noise" is deterministic — ``u = (md5_32(salt, id) + 0.5) /
    2^32``, ``g = -ln(-ln(u))`` — so the selected set depends only on
    (ids, weights, salt), never on partitioning, retries, or engine
    (change ``salt`` to redraw). Output adds the ``gumbel_key`` column
    (``weight + g``, the sort key); ties broken by ``id_col``. The
    plan is a TakeOrderedAndProject: per-partition top-k heaps, k rows
    to the driver — no global sort at any input size.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    h = F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(0.5)) / F.lit(_U32)
    g = -F.log(-F.log(u))
    keyed = df.withColumn("gumbel_key", F.col(weight_col).cast("double") + g)
    return keyed.orderBy(F.desc("gumbel_key"), F.col(id_col)).limit(k)
