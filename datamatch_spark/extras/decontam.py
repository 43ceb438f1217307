"""Corpus-hygiene operators for training-data pipelines:
benchmark decontamination and corpus-wide duplicated-n-gram metrics.

Both operate on a documents table (id + single-space-tokenized text)
and are expressed as pure Column pipelines — explode / broadcast-join /
partial-aggregate — with no Python in the hot path.

Scale story (100 TB corpus):

- ``decontaminate``: the eval/benchmark side is small by construction
  (benchmarks are thousands of documents, not billions), so its
  distinct-n-gram set is broadcast; the exploded train side never
  shuffles its gram strings — the only wide exchange is the final
  ``groupBy(id)`` over (id, partial-count) rows with map-side combine.
  With ``hash_grams=True`` (default) grams travel as xxhash64 longs,
  so the broadcast table is 8 bytes/gram.
- ``dup_ngram_stats``: the inverted-index shape — explode distinct
  grams, count docs per gram (map-side combine), keep grams with
  df > 1 (a tiny minority in real corpora), then a semi-join back and
  a per-doc count. Gram keys are 8-byte hashes; the df > 1 filter
  happens BEFORE the join so the join's build side carries only
  duplicated grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr

__all__ = ["decontaminate", "dup_ngram_stats"]


def _hashed_grams_expr(text_col: str, n: int) -> Column:
    """Distinct n-gram hashes WITHOUT materializing gram strings:
    tokens hashed once, each gram mixes its n token hashes via
    multi-arg xxhash64 (same construction as dedup.with_shingle_hashes
    — ~n x less string work, the hot path at corpus scale). NOTE this
    hash differs from xxhash64(gram string); equality semantics are
    identical absent 64-bit collisions, which is all the gram-set
    operations here rely on."""
    toks = f"transform(split({text_col}, ' '), t -> xxhash64(t))"
    if n == 1:
        return F.expr(f"array_distinct({toks})")
    args = ", ".join(f"h[i + {j}]" for j in range(n))
    # array(toks) + outer transform = a let-binding: the token-hash
    # array is computed ONCE and bound as `h` for both the guard and
    # the gram loop (plain SQL has no `let`, and a Column API caller
    # can't add a two-step withColumn here)
    return F.expr(
        f"transform(array({toks}), h -> "
        f"  case when size(h) < {n} then cast(array() as array<bigint>) "
        f"  else array_distinct(transform(sequence(0, size(h) - {n}), "
        f"    i -> xxhash64({args}))) end)[0]"
    )


def _gram_col(text_col: str, n: int, hash_grams: bool) -> Column:
    if hash_grams:
        return _hashed_grams_expr(text_col, n)
    return shingles_expr(text_col, n)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hash_grams: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents sharing any token ``n``-gram with an
    evaluation/benchmark set (GPT-3 appendix-C-style decontamination).

    Returns ``train``'s (id) plus ``n_contaminated_ngrams`` (count of
    DISTINCT train-doc n-grams that appear anywhere in ``eval_df``)
    and boolean ``contaminated``. Every train row is preserved
    (left join), so the output can drive either a filter or an audit.

    ``hash_grams=True`` ships xxhash64(gram) longs instead of strings
    (identical results absent 64-bit collisions; the driver oracle
    cross-checks the string path at small scale).
    """
    eval_grams = (
        eval_df.select(F.explode(_gram_col(text_col, n, hash_grams)).alias("gram"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train_grams = train.select(
        F.col(id_col), F.explode(_gram_col(text_col, n, hash_grams)).alias("gram")
    )
    hits = (
        train_grams.join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias(
                "n_contaminated_ngrams"
            ),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dup_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction measured CORPUS-WIDE
    (the Gopher/RefinedWeb "duplicate text fraction" signal): for each
    document, the share of its distinct token ``n``-grams that also
    occur in at least one OTHER document.

    Returns (id, n_grams, n_dup_grams, dup_fraction); documents with
    fewer than ``n`` tokens get (0, 0, 0.0).
    """
    # the (expensive, interpreted-HOF) gram expression is evaluated
    # once per branch below (r6: was 3 evaluations — df branch, join
    # branch, totals branch): explode_outer keeps zero-gram documents
    # as a NULL-gram row, so every doc survives to the final per-id
    # aggregation and the per-doc total is just the COUNT of its
    # non-null exploded rows — no separate size()-only pass, and no
    # second inlined copy of the expression inside one projection
    g = _gram_col(text_col, n, hash_grams)
    ex = df.select(F.col(id_col), F.explode_outer(g).alias("gram"))
    # shingles_expr output is already distinct per doc, so count(*)
    # per gram == distinct-document frequency; NULL placeholder rows
    # are excluded from the frequency table
    dup = (
        ex.where(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > 1)
        .select("gram", F.lit(1).alias("__dup"))
    )
    # left join: NULL-gram placeholders and unique grams miss and
    # contribute 0 to the dup count, exactly the old left-join fill
    return (
        ex.join(dup, "gram", "left")
        .groupBy(id_col)
        .agg(
            # count of non-null exploded rows == gram-array size; cast
            # keeps the historical int schema of the size() formulation
            F.count("gram").cast("int").alias("n_grams"),
            F.count("__dup").alias("n_dup_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "n_dup_grams",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_dup_grams") / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
