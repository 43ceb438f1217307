"""TF-IDF weighted-cosine similarity self-join (AllPairs-style).

The classic token-based similarity join of the record-linkage / set-
similarity literature (Bayardo, Ma & Srikant, "Scaling Up All Pairs
Similarity Search", WWW 2007): documents become L2-normalized TF-IDF
vectors and the join returns every pair whose cosine meets a
threshold. The reference library has no counterpart — this is one of
the "operations a large-scale training-data pipeline needs" tier.

Every stage is a JVM-side DataFrame op (explode / groupBy / join /
window) — no Python anywhere. Scale story at 100 TB:

* document frequencies: one (term, count) groupBy — map-side partial
  aggregation, shuffle carries only distinct terms.
* candidate generation is an inverted-index self-join over each
  document's PREFIX only. Terms get a global total order (rarest
  first: df ASC, term ASC); a document's prefix is the minimal
  down-set of its terms in that order whose complement (suffix) has
  L2 norm < threshold. Soundness: for any pair with cosine >= t, the
  globally-earliest shared term must lie in BOTH prefixes — if it
  were outside either document's prefix, every shared term would be
  in that document's suffix and the dot product would be bounded by
  ||suffix|| < t. So joining prefix postings loses nothing
  (recall-lossless), while hot terms — which by rarest-first ordering
  sit at the END of the order — almost never enter a prefix: the
  quadratic blowup of frequent tokens is pruned by construction, not
  by a lossy cap.
* exact scoring: candidates re-join the FULL posting lists and a
  (pair) groupBy sums the weight products — precision-exact cosine,
  LSH-free. The candidate set, not N^2, drives this cost.
* skew: prefix terms are rare terms (short posting lists); the two
  groupBys are standard partial-agg shuffles; AQE handles residue.

Determinism: tokenization is single-space split (DuckDB
``string_split`` parity), idf is the smoothed
``ln((1+N)/(1+df)) + 1``, and all arithmetic is float64 — the whole
operator is reproduced exactly by a pure-SQL DuckDB oracle
(__spark_entry__.oracle_sql()["tfidf_pairs"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tfidf_postings",
    "tfidf_cosine_pairs",
]


def tfidf_postings(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """L2-normalized TF-IDF posting list: one row per (doc, term).

    Returns columns ``(id_col, term, w, df)`` where ``w`` is the
    unit-normalized weight ``tf * idf / ||doc||`` with smoothed
    ``idf = ln((1+N)/(1+df)) + 1``. Empty tokens are dropped; a
    document with no tokens has no postings (and so joins nothing).
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .where(F.col("term") != "")
        .where(F.col(id_col).isNotNull())
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    n_docs = df.where(F.col(id_col).isNotNull()).count()
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    w = (
        tf.join(dfreq, "term")
        .withColumn(
            "w_raw",
            F.col("tf") * (F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
        )
    )
    norm = F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw")).over(Window.partitionBy(id_col)))
    return w.select(
        F.col(id_col),
        "term",
        (F.col("w_raw") / norm).alias("w"),
        "df",
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.6,
    prefix_filter: bool = True,
    postings: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= ``threshold``.

    Returns ``(idx_a, idx_b, cosine)`` with ``idx_a < idx_b``.
    ``prefix_filter=False`` joins the full inverted index instead of
    the prefix index — same result (the filter is recall-lossless;
    pinned by tests/test_tfidf.py), quadratically more candidates on
    corpora with frequent terms. Keep it on everywhere except when
    auditing the filter itself.

    The posting list is consumed THREE times (prefix index + both
    sides of the exact-scoring join): at corpus scale, precompute it
    once with :func:`tfidf_postings`, persist or write it out
    (bucketed by ``id_col`` for the scoring join), and pass it via
    ``postings`` — otherwise the tokenize/df/normalize lineage
    re-executes per consumer.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    post = postings if postings is not None else tfidf_postings(df, id_col, text_col)

    if prefix_filter:
        # Global rarest-first term order; a term stays in the prefix
        # while the suffix STARTING AT IT still has norm >= threshold
        # (rev_cum is nonincreasing along the order, so the prefix is
        # a down-set and the soundness argument above applies).
        order = Window.partitionBy(id_col).orderBy(
            F.col("df").asc(), F.col("term").asc()
        )
        rev_cum = (
            F.sum(F.col("w") * F.col("w")).over(
                order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        )
        index = post.withColumn("rev", rev_cum).where(
            F.sqrt(F.col("rev")) >= F.lit(threshold)
        )
    else:
        index = post

    a = index.select(F.col(id_col).alias("idx_a"), F.col("term").alias("t"))
    b = index.select(F.col(id_col).alias("idx_b"), F.col("term").alias("t"))
    cand = (
        a.join(b, "t")
        .where(F.col("idx_a") < F.col("idx_b"))
        .select("idx_a", "idx_b")
        .distinct()
    )

    pa = post.select(F.col(id_col).alias("idx_a"), F.col("term"), F.col("w").alias("wa"))
    pb = post.select(F.col(id_col).alias("idx_b"), F.col("term"), F.col("w").alias("wb"))
    scored = (
        cand.join(pa, "idx_a")
        .join(pb, ["idx_b", "term"])
        .groupBy("idx_a", "idx_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cosine"))
    )
    return scored.where(F.col("cosine") >= F.lit(threshold))
