"""Unigram language-model scoring over a documents table.

The cheapest useful "perplexity-style" quality signal a training-data
pipeline runs at corpus scale: score every document by the average
log-probability of its tokens under a unigram model estimated from a
(possibly different) corpus. Low-scoring documents are dominated by
rare garbage tokens; high-scoring ones read like the reference corpus
(the classic CCNet / Wenzek et al. 2020 filtering signal, with a
unigram model standing in for the 5-gram KenLM this container cannot
host).

Scale story at 100 TB:

* counts: one ``(token, count)`` groupBy — map-side partial
  aggregation, shuffle carries only distinct tokens (the vocabulary,
  not the corpus).
* scoring joins per-document TERM FREQUENCIES (``(doc, token, tf)``,
  one row per distinct token per doc) against the counts table —
  never the raw exploded token stream, so a million-repeat token
  costs one join row. The join key (token) is Zipf-skewed by nature:
  when the vocabulary fits (``broadcast_max_terms``) the counts side
  is broadcast and there is NO shuffle-by-token at all; past that the
  engine falls back to a shuffle join and AQE's skew-join splitting
  handles the head tokens.
* everything is JVM Column expressions (no Python), and the
  arithmetic (``ln(c / N)``, float64) is chosen so a DuckDB oracle
  reproduces it exactly — see __spark_entry__.oracle_sql()
  ["unigram_logprob"].

No counterpart in the reference library (pckhoi/datamatch has no
corpus-statistics operators); this belongs to the "operations a
large-scale training-data pipeline needs" tier alongside
extras/tfidf.py and extras/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_counts", "unigram_logprob"]


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram counts ``(token, c)`` over lower-cased
    single-space tokens (DuckDB ``string_split`` parity; empty tokens
    dropped). One partial-agg shuffle; output is vocabulary-sized."""
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token")
    ).where(F.col("token") != "")
    return toks.groupBy("token").agg(F.count("*").alias("c"))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
    oov_count: float = 0.5,
    broadcast_max_terms: int = 2_000_000,
) -> DataFrame:
    """Per-document average unigram log-probability.

    Returns ``(id_col, n_tokens, avg_logprob)`` for every document
    with at least one non-empty token, where ``avg_logprob`` is
    ``sum(tf * ln(c / N)) / sum(tf)`` over the document's distinct
    tokens (natural log, float64 — the same determinism contract as
    extras/tfidf.py, hard-checked by the DuckDB oracle).

    ``counts`` defaults to the corpus's own unigram model
    (:func:`unigram_counts` of ``df``); pass a reference-corpus
    counts table to score against an external model, in which case
    tokens absent from it contribute ``ln(oov_count / N)``
    (a Jeffreys-style half-count; never triggered in self-scoring
    mode, where every token has c >= 1 by construction).

    The counts side is broadcast when its vocabulary has at most
    ``broadcast_max_terms`` rows (one cheap count job on a
    vocabulary-sized table), eliminating the token-keyed shuffle that
    Zipf skew would otherwise concentrate on a handful of reducers.
    """
    if not oov_count > 0:
        # ln(0) is NULL under ANSI mode — OOV rows would silently drop
        # out of the sum and bias avg_logprob upward
        raise ValueError(f"oov_count must be > 0, got {oov_count}")
    if counts is None:
        counts = unigram_counts(df, text_col)
    counts = counts.select("token", F.col("c").cast("long").alias("c"))
    # one scalar job for both model size and vocab size (the join
    # below recomputes counts once more; at 100 TB wrap `counts` in a
    # checkpoint/cache upstream if the source scan is expensive)
    n_total, n_terms = counts.agg(F.sum("c"), F.count("*")).collect()[0]
    if not n_total or n_total <= 0:
        raise ValueError("unigram model is empty (no tokens in counts)")
    if n_terms <= broadcast_max_terms:
        counts = F.broadcast(counts)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).where((F.col("token") != "") & F.col(id_col).isNotNull())
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    lnp = F.log(
        F.coalesce(F.col("c").cast("double"), F.lit(float(oov_count)))
        / F.lit(float(n_total))
    )
    scored = tf.join(counts, "token", "left").select(
        F.col(id_col),
        F.col("tf"),
        (F.col("tf").cast("double") * lnp).alias("lp"),
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        (F.sum("lp") / F.sum("tf").cast("double")).alias("avg_logprob"),
    )
