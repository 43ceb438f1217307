"""Text-analysis operators over a documents table.

All of these are pure JVM Column expressions (whole-stage codegen, no
Python in the hot path) and are deliberately defined so a DuckDB
oracle can reproduce them exactly (split on single space, md5, plain
arithmetic) — see __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "with_token_count",
    "with_fingerprint",
    "with_quality",
    "with_lang_id",
    "LANG_MARKERS",
]

# tiny per-language marker-token sets for the n-gram/stopword language
# heuristic (public common-word lists)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def tokens(col: Column) -> Column:
    """Single-space tokenization (matches DuckDB string_split)."""
    return F.split(col, " ")


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """n_tokens = whitespace tokens; n_distinct = vocabulary size."""
    t = tokens(F.col(col))
    return df.withColumn("n_tokens", F.size(t)).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(t))
    )


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the lower-cased text (identical
    builtin exists in DuckDB, so this is oracle-checkable)."""
    return df.withColumn("fingerprint", F.md5(F.lower(F.col(col))))


def with_quality(df: DataFrame, col: str = "text") -> DataFrame:
    """Quality heuristics: token stats + repetition ratio + a composite
    score in [0,1]. Plain arithmetic only (oracle-checkable)."""
    t = tokens(F.col(col))
    n_tok = F.size(t)
    n_dis = F.size(F.array_distinct(t))
    n_chars = F.length(F.col(col))
    avg_tok_len = (n_chars - n_tok + 1).cast("double") / n_tok
    distinct_ratio = n_dis.cast("double") / n_tok
    length_score = F.least(F.lit(1.0), n_tok.cast("double") / 100.0)
    score = F.round(
        (length_score + distinct_ratio + F.least(F.lit(1.0), avg_tok_len / 8.0)) / 3.0,
        6,
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("distinct_ratio", F.round(distinct_ratio, 6))
        .withColumn("avg_token_len", F.round(avg_tok_len, 6))
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-token language heuristic: count marker hits per language,
    argmax; zero hits -> 'und'; ties break to the alphabetically
    first language (deterministic, mirrored by the DuckDB oracle)."""
    t = tokens(F.lower(F.col(col)))
    hit_cols = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # deterministic tie-break: first language (sorted) with the max count
    for lang in sorted(hit_cols, reverse=True):
        pred = F.when(
            (hit_cols[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = df
    for lang, c in hit_cols.items():
        out = out.withColumn(f"hits_{lang}", c)
    return out.withColumn("lang_pred", pred)
