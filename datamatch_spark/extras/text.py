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
    "with_bpe_token_estimate",
    "BPE_PIECE_RE",
    "with_fingerprint",
    "with_quality",
    "with_lang_id",
    "repetition_signals",
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


#: GPT-2-style pre-tokenizer regex, restricted to the syntax subset
#: shared by Java regex (Spark) and RE2 (DuckDB, no lookaround):
#: a piece is an optional-space-prefixed letter run, digit run, or
#: punctuation run, or a residual space run. Counting these pieces is
#: the standard cheap proxy for BPE token count (every BPE merge
#: happens WITHIN a pre-token, so piece count <= true token count,
#: with the gap shrinking as vocabulary coverage grows).
BPE_PIECE_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def with_bpe_token_estimate(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds two LLM-token-budget estimators, both pure Column exprs:

    * ``n_bpe_pieces`` — count of ``BPE_PIECE_RE`` pre-tokenizer
      pieces (the whitespace+BPE-ish-regex token counter; a lower
      bound on any BPE tokenizer's count over the same pre-tokens).
    * ``est_tokens_chars`` — ``ceil(chars / 4)``, the classic
      chars-per-token heuristic, as a cross-check column.

    NULL text scores 0 for both (budget of nothing is nothing).
    """
    pieces = F.expr(
        f"size(regexp_extract_all({col}, '{BPE_PIECE_RE}', 0))"
    )
    return df.withColumn(
        "n_bpe_pieces",
        F.when(F.col(col).isNull(), F.lit(0)).otherwise(pieces),
    ).withColumn(
        "est_tokens_chars",
        F.ceil(F.coalesce(F.length(col), F.lit(0)) / F.lit(4.0)).cast("int"),
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


def _gram_list(col: str, n: int) -> Column:
    """ALL word n-grams of single-space-tokenized ``col`` (WITH
    repeats — repetition counting needs every occurrence, unlike the
    dedup family's distinct shingles in extras/dedup.py)."""
    toks = f"split({col}, ' ')"
    if n == 1:
        return F.expr(toks)
    return F.expr(
        f"case when size({toks}) < {n} then array() "
        f"else transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) end"
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6),
) -> DataFrame:
    """WITHIN-document repetition quality signals, per Gopher's
    repetition filters (Rae et al. 2021, "Scaling Language Models",
    Table A1), adapted to the space-tokenized corpus:

    * ``top_{n}gram_char_frac`` (n in ``top_ns``): character mass of
      the heaviest n-gram — max over grams of count × chars(gram),
      over the document's character count. A deterministic variant of
      Gopher's "fraction of characters in the most frequent n-gram"
      that needs no tie-break rule: the max is taken over the PRODUCT,
      so the value is unique even when several grams share the top
      count.
    * ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters in ALL
      occurrences of n-grams that appear ≥ 2 times, over the character
      count, capped at 1.0 (overlapping occurrences can exceed the
      document length — the Dolma/NeMo-Curator counting convention).

    Distinct from ``decontam.dup_ngram_stats``: that measures
    CROSS-document duplication via an inverted index; these are
    per-document self-repetition scores (the "repetitious document"
    Gopher filter, applied before dedup at corpus scale).

    Shape at scale: one explode per n unioned, ONE shuffle on
    (id, n, gram) with map-side combine (counts), then a per-(id, n)
    aggregate and a conditional-aggregation widening on id — no UDFs,
    no joins against the gram space. Docs shorter than n tokens score
    0.0 (no grams → no repetition evidence). Returns
    (id_col, n_chars, signal columns, rounded to 6dp).
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    if not all_ns or min(all_ns) < 1:
        raise ValueError("top_ns/dup_ns must be non-empty, all n >= 1")
    parts = [
        df.select(
            F.col(id_col),
            F.lit(n).alias("__n"),
            F.explode(_gram_list(col, n)).alias("__g"),
        )
        for n in all_ns
    ]
    grams = parts[0]
    for p in parts[1:]:
        grams = grams.unionByName(p)
    cnts = grams.groupBy(id_col, "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    mass = F.col("__c") * F.length("__g")
    per_n = cnts.groupBy(id_col, "__n").agg(
        F.max(mass).alias("__top_mass"),
        F.sum(F.when(F.col("__c") >= 2, mass).otherwise(F.lit(0))).alias(
            "__dup_mass"
        ),
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("__n") == n, F.col("__top_mass"))).alias(
                f"__tm_{n}"
            )
        )
    for n in dup_ns:
        aggs.append(
            F.max(F.when(F.col("__n") == n, F.col("__dup_mass"))).alias(
                f"__dm_{n}"
            )
        )
    wide = per_n.groupBy(id_col).agg(*aggs)
    # NULL/empty text: n_chars 0 and every signal 0.0 (no repetition
    # evidence) — also keeps 0/0 NaN (Spark) vs NULL (other engines)
    # out of the output
    out = df.select(
        id_col, F.coalesce(F.length(col), F.lit(0)).alias("n_chars")
    ).join(wide, on=id_col, how="left")
    nc = F.col("n_chars").cast("double")

    def _frac(mass_col: str) -> Column:
        return F.when(
            nc > 0, F.coalesce(F.col(mass_col), F.lit(0)).cast("double") / nc
        ).otherwise(F.lit(0.0))

    for n in top_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac", F.round(_frac(f"__tm_{n}"), 6)
        )
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.round(F.least(F.lit(1.0), _frac(f"__dm_{n}")), 6),
        )
    return out.drop(
        *[f"__tm_{n}" for n in top_ns], *[f"__dm_{n}" for n in dup_ns]
    )
