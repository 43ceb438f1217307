"""Corpus-cleaning operators for LLM training-data pipelines.

Three families, all pure DataFrame/Column plans (no Python in any hot
path) with exact DuckDB-oracle counterparts in __spark_entry__:

* :func:`dedup_lines` — GLOBAL exact line-level deduplication (the C4
  / CCNet / RefinedWeb "keep one occurrence of every distinct line
  across the corpus" pass; Raffel et al. 2020 §2.2 dedup three-sentence
  spans, CCNet Wenzek et al. 2020 dedup paragraphs by hash — same
  shape: explode units, pick one global keeper per fingerprint,
  reassemble documents).
* :func:`filter_lines` — per-document line-quality filtering (the
  C4 line rules: minimum word count, terminal punctuation, stop
  phrases), zero-shuffle.
* :func:`redact_pii` — regex PII redaction (emails / IPv4 / phone
  numbers -> typed placeholders) with per-document replacement
  counts, zero-shuffle. Patterns are restricted to the Java-regex ∩
  RE2 syntax subset so a DuckDB oracle can run the IDENTICAL pattern.

Scale notes (100 TB):
  dedup_lines is the only shuffling operator here. Its plan is
  explode -> groupBy(line fingerprint) with map-side partial agg (hot
  lines collapse to one (fp, min-keeper) row per map task BEFORE the
  exchange) -> fingerprint-keyed join back -> per-doc rebuild. The
  pathological skew key of real corpora — the empty / boilerplate
  line repeated billions of times — is handled twice over: lines
  shorter than ``dedup_min_chars`` are exempted BEFORE the shuffle
  (never enter the join), and the keeper side of the join is unique
  per fingerprint so AQE skew-join can split a hot partition freely.
  Joining on md5 (16 bytes) rather than the line text keeps the
  exchange narrow; at 10^12 lines a 64-bit hash would see birthday
  collisions, a 128-bit one does not (collision would surface as a
  hash-mismatch against the string-keyed DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dedup_lines",
    "filter_lines",
    "redact_pii",
    "remove_duplicate_spans",
    "EMAIL_RE",
    "IPV4_RE",
    "PHONE_RE",
]


def _split_literal(col: Column, sep: str) -> Column:
    """Split on a LITERAL separator (Spark's split() takes a regex;
    \\Q..\\E quoting makes it literal, matching DuckDB string_split).
    Separators containing the closing quote are rejected rather than
    silently mis-split."""
    if "\\E" in sep:
        raise ValueError(r"separator must not contain \E")
    return F.split(col, "\\Q" + sep + "\\E")


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    sep: str = "\n",
    dedup_min_chars: int = 1,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Corpus-wide exact line deduplication, keep-first.

    Every distinct line (of at least ``dedup_min_chars`` characters)
    keeps exactly ONE occurrence across the whole corpus: the one with
    the smallest ``(id_col, position)``. All other occurrences are
    removed and each document's remaining lines are re-joined with
    ``sep`` in their original order. Lines shorter than
    ``dedup_min_chars`` (default: empty lines) are never deduplicated
    — they are structural, not content, and exempting them also drops
    the single most skewed fingerprint of any real corpus from the
    shuffle entirely.

    Returns ``(id_col, n_lines, n_lines_kept, out_col)`` with one row
    per input row; NULL text stays NULL with zero counts.

    The keeper choice is a plain ``min`` over a two-field struct, so
    the result is deterministic under any partitioning, retry, or
    engine — the property the DuckDB oracle checks end-to-end.

    ``id_col`` values are assumed unique per row (the corpus contract
    shared by every operator here); duplicate ids would merge their
    documents' lines in the reassembly step.
    """
    lines = _split_literal(F.col(col), sep)
    # r6: the split+explode expression is evaluated once per branch
    # (keeper table, reassembly) instead of three times — the per-doc
    # line count rides the reassembly aggregation as count(*) and the
    # keep-filter moves INSIDE the aggregation (collect_list/count skip
    # the NULLs a failed keep-guard produces), so no third size()-only
    # pass over the corpus exists
    ex = df.select(
        F.col(id_col), F.posexplode(lines).alias("__pos", "__line")
    ).select(
        id_col,
        "__pos",
        "__line",
        F.md5("__line").alias("__fp"),
        F.length("__line").alias("__len"),
    )
    eligible = ex.where(F.col("__len") >= dedup_min_chars)
    # map-side partial agg collapses hot fingerprints pre-shuffle
    keepers = eligible.groupBy("__fp").agg(
        F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__keep")
    )
    # a sub-min-chars line's fingerprint can never match a keeper row
    # (same fingerprint == same content == same length), so the plain
    # left join is exact for the structural-line exemption too
    keep_cond = (F.col("__len") < dedup_min_chars) | (
        (F.col(f"__keep.{id_col}") == F.col(id_col))
        & (F.col("__keep.__pos") == F.col("__pos"))
    )
    rebuilt = (
        ex.join(keepers, on="__fp", how="left")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep_cond, F.struct("__pos", "__line"))
                        )
                    ),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("__text"),
            F.count(F.when(keep_cond, F.lit(1))).alias("__n_kept"),
            F.count(F.lit(1)).cast("int").alias("__n_lines"),
        )
    )
    base = df.select(F.col(id_col), F.col(col).alias("__orig"))
    return base.join(rebuilt, on=id_col, how="left").select(
        id_col,
        F.when(F.col("__orig").isNull(), F.lit(0))
        .otherwise(F.coalesce(F.col("__n_lines"), F.lit(0)))
        .alias("n_lines"),
        F.coalesce(F.col("__n_kept"), F.lit(0))
        .cast("int")
        .alias("n_lines_kept"),
        F.when(F.col("__orig").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("__text"), F.lit("")))
        .alias(out_col),
    )


def filter_lines(
    df: DataFrame,
    col: str = "text",
    sep: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = False,
    drop_if_contains: tuple[str, ...] = (),
    out_col: str = "text_filtered",
) -> DataFrame:
    """C4-style per-line quality filtering (Raffel et al. 2020 §2.2),
    zero-shuffle: a line survives iff it has at least ``min_words``
    space-separated words, (optionally) ends in ``. ! ? "``, and
    contains none of ``drop_if_contains`` (C4 drops lines with
    "javascript", cookie/policy boilerplate, etc.). Word count is
    ``size(split(line, ' '))`` — the same convention as
    extras/text.py and the DuckDB oracle.

    Adds ``n_lines``, ``n_lines_kept``, ``out_col``; NULL text stays
    NULL with zero counts. Pure Column expressions — the whole
    operator runs inside whole-stage codegen with no exchange.
    """

    def keep(x: Column) -> Column:
        c = F.size(F.split(x, " ")) >= min_words
        if require_terminal_punct:
            c = c & F.substring(x, -1, 1).isin(".", "!", "?", '"')
        for phrase in drop_if_contains:
            c = c & ~x.contains(phrase)
        return c

    lines = _split_literal(F.col(col), sep)
    kept = F.filter(lines, keep)
    return (
        df.withColumn(
            "n_lines", F.coalesce(F.size(lines), F.lit(0))
        )
        .withColumn("n_lines_kept", F.coalesce(F.size(kept), F.lit(0)))
        .withColumn(out_col, F.array_join(kept, sep))
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    n: int = 8,
    min_count: int = 2,
    out_col: str = "text_cut",
) -> DataFrame:
    """Exact duplicate-SPAN removal, the within-document surgery of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", ExactSubstr) approximated at fixed window size:
    every token covered by an n-token window whose exact text occurs
    at least ``min_count`` times across the WHOLE corpus (within-doc
    repeats included) is cut from the document; surviving tokens are
    re-joined in order. Like the released ExactSubstr tool, ALL
    occurrences of a duplicated span are removed — no global
    keeper-election pass is needed, which is what makes the operator
    one aggregate + two joins instead of an iterative fixpoint.

    Distinct from :func:`~datamatch_spark.extras.decontam.
    dup_ngram_stats` (which only MEASURES the duplicated fraction):
    this one rewrites the text. Returns ``(id_col, n_tokens,
    n_tokens_removed, out_col)``; NULL text stays NULL, docs shorter
    than ``n`` tokens are never cut.

    Plan shape at scale: gram df aggregate with map-side combine
    (shuffle carries (md5, count), never text), md5-keyed join back
    (dup side unique per fingerprint -> AQE skew-join splittable —
    the same hot-key story as :func:`dedup_lines`), covered-index
    explode bounded by n x duplicated-window count, one left-anti
    join, one per-doc rebuild aggregate. All JVM Column ops.
    """
    from .text import _gram_list

    if n < 2:
        raise ValueError("n must be >= 2 (n=1 would cut every dup token)")
    grams = df.select(
        F.col(id_col), F.posexplode(_gram_list(col, n)).alias("__pos", "__g")
    )
    dup = (
        grams.groupBy(F.md5("__g").alias("__fp"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("__fp")
    )
    dupw = grams.join(dup, F.md5(grams["__g"]) == dup["__fp"]).select(
        id_col, "__pos"
    )
    covered = dupw.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(n - 1))
        ).alias("__ti"),
    ).distinct()
    toks_ex = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(col), " ")).alias(
            "__ti", "__tok"
        )
    )
    kept = toks_ex.join(covered, on=[id_col, "__ti"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ti", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.col(col).alias("__orig"),
        F.coalesce(F.size(F.split(F.col(col), " ")), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    n_tok = F.when(F.col("__orig").isNull(), F.lit(0)).otherwise(
        F.col("n_tokens")
    )
    return base.join(rebuilt, on=id_col, how="left").select(
        id_col,
        n_tok.alias("n_tokens"),
        (n_tok - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("int")
        .alias("n_tokens_removed"),
        F.when(F.col("__orig").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("__text"), F.lit("")))
        .alias(out_col),
    )


#: PII patterns, restricted to the Java-regex ∩ RE2 subset (no
#: lookaround, no backreferences) so Spark and DuckDB run the SAME
#: string. Kept deliberately simple/high-precision — production
#: pipelines (e.g. BigCode's PII pass) layer model-based detection on
#: top; the regex tier is the cheap always-on floor.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(
    df: DataFrame,
    col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Regex PII redaction with per-document replacement counts.

    Replacement is STAGED — emails first, then IPv4, then phone — and
    each count is taken on the text as it stands at that stage, so
    ``n_emails + n_ips + n_phones`` is exactly the number of
    placeholder tokens inserted (an IP inside an email's domain is
    counted once, as the email). Zero-shuffle, pure Column.
    """
    t0 = F.col(col)
    n_emails = F.regexp_count(t0, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    zero_if_null = lambda c: F.when(t0.isNull(), F.lit(0)).otherwise(c)  # noqa: E731
    return (
        df.withColumn("n_emails", zero_if_null(n_emails))
        .withColumn("n_ips", zero_if_null(n_ips))
        .withColumn("n_phones", zero_if_null(n_phones))
        .withColumn(out_col, t3)
    )
