"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` — one entry per implemented operator family from
SURVEY.md §2 (+ the training-data extras); each callable takes
(spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for every
SQL-expressible query (same column names, floats rounded identically),
including recursive-CTE replicas of the JW/LCS kernels, the greedy
1:1 / clique-split graph ops, and deterministic-hash twins of the
MinHash/SimHash/sign-LSH pipelines. The remaining rows-only queries
are each structurally non-SQL (production xxhash64/Gaussian paths
whose det twins ARE oracled, streaming state, binary media decode)
and carry pytest equivalence/recall evidence instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

US = "\x1f"  # key component separator used by datamatch_spark.indices


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# matcher-family queries (SURVEY.md §2.2-2.8)
# ---------------------------------------------------------------------------


def q_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking + per-block pair-count metrics (§2.2 ColumnsIndex +
    §4 metrics)."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import block_statistics, keyed_side

    docs = _docs(spark, sf_dir)
    side = keyed_side(docs, ColumnsIndex(["lang", "source"]), "doc_id", ["n_chars"], "idx", "rec")
    return block_statistics(side, dedup=True).select("block_key", "n_rows", "n_pairs")


def q_block_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matcher's metrics-sink path end-to-end (north rule:
    per-partition lineage + per-block pair counts written alongside
    results): run a ThresholdMatcher with a MetricsSink, then read the
    per-block table BACK from its parquet sink and oracle it against
    the plain-SQL block statistics."""
    import tempfile

    from datamatch_spark import AbsoluteNumericalSimilarity, ThresholdMatcher
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.metrics import MetricsSink

    docs = _docs(spark, sf_dir)
    sink = MetricsSink(spark, tempfile.mkdtemp(prefix="dm_metrics_"))
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "source"]),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        docs,
        row_key="doc_id",
        validate=False,
        defer=True,
        metrics_sink=sink,
    )
    m.scored_pairs.count()  # materialize -> sink writes
    return sink.blocks().select("block_key", "n_rows", "n_pairs")


def q_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup candidate-pair generation (§2.3 DeduplicatePairer)."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    pairs = candidate_pairs(docs, ColumnsIndex(["lang", "source"]), "doc_id", ["n_chars"])
    return pairs.select("idx_a", "idx_b")


def q_absnum_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full matcher spine with a numeric similarity (§2.5/§2.8):
    block on lang, score AbsoluteNumericalSimilarity(50) on n_chars,
    slice [0.5, 1.0]."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.5, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_match_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A×B match-mode scoring through the grouped grid-cell path
    (§2.3 MatchPairer + §2.5): even doc_ids vs odd doc_ids, blocked on
    lang, AbsoluteNumericalSimilarity(50) on n_chars, slice
    [0.5, 1.0]. Bounded to doc_id < 500 so the greedy-1:1 recursive
    CTE oracle stays tractable at every sf (its cost is
    selections x pairs x used-list length)."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 2000)
    side_a = docs.where(F.col("doc_id") % 2 == 0)
    side_b = docs.where(F.col("doc_id") % 2 == 1)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        side_a,
        side_b,
        row_key="doc_id",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.5, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_relnum_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RelativeNumericalSimilarity over orders blocked by
    (o_orderpriority, o_orderdate) (§2.5)."""
    from datamatch_spark import ColumnsIndex, RelativeNumericalSimilarity, ThresholdMatcher

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = ThresholdMatcher(
        ColumnsIndex(["o_orderpriority", "o_orderdate"]),
        {"o_totalprice": RelativeNumericalSimilarity(30)},
        orders,
        row_key="o_orderkey",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.9, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_dissimilar_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DissimilarFilter pair predicate (§2.4)."""
    from datamatch_spark import DissimilarFilter
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["source"])
    flt = DissimilarFilter("source")
    kept = pairs.where(flt.predicate("a", "b", pairs.schema["a"].dataType))
    return kept.groupBy(F.col("a.source").alias("source_a")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def q_nonoverlap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NonOverlappingFilter range predicate over event sessions
    [ts, ts+value seconds] per user (§2.4)."""
    from datamatch_spark import NonOverlappingFilter
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("start"),
            F.timestamp_add("SECOND", F.col("value").cast("int"), F.col("ts")).alias("end"),
        )
    )
    pairs = candidate_pairs(ev, ColumnsIndex("user_id"), "event_id", ["start", "end"])
    flt = NonOverlappingFilter("start", "end")
    kept = pairs.where(flt.predicate("a", "b", pairs.schema["a"].dataType))
    return kept.select("idx_a", "idx_b")


def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (large-star/small-star §2.8) over the
    0.9-sliced absnum pair graph."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher
    from datamatch_spark.clustering import connected_components

    docs = _docs(spark, sf_dir)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    sliced = m.get_index_pairs_within_thresholds(0.9, 1.0)
    return connected_components(sliced.select("idx_a", "idx_b")).select(
        "node", "component"
    )


def q_cluster_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end clustering (CC + clique split §2.8) on an
    exact-equality pair graph — blocks are cliques, so clusters must
    equal the (lang, n_chars) groups of size > 1."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "n_chars"]),
        {"n_chars": AbsoluteNumericalSimilarity(10)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    asg = m.get_cluster_assignments(1.0, 1.0)
    w = Window.partitionBy("cluster_id")
    return asg.select(
        F.min("row_key").over(w).alias("cluster_rep"),
        F.col("row_key").alias("doc_id"),
    )


def q_all_pairs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-pairs report frame (§2.8 result projection): two rows
    per pair, joined back to source columns, pair_idx by rank."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir).where(F.col("lang") == "en")
    m = ThresholdMatcher(
        ColumnsIndex("source"),
        {"n_chars": AbsoluteNumericalSimilarity(20)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    rep = m.get_all_pairs(0.9, 1.0)
    return rep.select(
        "pair_idx",
        F.round("sim_score", 6).alias("sim_score"),
        F.col("row_key").alias("doc_id"),
        "lang",
        "source",
        "n_chars",
    )


def q_noop_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NoopIndex full cross product (§2.2) — guarded to a small slice
    because the operator is by definition quadratic."""
    from datamatch_spark.indices import NoopIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    pairs = candidate_pairs(docs, NoopIndex(), "doc_id", ["n_chars"])
    return pairs.select("idx_a", "idx_b")


def q_index_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColumnsIndex(index_elements=True) (§2.2): rows block on EVERY
    element of an array key column (multi-bucket; pairs deduped)."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("lang") == "fr")
        .withColumn("toks", F.slice(F.split("text", " "), 1, 3))
    )
    pairs = candidate_pairs(
        docs, ColumnsIndex("toks", index_elements=True), "doc_id", ["n_chars"]
    )
    return pairs.select("idx_a", "idx_b")


def q_match_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-mode (two-dataset) blocked candidate generation — the
    tutorial-shaped linkage join (§2.3 MatchPairer; reference
    doc/tutorial.rst:39-119)."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    # Split on doc_id % 40 (NOT % 2 or % 4: the corpus generator assigns
    # source = src{doc_id % 20}, so any split on a modulus dividing 20
    # is perfectly source-correlated and the (lang, source) join would
    # be empty by construction).  With % 40, source k lands at
    # %40 ∈ {k, k+20} — one residue on each side, real join output.
    dfa = docs.where(F.col("doc_id") % 40 < 20)
    dfb = docs.where(F.col("doc_id") % 40 >= 20)
    pairs = candidate_pairs(
        dfa, ColumnsIndex(["lang", "source"]), "doc_id", ["n_chars"], dfb=dfb
    )
    return pairs.select("idx_a", "idx_b")


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo 1995): global
    sort by (n_chars, doc_id), pair rows < 5 positions apart. Rank via
    the distributed two-phase global_rank; pairs via the multi-bucket
    equality encoding (indices.SortedNeighborhoodIndex)."""
    from datamatch_spark.indices import SortedNeighborhoodIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    pairs = candidate_pairs(
        docs, SortedNeighborhoodIndex(["n_chars"], window=5), "doc_id", []
    )
    return pairs.select("idx_a", "idx_b")


def q_sorted_neighborhood_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-mode (two-dataset) sorted-neighborhood — the linkage case
    of Hernández-Stolfo 1995: rank the TAGGED UNION of A and B once
    (ties by (side, doc_id)), candidates are cross-side rows < 5
    merged-sort positions apart (SortedNeighborhoodIndex.key_df_pair)."""
    from datamatch_spark.indices import SortedNeighborhoodIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    dfa = docs.where(F.col("doc_id") % 40 < 20)
    dfb = docs.where(F.col("doc_id") % 40 >= 20)
    pairs = candidate_pairs(
        dfa, SortedNeighborhoodIndex(["n_chars"], window=5), "doc_id", [],
        dfb=dfb,
    )
    return pairs.select("idx_a", "idx_b")


def q_qgram_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-gram fuzzy blocking (Christen 2012 §4.4) over a VARIED key —
    the first token of ``text`` (~30 distinct words) — with the
    ``max_df=30`` stop-gram cap active: candidates share at least one
    NON-stop 3-gram. Both halves of the operator are exercised and
    oracle-checked: selectivity (the result is far below C(n,2) —
    blocking actually prunes) and posting-list pruning (grams in more
    than 30 docs, e.g. the 'mer' shared by customer/merge, drop on
    both sides)."""
    from datamatch_spark.indices import QGramIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).withColumn(
        "w0", F.split(F.col("text"), " ").getItem(0)
    )
    pairs = candidate_pairs(docs, QGramIndex("w0", q=3, max_df=30), "doc_id", [])
    return pairs.select("idx_a", "idx_b")


def q_suffix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005; Christen 2012 §4.5)
    over the first token of ``text``, with the too-frequent-suffix cap
    active (``max_block_size=30``): candidates share at least one
    NON-hot suffix of length >= 4 (or an exact sub-4-char key). Both
    halves are oracle-checked: suffix generation/joining AND
    posting-list pruning with the whole-string equality exemption."""
    from datamatch_spark.indices import SuffixArrayIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).withColumn(
        "w0", F.split(F.col("text"), " ").getItem(0)
    )
    pairs = candidate_pairs(
        docs, SuffixArrayIndex("w0", min_len=4, max_block_size=30), "doc_id", []
    )
    return pairs.select("idx_a", "idx_b")


def q_phonetic_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic (Soundex) blocking (Christen §4.3). Hard oracle: DuckDB
    has no built-in soundex, so ``oracle_sql()`` carries a pure-SQL
    American Soundex (``_duckdb_soundex``) replicating Spark's exact
    semantics; the index is ALSO cross-checked in pytest against an
    independent pure-Python Soundex reimplementation."""
    from datamatch_spark.indices import PhoneticIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).withColumn(
        "w0", F.split(F.col("text"), " ").getItem(0)
    )
    # doc_id predicate, NOT .limit(): limit's row choice is partition-
    # order-dependent in general; a key predicate is deterministic by
    # construction across any re-partitioning of the read
    pairs = candidate_pairs(
        docs.where(F.col("doc_id") < 200), PhoneticIndex("w0"), "doc_id", []
    )
    return pairs.select("idx_a", "idx_b")


def q_qgram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-evaluation metrics for the CAPPED QGramIndex against
    the same-first-token truth rule: quantifies that the max_df
    stop-gram cap buys its reduction ratio at ZERO pairs-completeness
    cost on this corpus (same-token pairs always share a non-stop
    gram; the dropped 'mer' only carried cross-token customer/merge
    noise)."""
    from datamatch_spark.indices import QGramIndex
    from datamatch_spark.metrics import blocking_quality

    docs = _docs(spark, sf_dir).withColumn(
        "w0", F.split(F.col("text"), " ").getItem(0)
    )
    a = docs.select(F.col("doc_id").alias("idx_a"), F.col("w0").alias("__wa"))
    b = docs.select(F.col("doc_id").alias("idx_b"), F.col("w0").alias("__wb"))
    truth = a.join(
        b,
        (F.col("__wa") == F.col("__wb")) & (F.col("idx_a") < F.col("idx_b")),
    ).select("idx_a", "idx_b")
    return blocking_quality(docs, QGramIndex("w0", q=3, max_df=30), "doc_id", truth)


def _eval_labels(spark: SparkSession, sf_dir: str):
    """(pred, truth) labelings for the cluster-evaluation metrics:
    truth = the lowercased first token of ``text`` (the 'entity'),
    pred = its 4-char prefix block (a deliberately coarse clustering,
    so precision < 1 while recall = 1 — both directions exercised)."""
    base = (
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.lower(F.split(F.col("text"), " ").getItem(0)).alias("qk"),
        )
        .where(F.length("qk") > 0)
    )
    pred = base.select("doc_id", F.substring("qk", 1, 4).alias("group_id"))
    truth = base.select("doc_id", F.col("qk").alias("true_id"))
    return pred, truth


def q_pairwise_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted clustering vs gold
    labels (Menestrina et al., VLDB 2010) — the north rule's acceptance
    metric, via the contingency formulation (no pair set materialized,
    exact at any cluster size)."""
    from datamatch_spark.metrics import pairwise_f1

    pred, truth = _eval_labels(spark, sf_dir)
    return pairwise_f1(pred, truth, "doc_id")


def q_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998; Amigó et al.
    2009) over the same labelings — the per-item complement to pairwise
    F1's quadratic cluster weighting."""
    from datamatch_spark.metrics import bcubed

    pred, truth = _eval_labels(spark, sf_dir)
    return bcubed(pred, truth, "doc_id")


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-evaluation metrics (Christen 2012 ch. 7): reduction
    ratio / pairs completeness / pairs quality of ColumnsIndex("lang")
    against a deterministic truth rule (same source, |n_chars diff| <
    20)."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.metrics import blocking_quality

    docs = _docs(spark, sf_dir)
    a = docs.select(
        F.col("doc_id").alias("idx_a"),
        F.col("source").alias("__sa"),
        F.col("n_chars").alias("__na"),
    )
    b = docs.select(
        F.col("doc_id").alias("idx_b"),
        F.col("source").alias("__sb"),
        F.col("n_chars").alias("__nb"),
    )
    truth = (
        a.join(b, (F.col("__sa") == F.col("__sb"))
               & (F.col("idx_a") < F.col("idx_b"))
               & (F.abs(F.col("__na") - F.col("__nb")) < 20))
        .select("idx_a", "idx_b")
    )
    return blocking_quality(docs, ColumnsIndex("lang"), "doc_id", truth)


def q_cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_clusters_within_threshold end-to-end (§2.8): blocks are
    cliques by construction (single-valued block keys ⇒ components =
    blocks = complete graphs) but scores are non-trivial, so
    cluster_idx / pair_idx / the two-row projection are all
    SQL-reproducible (reference matchers.py:237-274)."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = ThresholdMatcher(
        ColumnsIndex(["o_orderpriority", "o_orderdate"]),
        {"o_totalprice": AbsoluteNumericalSimilarity(1_000_000)},
        orders,
        row_key="o_orderkey",
        validate=False,
    )
    rep = m.get_clusters_within_threshold(0.4, 1.0)
    return rep.select(
        "cluster_idx",
        "pair_idx",
        F.round("sim_score", 6).alias("sim_score"),
        F.col("row_key").alias("o_orderkey"),
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_multiindex_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiIndex OR mode (§2.2): union of sub-index key sets with
    merge-by-equal-key; pairs deduped across buckets."""
    from datamatch_spark import ColumnsIndex, MultiIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    idx = MultiIndex([ColumnsIndex("lang"), ColumnsIndex("source")])
    pairs = candidate_pairs(docs, idx, "doc_id", ["n_chars"])
    return pairs.select("idx_a", "idx_b")


def q_multiindex_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiIndex AND mode (§2.2): composite keys — pairs must share a
    bucket under every child index."""
    from datamatch_spark import ColumnsIndex, MultiIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir)
    idx = MultiIndex(
        [ColumnsIndex("lang"), ColumnsIndex("source")], combine_keys=True
    )
    pairs = candidate_pairs(docs, idx, "doc_id", ["n_chars"])
    return pairs.select("idx_a", "idx_b")


def q_sample_pairs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_sample_pairs report (§2.8): per score range, the
    sample_counts LOWEST-scored pairs, printed descending."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir).where(F.col("lang") == "de")
    m = ThresholdMatcher(
        ColumnsIndex("source"),
        {"n_chars": AbsoluteNumericalSimilarity(40)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    rep = m.get_sample_pairs(sample_counts=3, lower_bound=0.7, upper_bound=1.0, step=0.1)
    return rep.select(
        "score_range",
        "pair_idx",
        F.round("sim_score", 6).alias("sim_score"),
        F.col("row_key").alias("doc_id"),
        "n_chars",
    )


def q_swap_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Swap variator max-over-variants with PURE-NUMERIC similarities
    (§2.7): exactly SQL-expressible, so the variator semantics — max
    RMS score over the valid variant combos, swap skipped when the two
    values are equal — get a hard oracle (the JW-based swap query stays
    rows-only). Uses the shared-similarity permutation identity: with
    one similarity for both fields, combo(a-swapped, b-plain) equals
    combo(a-plain, b-swapped) and combo(both) equals combo(none), so
    the oracle needs only greatest(c00, c01) under the validity
    guard."""
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        ColumnsIndex,
        Swap,
        ThresholdMatcher,
    )

    docs = (
        _docs(spark, sf_dir)
        .withColumn("p", F.col("n_chars").cast("double"))
        .withColumn("q", ((F.col("doc_id") * 7) % 500).cast("double"))
    )
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"p": AbsoluteNumericalSimilarity(60), "q": AbsoluteNumericalSimilarity(60)},
        docs,
        row_key="doc_id",
        validate=False,
        variator=Swap("p", "q"),
    )
    return m.get_index_pairs_within_thresholds(0.7, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_date_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateSimilarity over orders, ALL three stages (§2.5). Hard oracle:
    stage 3's indel-ratio is reproduced in pure DuckDB SQL by an LCS
    recursive CTE (``_duckdb_lcs_chain`` — the kernel's cummax row
    recurrence), so the full three-stage cascade is rows+schema+hash
    checked (upgraded from rows-only in r5)."""
    from datamatch_spark import ColumnsIndex, DateSimilarity, ThresholdMatcher

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "odate", F.col("o_orderdate").cast("date")
    )
    m = ThresholdMatcher(
        ColumnsIndex(["o_orderpriority", "o_custkey"]),
        {"odate": DateSimilarity(30)},
        orders,
        row_key="o_orderkey",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.4, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_date_scored_pairs_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateSimilarity stages 1-2 with stage-3 pairs excluded (§2.5).

    Stage 3 (same year + same day-of-month, far apart) scores with the
    indel-ratio kernel, which SQL cannot reproduce — so those (rare)
    pairs are excluded identically on BOTH sides, converting the other
    ~95%+ of date scoring from a rows-only check to a hard DuckDB
    oracle (reference similarities.py:166-180). The rows-only
    ``date_scored_pairs`` still covers stage 3."""
    from datamatch_spark import ColumnsIndex, DateSimilarity, ThresholdMatcher

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "odate", F.col("o_orderdate").cast("date")
    )
    m = ThresholdMatcher(
        ColumnsIndex(["o_orderpriority", "o_custkey"]),
        {"odate": DateSimilarity(30)},
        orders,
        row_key="o_orderkey",
        validate=False,
    )
    pairs = m.get_index_pairs_within_thresholds(0.4, 1.0)
    da = orders.select(F.col("o_orderkey").alias("idx_a"), F.col("odate").alias("__da"))
    db = orders.select(F.col("o_orderkey").alias("idx_b"), F.col("odate").alias("__db"))
    j = pairs.join(F.broadcast(da), "idx_a").join(F.broadcast(db), "idx_b")
    days = F.abs(F.datediff("__da", "__db"))
    same_year = F.year("__da") == F.year("__db")
    stage1 = days < 30
    stage2 = (
        same_year
        & (F.month("__da") == F.dayofmonth("__db"))
        & (F.dayofmonth("__da") == F.month("__db"))
    )
    stage3 = (
        ~stage1 & ~stage2 & same_year
        & (F.dayofmonth("__da") == F.dayofmonth("__db"))
    )
    return j.where(~stage3).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision summary (§2.1)."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        docs,
        row_key="doc_id",
        validate=False,
    )
    return m.decision_counts(0.8)


def q_greedy_one_to_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-mode greedy 1:1 pruning (§2.8). The sequential
    highest-score-first semantics ARE SQL-expressible: a recursive CTE
    that repeatedly picks the lowest-rank pair with both endpoints
    unused (equivalent to the one-pass greedy scan, since conflicts
    only grow) — see oracle_sql()["greedy_one_to_one"]."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    docs = _docs(spark, sf_dir)
    dfa = docs.where(F.col("doc_id") % 2 == 0)
    dfb = docs.where(F.col("doc_id") % 2 == 1)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        dfa,
        dfb,
        row_key="doc_id",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.5, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_jw_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler-scored dedup (§2.5 string kernels). Hard oracle:
    the python-Levenshtein JW variant (phase-dependent window, greedy
    matching, order-vs-rank transpositions, uncapped prefix) is
    reproduced in pure DuckDB SQL by a recursive CTE whose state is the
    matched-position list (``_duckdb_jw_chain``) — upgraded from
    rows-only in r5. Transliteration is identity here (the corpus text
    is ASCII; asserted by tests/test_entry.py)."""
    from datamatch_spark import ColumnsIndex, JaroWinklerSimilarity, ThresholdMatcher

    docs = _docs(spark, sf_dir).withColumn("prefix", F.substring("text", 1, 40))
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "source"]),
        {"prefix": JaroWinklerSimilarity()},
        docs,
        row_key="doc_id",
        validate=False,
    )
    return m.get_index_pairs_within_thresholds(0.75, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_jw_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL dedup composition under one hard oracle (§2.5 + §2.8):
    JW kernel scoring -> inclusive threshold slice -> connected
    components -> greedy clique split -> (cluster_rep, member). The
    oracle chains ``_duckdb_jw_chain`` into
    ``_duckdb_greedy_clique_chain`` — the first rows+schema+hash check
    of the clique-split stage on NON-clique components (threshold 0.70
    gives 15 of them here; ``cluster_exact``'s exact-key components are
    always cliques so its oracle never exercised the split)."""
    from datamatch_spark import ColumnsIndex, JaroWinklerSimilarity, ThresholdMatcher
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).withColumn("prefix", F.substring("text", 1, 40))
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "source"]),
        {"prefix": JaroWinklerSimilarity()},
        docs,
        row_key="doc_id",
        validate=False,
    )
    asg = m.get_cluster_assignments(0.70, 1.0)
    w = Window.partitionBy("cluster_id")
    return asg.select(
        F.min("row_key").over(w).alias("cluster_rep"),
        F.col("row_key").alias("doc_id"),
    )


def q_spans_matcher_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition under a HARD oracle: interleaved
    (doc_id, spans) input -> span-kind field projection -> THREE-sim
    matcher (JW last + JW first + DateSimilarity dob, SimSumScorer
    RMS) -> inclusive threshold slice -> connected components ->
    greedy clique split -> (cluster_rep, doc_id). The spans array is
    built deterministically from ``documents.parquet`` with
    SQL-expressible transforms so DuckDB can reconstruct the same
    fields; the oracle chains ``_duckdb_jw_chain`` (both name fields
    in one pass via +1e8 pair-id offsetting), the 3-stage date logic
    + ``_duckdb_lcs_chain``, RMS, and
    ``_duckdb_greedy_clique_chain``. Unlike ``jw_clusters`` (single
    sim), this value-checks the multi-similarity RMS composition and
    the BASELINE.json input shape end-to-end."""
    from datamatch_spark import (
        ColumnsIndex,
        DateSimilarity,
        JaroWinklerSimilarity,
        ThresholdMatcher,
    )
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.substring("text", 1, 18).alias("lastn"),
        F.substring("text", 20, 10).alias("firstn"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            ((F.col("doc_id") * 13) % 700).cast("int"),
        ).alias("dob"),
    )
    nul = F.lit(None).cast("string")
    spans_docs = base.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("name").alias("kind"),
                F.concat_ws("|", "lastn", "firstn").alias("text"),
                nul.alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("meta").alias("kind"),
                F.concat_ws(":", "lang", "source").alias("text"),
                nul.alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("dob").alias("kind"),
                F.col("dob").cast("string").alias("text"),
                nul.alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                nul.alias("text"),
                F.concat(F.lit("img://"), F.col("doc_id")).alias("media_ref"),
                F.lit(3).alias("offset"),
            ),
        ).alias("spans"),
    )
    name = F.expr("filter(spans, s -> s.kind = 'name')[0].text")
    meta = F.expr("filter(spans, s -> s.kind = 'meta')[0].text")
    fields = spans_docs.select(
        "doc_id",
        F.split(name, "\\|", 2).getItem(0).alias("lastn"),
        F.split(name, "\\|", 2).getItem(1).alias("firstn"),
        F.split(meta, ":", 2).getItem(0).alias("lang"),
        F.split(meta, ":", 2).getItem(1).alias("source"),
        F.to_date(F.expr("filter(spans, s -> s.kind = 'dob')[0].text")).alias("dob"),
    )
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "source"]),
        {
            "lastn": JaroWinklerSimilarity(),
            "firstn": JaroWinklerSimilarity(),
            "dob": DateSimilarity(),
        },
        fields,
        row_key="doc_id",
        validate=False,
    )
    asg = m.get_cluster_assignments(0.60, 1.0)
    w = Window.partitionBy("cluster_id")
    return asg.select(
        F.min("row_key").over(w).alias("cluster_rep"),
        F.col("row_key").alias("doc_id"),
    )


def q_spans_corpus_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: interleaved (doc_id, spans) corpus -> field projection
    -> JW+date matcher -> cluster assignments (rows-only; exercises the
    BASELINE.json input shape end-to-end)."""
    from datamatch_spark import (
        ColumnsIndex,
        DateSimilarity,
        JaroWinklerSimilarity,
        ThresholdMatcher,
    )
    from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields

    cfg = CorpusConfig(n_docs=900, seed=11, profile="clean")
    docs = generate_documents(spark, cfg)
    fields = project_fields(docs).drop("spans")
    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {
            "last": JaroWinklerSimilarity(),
            "first": JaroWinklerSimilarity(),
            "dob": DateSimilarity(),
        },
        fields,
        row_key="doc_id",
        validate=False,
    )
    from pyspark.sql import Window

    asg = m.get_cluster_assignments(0.8, 1.0)
    w = Window.partitionBy("cluster_id")
    return asg.select(
        F.min("row_key").over(w).alias("cluster_rep"),
        F.col("row_key").alias("doc_id"),
    )


def q_swap_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH-mode Swap (§2.7 + §2.8 composed): two datasets, Swap
    variator max-over-variants with pure-numeric similarities, then
    greedy 1:1 pruning — the variants+pruning COMPOSITION under a hard
    oracle (recursive-CTE greedy over the swap-max scores, like
    ``greedy_one_to_one``). Replaces the retired rows-only
    ``swap_variator`` entry (VERDICT r4 #7); JW-swap dedup stays
    covered by the er_swap bench and pair-set parity pytest."""
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        ColumnsIndex,
        Swap,
        ThresholdMatcher,
    )

    docs = (
        _docs(spark, sf_dir)
        .withColumn("p", F.col("n_chars").cast("double"))
        .withColumn("q", ((F.col("doc_id") * 7) % 500).cast("double"))
    )
    dfa = docs.where(F.col("doc_id") % 2 == 0)
    dfb = docs.where(F.col("doc_id") % 2 == 1)
    m = ThresholdMatcher(
        ColumnsIndex("lang"),
        {"p": AbsoluteNumericalSimilarity(60), "q": AbsoluteNumericalSimilarity(60)},
        dfa,
        dfb,
        row_key="doc_id",
        validate=False,
        variator=Swap("p", "q"),
    )
    return m.get_index_pairs_within_thresholds(0.7, 1.0).select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


# ---------------------------------------------------------------------------
# training-data extras
# ---------------------------------------------------------------------------


def q_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighted-cosine similarity self-join (AllPairs-style
    prefix filtering; extras/tfidf.py). Hard oracle: deterministic
    float64 pipeline (single-space tokens, smoothed idf, L2 norm,
    exact dot) reproduced verbatim in DuckDB SQL; the prefix filter is
    recall-lossless so the oracle needs no pruning logic at all."""
    from datamatch_spark.extras.tfidf import tfidf_cosine_pairs

    docs = _docs(spark, sf_dir)
    return tfidf_cosine_pairs(docs, "doc_id", threshold=0.8).select(
        "idx_a", "idx_b", F.round("cosine", 6).alias("cosine")
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window sequence chunking (extras/packing.py
    chunk_documents — training-loader prep): 40-token chunks, 8-token
    overlap (stride 32), trailing all-overlap chunks suppressed.
    Zero-shuffle row-local plan (scan -> Generate -> projection).
    Hard oracle: identical token arithmetic over string_split in
    DuckDB (range starts, list slice, least)."""
    from datamatch_spark.extras.packing import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), max_tokens=40, overlap=8
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (extras/urls.cap_per_domain): keep at
    most 3 docs per registered domain, chosen by ascending
    md5('r5', doc_id) — the link-farm suppression step, deterministic
    under repartition/retry. Skew-safe two-phase bottom-k (pre-cut
    within md5-derived shards is lossless, pinned by pytest). Hard
    oracle: the shared URL->domain CTE chain + the same md5 rank in a
    SQL window."""
    from datamatch_spark.extras.urls import cap_per_domain

    docs = _docs(spark, sf_dir).select("doc_id", _url_expr().alias("url"))
    return cap_per_domain(docs, "url", 3, salt="r5").select("doc_id", "domain")


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition under ONE chained oracle (the
    training-loader analogue of ``clean_pipeline``): per-domain
    frequency cap (3 docs/registered domain, md5 'r5' rank) ->
    sliding-window chunking (40 tokens, overlap 8) -> quota shard
    packing of the CHUNKS (max 2000 tokens, 16 md5 'pack' buckets,
    chunk_id = doc_id:chunk_idx string order). Checks the stage
    INTERFACES, not just each stage alone — the oracle chains the
    URL->domain CTE, the chunk arithmetic, and the cumsum window in
    one statement."""
    from datamatch_spark.extras.packing import chunk_documents, pack_quota
    from datamatch_spark.extras.urls import cap_per_domain

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", _url_expr().alias("url")
    )
    kept = cap_per_domain(docs, "url", 3, salt="r5")
    chunks = chunk_documents(kept, max_tokens=40, overlap=8).select(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")).alias("chunk_id"),
        "chunk_text",
    )
    return pack_quota(
        chunks, 2000, id_col="chunk_id", text_col="chunk_text", n_buckets=16
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): flag train
    docs sharing any 5-token-gram with a held-out eval set (here the
    deterministic doc_id % 20 == 0 slice). Broadcast eval grams, one
    narrow groupBy — the 100 TB shape (extras/decontam.py). Hard
    oracle: the hash_grams=True engine path must produce counts
    identical to DuckDB's gram-STRING join (collision-free check)."""
    from datamatch_spark.extras.decontam import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(
        docs.where(F.col("doc_id") % 20 != 0),
        docs.where(F.col("doc_id") % 20 == 0),
        n=5,
    )


def q_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (extras/bloom.py): the eval side's
    5-gram set summarized as a fixed 2^16-bit array (built via
    byte-index bit_or aggregation), train grams probed by one
    Arrow-vectorized bit test — no broadcast gram TABLE, so the eval
    side may be arbitrarily large. m is deliberately small here so
    false positives occur at sf0.01 and the oracle must reproduce
    them: DuckDB rebuilds the exact md5-slice position set and flags a
    gram when all k=4 positions appear — bit-identical semantics to
    the engine's bitset probe, FPs included."""
    from datamatch_spark.extras.bloom import bloom_decontaminate

    docs = _docs(spark, sf_dir)
    return bloom_decontaminate(
        docs.where(F.col("doc_id") % 20 != 0),
        docs.where(F.col("doc_id") % 20 == 0),
        n=5,
        m_bits=1 << 16,
        k=4,
    )


def q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-8-gram fraction per document (the
    Gopher/RefinedWeb duplicate-text-fraction signal): inverted-index
    aggregate, df>1 filter BEFORE the join back
    (extras/decontam.py)."""
    from datamatch_spark.extras.decontam import dup_ngram_stats

    return dup_ngram_stats(_docs(spark, sf_dir), n=8).select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round("dup_fraction", 6).alias("dup_fraction"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (extras/sampling.py):
    per-language keep rates decided by content hash (md5 buckets), so
    the kept set is identical on any partitioning/retry/engine — the
    reproducibility property df.sample() lacks. Hard oracle: same md5
    arithmetic in DuckDB."""
    from datamatch_spark.extras.sampling import stratified_deterministic_sample

    docs = _docs(spark, sf_dir)
    return stratified_deterministic_sample(
        docs,
        key_col="doc_id",
        strata_col="lang",
        fractions={"en": 0.5, "de": 0.25, "zh": 1.0},
        default_fraction=0.1,
        salt="r5",
    ).select("doc_id", "lang")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.text import with_token_count

    return with_token_count(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_distinct_tokens"
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.text import with_fingerprint

    return with_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.text import with_quality

    return with_quality(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "distinct_ratio", "avg_token_len", "quality_score"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.text import with_lang_id

    return with_lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "hits_en", "hits_es", "hits_de", "hits_fr", "lang_pred"
    )


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-budget estimators (extras/text.py): GPT-2-style
    pre-tokenizer piece count via a Java/RE2-shared regex + the
    chars/4 heuristic. Hard oracle: same regex under DuckDB's RE2."""
    from datamatch_spark.extras.text import with_bpe_token_estimate

    return with_bpe_token_estimate(_docs(spark, sf_dir)).select(
        "doc_id", "n_bpe_pieces", "est_tokens_chars"
    )


def _duckdb_bpe_tokens_sql() -> str:
    """Interpolates the ONE regex definition (text.BPE_PIECE_RE) so
    engine and oracle cannot drift — the pattern uses only the
    Java/RE2 shared syntax subset and contains no SQL-quote chars."""
    from datamatch_spark.extras.text import BPE_PIECE_RE

    assert "'" not in BPE_PIECE_RE
    return f"""
        SELECT doc_id,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(regexp_extract_all(text, '{BPE_PIECE_RE}'))
               END AS n_bpe_pieces,
               CAST(ceil(COALESCE(len(text), 0) / 4.0) AS INT)
                 AS est_tokens_chars
        FROM documents
    """


# shared by q_repetition_signals and its oracle generator
_REP_TOP_NS = (2, 3)
_REP_DUP_NS = (5,)


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document Gopher repetition signals (extras/text.py
    repetition_signals): top-{2,3}-gram character fraction + duplicated
    5-gram character fraction — one (id, n, gram) count shuffle with
    map-side combine, no UDFs. Hard oracle: identical gram/count/mass
    arithmetic in DuckDB."""
    from datamatch_spark.extras.text import repetition_signals

    return repetition_signals(
        _docs(spark, sf_dir), top_ns=_REP_TOP_NS, dup_ns=_REP_DUP_NS
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's
    own unigram model (extras/lm.py) — the CCNet-style LM quality
    signal with a unigram model. Counts groupBy + broadcast counts
    join (vocab-sized build side, no token-keyed shuffle); hard oracle
    replicates ln(c/N) float64 arithmetic in DuckDB."""
    from datamatch_spark.extras.lm import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_tokens",
        F.round("avg_logprob", 6).alias("avg_logprob"),
    )


_DSIR_BUCKETS = 1000
_DSIR_ALPHA = 1.0


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.dsir import dsir_logweights, hashed_ngram_counts

    docs = _docs(spark, sf_dir)
    tgt = hashed_ngram_counts(
        docs.where(F.col("lang") == "en"),
        n_max=2,
        buckets=_DSIR_BUCKETS,
        hash_fn="md5",
    )
    return dsir_logweights(
        docs, tgt, n_max=2, buckets=_DSIR_BUCKETS, alpha=_DSIR_ALPHA, hash_fn="md5"
    )


def q_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, extras/dsir.py):
    hashed uni+bigram bucket models (target = the corpus's English
    docs, raw = everything), per-doc sum of tf * log-likelihood
    ratios. Model tables are bucket-bounded and broadcast — no
    feature-keyed shuffle at any corpus size. Hard oracle replicates
    the md5 bucketing + Laplace-smoothed ln arithmetic in DuckDB."""
    return _dsir_weights(spark, sf_dir).select(
        "doc_id",
        "n_feats",
        F.round("log_weight", 6).alias("log_weight"),
    )


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step (extras/dsir.py): deterministic Gumbel
    top-k over the importance weights — sample k docs without
    replacement proportionally to exp(log_weight), noise derived from
    md5(salt, id) so the chosen set is layout/retry/engine-invariant.
    Runs as TakeOrderedAndProject (per-partition heaps, no global
    sort). Hard oracle: same md5 -> uniform -> Gumbel arithmetic."""
    from datamatch_spark.extras.dsir import gumbel_topk

    return gumbel_topk(_dsir_weights(spark, sf_dir), k=50, salt="r5").select(
        "doc_id",
        F.round("gumbel_key", 6).alias("gumbel_key"),
    )


_PACK_MAX_TOKENS = 500
_PACK_BUCKETS = 8


def q_pack_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment, quota strategy (extras/
    packing.py): shard = floor(tokens-before / max_tokens) in id order
    within an md5 hash bucket. Pure window cumsum (whole-stage
    codegen); hard oracle via the identical window in DuckDB."""
    from datamatch_spark.extras.packing import pack_quota

    return pack_quota(
        _docs(spark, sf_dir), _PACK_MAX_TOKENS, n_buckets=_PACK_BUCKETS
    )


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment, first-fit greedy strategy
    (extras/packing.py): a shard closes when the next doc would
    overflow max_tokens — no shard exceeds the budget except a
    singleton oversized doc. Sequential reset-state runs per hash
    bucket in one Arrow batch; hard oracle via a recursive CTE
    stepping the same per-bucket greedy state in DuckDB."""
    from datamatch_spark.extras.packing import pack_greedy

    return pack_greedy(
        _docs(spark, sf_dir), _PACK_MAX_TOKENS, n_buckets=_PACK_BUCKETS
    )


def _duckdb_repetition_sql(
    top_ns: tuple[int, ...], dup_ns: tuple[int, ...]
) -> str:
    """DuckDB replica of ``repetition_signals``: per-n ALL-gram unions
    (with repeats), (doc, n, gram) counts, per-(doc, n) top mass
    max(count·len) and dup mass sum(count·len | count ≥ 2), widened by
    conditional aggregation, fractions over len(text) with the dup cap
    at 1.0 and 0.0 for empty/NULL text."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    parts = []
    for n in all_ns:
        gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
        # range(1, len - n + 2) is empty when len(t) < n — short docs
        # contribute no n-grams, like the Spark side's empty array
        parts.append(
            f"SELECT doc_id, {n} AS n, {gram} AS g "
            f"FROM toks, UNNEST(range(1, len(t) - {n - 2})) u(i)"
        )
    union = "\n  UNION ALL ".join(parts)
    sel_top = ", ".join(
        f"max(CASE WHEN n = {n} THEN topm END) AS topm_{n}" for n in top_ns
    )
    sel_dup = ", ".join(
        f"max(CASE WHEN n = {n} THEN dupm END) AS dupm_{n}" for n in dup_ns
    )
    out_top = ", ".join(
        f"round(CASE WHEN b.n_chars > 0 THEN COALESCE(w.topm_{n}, 0) / "
        f"CAST(b.n_chars AS DOUBLE) ELSE 0.0 END, 6) "
        f"AS top_{n}gram_char_frac"
        for n in top_ns
    )
    out_dup = ", ".join(
        f"round(least(1.0, CASE WHEN b.n_chars > 0 THEN "
        f"COALESCE(w.dupm_{n}, 0) / CAST(b.n_chars AS DOUBLE) "
        f"ELSE 0.0 END), 6) AS dup_{n}gram_char_frac"
        for n in dup_ns
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
), allg AS (
  {union}
), cnts AS (
  SELECT doc_id, n, g, count(*) AS c FROM allg GROUP BY 1, 2, 3
), per AS (
  SELECT doc_id, n, max(c * len(g)) AS topm,
         sum(CASE WHEN c >= 2 THEN c * len(g) ELSE 0 END) AS dupm
  FROM cnts GROUP BY 1, 2
), wide AS (
  SELECT doc_id, {sel_top}, {sel_dup} FROM per GROUP BY doc_id
), base AS (
  SELECT doc_id, COALESCE(len(text), 0) AS n_chars FROM documents
)
SELECT b.doc_id, CAST(b.n_chars AS INT) AS n_chars, {out_top}, {out_dup}
FROM base b LEFT JOIN wide w USING (doc_id)
"""


def _docs_with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic line boundaries: the corpus text
    has no newlines, so every literal ' table ' becomes one (both
    sides: Spark replace() and DuckDB replace() are the same
    left-to-right non-overlapping literal substitution)."""
    return _docs(spark, sf_dir).withColumn(
        "text", F.expr("replace(text, ' table ', '\\n')")
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL exact line-level dedup (C4/CCNet keep-first; see
    extras/cleaning.py): every distinct non-empty line keeps only its
    (doc_id, position)-minimal occurrence across the corpus and each
    document is reassembled. One md5-keyed agg+join — hot/empty lines
    exempted BEFORE the shuffle. Hard oracle: DuckDB window-free
    arg-min replica keyed on the line STRING, so it also
    collision-checks the engine's md5 join keys."""
    from datamatch_spark.extras.cleaning import dedup_lines

    return dedup_lines(_docs_with_lines(spark, sf_dir))


def q_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-line quality filter (extras/cleaning.py): keep
    lines with >= 3 space-separated words that don't contain the stop
    phrase 'slow slow'; zero-shuffle pure-Column plan. Hard oracle:
    list_filter replica in DuckDB."""
    from datamatch_spark.extras.cleaning import filter_lines

    return filter_lines(
        _docs_with_lines(spark, sf_dir),
        min_words=3,
        drop_if_contains=("slow slow",),
    ).select("doc_id", "n_lines", "n_lines_kept", "text_filtered")


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (extras/cleaning.py): emails/IPv4/phones ->
    typed placeholders with staged per-doc counts. The corpus has no
    natural PII, so deterministic PII is appended to every 7th doc on
    BOTH sides (same SQL expression) — the oracle then checks real
    replacements, not a no-op. Patterns are Java-regex ∩ RE2 so DuckDB
    runs the identical strings."""
    from datamatch_spark.extras.cleaning import redact_pii

    docs = _docs(spark, sf_dir).withColumn("text", F.expr(_PII_SEED_EXPR))
    return redact_pii(docs).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "text_redacted"
    )


#: appended PII seed — one shared SQL expression, valid in BOTH Spark
#: SQL and DuckDB (concat, %, lpad over varchar)
_PII_SEED_EXPR = (
    "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', "
    "CAST(doc_id AS STRING), '@example.com or 10.0.', "
    "CAST(doc_id % 200 AS STRING), '.', CAST(doc_id % 250 AS STRING), "
    "' tel 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE text END"
)


def _duckdb_pii_sql() -> str:
    """Interpolates the ONE set of PII pattern definitions
    (cleaning.EMAIL_RE / IPV4_RE / PHONE_RE) so engine and oracle
    cannot drift. Staged like the engine: emails counted+replaced
    first, then IPv4 on the email-redacted text, then phones — DuckDB
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all default; counts are len(regexp_extract_all) since
    DuckDB has no regexp_count."""
    from datamatch_spark.extras.cleaning import EMAIL_RE, IPV4_RE, PHONE_RE

    for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
        assert "'" not in pat
    return f"""
        WITH seeded AS (
          SELECT doc_id, {_PII_SEED_EXPR} AS text FROM documents
        ),
        s1 AS (
          SELECT doc_id, text,
                 CASE WHEN text IS NULL THEN 0
                      ELSE len(regexp_extract_all(text, '{EMAIL_RE}')) END
                   AS n_emails,
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
          FROM seeded
        ),
        s2 AS (
          SELECT doc_id, text, n_emails,
                 CASE WHEN text IS NULL THEN 0
                      ELSE len(regexp_extract_all(t1, '{IPV4_RE}')) END
                   AS n_ips,
                 regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
          FROM s1
        )
        SELECT doc_id,
               CAST(n_emails AS INT) AS n_emails,
               CAST(n_ips AS INT) AS n_ips,
               CAST(CASE WHEN text IS NULL THEN 0
                    ELSE len(regexp_extract_all(t2, '{PHONE_RE}')) END AS INT)
                 AS n_phones,
               regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g')
                 AS text_redacted
        FROM s2
    """


def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cleaning COMPOSITION under one hard oracle: PII-seed ->
    line synthesis -> C4 per-line filter (min 2 words) -> GLOBAL
    keep-first line dedup -> staged PII redaction. Every stage's
    output feeds the next (the seeded PII rides a surviving line
    through filter+dedup and is redacted at the end), so the oracle
    checks the stage interfaces, not just each stage alone."""
    from datamatch_spark.extras.cleaning import (
        dedup_lines,
        filter_lines,
        redact_pii,
    )

    docs = (
        _docs(spark, sf_dir)
        .withColumn("text", F.expr(_PII_SEED_EXPR))
        .withColumn("text", F.expr("replace(text, ' table ', '\\n')"))
    )
    filtered = filter_lines(docs, min_words=2).select(
        "doc_id", F.col("text_filtered").alias("text")
    )
    out = redact_pii(
        dedup_lines(filtered), col="text_dedup", out_col="text_clean"
    )
    return out.select(
        "doc_id", "n_lines", "n_lines_kept",
        "n_emails", "n_ips", "n_phones", "text_clean",
    )


def _duckdb_clean_pipeline_sql() -> str:
    """Chained replica of q_clean_pipeline: seed+split, list_filter,
    the arg-min line-dedup chain, then the 3-stage PII redaction over
    the deduped text — one SQL statement, stage outputs feeding the
    next exactly like the Spark plan."""
    from datamatch_spark.extras.cleaning import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 replace({_PII_SEED_EXPR}, ' table ', chr(10)) AS text
          FROM documents
        ),
        filt AS (
          SELECT doc_id,
                 CASE WHEN ls IS NULL THEN NULL
                      ELSE COALESCE(array_to_string(
                        list_filter(ls,
                          x -> len(string_split(x, ' ')) >= 2),
                        chr(10)), '')
                 END AS text
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM seeded)
        ),
        ex AS (
          SELECT doc_id, unnest(ls) AS line,
                 generate_subscripts(ls, 1) - 1 AS pos
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM filt)
        ),
        keepers AS (
          SELECT line,
                 min(struct_pack(doc_id := doc_id, pos := pos)) AS k
          FROM ex WHERE length(line) >= 1 GROUP BY line
        ),
        kept AS (
          SELECT e.doc_id, e.pos, e.line
          FROM ex e LEFT JOIN keepers kk ON e.line = kk.line
          WHERE length(e.line) < 1
             OR (kk.k.doc_id = e.doc_id AND kk.k.pos = e.pos)
        ),
        re AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        ),
        dd AS (
          SELECT f.doc_id,
                 CAST(CASE WHEN f.text IS NULL THEN 0
                      ELSE len(string_split(f.text, chr(10))) END AS INT)
                   AS n_lines,
                 CAST(COALESCE(r.n_kept, 0) AS INT) AS n_lines_kept,
                 CASE WHEN f.text IS NULL THEN NULL
                      ELSE COALESCE(r.text_dedup, '') END AS td
          FROM filt f LEFT JOIN re r USING (doc_id)
        ),
        p1 AS (
          SELECT *, CASE WHEN td IS NULL THEN 0
                      ELSE len(regexp_extract_all(td, '{EMAIL_RE}')) END
                   AS n_emails,
                 regexp_replace(td, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
          FROM dd
        ),
        p2 AS (
          SELECT *, CASE WHEN td IS NULL THEN 0
                      ELSE len(regexp_extract_all(t1, '{IPV4_RE}')) END
                   AS n_ips,
                 regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
          FROM p1
        )
        SELECT doc_id, n_lines, n_lines_kept,
               CAST(n_emails AS INT) AS n_emails,
               CAST(n_ips AS INT) AS n_ips,
               CAST(CASE WHEN td IS NULL THEN 0
                    ELSE len(regexp_extract_all(t2, '{PHONE_RE}')) END
                 AS INT) AS n_phones,
               regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g')
                 AS text_clean
        FROM p2
    """


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span removal (Lee et al. 2022 ExactSubstr at
    fixed window n=8; extras/cleaning.py): every token covered by a
    corpus-duplicated 8-gram window is cut, all occurrences removed.
    Hard oracle: gram-STRING-keyed DuckDB replica (collision-checks
    the engine's md5 gram transport)."""
    from datamatch_spark.extras.cleaning import remove_duplicate_spans

    return remove_duplicate_spans(_docs(spark, sf_dir), n=8, min_count=2)


def _duckdb_dup_span_sql(n: int = 8, min_count: int = 2) -> str:
    """DuckDB replica of remove_duplicate_spans: positioned n-gram
    windows, HAVING count >= min_count over the gram string, covered
    token indices via range-unnest, anti-join, ordered string_agg."""
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        w AS (
          SELECT doc_id, i - 1 AS pos, {gram} AS g
          FROM toks, UNNEST(range(1, len(t) - {n - 2})) u(i)
        ),
        dup AS (
          SELECT g FROM w GROUP BY g HAVING count(*) >= {min_count}
        ),
        cov AS (
          SELECT DISTINCT doc_id, pos + j AS ti
          FROM (SELECT doc_id, pos FROM w JOIN dup USING (g)),
               UNNEST(range(0, {n})) v(j)
        ),
        tex AS (
          SELECT doc_id, generate_subscripts(t, 1) - 1 AS ti,
                 unnest(t) AS tok
          FROM toks
        ),
        kept AS (
          SELECT e.doc_id, e.ti, e.tok
          FROM tex e LEFT JOIN cov c
            ON e.doc_id = c.doc_id AND e.ti = c.ti
          WHERE c.ti IS NULL
        ),
        re AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text_cut,
                 count(*) AS nk
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(CASE WHEN d.text IS NULL THEN 0
                    ELSE len(string_split(d.text, ' ')) END AS INT)
                 AS n_tokens,
               CAST(CASE WHEN d.text IS NULL THEN 0
                    ELSE len(string_split(d.text, ' ')) END
                    - COALESCE(r.nk, 0) AS INT) AS n_tokens_removed,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE COALESCE(r.text_cut, '') END AS text_cut
        FROM documents d LEFT JOIN re r USING (doc_id)
    """


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.dedup import exact_duplicates

    docs = _docs(spark, sf_dir).withColumn("prefix", F.substring("text", 1, 25))
    return exact_duplicates(docs, "doc_id", "prefix")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", n=2, threshold=0.5, max_df=None
    )


def q_ngram_jaccard_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact n-gram Jaccard JOIN (``ngram_jaccard_match``
    — the brute-force baseline of the MinHash/SimHash match modes)
    over an even/odd doc_id split; hard oracle: the pairs-mode CTE
    with the side-split cross predicate and no ordering (a-side id is
    always idx_a, including pairs where idx_a > idx_b)."""
    from datamatch_spark.extras.dedup import ngram_jaccard_match

    docs = _docs(spark, sf_dir)
    return ngram_jaccard_match(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        n=2,
        threshold=0.5,
        max_df=None,
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup over the PRODUCTION xxhash64 gram-hash path
    (rows-only: DuckDB has no xxhash64). The identical pipeline under
    hash_fn='md5' is hard-oracled by ``minhash_det`` — same parameters,
    every stage (gram hashing, splitmix64 permutations, banding,
    estimate prefilter, exact-Jaccard verify) replicated in SQL."""
    from datamatch_spark.extras.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", n=2, n_perm=64, bands=16, threshold=0.5
    )


# parameter packs shared by the deterministic-hash dedup queries and
# their DuckDB oracle generators — ONE definition so they cannot drift
_MINHASH_DET = dict(n=2, n_perm=64, bands=16, threshold=0.5, est_margin=0.12)
_SIMHASH_DET = dict(n=2, max_hamming=8)
_MINHASH_GROUPS_DET = dict(n=3, n_perm=64, bands=8, threshold=0.8, est_margin=0.12)
# bands=32 -> rows-per-band r=2: a band-fold depth neither of the
# other two det packs exercises
_MINHASH_MATCH_DET = dict(n=2, n_perm=64, bands=32, threshold=0.5, est_margin=0.12)


def q_minhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash-LSH near-dup pipeline under a hard DuckDB
    oracle: hash_fn='md5' derives gram hashes from md5 hex (identical
    in any engine), so the oracle (``_duckdb_minhash_sql``) replicates
    every stage — distinct word-bigram md5-64 hashes, 64 splitmix64
    permutation mins, 16 splitmix64-fold band hashes, band-bucket
    candidate join, signature-estimate prefilter, exact hashed-shingle
    Jaccard — in mod-2^64 HUGEINT SQL. Upgrades the LSH family from
    rows-only (xxhash64 is Spark-only) to rows+schema+hash."""
    from datamatch_spark.extras.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", hash_fn="md5", **_MINHASH_DET
    )


def q_minhash_groups_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup GROUPS (MinHash-LSH pairs → connected
    components → min-id representative) under a hard oracle: the
    ``_duckdb_minhash_sql`` pair CTE chained into the recursive-CTE
    reachability closure (the ``semantic_dedup`` oracle's CC pattern).
    Trigram variant at threshold 0.8 — different (n, bands, threshold)
    than ``minhash_det`` so the two exercise distinct band folds."""
    from datamatch_spark.extras.dedup import minhash_dedup_groups

    p = dict(_MINHASH_GROUPS_DET)
    return minhash_dedup_groups(
        _docs(spark, sf_dir), "doc_id", hash_fn="md5", **p
    ).withColumn("keep", F.col("keep").cast("boolean"))


def q_minhash_match_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus MinHash-LSH near-dup JOIN (``minhash_lsh_match`` —
    the fuzzy-decontamination / crawl-overlap primitive) under a hard
    DuckDB oracle: documents split even/odd by doc_id into two corpora,
    md5 gram hashes, bands=32 (fold depth r=2, untested by the dedup
    packs). The oracle reuses the ``minhash_det`` CTE chain with the
    side-split candidate predicate; the production xxhash64 path is
    covered by the brute-force/orientation parity pytest
    (tests/test_extras.py::test_minhash_match_cross_corpus_parity)."""
    from datamatch_spark.extras.dedup import minhash_lsh_match

    docs = _docs(spark, sf_dir)
    return minhash_lsh_match(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        hash_fn="md5",
        **_MINHASH_MATCH_DET,
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the PRODUCTION xxhash64 path
    (rows-only); the identical pipeline under hash_fn='md5' is
    hard-oracled by ``simhash_det``."""
    from datamatch_spark.extras.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs(spark, sf_dir), "doc_id", n=2, max_hamming=8)


def q_simhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs under a hard DuckDB oracle (hash_fn='md5'
    gram hashes; the oracle recomputes the 64 sign-sums, the
    fingerprint, and bit_count(xor) over ALL pairs — the engine's
    pigeonhole chunk candidacy is recall-lossless at
    n_chunks = max_hamming + 1, so all-pairs is the same set)."""
    from datamatch_spark.extras.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _docs(spark, sf_dir), "doc_id", hash_fn="md5", **_SIMHASH_DET
    )


def q_simhash_match_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus SimHash near-dup JOIN (``simhash_near_match`` —
    the Hamming-space sibling of ``minhash_match_det``) under a hard
    DuckDB oracle: documents split even/odd by doc_id into two
    corpora, md5 gram hashes; the oracle reuses the ``simhash_det``
    fingerprint chain with the side-split candidate predicate. The
    production xxhash64 path is covered by the pairs-mode/orientation
    parity pytest (tests/test_extras.py::
    test_simhash_match_cross_corpus_parity)."""
    from datamatch_spark.extras.dedup import simhash_near_match

    docs = _docs(spark, sf_dir)
    return simhash_near_match(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        hash_fn="md5",
        **_SIMHASH_DET,
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.simsearch import cosine_topk

    emb = _emb(spark, sf_dir)
    return cosine_topk(emb, emb.where(F.col("vec_id") < 25), k=3)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatch_spark.extras.simsearch import embedding_near_dup_pairs

    # Threshold 0.3, not 0.9: the fixture embeddings' max within-block
    # cosine is ~0.47, so 0.9 matched zero rows (vacuous oracle);
    # 0.3 yields 111 real rows at sf0.01.
    return embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.3, block_col="label"
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup. n_cells=1 makes the k-means stage
    a no-op (single cell) so the whole operator — all-pairs cosine →
    near-dup graph → connected components → min-id representative — is
    exactly SQL-reproducible (DuckDB list_cosine_similarity + recursive
    CTE)."""
    from datamatch_spark.extras.simsearch import semantic_dedup

    return semantic_dedup(
        _emb(spark, sf_dir), threshold=0.4, n_cells=1
    ).withColumn("keep", F.col("keep").cast("boolean"))


def q_semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in the BLOCKED (multi-cell) regime users actually run:
    4 fixed centroids (the embeddings of vec_id 0-3), cell = argmax
    cosine, near-dup graph within cells only, CC, min-id
    representative. With centroids pinned, the whole pipeline is
    exactly SQL-reproducible including the cell assignment."""
    from datamatch_spark.extras.simsearch import semantic_dedup

    emb = _emb(spark, sf_dir)
    cent = [
        list(r["embedding"])
        for r in emb.where(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    return semantic_dedup(emb, threshold=0.4, centroids=cent).withColumn(
        "keep", F.col("keep").cast("boolean")
    )


def q_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash near-dedup groups (rows-only: banding recall
    is hash-dependent; the pair stage's exact-Jaccard verification and
    the CC stage each have their own oracles/tests)."""
    from datamatch_spark.extras.dedup import minhash_dedup_groups

    docs = _docs(spark, sf_dir).limit(400)
    return minhash_dedup_groups(docs, "doc_id", threshold=0.8)


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN over the default seeded-Gaussian planes
    (rows-only: RandomState streams are not SQL-reproducible; recall vs
    brute force is asserted in tests). The identical pipeline under
    splitmix64-derived ±1 planes is hard-oracled by ``lsh_ann_det``."""
    from datamatch_spark.extras.simsearch import lsh_topk

    emb = _emb(spark, sf_dir)
    return lsh_topk(emb, emb.where(F.col("vec_id") < 25), k=3, n_planes=6)


_LSH_ANN_DET = dict(k=3, n_planes=6, seed=42)


def q_lsh_ann_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN under a hard DuckDB oracle:
    plane_kind='rademacher' derives the ±1 hyperplane entries from
    splitmix64 (SQL-reproducible), so the oracle replicates the WHOLE
    approximate pipeline — plane bank, sign codes, 1-bit-flip
    multiprobe, bucket candidacy, exact-cosine rescoring, top-k — not
    just an exact brute-force equivalent."""
    from datamatch_spark.extras.simsearch import lsh_topk

    emb = _emb(spark, sf_dir)
    p = _LSH_ANN_DET
    return lsh_topk(
        emb, emb.where(F.col("vec_id") < 25), k=p["k"], n_planes=p["n_planes"],
        seed=p["seed"], plane_kind="rademacher",
    )


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN top-k. Run with nprobe = n_cells, which makes the
    inverted-file search provably exact — so the brute-force cosine
    oracle applies; the recall-vs-nprobe tradeoff is tested in pytest."""
    from datamatch_spark.extras.simsearch import ivf_topk

    emb = _emb(spark, sf_dir)
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 25), k=3, n_cells=16, nprobe=16
    )


def q_incremental_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming micro-batch linkage spine (datamatch_spark.streaming):
    one batch of new docs matched against a static reference — rows-only
    (includes greedy 1:1 pruning, which is not SQL-expressible)."""
    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex
    from datamatch_spark.streaming import incremental_link_batch

    docs = _docs(spark, sf_dir)
    ref = docs.where(F.col("doc_id") % 3 == 0)
    batch = docs.where(F.col("doc_id") % 3 == 1)
    out = incremental_link_batch(
        batch,
        ref,
        ColumnsIndex("lang"),
        {"n_chars": AbsoluteNumericalSimilarity(50)},
        "doc_id",
        0.5,
        1.0,
    )
    return out.select(
        "idx_a", "idx_b", F.round("sim_score", 6).alias("sim_score")
    )


def q_media_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path (rows-only: RandomState pixels are not
    SQL-reproducible; the md5-pixel twin ``media_decode_ppm_det``
    hard-checks the identical decode code path): synthesize
    deterministic P6 PPM bytes per doc, decode via the numpy PPM
    codec, return dimensions + leading features."""
    import numpy as np
    import pandas as pd

    from datamatch_spark.extras.multimodal import MEDIA_SCHEMA, decode_media, encode_ppm

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 64).select("doc_id")

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.RandomState(int(did))
                px = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
                rows.append(
                    (f"m{did}", "image", bytearray(encode_ppm(px)), (8, 8, 1, 0))
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "data", "meta"])

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    out = decode_media(media, codec="ppm", dim=8)
    return out.select(
        "media_ref",
        "width",
        "height",
        F.round(F.col("features")[0], 5).alias("mean_r"),
        F.round(F.col("features")[3], 5).alias("std_r"),
    )


def q_media_decode_ppm_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-hash twin of ``media_decode_ppm`` with a HARD
    oracle: pixel bytes come from md5 (``byte = int(md5(f"{doc}:{i}")
    hex[:2], 16)``, reshaped 8x8x3) instead of numpy RandomState, so
    DuckDB reproduces the exact pixel values from the same digests.
    The comparison is integer-exact: ``round(mean_ch * 64 * 255)``
    recovers the channel's integer pixel sum (float32 mean error
    ~3e-7 against a 0.5 rounding margin), so the oracle hard-checks
    the FULL encode→P6-header-parse→buffer-offset→channel-interleave→
    mean path with zero float-boundary flake. Same decode code path
    as the production query (extras/multimodal.py:_decode_ppm)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from datamatch_spark.extras.multimodal import MEDIA_SCHEMA, decode_media, encode_ppm

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 64).select("doc_id")

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                vals = [
                    int(hashlib.md5(f"{did}:{i}".encode()).hexdigest()[:2], 16)
                    for i in range(192)
                ]
                px = np.asarray(vals, dtype=np.uint8).reshape(8, 8, 3)
                rows.append(
                    (f"m{did}", "image", bytearray(encode_ppm(px)), (8, 8, 1, 0))
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "data", "meta"])

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    out = decode_media(media, codec="ppm", dim=8)
    return out.select(
        "media_ref",
        "width",
        "height",
        F.round(F.col("features")[0] * 16320.0).cast("long").alias("sum_r"),
        F.round(F.col("features")[1] * 16320.0).cast("long").alias("sum_g"),
        F.round(F.col("features")[2] * 16320.0).cast("long").alias("sum_b"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over interleaved docs (rows-only)."""
    from datamatch_spark.corpus import CorpusConfig, generate_documents
    from datamatch_spark.extras.multimodal import media_features

    docs = generate_documents(spark, CorpusConfig(n_docs=300, seed=17))
    return media_features(docs, dim=8).select(
        "doc_id", "media_ref", "width", "height", "n_frames"
    )


def _fs_gammas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs with the three binary agreement columns the FS
    oracle replays (source equality, |n_chars| diff <= 20, first-token
    equality), blocked on lang."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).withColumn(
        "tok0", F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    )
    pairs = candidate_pairs(
        docs, ColumnsIndex("lang"), "doc_id", ["source", "n_chars", "tok0"]
    )
    return pairs.select(
        "idx_a",
        "idx_b",
        F.when(F.col("a.source").eqNullSafe(F.col("b.source")), 1)
        .otherwise(0)
        .alias("g_source"),
        F.when(F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20, 1)
        .otherwise(0)
        .alias("g_len"),
        F.when(F.col("a.tok0").eqNullSafe(F.col("b.tok0")), 1)
        .otherwise(0)
        .alias("g_tok"),
        # the (possibly) agreed token value, for term-frequency
        # adjustment; either side works since the adjustment is gated
        # on g_tok = 1
        F.col("a.tok0").alias("v_tok"),
    )


def q_fs_em_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage, EM-estimated m/u/lambda
    (no reference counterpart — the probabilistic upgrade over the
    reference's hand-weighted thresholds). The distributed side is one
    groupBy to <= 2^3 pattern rows; EM is a bit-reproducible driver
    fold the oracle replays in a recursive CTE; scoring is a pure
    literal projection."""
    from datamatch_spark.linkage import estimate_fs

    gam = _fs_gammas(spark, sf_dir)
    model = estimate_fs(gam, ["g_source", "g_len", "g_tok"], n_iter=20)
    return model.score(gam).select(
        "idx_a",
        "idx_b",
        "g_source",
        "g_len",
        "g_tok",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_probability", 6).alias("match_probability"),
    )


def q_fs_tf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splink-style term-frequency adjustment on the FS model's token
    field: agreement on a rare first token outweighs agreement on a
    common one (u_tok replaced by the value's collision probability
    tf(v)). The oracle replays EM (recursive CTE) + the tf table + the
    adjusted weight/posterior arithmetic float64-exactly."""
    from datamatch_spark.linkage import estimate_fs, term_frequencies, tf_adjust

    gam = _fs_gammas(spark, sf_dir)
    model = estimate_fs(gam, ["g_source", "g_len", "g_tok"], n_iter=20)
    docs = _docs(spark, sf_dir).withColumn(
        "tok0", F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    )
    tf = term_frequencies(docs, "tok0")
    adj = tf_adjust(model.score(gam), model, "g_tok", "v_tok", tf)
    return adj.select(
        "idx_a",
        "idx_b",
        "g_tok",
        F.round("match_weight_tf", 6).alias("match_weight_tf"),
        F.round("match_probability_tf", 6).alias("match_probability_tf"),
    )


def q_fs_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probabilistic family end-to-end: FS-EM posterior threshold
    -> transitive closure (connected components), composed through the
    real interfaces (estimate_fs -> score -> connected_components)
    under one chained oracle, jw_clusters-style."""
    from datamatch_spark.clustering import connected_components
    from datamatch_spark.linkage import estimate_fs

    gam = _fs_gammas(spark, sf_dir)
    model = estimate_fs(gam, ["g_source", "g_len", "g_tok"], n_iter=20)
    edges = (
        model.score(gam)
        .where(F.col("match_probability") >= 0.15)
        .select("idx_a", "idx_b")
    )
    return connected_components(edges).select("node", "component")


def q_golden_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge step composed through the REAL interfaces (chained
    oracle, fs_clusters-style): first-token blocking pairs ->
    connected components (groups_from_pairs) -> golden_records
    survivorship (longest text, modal lang, max n_chars, min source).
    The oracle replays the whole chain — components of a shared-key
    clique are min-member windows, survivorship is aggregate
    ORDER BY/FILTER."""
    from datamatch_spark import golden_records
    from datamatch_spark.clustering import groups_from_pairs
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 500)
        .withColumn(
            "tok", F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(1)))
        )
    )
    pairs = candidate_pairs(docs, ColumnsIndex("tok"), "doc_id", [])
    assign = groups_from_pairs(docs, "doc_id", pairs.select("idx_a", "idx_b"))
    return golden_records(
        docs.drop("tok"),
        "doc_id",
        assign.select("doc_id", "group_id"),
        rules={
            "text": "longest",
            "lang": "most_frequent",
            "n_chars": "max",
            "source": "min",
        },
    )


def q_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster edge-density / score-spread diagnostics over a
    transitive clustering whose components are CHAINS by construction
    (n_chars-proximity edges), so density < 1 clusters exist. Chained
    oracle: edges -> recursive-CTE CC -> the stats aggregation. Scores
    are dyadic rationals (halves), so avg_score is float-exact in any
    summation order."""
    from datamatch_spark.clustering import groups_from_pairs
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.metrics import cluster_stats
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 400)
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["n_chars"])
    diff = F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
    scored = (
        pairs.where(diff <= 2)
        .select(
            "idx_a",
            "idx_b",
            (F.lit(1.0) - diff / F.lit(2.0)).alias("sim_score"),
        )
    )
    assign = groups_from_pairs(docs, "doc_id", scored.select("idx_a", "idx_b"))
    out = cluster_stats(scored, assign.select("doc_id", "group_id"), "doc_id")
    return out.select(
        "group_id",
        "cluster_size",
        "n_edges",
        F.round("density", 6).alias("density"),
        F.round("min_score", 6).alias("min_score"),
        F.round("avg_score", 6).alias("avg_score"),
        F.round("max_score", 6).alias("max_score"),
    )


def q_geo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoSimilarity (haversine proximity, §2.5 family extension) over
    nation-blocked customers with deterministic synthetic coordinates
    (pure integer arithmetic -> identical float64 on both engines).
    The oracle mirrors the trig formula operand-for-operand."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs
    from datamatch_spark.similarities import GeoSimilarity

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    geo = cust.select(
        "c_custkey",
        F.struct(
            (((F.col("c_custkey") * 37) % 1700) / 10.0 - 85.0).alias("lat"),
            (((F.col("c_custkey") * 91) % 3600) / 10.0 - 180.0).alias("lon"),
        ).alias("pos"),
        "c_nationkey",
    )
    pairs = candidate_pairs(geo, ColumnsIndex("c_nationkey"), "c_custkey", ["pos"])
    sim = GeoSimilarity(d_max_km=500.0).expr(F.col("a.pos"), F.col("b.pos"))
    return pairs.select(
        "idx_a", "idx_b", F.round(sim, 6).alias("geo_sim")
    )


def q_geo_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoGridIndex blocking (8 shifted chord-metric grids on the unit
    sphere — lossless within d_km) over the synthetic customer
    coordinates. Oracle replays the 3D embedding + shifted-grid floor
    bucketing + equi-join with the IDENTICAL chord constant inlined
    on both sides."""
    from datamatch_spark.indices import GeoGridIndex
    from datamatch_spark.pairing import candidate_pairs

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    geo = cust.select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 1700) / 10.0 - 85.0).alias("lat"),
        (((F.col("c_custkey") * 91) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    pairs = candidate_pairs(
        geo, GeoGridIndex("lat", "lon", d_km=200.0), "c_custkey", []
    )
    return pairs.select("idx_a", "idx_b")


def _geo_candidates_oracle_sql() -> str:
    import math

    c = 2.0 * math.sin(min(math.pi / 2.0, 200.0 / (2.0 * 6371.0088)))
    shifts = ", ".join(
        f"({gid}, {gid & 1}, {(gid >> 1) & 1}, {(gid >> 2) & 1})"
        for gid in range(8)
    )
    return f"""
        WITH g AS (
          SELECT c_custkey,
                 radians(((c_custkey * 37) % 1700) / 10.0 - 85.0) AS phi,
                 radians(((c_custkey * 91) % 3600) / 10.0 - 180.0) AS lam
          FROM customer
        ), pts AS (
          SELECT c_custkey,
                 cos(phi) * cos(lam) AS x,
                 cos(phi) * sin(lam) AS y,
                 sin(phi) AS z
          FROM g
        ), k AS (
          SELECT c_custkey, s.gid,
                 floor((x + s.sx * {c!r}) / {2.0 * c!r}) AS cx,
                 floor((y + s.sy * {c!r}) / {2.0 * c!r}) AS cy,
                 floor((z + s.sz * {c!r}) / {2.0 * c!r}) AS cz
          FROM pts, (VALUES {shifts}) AS s(gid, sx, sy, sz)
        )
        SELECT DISTINCT a.c_custkey AS idx_a, b.c_custkey AS idx_b
        FROM k a JOIN k b
          ON a.gid = b.gid AND a.cx = b.cx AND a.cy = b.cy
         AND a.cz = b.cz AND a.c_custkey < b.c_custkey
    """


def q_best_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record argmax (enrichment-join semantics) over the dyadic
    n_chars-proximity scored pairs: each left doc keeps its single
    best candidate, score ties to the smallest winner id. Oracle
    replays via a row_number window (score DESC, idx_b ASC)."""
    from datamatch_spark.clustering import best_matches
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 400)
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["n_chars"])
    diff = F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
    scored = pairs.where(diff <= 2).select(
        "idx_a", "idx_b", (F.lit(1.0) - diff / F.lit(2.0)).alias("sim_score")
    )
    return best_matches(scored)


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-classification P/R/F1 over a threshold grid vs a labeled
    truth rule (same source, |n_chars diff| <= 1, ANY lang — so truth
    pairs blocked away by the lang blocking count as FN at every
    threshold). Dyadic scores; one explode x one aggregation."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.metrics import threshold_sweep
    from datamatch_spark.pairing import candidate_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 400)
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["n_chars"])
    diff = F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
    scored = pairs.where(diff <= 2).select(
        "idx_a", "idx_b", (F.lit(1.0) - diff / F.lit(2.0)).alias("sim_score")
    )
    a = docs.select(
        F.col("doc_id").alias("idx_a"),
        F.col("source").alias("__sa"),
        F.col("n_chars").alias("__na"),
    )
    b = docs.select(
        F.col("doc_id").alias("idx_b"),
        F.col("source").alias("__sb"),
        F.col("n_chars").alias("__nb"),
    )
    truth = a.join(
        b,
        (F.col("__sa") == F.col("__sb"))
        & (F.col("idx_a") < F.col("idx_b"))
        & (F.abs(F.col("__na") - F.col("__nb")) <= 1),
    ).select("idx_a", "idx_b")
    out = threshold_sweep(scored, truth, [0.25, 0.5, 0.75, 1.0])
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


def q_token_set_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TokenSetSimilarity, all three modes (jaccard/dice/overlap) over
    lang-blocked candidate pairs — pure-Column set arithmetic (split /
    array_distinct / array_intersect), replayed in DuckDB list
    functions. Bounded to doc_id < 300 to keep the oracle's per-pair
    list ops tractable."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs
    from datamatch_spark.similarities import TokenSetSimilarity

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["text"])
    a, b = F.col("a.text"), F.col("b.text")
    return pairs.select(
        "idx_a",
        "idx_b",
        F.round(TokenSetSimilarity("jaccard").expr(a, b), 6).alias("jaccard"),
        F.round(TokenSetSimilarity("dice").expr(a, b), 6).alias("dice"),
        F.round(TokenSetSimilarity("overlap").expr(a, b), 6).alias("overlap"),
    )


def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record merge — the ER lifecycle's final
    step (no reference counterpart; the reference stops at cluster
    reports, matchers.py:425-474): one canonical profile per user over
    the events table, exercising most_frequent (modal event_type, ties
    to larger value), latest:/earliest: row-picks (props by (ts,
    event_id)), sum, max and count_distinct — every rule replayed in
    plain SQL (aggregate ORDER BY + FILTER)."""
    from datamatch_spark import golden_records

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("first_props", F.col("props"))
        .withColumn("n_types", F.col("event_type"))
    )
    assign = ev.select("event_id", F.col("user_id").alias("group_id"))
    return golden_records(
        ev,
        "event_id",
        assign,
        rules={
            "event_type": "most_frequent",
            "props": "latest:ts",
            "first_props": "earliest:ts",
            "value": "sum",
            "ts": "max",
            "n_types": "count_distinct",
        },
    )


def q_monge_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monge-Elkan hybrid token similarity (JW inner, symmetric mean)
    over a 3-token name field, §2.5 family. Bounded to doc_id < 150 so
    the oracle's per-token-combo JW recursive CTE stays tractable."""
    from datamatch_spark.indices import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs
    from datamatch_spark.similarities import MongeElkanSimilarity

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 150)
        .withColumn(
            "name3",
            F.array_join(
                F.slice(
                    F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""),
                    1,
                    3,
                ),
                " ",
            ),
        )
    )
    pairs = candidate_pairs(docs, ColumnsIndex("lang"), "doc_id", ["name3"])
    me = MongeElkanSimilarity()
    return pairs.select(
        "idx_a",
        "idx_b",
        F.round(me.expr(F.col("a.name3"), F.col("b.name3")), 6).alias("me_sim"),
    )


def q_meta_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-blocking (Papadakis et al. TKDE'14): token blocking over
    document text -> block purging -> CBS edge weights -> redefined-WNP
    node-average pruning. Integer CBS weights make every threshold an
    exact-integer average, so the full graph pipeline is hard-oracled."""
    from datamatch_spark.metablocking import meta_block, token_blocks

    docs = _docs(spark, sf_dir)
    blocks = token_blocks(docs, "doc_id", "text", min_token_len=2, ngram=2)
    pruned = meta_block(
        blocks, "doc_id", weight="cbs", scheme="wnp", max_block_size=32
    )
    return pruned.select("idx_a", "idx_b", F.col("weight").cast("long").alias("weight"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: JW dedup of documents -> cluster report."""
    from datamatch_spark import ColumnsIndex, JaroWinklerSimilarity, ThresholdMatcher

    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir).withColumn("prefix", F.substring("text", 1, 40))
    m = ThresholdMatcher(
        ColumnsIndex(["lang", "source"]),
        {"prefix": JaroWinklerSimilarity()},
        docs,
        row_key="doc_id",
        validate=False,
    )
    return m.get_clusters_within_threshold(0.7, 1.0).select(
        "cluster_idx",
        "pair_idx",
        F.round("sim_score", 6).alias("sim_score"),
        "row_key",
        "lang",
        "source",
        "n_chars",
    )


def _url_expr() -> Column:
    """Deterministic synthetic absolute URLs keyed on doc_id (the
    documents table carries no URL column): five shapes covering every
    canonicalization branch — uppercase scheme/host, default and
    non-default ports, tracking params leading/trailing/solo,
    fragments, two-level public suffix, bare IP host. The DuckDB
    oracle builds the IDENTICAL strings in SQL."""
    s = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    return (
        F.when(m == 0, F.concat(
            F.lit("HTTP://WWW.Example.COM:80/a/"), s,
            F.lit("?utm_source=feed&id="), s, F.lit("&fbclid=XYZ#frag")))
        .when(m == 1, F.concat(
            F.lit("https://News.Site.co.uk:443/story/"), s,
            F.lit("?id="), s, F.lit("&utm_campaign=np")))
        .when(m == 2, F.concat(
            F.lit("https://ads.Tracker.example.org/p/"), s))
        .when(m == 3, F.concat(
            F.lit("http://sub.shop.com.au/item/"), s,
            F.lit("?utm_campaign=x")))
        .otherwise(F.concat(F.lit("https://192.168.0.1:8080/raw/"), s))
    )


# Shared DuckDB CTE chain: synthesize the _url_expr strings, canonicalize
# (mirrors extras/urls.py canonicalize_url step by step), and extract the
# registered domain (mirrors registered_domain). Ends at d4 exposing
# (doc_id, url_canon, domain). Used by the url_pipeline and domain_stats
# oracles so the two stay provably on one spec.
_DUCKDB_URL_DOMAIN_CTE = """
            WITH u AS (
              SELECT doc_id, CASE doc_id % 5
                WHEN 0 THEN 'HTTP://WWW.Example.COM:80/a/'
                            || CAST(doc_id AS VARCHAR)
                            || '?utm_source=feed&id='
                            || CAST(doc_id AS VARCHAR) || '&fbclid=XYZ#frag'
                WHEN 1 THEN 'https://News.Site.co.uk:443/story/'
                            || CAST(doc_id AS VARCHAR) || '?id='
                            || CAST(doc_id AS VARCHAR) || '&utm_campaign=np'
                WHEN 2 THEN 'https://ads.Tracker.example.org/p/'
                            || CAST(doc_id AS VARCHAR)
                WHEN 3 THEN 'http://sub.shop.com.au/item/'
                            || CAST(doc_id AS VARCHAR) || '?utm_campaign=x'
                ELSE 'https://192.168.0.1:8080/raw/'
                     || CAST(doc_id AS VARCHAR)
              END AS url FROM documents
            ), c2 AS (
              SELECT doc_id, url,
                     lower(regexp_extract(regexp_replace(url, '#.*', ''),
                           '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                     regexp_replace(regexp_replace(url, '#.*', ''),
                           '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
              FROM u
            ), c3 AS (
              SELECT *,
                     lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
                     substr(rest,
                            length(regexp_extract(rest, '^([^/?]*)', 1)) + 1)
                       AS tail
              FROM c2
            ), c4 AS (
              SELECT *,
                CASE WHEN scheme = 'http'
                       THEN regexp_replace(hostport, ':80$', '')
                     WHEN scheme = 'https'
                       THEN regexp_replace(hostport, ':443$', '')
                     ELSE hostport END AS host,
                regexp_extract(tail, '^([^?]*)', 1) AS path,
                substr(tail,
                       length(regexp_extract(tail, '^([^?]*)', 1)) + 2)
                  AS query
              FROM c3
            ), c5 AS (
              SELECT *,
                array_to_string(list_filter(string_split(query, '&'),
                    p -> len(p) > 0 AND NOT regexp_matches(p,
                         '^(utm_[^=]*|fbclid|gclid)(=|$)')), '&') AS q2
              FROM c4
            ), c6 AS (
              SELECT doc_id,
                CASE WHEN scheme = '' THEN url
                     ELSE scheme || '://' || host || path ||
                          CASE WHEN length(q2) > 0 THEN '?' || q2
                               ELSE '' END
                END AS url_canon
              FROM c5
            ), d2 AS (
              SELECT doc_id, url_canon,
                lower(regexp_extract(url_canon,
                      '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host2
              FROM c6
            ), d3 AS (
              SELECT *, string_split(host2, '.') AS labels FROM d2
            ), d4 AS (
              SELECT doc_id, url_canon,
                CASE WHEN regexp_matches(host2, '^[0-9.]+$') THEN host2
                     WHEN len(labels) <= 2 THEN host2
                     WHEN (labels[-2] || '.' || labels[-1]) IN
                          ('co.uk','org.uk','ac.uk','gov.uk','com.au',
                           'net.au','org.au','co.jp','ne.jp','or.jp',
                           'com.br','com.mx','co.in','co.nz','com.cn',
                           'com.sg','co.za','com.tr')
                       THEN labels[-3] || '.' || labels[-2] || '.'
                            || labels[-1]
                     ELSE labels[-2] || '.' || labels[-1]
                END AS domain
              FROM d3
            )
"""


def q_url_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene trio (extras/urls.py): canonicalize (fragment /
    default-port / tracking-param stripping, scheme+host lowercased),
    registered-domain extraction (two-level public suffixes, IP
    pass-through), domain-blocklist flagging. Pure Column exprs; hard
    DuckDB oracle replicates every step in SQL."""
    from datamatch_spark.extras.urls import (
        canonicalize_url,
        filter_blocked_domains,
        registered_domain,
    )

    docs = _docs(spark, sf_dir).select("doc_id", _url_expr().alias("url"))
    canon = docs.select(
        "doc_id", canonicalize_url(F.col("url")).alias("url_canon")
    )
    flagged = filter_blocked_domains(
        canon, "url_canon", ["example.org", "shop.com.au"],
        flag_col="blocked",
    )
    return flagged.select(
        "doc_id",
        "url_canon",
        registered_domain(F.col("url_canon")).alias("domain"),
        "blocked",
    )


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus analytics (extras/urls.py
    domain_stats): docs per domain, distinct canonical URLs per
    domain, mean quality score — the reporting aggregate a crawl
    pipeline runs right after URL hygiene. One map-side-combinable
    groupBy; hard DuckDB oracle over the shared URL CTE chain."""
    from datamatch_spark.extras.text import with_quality
    from datamatch_spark.extras.urls import domain_stats

    docs = with_quality(
        _docs(spark, sf_dir).select("doc_id", "text")
    ).select("doc_id", "quality_score", _url_expr().alias("url"))
    return domain_stats(
        docs, "url",
        aggs={"avg_quality": F.round(F.avg("quality_score"), 6)},
    )


def q_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection (extras/dedup.py
    keep_best_in_groups): exact-duplicate groups over a 25-char text
    prefix, then keep the HIGHEST-quality_score member per group (ties
    -> lowest id) instead of the minimum-id canonical. One
    map-side-combinable max_by aggregate, no window sort."""
    from datamatch_spark.extras.dedup import (
        exact_duplicates,
        keep_best_in_groups,
    )
    from datamatch_spark.extras.text import with_quality

    docs = _docs(spark, sf_dir).withColumn(
        "prefix", F.substring("text", 1, 25)
    )
    dups = exact_duplicates(docs, "doc_id", "prefix")
    groups = dups.select(
        F.col("canonical_id").alias("group_id"), "doc_id"
    ).unionByName(
        dups.select(
            F.col("canonical_id").alias("group_id"),
            F.col("canonical_id").alias("doc_id"),
        ).distinct()
    )
    return keep_best_in_groups(
        groups, with_quality(docs), "doc_id", "quality_score"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "block_stats": q_block_stats,
        "block_metrics": q_block_metrics,
        "candidate_pairs": q_candidate_pairs,
        "absnum_scored_pairs": q_absnum_scored_pairs,
        "match_scored": q_match_scored,
        "relnum_scored_pairs": q_relnum_scored_pairs,
        "dissimilar_filter": q_dissimilar_filter,
        "nonoverlap_filter": q_nonoverlap_filter,
        "cc_components": q_cc_components,
        "cluster_exact": q_cluster_exact,
        "all_pairs_report": q_all_pairs_report,
        "sample_pairs_report": q_sample_pairs_report,
        "noop_index": q_noop_index,
        "index_elements": q_index_elements,
        "match_candidates": q_match_candidates,
        "sorted_neighborhood": q_sorted_neighborhood,
        "sorted_neighborhood_match": q_sorted_neighborhood_match,
        "qgram_candidates": q_qgram_candidates,
        "suffix_candidates": q_suffix_candidates,
        "phonetic_candidates": q_phonetic_candidates,
        "blocking_quality": q_blocking_quality,
        "pairwise_f1": q_pairwise_f1,
        "bcubed": q_bcubed,
        "qgram_quality": q_qgram_quality,
        "cluster_report": q_cluster_report,
        "multiindex_or": q_multiindex_or,
        "multiindex_and": q_multiindex_and,
        "swap_numeric": q_swap_numeric,
        "date_scored_pairs": q_date_scored_pairs,
        "date_scored_pairs_sql": q_date_scored_pairs_sql,
        "decision": q_decision,
        "greedy_one_to_one": q_greedy_one_to_one,
        "fs_em_pairs": q_fs_em_pairs,
        "fs_clusters": q_fs_clusters,
        "fs_tf_pairs": q_fs_tf_pairs,
        "golden_records": q_golden_records,
        "golden_clusters": q_golden_clusters,
        "cluster_stats": q_cluster_stats,
        "threshold_sweep": q_threshold_sweep,
        "best_matches": q_best_matches,
        "geo_pairs": q_geo_pairs,
        "geo_candidates": q_geo_candidates,
        "token_set_pairs": q_token_set_pairs,
        "monge_elkan": q_monge_elkan,
        "meta_blocking": q_meta_blocking,
        "jw_dedup_pairs": q_jw_dedup_pairs,
        "jw_clusters": q_jw_clusters,
        "spans_matcher_clusters": q_spans_matcher_clusters,
        "spans_corpus_clusters": q_spans_corpus_clusters,
        "swap_match": q_swap_match,
        "tfidf_pairs": q_tfidf_pairs,
        "decontaminate": q_decontaminate,
        "domain_cap": q_domain_cap,
        "chunk_documents": q_chunk_documents,
        "curation_pipeline": q_curation_pipeline,
        "bloom_decontam": q_bloom_decontam,
        "dup_ngram_stats": q_dup_ngram_stats,
        "stratified_sample": q_stratified_sample,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "repetition_signals": q_repetition_signals,
        "unigram_logprob": q_unigram_logprob,
        "dsir_logweights": q_dsir_logweights,
        "dsir_sample": q_dsir_sample,
        "pack_quota": q_pack_quota,
        "pack_greedy": q_pack_greedy,
        "bpe_tokens": q_bpe_tokens,
        "line_dedup": q_line_dedup,
        "line_filter": q_line_filter,
        "pii_redact": q_pii_redact,
        "clean_pipeline": q_clean_pipeline,
        "dup_span_removal": q_dup_span_removal,
        "exact_dedup": q_exact_dedup,
        "url_pipeline": q_url_pipeline,
        "domain_stats": q_domain_stats,
        "keep_best": q_keep_best,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_match": q_ngram_jaccard_match,
        "minhash_lsh": q_minhash_lsh,
        "minhash_det": q_minhash_det,
        "minhash_match_det": q_minhash_match_det,
        "minhash_groups_det": q_minhash_groups_det,
        "simhash": q_simhash,
        "simhash_det": q_simhash_det,
        "simhash_match_det": q_simhash_match_det,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_cells": q_semantic_dedup_cells,
        "minhash_groups": q_minhash_groups,
        "lsh_ann": q_lsh_ann,
        "lsh_ann_det": q_lsh_ann_det,
        "ivf_ann": q_ivf_ann,
        "incremental_link": q_incremental_link,
        "media_features": q_media_features,
        "media_decode_ppm": q_media_decode_ppm,
        "media_decode_ppm_det": q_media_decode_ppm_det,
    }


_SM_W64 = 1 << 64
_SM_K1 = 0x9E3779B97F4A7C15
_SM_K2 = 0xBF58476D1CE4E5B9
_SM_K3 = 0x94D049BB133111EB


def _duckdb_u64(e: str) -> str:
    """Wrap a non-negative HUGEINT expression to uint64."""
    return f"CAST((({e}) % {_SM_W64}) AS UBIGINT)"


def _duckdb_mul64(a: str, b: int) -> str:
    """a*b mod 2^64 without HUGEINT overflow: 32-bit-limb split of
    ``a`` keeps every partial product under 2^96 (HUGEINT max ~2^127;
    a straight u64×u64 product would reach 2^128 and overflow)."""
    A = f"CAST({a} AS HUGEINT)"
    return _duckdb_u64(
        f"({A} % 4294967296) * {b} + "
        f"(({A} // 4294967296) * {b} % 4294967296) * 4294967296"
    )


def _duckdb_sm64_ctes(prefix: str, src: str, keys: list[str], x: str) -> str:
    """Four chained CTEs applying splitmix64 (the exact finalizer of
    ``dedup._splitmix64``) to expression ``x`` of CTE ``src``; the
    final CTE ``{prefix}4`` carries ``keys`` + ``h``. Staged through
    CTE columns because DuckDB has no common-subexpression elimination
    across a textually-inlined mix chain (each xor(z, z>>k) step
    references z twice — full inlining is 8 copies of the innermost
    expression)."""
    kc = (", ".join(keys) + ", ") if keys else ""
    return (
        f"{prefix}1 AS (SELECT {kc}"
        f"{_duckdb_u64(f'CAST({x} AS HUGEINT) + {_SM_K1}')} AS z FROM {src}),\n"
        f"{prefix}2 AS (SELECT {kc}"
        f"{_duckdb_mul64('xor(z, z >> 30)', _SM_K2)} AS z FROM {prefix}1),\n"
        f"{prefix}3 AS (SELECT {kc}"
        f"{_duckdb_mul64('xor(z, z >> 27)', _SM_K3)} AS z FROM {prefix}2),\n"
        f"{prefix}4 AS (SELECT {kc}xor(z, z >> 31) AS h FROM {prefix}3)"
    )


def _duckdb_hex2u64(hh: str) -> str:
    """uint64 from the first 16 hex chars of column ``hh`` (the md5-64
    gram hash of ``dedup._hex16_to_int64_sql``, unsigned view). Positional
    digit sum with literal 16^k weights — NOT list_reduce, whose
    DuckDB 1.0 lambda mis-threads when a step returns the accumulator
    unchanged (leading-zero digests hit acc*16+0 == acc == 0)."""
    terms = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr({hh}, {j}, 1)) AS HUGEINT)"
        f" - 1) * {16 ** (16 - j)}"
        for j in range(1, 17)
    )
    return f"CAST(({terms}) AS UBIGINT)"


def _duckdb_gram_hash_ctes(n: int) -> str:
    """CTEs ``toks → grams → gramh → gh(doc_id, g)``: distinct word
    n-grams of documents.text and their md5-64 uint64 hashes — the
    DuckDB replica of ``with_shingle_hashes(..., hash_fn='md5')``
    including its ``_has_shingles`` row filter. ``gramh`` stages the
    md5 so the 16 hex-digit extractions share one digest."""
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= {n}
), grams AS (
  SELECT DISTINCT doc_id, {gram} AS s
  FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
), gramh AS (
  SELECT doc_id, md5(s) AS hh FROM grams
), gh AS (
  SELECT DISTINCT doc_id, {_duckdb_hex2u64('hh')} AS g FROM gramh
)"""


def _duckdb_minhash_ctes(
    n: int,
    n_perm: int,
    bands: int,
    threshold: float,
    est_margin: float,
    cand_cond: str = "a.doc_id < b.doc_id",
) -> str:
    """CTE chain replicating ``minhash_lsh_pairs(hash_fn='md5')`` stage
    by stage (datamatch_spark/extras/dedup.py): per-permutation seeds
    splitmix64(p+1), signature mins, per-band splitmix64 fold seeded by
    splitmix64(band + 0x5EED), band-bucket candidate self-join,
    signature-estimate prefilter at threshold - est_margin, exact
    hashed-shingle Jaccard rounded to 6dp with the threshold applied to
    the ROUNDED value (as the engine does). Ends in
    ``mh_pairs(idx_a, idx_b, jaccard)``.

    ``cand_cond`` swaps the candidate-join pairing predicate: the
    default is self-dedup id ordering; ``minhash_match_det`` passes the
    even/odd side split so the SAME signature chain oracles
    ``minhash_lsh_match`` (per-doc signatures are side-independent, so
    computing them over the union table is identical to computing them
    per side)."""
    r = n_perm // bands
    fold = []
    prev = "binit4"
    for step in range(1, r + 1):
        head = (
            f"bf{step}_0 AS (SELECT c.doc_id, c.band, c.cs, "
            f"xor(b.h, c.cs[{step}]) AS x "
            f"FROM comp c JOIN {prev} b USING (band))"
            if step == 1
            else f"bf{step}_0 AS (SELECT doc_id, band, cs, "
            f"xor(h, cs[{step}]) AS x FROM {prev})"
        )
        fold.append(head)
        fold.append(
            _duckdb_sm64_ctes(
                f"bf{step}_", f"bf{step}_0", ["doc_id", "band", "cs"], "x"
            )
        )
        prev = f"bf{step}_4"
    est_thr = repr(threshold - est_margin)
    return f"""{_duckdb_gram_hash_ctes(n)}, seeds0 AS (
  SELECT CAST(p AS INT) AS p, CAST(p + 1 AS UBIGINT) AS x
  FROM range({n_perm}) t(p)
),
{_duckdb_sm64_ctes('seeds', 'seeds0', ['p'], 'x')},
perm0 AS (
  SELECT gh.doc_id, s.p, xor(gh.g, s.h) AS x FROM gh CROSS JOIN seeds4 s
),
{_duckdb_sm64_ctes('perm', 'perm0', ['doc_id', 'p'], 'x')},
sig AS (SELECT doc_id, p, min(h) AS s FROM perm4 GROUP BY 1, 2),
sigl AS (SELECT doc_id, list(s ORDER BY p) AS sl FROM sig GROUP BY 1),
comp AS (
  SELECT doc_id, CAST(p // {r} AS INT) AS band, list(s ORDER BY p) AS cs
  FROM sig GROUP BY 1, 2
), binit0 AS (
  SELECT CAST(band AS INT) AS band, CAST(band + {0x5EED} AS UBIGINT) AS x
  FROM range({bands}) t(band)
),
{_duckdb_sm64_ctes('binit', 'binit0', ['band'], 'x')},
{','.join(fold)},
bandt AS (SELECT doc_id, band, h FROM {prev}),
cand AS (
  SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
  FROM bandt a JOIN bandt b
    ON a.band = b.band AND a.h = b.h AND {cand_cond}
), ghl AS (SELECT doc_id, list(g) AS gl FROM gh GROUP BY 1),
ver AS (
  SELECT c.idx_a, c.idx_b,
         len(list_intersect(ga.gl, gb.gl)) AS inter,
         len(ga.gl) + len(gb.gl) - len(list_intersect(ga.gl, gb.gl)) AS uni
  FROM cand c
  JOIN sigl sa ON sa.doc_id = c.idx_a
  JOIN sigl sb ON sb.doc_id = c.idx_b
  JOIN ghl ga ON ga.doc_id = c.idx_a
  JOIN ghl gb ON gb.doc_id = c.idx_b
  WHERE len(list_filter(range(1, {n_perm + 1}),
            i -> sa.sl[CAST(i AS INT)] = sb.sl[CAST(i AS INT)]))
        / {float(n_perm)} >= {est_thr}
), mh_pairs AS (
  SELECT idx_a, idx_b, round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
  FROM ver WHERE round(CAST(inter AS DOUBLE) / uni, 6) >= {threshold}
)"""


def _duckdb_minhash_sql(
    n: int, n_perm: int, bands: int, threshold: float, est_margin: float
) -> str:
    return (
        f"WITH {_duckdb_minhash_ctes(n, n_perm, bands, threshold, est_margin)}"
        "\nSELECT idx_a, idx_b, jaccard FROM mh_pairs"
    )


def _duckdb_dsir_ctes(buckets: int, alpha: float) -> str:
    """Shared CTE chain for the two DSIR oracles (``_dsir_weights``):
    hashed uni+bigram md5-32 buckets, Laplace-``alpha``-smoothed
    target (lang='en') / raw (all docs) models, per-doc (bucket, tf),
    per-doc ``w(doc_id, n_feats, log_weight)``. The model counts run
    over ALL documents' grams — the engine fits models on the full
    frame — while ``tf`` keys on doc_id, so only non-NULL-id docs are
    scored (matching ``dsir_logweights``'s id filter exactly)."""
    return f"""toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
  FROM documents
),
uni AS (SELECT doc_id, lang, unnest(t) AS gram FROM toks),
bi AS (
  SELECT doc_id, lang, t[j.j] || ' ' || t[j.j + 1] AS gram
  FROM toks, LATERAL UNNEST(range(1, len(t))) AS j(j)
  WHERE len(t) >= 2
),
grams AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
           % {buckets} AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
tc AS (SELECT bucket, count(*) AS c FROM grams
       WHERE lang = 'en' GROUP BY bucket),
rc AS (SELECT bucket, count(*) AS c FROM grams GROUP BY bucket),
tot AS (
  SELECT (SELECT sum(c) FROM tc) + {alpha!r} * {buckets} AS dt,
         (SELECT sum(c) FROM rc) + {alpha!r} * {buckets} AS dr
),
tf AS (SELECT doc_id, bucket, count(*) AS tf FROM grams
       WHERE doc_id IS NOT NULL GROUP BY doc_id, bucket),
w AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_feats,
         sum(tf.tf * (
             ln((coalesce(tc.c, 0) + {alpha!r}) / tot.dt)
           - ln((coalesce(rc.c, 0) + {alpha!r}) / tot.dr))) AS log_weight
  FROM tf
  LEFT JOIN tc USING (bucket)
  LEFT JOIN rc USING (bucket)
  CROSS JOIN tot
  GROUP BY tf.doc_id
)"""


def _duckdb_minhash_match_sql(
    n: int, n_perm: int, bands: int, threshold: float, est_margin: float
) -> str:
    """``minhash_lsh_match(hash_fn='md5')`` over the even/odd doc_id
    split of ``documents``: identical signature/band chain, but the
    candidate join pairs (even side) x (odd side) with no id-order
    collapse — idx_a is always the even-side id, idx_b the odd-side id,
    exactly the engine's orientation contract."""
    return (
        f"WITH {_duckdb_minhash_ctes(n, n_perm, bands, threshold, est_margin, cand_cond='a.doc_id % 2 = 0 AND b.doc_id % 2 = 1')}"
        "\nSELECT idx_a, idx_b, jaccard FROM mh_pairs"
    )


def _duckdb_minhash_groups_sql(
    n: int, n_perm: int, bands: int, threshold: float, est_margin: float
) -> str:
    """``minhash_dedup_groups(hash_fn='md5')``: the mh_pairs chain fed
    into the recursive-CTE reachability closure (the ``semantic_dedup``
    oracle's CC pattern) over ALL documents — unpaired docs are their
    own group with keep=true, like ``groups_from_pairs``."""
    return f"""
WITH RECURSIVE {_duckdb_minhash_ctes(n, n_perm, bands, threshold, est_margin)},
edges AS (
  SELECT idx_a AS src, idx_b AS dst FROM mh_pairs
  UNION SELECT idx_b, idx_a FROM mh_pairs
), reach(node, rt) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.rt FROM reach JOIN edges e ON e.src = reach.node
), cmp AS (
  SELECT node, min(rt) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS group_id,
       COALESCE(c.component, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN cmp c ON c.node = d.doc_id
"""


def _duckdb_simhash_sql(
    n: int, max_hamming: int, cand_cond: str = "a.doc_id < b.doc_id"
) -> str:
    """``simhash_near_pairs(hash_fn='md5')``: 64 per-bit ±1 sign-sums
    over the distinct gram hashes, fingerprint = bits with positive
    sum, then bit_count(xor) over ALL id-ordered pairs — equivalent to
    the engine's pigeonhole chunk candidacy, which is recall-lossless
    at its default n_chunks = max_hamming + 1. ``cand_cond`` swaps the
    pairing predicate: ``simhash_match_det`` passes the even/odd side
    split so the same fingerprint chain oracles ``simhash_near_match``
    (per-doc fingerprints are side-independent)."""
    return f"""
WITH {_duckdb_gram_hash_ctes(n)}, bits AS (
  SELECT gh.doc_id, b.b,
         sum(CASE WHEN ((gh.g >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM gh CROSS JOIN (SELECT CAST(x AS INT) AS b FROM range(64) t(x)) b
  GROUP BY 1, 2
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS UBIGINT) << b ELSE 0 END)
              AS UBIGINT) AS v
  FROM bits GROUP BY 1
)
SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
       CAST(bit_count(xor(a.v, b.v)) AS INT) AS hamming
FROM sh a JOIN sh b ON {cand_cond}
WHERE bit_count(xor(a.v, b.v)) <= {max_hamming}
"""


def _duckdb_lsh_ann_sql(k: int, n_planes: int, seed: int, dim: int = 64) -> str:
    """``lsh_topk(plane_kind='rademacher')`` end-to-end: splitmix64 ±1
    plane bank over the flat (plane, dim) index xor seed, sign codes
    packed little-endian, the query code plus its n_planes 1-bit flips
    (multiprobe), bucket-equality candidates, exact cosine rounded to
    6dp, row_number top-k with (cos DESC, neighbor_id) ties. ``dim`` is
    pinned to the fixture's embedding width (the engine reads it from
    data). Sign boundaries: both sides sum the same float64 products,
    order-dependent rounding could flip a sign only for |dot| ≲ 1e-13
    — same acceptance as the existing cosine oracles' 6dp rounding."""
    probes = ", ".join(["code"] + [f"xor(code, {1 << i})" for i in range(n_planes)])
    return f"""
WITH pl0 AS (
  SELECT CAST(x // {dim} AS INT) AS p, CAST(x % {dim} AS INT) AS d,
         xor(CAST(x + 1 AS UBIGINT), CAST({seed} AS UBIGINT)) AS xx
  FROM range({n_planes * dim}) t(x)
),
{_duckdb_sm64_ctes('pl', 'pl0', ['p', 'd'], 'xx')},
planes AS (
  SELECT p, d, CASE WHEN (h & 1) = 1 THEN 1.0 ELSE -1.0 END AS w FROM pl4
), vals AS (
  SELECT vec_id, CAST(t.d AS INT) AS d,
         CAST(embedding[CAST(t.d AS INT) + 1] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(len(embedding))) t(d)
), dots AS (
  SELECT v.vec_id, pl.p, sum(pl.w * v.v) AS dot
  FROM vals v JOIN planes pl ON pl.d = v.d GROUP BY 1, 2
), codes AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END)
              AS BIGINT) AS code
  FROM dots GROUP BY 1
), qcodes AS (SELECT vec_id AS query_id, code FROM codes WHERE vec_id < 25),
probes AS (
  SELECT query_id, pr.pc FROM qcodes, UNNEST([{probes}]) pr(pc)
), cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN codes c ON c.code = p.pc
  WHERE c.vec_id <> p.query_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ce.embedding AS DOUBLE[])), 6) AS cos
  FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id
            JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def _duckdb_soundex(col: str) -> str:
    """American Soundex as a pure DuckDB expression, replicating Spark's
    ``soundex`` (UTF8String.soundex) exactly: first char kept (pass-through
    of the WHOLE string when it isn't A-Z), H/W ignored WITHOUT resetting
    the last code (string removal preserves that), vowels/non-letters map
    to '0' (reset separators), adjacent duplicate codes collapse, then
    separators drop and the result pads/truncates to 4. DuckDB's RE2 has
    no pattern backreferences, so run-collapse is one regexp per digit.
    Parity-tested against Spark soundex in tests/test_entry.py."""
    m = "'ABCDEFGIJKLMNOPQRSTUVXYZ', '012301202245501262301202'"
    first = f"substr({col},1,1)"
    fcode = (
        f"CASE WHEN {first} IN ('H','W') THEN '7' "
        f"ELSE translate({first}, {m}) END"
    )
    rest = (
        f"translate(replace(replace(regexp_replace(substr({col},2), "
        f"'[^A-Z]', '0', 'g'), 'H',''),'W',''), {m})"
    )
    seq = f"({fcode} || {rest})"
    for d in "01234567":
        seq = f"regexp_replace({seq}, '{d}{d}+', '{d}', 'g')"
    digits = f"replace(substr({seq}, 2), '0','')"
    return (
        f"CASE WHEN {first} BETWEEN 'A' AND 'Z' "
        f"THEN substr({first} || {digits} || '000', 1, 4) "
        f"ELSE {col} END"
    )


def _duckdb_jw_chain() -> str:
    """python-Levenshtein-style Jaro-Winkler as DuckDB recursive-CTE
    fragments (the exact algorithm of ``kernels.jaro_winkler_batch``:
    phase-dependent matching window, greedy first-unmatched-position
    match, order-vs-rank transposition count, UNCAPPED common prefix,
    p=0.1). Expects a prior CTE ``jw_cand(idx_a, idx_b, s_a, s_b)``
    inside a ``WITH RECURSIVE``; emits CTEs ending in
    ``jw_scored(idx_a, idx_b, jw)``. The greedy state is the list of
    matched s1 positions in match order: m = len(ord);
    t = |{k : ord[k] != sort(ord)[k]}| — identical to the kernel's
    order-vs-rank bookkeeping. Validated bit-identical (after round 6)
    to the kernel on all 1,621 sf0.01 candidate pairs."""
    return """
jw_prep AS (
  SELECT idx_a, idx_b, s_a, s_b,
    CASE WHEN len(s_a) <= len(s_b) THEN s_a ELSE s_b END AS s1,
    CASE WHEN len(s_a) <= len(s_b) THEN s_b ELSE s_a END AS s2,
    least(len(s_a), len(s_b)) AS l1,
    greatest(len(s_a), len(s_b)) AS l2,
    (least(len(s_a), len(s_b)) + 1) // 2 AS halflen,
    least(greatest(len(s_a), len(s_b)),
          least(len(s_a), len(s_b))
          + (least(len(s_a), len(s_b)) + 1) // 2) AS bound
  FROM jw_cand
),
jw_greedy AS (
  SELECT idx_a, idx_b, s1, s2, l1, l2, halflen, bound,
         0 AS i, CAST([] AS INTEGER[]) AS ord
  FROM jw_prep
  UNION ALL
  SELECT idx_a, idx_b, s1, s2, l1, l2, halflen, bound, i + 1,
         CASE WHEN fj IS NULL THEN ord ELSE list_append(ord, fj) END
  FROM (
    SELECT g.*,
      list_min(list_filter(
        range(CASE WHEN g.i < g.halflen THEN 0 ELSE g.i - g.halflen END,
              (CASE WHEN g.i < g.halflen
                    THEN least(g.i + g.halflen, g.l1 - 1)
                    ELSE g.l1 - 1 END) + 1),
        j -> substr(g.s1, j + 1, 1) = substr(g.s2, g.i + 1, 1)
             AND NOT list_contains(g.ord, j)
      )) AS fj
    FROM jw_greedy g
    WHERE g.i < g.bound
  )
),
jw_final AS (
  SELECT idx_a, idx_b, s1, s2, l1, l2, ord,
         len(ord) AS m, list_sort(ord) AS sord
  FROM jw_greedy WHERE i = bound
),
jw_jaro AS (
  SELECT idx_a, idx_b, s1, s2, l1, l2, m,
    CASE WHEN m > 0 THEN
      len(list_filter(range(1, m + 1), k -> ord[k] != sord[k]))
    ELSE 0 END AS t
  FROM jw_final
),
jw_parts AS (
  SELECT idx_a, idx_b, l1, l2,
    CASE WHEN m > 0 THEN
      (m / CAST(l1 AS DOUBLE) + m / CAST(l2 AS DOUBLE)
       + 1.0 - t / (2.0 * m)) / 3.0
    ELSE 0.0 END AS jscore,
    coalesce(
      list_min(list_filter(range(1, l1 + 1),
        k -> substr(s1, k, 1) != substr(s2, k, 1))) - 1,
      l1) AS p
  FROM jw_jaro
),
jw_scored AS (
  -- both-empty pairs score 1.0 (kernel's explicit special case)
  SELECT idx_a, idx_b,
    CASE WHEN l1 = 0 AND l2 = 0 THEN 1.0
         ELSE least(1.0, jscore + 0.1 * p * (1.0 - jscore)) END AS jw
  FROM jw_parts
)"""


def _duckdb_lcs_chain() -> str:
    """Indel-Levenshtein ratio (2*LCS/(la+lb)) as DuckDB recursive-CTE
    fragments — the exact cummax row recurrence of
    ``kernels.lev_ratio_batch``. Expects a prior CTE
    ``lcs_in(idx_a, idx_b, fa, fb)``; emits
    ``lcs_out(idx_a, idx_b, ratio)``. Per step i the DP row over fb
    prefixes is cand[j] = max(prev[j-1]+eq, prev[j]) followed by a
    cumulative max (valid because LCS rows are nondecreasing)."""
    return """
lcs_len AS (
  SELECT idx_a, idx_b, fa, fb, len(fa) AS la, len(fb) AS lb FROM lcs_in
),
lcs_rec AS (
  SELECT idx_a, idx_b, fa, fb, la, lb, 0 AS i,
         list_transform(range(0, lb + 1), x -> 0) AS prev
  FROM lcs_len
  UNION ALL
  SELECT idx_a, idx_b, fa, fb, la, lb, i + 1,
    list_concat([0], list_transform(range(1, lb + 1),
      j -> list_max(list_slice(cand, 1, j))))
  FROM (
    SELECT r.*,
      list_transform(range(1, r.lb + 1),
        j -> greatest(
          r.prev[j] + CASE WHEN substr(r.fa, r.i + 1, 1)
                              = substr(r.fb, j, 1) THEN 1 ELSE 0 END,
          r.prev[j + 1])) AS cand
    FROM lcs_rec r WHERE r.i < r.la
  )
),
lcs_out AS (
  SELECT idx_a, idx_b,
    CASE WHEN la + lb > 0
         THEN 2.0 * prev[lb + 1] / (la + lb) ELSE 1.0 END AS ratio
  FROM lcs_rec WHERE i = la
)"""


def _duckdb_greedy_clique_chain() -> str:
    """The engine's greedy clique split (``clustering._greedy_cliques``:
    seeds ascending, LIFO stack, neighbors ascending, add a neighbor
    only when adjacent to EVERY current member, emit clusters of
    size > 1) as DuckDB recursive-CTE fragments. Expects a prior CTE
    ``edges(idx_a, idx_b)``; emits ``cliq(cluster_rep, doc_id)`` with
    ``cluster_rep = min(member)``.

    The walk is one sequential fold, so the CTE evolves a SINGLE state
    row (clustered set, current cluster, stack, closed clusters); each
    recursion step pops one stack node and folds its sorted neighbor
    list with ``list_reduce`` (the one list accumulator is the growing
    cluster — DuckDB 1.0's list_reduce mis-threads STRUCT accumulators
    AND any lambda branch that returns ``acc`` unchanged, so the
    clustered-check decomposes into the fixed row-start set plus the
    accumulator, and the reject branch appends a NULL sentinel —
    ``list_contains`` stays FALSE-not-NULL and ``list_has_all``
    ignores NULL needles — stripped by a final ``list_filter``). Running the greedy globally equals the engine's
    per-component runs: a seed's walk can only reach its own component.
    Validated row-identical to ``_greedy_cliques`` on the sf0.01 JW
    graph (15 non-clique components) and on constructed graphs
    (tests/test_entry.py)."""
    return """
adj_pairs AS (
  SELECT idx_a AS n, idx_b AS nb FROM edges
  UNION ALL
  SELECT idx_b AS n, idx_a AS nb FROM edges
),
adj AS (
  SELECT n, list_sort(list(nb)) AS nbrs FROM adj_pairs GROUP BY n
),
gg AS (
  SELECT map_from_entries(list({'k': n, 'v': nbrs})) AS amap,
         list_sort(list(n)) AS seeds
  FROM adj
),
walk AS (
  SELECT 0 AS i, FALSE AS done,
         CAST([] AS BIGINT[]) AS clustered,
         CAST([] AS BIGINT[]) AS cluster,
         CAST([] AS BIGINT[]) AS stack,
         CAST([] AS BIGINT[][]) AS outcl
  UNION ALL
  SELECT i + 1,
    CASE WHEN stk_empty THEN nxt IS NULL ELSE FALSE END AS done,
    CASE WHEN stk_empty
         THEN CASE WHEN nxt IS NULL THEN clustered
                   ELSE list_append(clustered, nxt) END
         ELSE list_concat(clustered, added) END AS clustered,
    CASE WHEN stk_empty
         THEN CASE WHEN nxt IS NULL THEN CAST([] AS BIGINT[])
                   ELSE [nxt] END
         ELSE cl_end END AS cluster,
    CASE WHEN stk_empty
         THEN CASE WHEN nxt IS NULL THEN CAST([] AS BIGINT[])
                   ELSE [nxt] END
         ELSE list_concat(rest, added) END AS stack,
    CASE WHEN stk_empty THEN closed ELSE outcl END AS outcl
  FROM (
    SELECT w.*,
      len(w.stack) = 0 AS stk_empty,
      CASE WHEN len(w.cluster) > 1 THEN list_append(w.outcl, w.cluster)
           ELSE w.outcl END AS closed,
      list_min(list_filter(gg.seeds,
        s -> NOT list_contains(w.clustered, s))) AS nxt,
      list_slice(w.stack, 1, len(w.stack) - 1) AS rest,
      CASE WHEN len(w.stack) > 0 THEN
        list_filter(list_reduce(
          [w.cluster] || list_transform(
            map_extract(gg.amap, w.stack[-1])[1], nb -> [nb]),
          (acc, x) -> CASE
            WHEN NOT list_contains(w.clustered, x[1])
                 AND NOT list_contains(acc, x[1])
                 AND list_has_all(map_extract(gg.amap, x[1])[1], acc)
            THEN list_append(acc, x[1])
            ELSE list_append(acc, NULL) END), e -> e IS NOT NULL)
      ELSE CAST([] AS BIGINT[]) END AS cl_end
    FROM walk w, gg
    WHERE NOT w.done
  ) step(i, done, clustered, cluster, stack, outcl,
         stk_empty, closed, nxt, rest, cl_end),
  LATERAL (
    SELECT list_slice(cl_end, len(cluster) + 1, len(cl_end)) AS added
  ) d
),
clusters AS (
  SELECT unnest(outcl) AS cl FROM walk WHERE done
),
cliq AS (
  SELECT list_min(cl) AS cluster_rep, unnest(cl) AS doc_id FROM clusters
)"""


def _duckdb_fs_em_sql(n_iter: int = 20, tail: str = "pairs") -> str:
    """Recursive-CTE replay of ``datamatch_spark.linkage._em``.

    The engine folds sorted patterns left-to-right inside each EM
    iteration and multiplies fields in declaration order; the CTE walks
    the identical (iteration, pattern-index) sequence one row at a
    time, so every float64 operation matches bit-for-bit. Clamp
    literals are written exactly as the engine computes them
    (``1e-6`` / ``1.0 - 1e-6``).
    """
    fields = [("g_source", "m1", "u1"), ("g_len", "m2", "u2"), ("g_tok", "m3", "u3")]

    def prod(prior: str, grow: str, ptab: str, which: int) -> str:
        """lam * prod_k (gamma_k ? param_k : 1 - param_k), fields in
        declaration order — ``which`` picks m (1) or u (2) params."""
        terms = [prior]
        for f3 in fields:
            g, p = f3[0], f3[which]
            terms.append(
                f"(CASE WHEN {grow}.{g} = 1 THEN {ptab}.{p}"
                f" ELSE 1.0 - {ptab}.{p} END)"
            )
        return "\n             * ".join(terms)

    w_em = prod("e.lam", "p", "e", 1)
    v_em = prod("(1.0 - e.lam)", "p", "e", 2)
    w_fin = prod("f.lam", "g", "f", 1)
    v_fin = prod("(1.0 - f.lam)", "g", "f", 2)
    clamp = lambda x: f"least(greatest({x}, 0.000001), 1.0 - 0.000001)"  # noqa: E731
    m_updates = ",\n    ".join(
        f"CASE WHEN e.pid < m.pmax THEN e.{mk} ELSE {clamp(f'e.scpg{j + 1} / e.scp')} END"
        for j, (_, mk, _) in enumerate(fields)
    )
    u_updates = ",\n    ".join(
        f"CASE WHEN e.pid < m.pmax THEN e.{uk} ELSE {clamp(f'e.scqg{j + 1} / e.scq')} END"
        for j, (_, _, uk) in enumerate(fields)
    )
    g_sums = ",\n    ".join(
        f"CASE WHEN e.pid < m.pmax THEN"
        f" (CASE WHEN p.{g} = 1 THEN e.scpg{j + 1} + s.cp ELSE e.scpg{j + 1} END)"
        f" ELSE CAST(0 AS DOUBLE) END"
        for j, (g, _, _) in enumerate(fields)
    ) + ",\n    " + ",\n    ".join(
        f"CASE WHEN e.pid < m.pmax THEN"
        f" (CASE WHEN p.{g} = 1 THEN e.scqg{j + 1} + s.cq ELSE e.scqg{j + 1} END)"
        f" ELSE CAST(0 AS DOUBLE) END"
        for j, (g, _, _) in enumerate(fields)
    )
    weight = "\n       + ".join(
        f"(CASE WHEN g.{g} = 1 THEN log2(f.{mk} / f.{uk})"
        f" ELSE log2((1.0 - f.{mk}) / (1.0 - f.{uk})) END)"
        for g, mk, uk in fields
    )
    if tail == "pairs":
        tail_sql = f"""
        SELECT g.idx_a, g.idx_b, g.g_source, g.g_len, g.g_tok,
               round({weight}, 6) AS match_weight,
               round(pw.w / (pw.w + pw.v), 6) AS match_probability
        FROM gam g
        CROSS JOIN fin f
        CROSS JOIN LATERAL (
          SELECT {w_fin} AS w,
                 {v_fin} AS v
        ) pw"""
    elif tail == "tf":
        # term-frequency adjustment on g_tok: u3 -> tf(v_tok) for
        # agreeing pairs (tf_weight = 1.0, so the engine's
        # pow(ratio, 1.0) is the plain ratio bit-for-bit)
        tail_sql = f""",
        tfreq AS (
          SELECT split_part(text, ' ', 1) AS value,
                 count(*) / (SELECT CAST(count(*) AS DOUBLE)
                             FROM documents
                             WHERE split_part(text, ' ', 1) IS NOT NULL)
                   AS tf
          FROM documents
          WHERE split_part(text, ' ', 1) IS NOT NULL
          GROUP BY 1
        )
        SELECT g.idx_a, g.idx_b, g.g_tok,
               round({weight}
                     + CASE WHEN g.g_tok = 1 AND t.tf IS NOT NULL
                            THEN 1.0 * log2(f.u3 / t.tf)
                            ELSE 0.0 END, 6) AS match_weight_tf,
               round(pw.w * (CASE WHEN g.g_tok = 1 AND t.tf IS NOT NULL
                                  THEN f.u3 / t.tf ELSE 1.0 END)
                     / (pw.w * (CASE WHEN g.g_tok = 1 AND t.tf IS NOT NULL
                                     THEN f.u3 / t.tf ELSE 1.0 END)
                        + pw.v), 6) AS match_probability_tf
        FROM gam g
        CROSS JOIN fin f
        LEFT JOIN tfreq t ON t.value = g.v_tok
        CROSS JOIN LATERAL (
          SELECT {w_fin} AS w,
                 {v_fin} AS v
        ) pw"""
    else:  # clusters: threshold the UNROUNDED posterior, then CC
        tail_sql = f""",
        scored AS (
          SELECT g.idx_a, g.idx_b, pw.w / (pw.w + pw.v) AS prob
          FROM gam g
          CROSS JOIN fin f
          CROSS JOIN LATERAL (
            SELECT {w_fin} AS w,
                   {v_fin} AS v
          ) pw
        ),
        fedges AS (
          SELECT idx_a AS src, idx_b AS dst FROM scored WHERE prob >= 0.15
        ),
        sym AS (
          SELECT src, dst FROM fedges UNION SELECT dst, src FROM fedges
        ),
        reach(node, r) AS (
          SELECT src, src FROM sym
          UNION
          SELECT e.dst, reach.r FROM reach JOIN sym e ON e.src = reach.node
        )
        SELECT node, min(r) AS component FROM reach GROUP BY node"""
    return f"""
        WITH RECURSIVE
        gam AS (
          SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                 CASE WHEN a.source IS NOT DISTINCT FROM b.source
                      THEN 1 ELSE 0 END AS g_source,
                 CASE WHEN abs(a.n_chars - b.n_chars) <= 20
                      THEN 1 ELSE 0 END AS g_len,
                 CASE WHEN split_part(a.text, ' ', 1)
                        IS NOT DISTINCT FROM split_part(b.text, ' ', 1)
                      THEN 1 ELSE 0 END AS g_tok,
                 split_part(a.text, ' ', 1) AS v_tok
          FROM documents a JOIN documents b
            ON a.lang = b.lang AND a.doc_id < b.doc_id
        ),
        pat AS (
          SELECT g_source, g_len, g_tok, CAST(count(*) AS DOUBLE) AS c,
                 CAST(row_number() OVER (ORDER BY g_source, g_len, g_tok)
                      AS INTEGER) AS pid
          FROM gam GROUP BY 1, 2, 3
        ),
        meta AS (
          SELECT CAST(max(pid) AS INTEGER) AS pmax,
                 (SELECT CAST(count(*) AS DOUBLE) FROM gam) AS tot
          FROM pat
        ),
        em AS (
          SELECT 1 AS it, 0 AS pid,
                 CAST(0.5 AS DOUBLE) AS lam,
                 CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
                 CAST(0.9 AS DOUBLE) AS m3,
                 CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
                 CAST(0.1 AS DOUBLE) AS u3,
                 CAST(0 AS DOUBLE) AS scp, CAST(0 AS DOUBLE) AS scq,
                 CAST(0 AS DOUBLE) AS scpg1, CAST(0 AS DOUBLE) AS scpg2,
                 CAST(0 AS DOUBLE) AS scpg3,
                 CAST(0 AS DOUBLE) AS scqg1, CAST(0 AS DOUBLE) AS scqg2,
                 CAST(0 AS DOUBLE) AS scqg3
          UNION ALL
          SELECT
            CASE WHEN e.pid < m.pmax THEN e.it ELSE e.it + 1 END,
            CASE WHEN e.pid < m.pmax THEN e.pid + 1 ELSE 0 END,
            CASE WHEN e.pid < m.pmax THEN e.lam
                 ELSE {clamp("e.scp / m.tot")} END,
            {m_updates},
            {u_updates},
            CASE WHEN e.pid < m.pmax THEN e.scp + s.cp
                 ELSE CAST(0 AS DOUBLE) END,
            CASE WHEN e.pid < m.pmax THEN e.scq + s.cq
                 ELSE CAST(0 AS DOUBLE) END,
            {g_sums}
          FROM em e
          CROSS JOIN meta m
          LEFT JOIN pat p ON p.pid = e.pid + 1
          LEFT JOIN LATERAL (
            SELECT {w_em} AS w,
                   {v_em} AS v
          ) wv ON TRUE
          LEFT JOIN LATERAL (
            SELECT p.c * (wv.w / (wv.w + wv.v)) AS cp,
                   p.c * (1.0 - wv.w / (wv.w + wv.v)) AS cq
          ) s ON TRUE
          WHERE e.it <= {n_iter}
        ),
        fin AS (
          SELECT lam, m1, m2, m3, u1, u2, u3 FROM em WHERE it = {n_iter} + 1
        ){tail_sql}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "block_stats": f"""
            SELECT 's:' || lang || chr(31) || 's:' || source AS block_key,
                   count(*) AS n_rows,
                   CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
            FROM documents GROUP BY 1
        """,
        "block_metrics": """
            SELECT 's:' || lang || chr(31) || 's:' || source AS block_key,
                   count(*) AS n_rows,
                   CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
            FROM documents GROUP BY 1
        """,
        "candidate_pairs": """
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        """,
        "absnum_scored_pairs": """
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                   round(1.0 - abs(a.n_chars - b.n_chars) / 50.0, 6) AS sim_score
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE abs(a.n_chars - b.n_chars) < 50
              AND (1.0 - abs(a.n_chars - b.n_chars) / 50.0) >= 0.5
        """,
        "match_scored": """
            WITH RECURSIVE scored AS (
              -- EVERY blocked pair participates in the greedy 1:1 pass
              -- (zero-score pairs still claim their rows); the
              -- [0.5, 1.0] slice happens after, like the engine
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     CASE WHEN abs(a.n_chars - b.n_chars) < 50
                          THEN 1.0 - abs(a.n_chars - b.n_chars) / 50.0
                          ELSE 0 END AS sim_score
              FROM documents a JOIN documents b ON a.lang = b.lang
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
                AND a.doc_id < 500 AND b.doc_id < 500
            ), ranked AS (
              SELECT idx_a, idx_b, sim_score,
                     row_number() OVER (
                       ORDER BY sim_score DESC, idx_a, idx_b) AS rn
              FROM scored
            ), g AS (
              SELECT 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS ua,
                     CAST([] AS BIGINT[]) AS ub
              UNION ALL
              SELECT nxt.rn, list_append(g.ua, nxt.idx_a),
                     list_append(g.ub, nxt.idx_b)
              FROM g, LATERAL (
                SELECT r.rn, r.idx_a, r.idx_b FROM ranked r
                WHERE r.rn > g.rn
                  AND NOT list_contains(g.ua, r.idx_a)
                  AND NOT list_contains(g.ub, r.idx_b)
                ORDER BY r.rn LIMIT 1
              ) nxt
            )
            SELECT r.idx_a, r.idx_b, round(r.sim_score, 6) AS sim_score
            FROM ranked r JOIN g ON r.rn = g.rn
            WHERE r.sim_score BETWEEN 0.5 AND 1.0
        """,
        "relnum_scored_pairs": """
            WITH p AS (
              SELECT a.o_orderkey AS idx_a, b.o_orderkey AS idx_b,
                     abs(a.o_totalprice - b.o_totalprice)
                       / greatest(abs(a.o_totalprice), abs(b.o_totalprice)) * 100 AS pc
              FROM orders a JOIN orders b
                ON a.o_orderpriority = b.o_orderpriority
               AND a.o_orderdate = b.o_orderdate
               AND a.o_orderkey < b.o_orderkey
            )
            SELECT idx_a, idx_b, round(1.0 - pc / 30.0, 6) AS sim_score
            FROM p WHERE pc < 30 AND (1.0 - pc / 30.0) >= 0.9
        """,
        "dissimilar_filter": """
            SELECT a.source AS source_a, count(*) AS n_pairs
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE a.source IS NULL OR b.source IS NULL OR a.source <> b.source
            GROUP BY 1
        """,
        "nonoverlap_filter": """
            WITH ev AS (
              SELECT event_id, user_id, ts AS start_ts,
                     ts + CAST(value AS INT) * INTERVAL '1 second' AS end_ts
              FROM events WHERE event_type = 'purchase'
            )
            SELECT a.event_id AS idx_a, b.event_id AS idx_b
            FROM ev a JOIN ev b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
            WHERE a.end_ts < b.start_ts OR a.start_ts > b.end_ts
        """,
        "semantic_dedup": """
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS src, b.vec_id AS dst
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
            ), edges AS (
              SELECT src, dst FROM p UNION SELECT dst, src FROM p
            ), reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
            ), comp AS (
              SELECT node, min(r) AS component FROM reach GROUP BY node
            )
            SELECT e.vec_id,
                   COALESCE(c.component, e.vec_id) AS group_id,
                   COALESCE(c.component, e.vec_id) = e.vec_id AS keep
            FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
        """,
        "semantic_dedup_cells": """
            WITH RECURSIVE c AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS cemb
              FROM embeddings WHERE vec_id < 4
            ), scored AS (
              SELECT e.vec_id, c.cid,
                     list_cosine_similarity(e.embedding::DOUBLE[], c.cemb) AS s
              FROM embeddings e CROSS JOIN c
            ), assign AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY s DESC, cid ASC) AS rn
                FROM scored) WHERE rn = 1
            ), p AS (
              SELECT a.vec_id AS src, b.vec_id AS dst
              FROM embeddings a
              JOIN assign aa ON aa.vec_id = a.vec_id
              JOIN embeddings b ON a.vec_id < b.vec_id
              JOIN assign ab ON ab.vec_id = b.vec_id AND ab.cid = aa.cid
              WHERE list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
            ), edges AS (
              SELECT src, dst FROM p UNION SELECT dst, src FROM p
            ), reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
            ), comp AS (
              SELECT node, min(r) AS component FROM reach GROUP BY node
            )
            SELECT e.vec_id,
                   COALESCE(c2.component, e.vec_id) AS group_id,
                   COALESCE(c2.component, e.vec_id) = e.vec_id AS keep
            FROM embeddings e LEFT JOIN comp c2 ON c2.node = e.vec_id
        """,
        "swap_match": """
            WITH RECURSIVE d AS (
              SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS p,
                     CAST((doc_id * 7) % 500 AS DOUBLE) AS q
              FROM documents
            ), sims AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     a.p AS ap, a.q AS aq, b.p AS bp, b.q AS bq,
                     CASE WHEN abs(a.p-b.p) < 60 THEN 1 - abs(a.p-b.p)/60 ELSE 0 END AS s_pp,
                     CASE WHEN abs(a.q-b.q) < 60 THEN 1 - abs(a.q-b.q)/60 ELSE 0 END AS s_qq,
                     CASE WHEN abs(a.p-b.q) < 60 THEN 1 - abs(a.p-b.q)/60 ELSE 0 END AS s_pq,
                     CASE WHEN abs(a.q-b.p) < 60 THEN 1 - abs(a.q-b.p)/60 ELSE 0 END AS s_qp
              FROM d a JOIN d b ON a.lang = b.lang
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
            ), scored AS (
              -- swap-max score (shared-similarity permutation identity,
              -- see swap_numeric); EVERY blocked pair participates in
              -- the greedy pass, the [0.7, 1.0] slice happens after
              SELECT idx_a, idx_b,
                     CASE WHEN ap <> aq OR bp <> bq
                          THEN greatest(sqrt((s_pp*s_pp + s_qq*s_qq)/2),
                                        sqrt((s_pq*s_pq + s_qp*s_qp)/2))
                          ELSE sqrt((s_pp*s_pp + s_qq*s_qq)/2) END AS sim_score
              FROM sims
            ), ranked AS (
              SELECT idx_a, idx_b, sim_score,
                     row_number() OVER (
                       ORDER BY sim_score DESC, idx_a, idx_b) AS rn
              FROM scored
            ), g AS (
              SELECT 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS ua,
                     CAST([] AS BIGINT[]) AS ub
              UNION ALL
              SELECT nxt.rn, list_append(g.ua, nxt.idx_a),
                     list_append(g.ub, nxt.idx_b)
              FROM g, LATERAL (
                SELECT r.rn, r.idx_a, r.idx_b FROM ranked r
                WHERE r.rn > g.rn
                  AND NOT list_contains(g.ua, r.idx_a)
                  AND NOT list_contains(g.ub, r.idx_b)
                ORDER BY r.rn LIMIT 1
              ) nxt
            )
            SELECT r.idx_a, r.idx_b, round(r.sim_score, 6) AS sim_score
            FROM ranked r JOIN g ON r.rn = g.rn
            WHERE r.sim_score BETWEEN 0.7 AND 1.0
        """,
        "swap_numeric": """
            WITH d AS (
              SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS p,
                     CAST((doc_id * 7) % 500 AS DOUBLE) AS q
              FROM documents
            ), sims AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     a.p AS ap, a.q AS aq, b.p AS bp, b.q AS bq,
                     CASE WHEN abs(a.p-b.p) < 60 THEN 1 - abs(a.p-b.p)/60 ELSE 0 END AS s_pp,
                     CASE WHEN abs(a.q-b.q) < 60 THEN 1 - abs(a.q-b.q)/60 ELSE 0 END AS s_qq,
                     CASE WHEN abs(a.p-b.q) < 60 THEN 1 - abs(a.p-b.q)/60 ELSE 0 END AS s_pq,
                     CASE WHEN abs(a.q-b.p) < 60 THEN 1 - abs(a.q-b.p)/60 ELSE 0 END AS s_qp
              FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
            ), scored AS (
              SELECT idx_a, idx_b,
                     CASE WHEN ap <> aq OR bp <> bq
                          THEN greatest(sqrt((s_pp*s_pp + s_qq*s_qq)/2),
                                        sqrt((s_pq*s_pq + s_qp*s_qp)/2))
                          ELSE sqrt((s_pp*s_pp + s_qq*s_qq)/2) END AS sc
              FROM sims
            )
            SELECT idx_a, idx_b, round(sc, 6) AS sim_score
            FROM scored WHERE sc >= 0.7 AND sc <= 1.0
        """,
        "cc_components": """
            WITH RECURSIVE pairs AS (
              SELECT a.doc_id AS src, b.doc_id AS dst
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) < 50
                AND (1.0 - abs(a.n_chars - b.n_chars) / 50.0) >= 0.9
            ), edges AS (
              SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
            ), reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
            )
            SELECT node, min(r) AS component FROM reach GROUP BY node
        """,
        "cluster_exact": """
            WITH g AS (
              SELECT doc_id,
                     count(*) OVER (PARTITION BY lang, n_chars) AS c,
                     min(doc_id) OVER (PARTITION BY lang, n_chars) AS rep
              FROM documents
            )
            SELECT rep AS cluster_rep, doc_id FROM g WHERE c > 1
        """,
        "all_pairs_report": """
            WITH docs AS (SELECT * FROM documents WHERE lang = 'en'),
            p AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib,
                     round(1.0 - abs(a.n_chars - b.n_chars) / 20.0, 6) AS s
              FROM docs a JOIN docs b
                ON a.source = b.source AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) < 20
                AND (1.0 - abs(a.n_chars - b.n_chars) / 20.0) >= 0.9
            ), ranked AS (
              SELECT ia, ib, s,
                     row_number() OVER (ORDER BY s DESC, ia, ib) - 1 AS pair_idx
              FROM p
            ), two AS (
              SELECT pair_idx, s AS sim_score, ia AS doc_id FROM ranked
              UNION ALL
              SELECT pair_idx, s AS sim_score, ib AS doc_id FROM ranked
            )
            SELECT t.pair_idx, t.sim_score, t.doc_id, d.lang, d.source, d.n_chars
            FROM two t JOIN docs d ON t.doc_id = d.doc_id
        """,
        "noop_index": """
            WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300)
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM d a JOIN d b ON a.doc_id < b.doc_id
        """,
        "index_elements": """
            WITH d AS (
              SELECT doc_id, string_split(text, ' ')[1:3] AS toks
              FROM documents WHERE lang = 'fr'
            ), k AS (
              SELECT DISTINCT doc_id, 's:' || u.t AS k
              FROM d, UNNEST(d.toks) AS u(t)
            )
            SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM k a JOIN k b ON a.k = b.k AND a.doc_id < b.doc_id
        """,
        "match_candidates": """
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.source = b.source
            WHERE a.doc_id % 40 < 20 AND b.doc_id % 40 >= 20
        """,
        "phonetic_candidates": f"""
            WITH k AS (
              SELECT doc_id, upper(split_part(text, ' ', 1)) AS u
              FROM documents WHERE doc_id < 200
            ), sx AS (
              SELECT doc_id, {_duckdb_soundex('u')} AS code FROM k
            ), keyed AS (
              SELECT doc_id, code FROM sx
              WHERE code IS NOT NULL AND length(code) > 0
            )
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM keyed a JOIN keyed b
              ON a.code = b.code AND a.doc_id < b.doc_id
        """,
        "qgram_candidates": """
            WITH k AS (
              SELECT doc_id, lower(split_part(text, ' ', 1)) AS qk
              FROM documents
              WHERE text IS NOT NULL AND length(split_part(text, ' ', 1)) > 0
            ), g AS (
              SELECT DISTINCT doc_id, substring(qk, i, 3) AS gm,
                     length(qk) <= 3 AS whole
              FROM k, UNNEST(range(1, greatest(1, length(qk) - 2) + 1)) AS t(i)
            ), kept AS (
              SELECT gm FROM g GROUP BY gm HAVING count(*) <= 30
            ), g2 AS (
              -- whole-string grams of sub-q keys are equality blocks,
              -- exempt from the stop-gram cap (matches QGramIndex)
              SELECT doc_id, gm FROM g
              WHERE whole OR gm IN (SELECT gm FROM kept)
            )
            SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM g2 a JOIN g2 b ON a.gm = b.gm AND a.doc_id < b.doc_id
        """,
        "suffix_candidates": """
            WITH k AS (
              SELECT doc_id, lower(split_part(text, ' ', 1)) AS qk
              FROM documents
              WHERE text IS NOT NULL AND length(split_part(text, ' ', 1)) > 0
            ), g AS (
              SELECT DISTINCT doc_id, substring(qk, i) AS sfx,
                     length(qk) <= 4 AS whole
              FROM k, UNNEST(range(1, greatest(1, length(qk) - 3) + 1)) AS t(i)
            ), kept AS (
              SELECT sfx FROM g GROUP BY sfx HAVING count(*) <= 30
            ), g2 AS (
              -- whole-string suffixes of sub-min_len keys are equality
              -- blocks, exempt from the cap (matches SuffixArrayIndex)
              SELECT doc_id, sfx FROM g
              WHERE whole OR sfx IN (SELECT sfx FROM kept)
            )
            SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM g2 a JOIN g2 b ON a.sfx = b.sfx AND a.doc_id < b.doc_id
        """,
        "qgram_quality": """
            WITH k AS (
              SELECT doc_id, lower(split_part(text, ' ', 1)) AS qk
              FROM documents
              WHERE text IS NOT NULL AND length(split_part(text, ' ', 1)) > 0
            ), g AS (
              SELECT DISTINCT doc_id, substring(qk, i, 3) AS gm,
                     length(qk) <= 3 AS whole
              FROM k, UNNEST(range(1, greatest(1, length(qk) - 2) + 1)) AS t(i)
            ), kept AS (
              SELECT gm FROM g GROUP BY gm HAVING count(*) <= 30
            ), g2 AS (
              SELECT doc_id, gm FROM g
              WHERE whole OR gm IN (SELECT gm FROM kept)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
              FROM g2 a JOIN g2 b ON a.gm = b.gm AND a.doc_id < b.doc_id
            ), truth AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
              FROM k a JOIN k b
                ON a.qk = b.qk AND a.doc_id < b.doc_id
            ), nn AS (SELECT count(*) AS n_rows FROM documents),
            cc AS (SELECT count(*) AS n_cand FROM cand),
            mm AS (
              SELECT count(*) AS n_truth,
                     count(c.idx_a) AS covered
              FROM truth t
              LEFT JOIN cand c
                ON c.idx_a = t.idx_a AND c.idx_b = t.idx_b
            )
            SELECT nn.n_rows,
                   cc.n_cand AS n_candidates,
                   mm.n_truth,
                   mm.covered AS n_truth_covered,
                   round(1.0 - cc.n_cand / (nn.n_rows * (nn.n_rows - 1) / 2.0), 6)
                     AS reduction_ratio,
                   round(mm.covered * 1.0 / mm.n_truth, 6) AS pairs_completeness,
                   round(mm.covered * 1.0 / cc.n_cand, 6) AS pairs_quality
            FROM nn, cc, mm
        """,
        "pairwise_f1": """
            WITH k AS (
              SELECT doc_id, lower(split_part(text, ' ', 1)) AS qk
              FROM documents
              WHERE text IS NOT NULL AND length(split_part(text, ' ', 1)) > 0
            ), lab AS (
              SELECT doc_id, substring(qk, 1, 4) AS p, qk AS t FROM k
            ), pp AS (
              SELECT coalesce(sum(n * (n - 1) // 2), 0) AS pred_pairs
              FROM (SELECT count(*) AS n FROM lab GROUP BY p)
            ), tp AS (
              SELECT coalesce(sum(n * (n - 1) // 2), 0) AS true_pairs
              FROM (SELECT count(*) AS n FROM lab GROUP BY t)
            ), cp AS (
              SELECT coalesce(sum(n * (n - 1) // 2), 0) AS common_pairs
              FROM (SELECT count(*) AS n FROM lab GROUP BY p, t)
            )
            SELECT CAST(pred_pairs AS BIGINT) AS pred_pairs,
                   CAST(true_pairs AS BIGINT) AS true_pairs,
                   CAST(common_pairs AS BIGINT) AS common_pairs,
                   common_pairs / nullif(pred_pairs, 0) AS precision,
                   common_pairs / nullif(true_pairs, 0) AS recall,
                   2 * (common_pairs / nullif(pred_pairs, 0))
                     * (common_pairs / nullif(true_pairs, 0))
                     / nullif(common_pairs / nullif(pred_pairs, 0)
                              + common_pairs / nullif(true_pairs, 0), 0)
                     AS f1
            FROM pp, tp, cp
        """,
        "bcubed": """
            WITH k AS (
              SELECT doc_id, lower(split_part(text, ' ', 1)) AS qk
              FROM documents
              WHERE text IS NOT NULL AND length(split_part(text, ' ', 1)) > 0
            ), lab AS (
              SELECT doc_id, substring(qk, 1, 4) AS p, qk AS t FROM k
            ), cells AS (
              SELECT p, t, count(*) AS n_pt FROM lab GROUP BY 1, 2
            ), ps AS (
              SELECT p, count(*) AS n_p FROM lab GROUP BY 1
            ), ts AS (
              SELECT t, count(*) AS n_t FROM lab GROUP BY 1
            ), agg AS (
              SELECT sum(n_pt) AS n_rows,
                     sum(n_pt * n_pt / n_p) / sum(n_pt) AS bp,
                     sum(n_pt * n_pt / n_t) / sum(n_pt) AS br
              FROM cells JOIN ps USING (p) JOIN ts USING (t)
            )
            SELECT CAST(n_rows AS BIGINT) AS n_rows,
                   bp AS bcubed_precision, br AS bcubed_recall,
                   2 * bp * br / nullif(bp + br, 0) AS bcubed_f1
            FROM agg
        """,
        "blocking_quality": """
            WITH c AS (
              SELECT count(*) AS n_cand
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
            ), m AS (
              SELECT count(*) AS n_truth,
                     count(*) FILTER (a.lang = b.lang) AS covered
              FROM documents a JOIN documents b
                ON a.source = b.source AND a.doc_id < b.doc_id
               AND abs(a.n_chars - b.n_chars) < 20
            ), n AS (SELECT count(*) AS n_rows FROM documents)
            SELECT n.n_rows,
                   c.n_cand AS n_candidates,
                   m.n_truth,
                   m.covered AS n_truth_covered,
                   round(1.0 - c.n_cand / (n.n_rows * (n.n_rows - 1) / 2.0), 6)
                     AS reduction_ratio,
                   round(m.covered * 1.0 / m.n_truth, 6) AS pairs_completeness,
                   round(m.covered * 1.0 / c.n_cand, 6) AS pairs_quality
            FROM n, c, m
        """,
        "sorted_neighborhood": """
            WITH ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rnk
              FROM documents
              WHERE n_chars IS NOT NULL
            )
            SELECT LEAST(a.doc_id, b.doc_id) AS idx_a,
                   GREATEST(a.doc_id, b.doc_id) AS idx_b
            FROM ranked a JOIN ranked b
              ON b.rnk > a.rnk AND b.rnk <= a.rnk + 4
        """,
        "sorted_neighborhood_match": """
            WITH u AS (
              SELECT doc_id, n_chars,
                     CASE WHEN doc_id % 40 < 20 THEN 0 ELSE 1 END AS side
              FROM documents
              WHERE n_chars IS NOT NULL
            ), ranked AS (
              SELECT doc_id, side,
                     row_number() OVER (ORDER BY n_chars, side, doc_id) - 1
                       AS rnk
              FROM u
            )
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM ranked a JOIN ranked b
              ON a.side = 0 AND b.side = 1 AND abs(a.rnk - b.rnk) <= 4
        """,
        "cluster_report": """
            WITH p AS (
              SELECT a.o_orderkey AS ia, b.o_orderkey AS ib,
                     a.o_orderpriority AS prio, a.o_orderdate AS od,
                     1.0 - abs(a.o_totalprice - b.o_totalprice) / 1000000.0 AS s
              FROM orders a JOIN orders b
                ON a.o_orderpriority = b.o_orderpriority
               AND a.o_orderdate = b.o_orderdate
               AND a.o_orderkey < b.o_orderkey
              WHERE abs(a.o_totalprice - b.o_totalprice) < 1000000
                AND (1.0 - abs(a.o_totalprice - b.o_totalprice) / 1000000.0)
                      BETWEEN 0.4 AND 1.0
            ), stats AS (
              SELECT prio, od, max(s) AS max_s, min(ia) AS rep
              FROM p GROUP BY prio, od
            ), idxd AS (
              SELECT prio, od,
                     row_number() OVER (ORDER BY max_s DESC, rep ASC) - 1
                       AS cluster_idx
              FROM stats
            ), ranked AS (
              SELECT p.*, i.cluster_idx,
                     row_number() OVER (
                       PARTITION BY p.prio, p.od
                       ORDER BY p.s DESC, p.ia ASC, p.ib ASC
                     ) - 1 AS pair_idx
              FROM p JOIN idxd i ON p.prio = i.prio AND p.od = i.od
            ), two AS (
              SELECT cluster_idx, pair_idx, round(s, 6) AS sim_score,
                     ia AS o_orderkey FROM ranked
              UNION ALL
              SELECT cluster_idx, pair_idx, round(s, 6) AS sim_score,
                     ib AS o_orderkey FROM ranked
            )
            SELECT t.cluster_idx, t.pair_idx, t.sim_score, t.o_orderkey,
                   o.o_orderpriority, round(o.o_totalprice, 2) AS o_totalprice
            FROM two t JOIN orders o ON t.o_orderkey = o.o_orderkey
        """,
        "multiindex_or": """
            WITH keys AS (
              SELECT doc_id, 's:' || lang AS k FROM documents
              UNION
              SELECT doc_id, 's:' || source AS k FROM documents
            )
            SELECT DISTINCT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id
        """,
        "multiindex_and": """
            SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        """,
        "sample_pairs_report": """
            WITH docs AS (SELECT * FROM documents WHERE lang = 'de'),
            p AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib,
                     round(1.0 - abs(a.n_chars - b.n_chars) / 40.0, 6) AS s
              FROM docs a JOIN docs b
                ON a.source = b.source AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) < 40
            ), bucketed AS (
              -- np.arange(1.0, 0.7, -0.1) + [0.7] ranges, first match wins
              SELECT ia, ib, s,
                     CASE WHEN s > 0.9 AND s <= 1.0 THEN 0
                          WHEN s > 0.8 AND s <= 0.9 THEN 1
                          WHEN s > 0.7 AND s <= 0.8 THEN 2
                     END AS bkt,
                     CASE WHEN s > 0.9 AND s <= 1.0 THEN '1.00-0.90'
                          WHEN s > 0.8 AND s <= 0.9 THEN '0.90-0.80'
                          WHEN s > 0.7 AND s <= 0.8 THEN '0.80-0.70'
                     END AS score_range
              FROM p
            ), ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY bkt ORDER BY s ASC, ia ASC, ib ASC
                     ) AS rn
              FROM bucketed WHERE bkt IS NOT NULL
            ), kept AS (
              SELECT *, max(rn) OVER (PARTITION BY bkt) - rn AS pair_idx
              FROM ranked WHERE rn <= 3
            ), two AS (
              SELECT score_range, pair_idx, s AS sim_score, ia AS doc_id FROM kept
              UNION ALL
              SELECT score_range, pair_idx, s AS sim_score, ib AS doc_id FROM kept
            )
            SELECT t.score_range, t.pair_idx, t.sim_score, t.doc_id, d.n_chars
            FROM two t JOIN docs d ON t.doc_id = d.doc_id
        """,
        "fs_em_pairs": _duckdb_fs_em_sql(20),
        "fs_clusters": _duckdb_fs_em_sql(20, tail="clusters"),
        "fs_tf_pairs": _duckdb_fs_em_sql(20, tail="tf"),
        "cluster_stats": """
            WITH RECURSIVE k AS (
              SELECT doc_id, lang, n_chars FROM documents
              WHERE doc_id < 400
            ), e AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     1.0 - abs(a.n_chars - b.n_chars) / 2.0 AS s
              FROM k a JOIN k b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) <= 2
            ), sym AS (
              SELECT idx_a AS src, idx_b AS dst FROM e
              UNION SELECT idx_b, idx_a FROM e
            ), reach(node, r) AS (
              SELECT src, src FROM sym
              UNION
              SELECT s2.dst, reach.r FROM reach
              JOIN sym s2 ON s2.src = reach.node
            ), comp AS (
              SELECT node, min(r) AS component FROM reach GROUP BY node
            ), assign AS (
              SELECT k.doc_id,
                     coalesce(c.component, k.doc_id) AS group_id
              FROM k LEFT JOIN comp c ON c.node = k.doc_id
            ), sizes AS (
              SELECT group_id, count(*) AS cluster_size
              FROM assign GROUP BY 1 HAVING count(*) >= 2
            ), ee AS (
              SELECT a1.group_id AS g, e.s
              FROM e
              JOIN assign a1 ON a1.doc_id = e.idx_a
              JOIN assign a2 ON a2.doc_id = e.idx_b
              WHERE a1.group_id = a2.group_id
            ), agg AS (
              SELECT g, count(*) AS n_edges, min(s) AS mn,
                     avg(s) AS av, max(s) AS mx
              FROM ee GROUP BY 1
            )
            SELECT s.group_id, s.cluster_size,
                   coalesce(a.n_edges, 0) AS n_edges,
                   round(coalesce(a.n_edges, 0)
                         / (s.cluster_size * (s.cluster_size - 1) / 2.0),
                         6) AS density,
                   round(a.mn, 6) AS min_score,
                   round(a.av, 6) AS avg_score,
                   round(a.mx, 6) AS max_score
            FROM sizes s LEFT JOIN agg a ON a.g = s.group_id
        """,
        "golden_clusters": """
            WITH k AS (
              SELECT doc_id, text, lang, source, n_chars,
                     lower(split_part(text, ' ', 1)) AS tok
              FROM documents WHERE doc_id < 500
            ), grp AS (
              -- components of shared-token cliques = min member id;
              -- NULL-token rows are singletons (null keys never pair)
              SELECT doc_id, text, lang, source, n_chars,
                     CASE WHEN tok IS NOT NULL
                          THEN min(doc_id) OVER (PARTITION BY tok)
                          ELSE doc_id END AS group_id
              FROM k
            ), m AS (
              SELECT group_id, lang, count(*) AS n
              FROM grp WHERE lang IS NOT NULL GROUP BY 1, 2
            ), mode AS (
              SELECT group_id,
                     first(lang ORDER BY n DESC, lang DESC) AS lang
              FROM m GROUP BY 1
            ), base AS (
              SELECT group_id, count(*) AS cluster_size,
                     first(text ORDER BY length(text) DESC, text DESC)
                       FILTER (WHERE text IS NOT NULL) AS text,
                     max(n_chars) AS n_chars,
                     min(source) AS source
              FROM grp GROUP BY 1
            )
            SELECT b.group_id, b.cluster_size, b.text, mode.lang,
                   b.n_chars, b.source
            FROM base b LEFT JOIN mode USING (group_id)
        """,
        "geo_candidates": _geo_candidates_oracle_sql(),
        "geo_pairs": """
            WITH g AS (
              SELECT c_custkey,
                     ((c_custkey * 37) % 1700) / 10.0 - 85.0 AS lat,
                     ((c_custkey * 91) % 3600) / 10.0 - 180.0 AS lon,
                     c_nationkey
              FROM customer
            )
            SELECT a.c_custkey AS idx_a, b.c_custkey AS idx_b,
                   round(
                     greatest(0.0,
                       1.0 - (2.0 * 6371.0088 * asin(least(1.0, sqrt(
                         pow(sin((radians(b.lat) - radians(a.lat)) / 2.0), 2)
                         + cos(radians(a.lat)) * cos(radians(b.lat))
                         * pow(sin((radians(b.lon) - radians(a.lon)) / 2.0),
                               2)
                       )))) / 500.0),
                     6) AS geo_sim
            FROM g a JOIN g b
              ON a.c_nationkey = b.c_nationkey
             AND a.c_custkey < b.c_custkey
        """,
        "best_matches": """
            WITH k AS (
              SELECT doc_id, lang, n_chars FROM documents
              WHERE doc_id < 400
            ), sc AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     1.0 - abs(a.n_chars - b.n_chars) / 2.0 AS sim_score
              FROM k a JOIN k b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) <= 2
            ), r AS (
              SELECT idx_a, idx_b, sim_score,
                     row_number() OVER (PARTITION BY idx_a
                                        ORDER BY sim_score DESC, idx_b ASC)
                       AS rn
              FROM sc
            )
            SELECT idx_a, idx_b, sim_score FROM r WHERE rn = 1
        """,
        "threshold_sweep": """
            WITH k AS (
              SELECT doc_id, lang, source, n_chars FROM documents
              WHERE doc_id < 400
            ), sc AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     1.0 - abs(a.n_chars - b.n_chars) / 2.0 AS s
              FROM k a JOIN k b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) <= 2
            ), tr AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b
              FROM k a JOIN k b
                ON a.source = b.source AND a.doc_id < b.doc_id
              WHERE abs(a.n_chars - b.n_chars) <= 1
            ), u AS (
              SELECT sc.s, tr.idx_a IS NOT NULL AS t
              FROM sc FULL OUTER JOIN tr
                ON sc.idx_a = tr.idx_a AND sc.idx_b = tr.idx_b
            ), g AS (
              SELECT u.*, th.threshold
              FROM u, UNNEST([0.25, 0.5, 0.75, 1.0]) AS th(threshold)
            ), agg AS (
              SELECT threshold,
                     sum(CASE WHEN s IS NOT NULL AND s >= threshold
                              AND t THEN 1 ELSE 0 END) AS tp,
                     sum(CASE WHEN s IS NOT NULL AND s >= threshold
                              AND NOT t THEN 1 ELSE 0 END) AS fp,
                     sum(CASE WHEN (s IS NULL OR s < threshold)
                              AND t THEN 1 ELSE 0 END) AS fn
              FROM g GROUP BY 1
            )
            SELECT threshold,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   round(tp / nullif(tp + fp, 0), 6) AS precision,
                   round(tp / nullif(tp + fn, 0), 6) AS recall,
                   round(2 * (tp / nullif(tp + fp, 0))
                         * (tp / nullif(tp + fn, 0))
                         / nullif(tp / nullif(tp + fp, 0)
                                  + tp / nullif(tp + fn, 0), 0),
                         6) AS f1
            FROM agg
        """,
        "token_set_pairs": """
            WITH d AS (
              SELECT doc_id, lang,
                     CASE WHEN text IS NULL THEN NULL
                          ELSE list_distinct(list_filter(
                                 regexp_split_to_array(lower(text), '\\s+'),
                                 x -> x <> '')) END AS toks
              FROM documents WHERE doc_id < 300
            ), p AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     a.toks AS ta, b.toks AS tb,
                     CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS i,
                     CAST(len(a.toks) AS DOUBLE) AS na,
                     CAST(len(b.toks) AS DOUBLE) AS nb
              FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
            )
            SELECT idx_a, idx_b,
                   CASE WHEN ta IS NULL OR tb IS NULL THEN NULL
                        ELSE round(CASE WHEN na + nb - i > 0
                                        THEN i / (na + nb - i)
                                        ELSE 0.0 END, 6) END AS jaccard,
                   CASE WHEN ta IS NULL OR tb IS NULL THEN NULL
                        ELSE round(CASE WHEN na + nb > 0
                                        THEN 2.0 * i / (na + nb)
                                        ELSE 0.0 END, 6) END AS dice,
                   CASE WHEN ta IS NULL OR tb IS NULL THEN NULL
                        ELSE round(CASE WHEN least(na, nb) > 0
                                        THEN i / least(na, nb)
                                        ELSE 0.0 END, 6) END AS overlap
            FROM p
        """,
        "golden_records": """
            WITH m AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events WHERE event_type IS NOT NULL
              GROUP BY 1, 2
            ), mode AS (
              -- modal value, frequency ties to the LARGER value
              -- (matches the engine's max(struct(count, value)))
              SELECT user_id,
                     first(event_type ORDER BY n DESC, event_type DESC)
                       AS event_type
              FROM m GROUP BY 1
            ), base AS (
              SELECT user_id,
                     count(*) AS cluster_size,
                     first(props ORDER BY ts DESC, event_id DESC)
                       FILTER (WHERE props IS NOT NULL AND ts IS NOT NULL)
                       AS props,
                     first(props ORDER BY ts ASC, event_id ASC)
                       FILTER (WHERE props IS NOT NULL AND ts IS NOT NULL)
                       AS first_props,
                     sum(value) AS value,
                     max(ts) AS ts,
                     count(DISTINCT event_type) AS n_types
              FROM events GROUP BY 1
            )
            SELECT b.user_id AS group_id, b.cluster_size, mode.event_type,
                   b.props, b.first_props, b.value, b.ts, b.n_types
            FROM base b LEFT JOIN mode USING (user_id)
        """,
        # Monge-Elkan(JW inner, symmetric mean) over the 3-token name
        # field: every token combo of every pair goes through the
        # bit-exact jw chain ONCE (pair id in idx_a, packed
        # (ia, ib) token coordinates in idx_b), then row-max /
        # ordered-list-sum means replay the engine's reduction order.
        "monge_elkan": f"""
            WITH RECURSIVE
            d AS (
              SELECT doc_id, lang,
                     coalesce(list_slice(list_filter(
                       regexp_split_to_array(text, '\\s+'), t -> t != ''),
                       1, 3), CAST([] AS VARCHAR[])) AS toks
              FROM documents WHERE doc_id < 150
            ),
            prs AS (
              SELECT a.doc_id AS pid_a, b.doc_id AS pid_b,
                     a.toks AS ta, b.toks AS tb,
                     a.doc_id * 100000 + b.doc_id AS pid
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
            ),
            jw_cand AS (
              SELECT p.pid AS idx_a,
                     (ia.i * 100 + ib.i)::BIGINT AS idx_b,
                     p.ta[ia.i] AS s_a, p.tb[ib.i] AS s_b
              FROM prs p,
                   unnest(range(1, len(p.ta) + 1)) AS ia(i),
                   unnest(range(1, len(p.tb) + 1)) AS ib(i)
            ),
            {_duckdb_jw_chain().lstrip()},
            rowmax AS (
              SELECT idx_a AS pid, idx_b // 100 AS ti, max(jw) AS mx
              FROM jw_scored GROUP BY 1, 2
            ),
            colmax AS (
              SELECT idx_a AS pid, idx_b % 100 AS ti, max(jw) AS mx
              FROM jw_scored GROUP BY 1, 2
            ),
            me_ab AS (
              SELECT pid, list_sum(list(mx ORDER BY ti)) / count(*) AS v
              FROM rowmax GROUP BY pid
            ),
            me_ba AS (
              SELECT pid, list_sum(list(mx ORDER BY ti)) / count(*) AS v
              FROM colmax GROUP BY pid
            )
            SELECT p.pid_a AS idx_a, p.pid_b AS idx_b,
                   round(CASE
                     WHEN len(p.ta) = 0 AND len(p.tb) = 0 THEN 1.0
                     WHEN len(p.ta) = 0 OR len(p.tb) = 0 THEN 0.0
                     ELSE (ab.v + ba.v) / 2.0
                   END, 6) AS me_sim
            FROM prs p
            LEFT JOIN me_ab ab ON ab.pid = p.pid
            LEFT JOIN me_ba ba ON ba.pid = p.pid
        """,
        "meta_blocking": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ts
              FROM documents
            ),
            asg AS (
              SELECT DISTINCT doc_id AS eid,
                     ts[i] || ' ' || ts[i + 1] AS bkey
              FROM toks, unnest(range(1, len(ts))) AS r(i)
              WHERE length(ts[i]) >= 2 AND length(ts[i + 1]) >= 2
            ),
            kept AS (
              SELECT eid, bkey FROM asg
              QUALIFY count(*) OVER (PARTITION BY bkey) <= 32
            ),
            edges AS (
              SELECT a.eid AS idx_a, b.eid AS idx_b,
                     CAST(count(*) AS DOUBLE) AS w
              FROM kept a JOIN kept b
                ON a.bkey = b.bkey AND a.eid < b.eid
              GROUP BY 1, 2
            ),
            navg AS (
              SELECT eid, sum(w) / count(*) AS avg_w
              FROM (
                SELECT idx_a AS eid, w FROM edges
                UNION ALL
                SELECT idx_b AS eid, w FROM edges
              ) GROUP BY 1
            )
            SELECT e.idx_a, e.idx_b, CAST(e.w AS BIGINT) AS weight
            FROM edges e
            JOIN navg na ON na.eid = e.idx_a
            JOIN navg nb ON nb.eid = e.idx_b
            WHERE e.w >= na.avg_w OR e.w >= nb.avg_w
        """,
        "greedy_one_to_one": """
            WITH RECURSIVE scored AS (
              -- every blocked pair is scored and participates in the
              -- greedy pass (0-score pairs consume endpoints too);
              -- the [0.5, 1.0] slice happens AFTER pruning, mirroring
              -- ThresholdMatcher.scored_pairs -> _slice
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     CASE WHEN abs(a.n_chars - b.n_chars) < 50
                          THEN 1.0 - abs(a.n_chars - b.n_chars) / 50.0
                          ELSE 0.0 END AS sim_score
              FROM documents a JOIN documents b ON a.lang = b.lang
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
            ), ranked AS (
              SELECT idx_a, idx_b, sim_score,
                     row_number() OVER (
                       ORDER BY sim_score DESC, idx_a, idx_b) AS rn
              FROM scored
            ), g AS (
              -- sequential highest-score-first greedy 1:1 as a
              -- recursive scan: each step picks the lowest-rank pair
              -- whose endpoints are both unused
              SELECT 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS ua,
                     CAST([] AS BIGINT[]) AS ub
              UNION ALL
              SELECT nxt.rn, list_append(g.ua, nxt.idx_a),
                     list_append(g.ub, nxt.idx_b)
              FROM g, LATERAL (
                SELECT r.rn, r.idx_a, r.idx_b FROM ranked r
                WHERE r.rn > g.rn
                  AND NOT list_contains(g.ua, r.idx_a)
                  AND NOT list_contains(g.ub, r.idx_b)
                ORDER BY r.rn LIMIT 1
              ) nxt
            )
            SELECT r.idx_a, r.idx_b, round(r.sim_score, 6) AS sim_score
            FROM ranked r JOIN g ON r.rn = g.rn
            WHERE r.sim_score BETWEEN 0.5 AND 1.0
        """,
        "jw_dedup_pairs": f"""
            WITH RECURSIVE
            jw_cand AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     substr(a.text, 1, 40) AS s_a, substr(b.text, 1, 40) AS s_b
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            {_duckdb_jw_chain()}
            SELECT idx_a, idx_b, round(jw, 6) AS sim_score
            FROM jw_scored
            WHERE jw >= 0.75 AND jw <= 1.0
        """,
        "jw_clusters": f"""
            WITH RECURSIVE
            jw_cand AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     substr(a.text, 1, 40) AS s_a, substr(b.text, 1, 40) AS s_b
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            {_duckdb_jw_chain()},
            edges AS (
              SELECT idx_a, idx_b FROM jw_scored
              WHERE jw >= 0.70 AND jw <= 1.0
            ),
            {_duckdb_greedy_clique_chain()}
            SELECT cluster_rep, doc_id FROM cliq
        """,
        "spans_matcher_clusters": f"""
            WITH RECURSIVE
            base AS (
              SELECT doc_id, lang, source,
                     substr(text, 1, 18) AS lastn,
                     substr(text, 20, 10) AS firstn,
                     DATE '1995-01-01'
                       + CAST((doc_id * 13) % 700 AS INT) AS dob
              FROM documents
            ),
            cand AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     a.lastn AS al, b.lastn AS bl,
                     a.firstn AS af, b.firstn AS bf,
                     a.dob AS da, b.dob AS db
              FROM base a JOIN base b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            jw_cand AS (
              SELECT idx_a, idx_b, al AS s_a, bl AS s_b FROM cand
              UNION ALL
              SELECT idx_a + 100000000, idx_b + 100000000,
                     af AS s_a, bf AS s_b FROM cand
            ),
            {_duckdb_jw_chain()},
            jwboth AS (
              SELECT
                CASE WHEN idx_a >= 100000000
                     THEN idx_a - 100000000 ELSE idx_a END AS idx_a,
                CASE WHEN idx_b >= 100000000
                     THEN idx_b - 100000000 ELSE idx_b END AS idx_b,
                max(CASE WHEN idx_a < 100000000 THEN jw END) AS jw_last,
                max(CASE WHEN idx_a >= 100000000 THEN jw END) AS jw_first
              FROM jw_scored GROUP BY 1, 2
            ),
            staged AS (
              SELECT idx_a, idx_b,
                abs(datediff('day', da, db)) AS days,
                (year(da) = year(db)) AS same_year,
                (month(da) = day(db) AND day(da) = month(db)) AS st2,
                (year(da) = year(db) AND day(da) = day(db)) AS st3,
                strftime(da, '%Y%m%d') AS fa,
                strftime(db, '%Y%m%d') AS fb
              FROM cand
            ),
            lcs_in AS (
              SELECT idx_a, idx_b, fa, fb FROM staged
              WHERE days >= 30 AND NOT st2 AND st3
            ),
            {_duckdb_lcs_chain()},
            datesim AS (
              SELECT s.idx_a, s.idx_b,
                CASE
                  WHEN s.days < 30 THEN 1.0 - s.days / 30.0
                  WHEN s.same_year AND s.st2 THEN 0.5
                  WHEN s.st3 THEN coalesce(l.ratio, 0.0)
                  ELSE 0.0
                END AS dsim
              FROM staged s LEFT JOIN lcs_out l USING (idx_a, idx_b)
            ),
            edges AS (
              SELECT j.idx_a, j.idx_b
              FROM jwboth j JOIN datesim d
                ON j.idx_a = d.idx_a AND j.idx_b = d.idx_b
              WHERE sqrt((j.jw_last * j.jw_last + j.jw_first * j.jw_first
                          + d.dsim * d.dsim) / 3) BETWEEN 0.60 AND 1.0
            ),
            {_duckdb_greedy_clique_chain()}
            SELECT cluster_rep, doc_id FROM cliq
        """,
        "date_scored_pairs": f"""
            WITH RECURSIVE
            o AS (
              SELECT o_orderkey, o_orderpriority, o_custkey,
                     CAST(o_orderdate AS DATE) AS odate
              FROM orders
            ),
            dcand AS (
              SELECT a.o_orderkey AS idx_a, b.o_orderkey AS idx_b,
                     a.odate AS da, b.odate AS db
              FROM o a JOIN o b
                ON a.o_orderpriority = b.o_orderpriority
               AND a.o_custkey = b.o_custkey
               AND a.o_orderkey < b.o_orderkey
            ),
            staged AS (
              SELECT idx_a, idx_b,
                abs(datediff('day', da, db)) AS days,
                (year(da) = year(db)) AS same_year,
                (month(da) = day(db) AND day(da) = month(db)) AS st2,
                (year(da) = year(db) AND day(da) = day(db)) AS st3,
                strftime(da, '%Y%m%d') AS fa,
                strftime(db, '%Y%m%d') AS fb
              FROM dcand
            ),
            lcs_in AS (
              SELECT idx_a, idx_b, fa, fb FROM staged
              WHERE days >= 30 AND NOT st2 AND st3
            ),
            {_duckdb_lcs_chain()},
            scored AS (
              SELECT s.idx_a, s.idx_b,
                CASE
                  WHEN s.days < 30 THEN 1.0 - s.days / 30.0
                  WHEN s.same_year AND s.st2 THEN 0.5
                  WHEN s.st3 THEN coalesce(l.ratio, 0.0)
                  ELSE 0.0
                END AS sim_score
              FROM staged s LEFT JOIN lcs_out l USING (idx_a, idx_b)
            )
            SELECT idx_a, idx_b, round(sim_score, 6) AS sim_score
            FROM scored
            WHERE sim_score >= 0.4 AND sim_score <= 1.0
        """,
        "date_scored_pairs_sql": """
            WITH p AS (
              SELECT a.o_orderkey AS ia, b.o_orderkey AS ib,
                     CAST(a.o_orderdate AS DATE) AS da,
                     CAST(b.o_orderdate AS DATE) AS db
              FROM orders a JOIN orders b
                ON a.o_orderpriority = b.o_orderpriority
               AND a.o_custkey = b.o_custkey
               AND a.o_orderkey < b.o_orderkey
            ), s AS (
              SELECT ia, ib,
                     abs(date_diff('day', db, da)) AS days,
                     year(da) = year(db) AS same_year,
                     month(da) AS ma, month(db) AS mb,
                     day(da) AS dda, day(db) AS ddb
              FROM p
            ), scored AS (
              SELECT ia AS idx_a, ib AS idx_b,
                     CASE WHEN days < 30 THEN 1.0 - days / 30.0
                          WHEN same_year AND ma = ddb AND dda = mb THEN 0.5
                          ELSE 0.0 END AS sim_score,
                     (days >= 30) AND NOT (same_year AND ma = ddb AND dda = mb)
                       AND same_year AND dda = ddb AS is_stage3
              FROM s
            )
            SELECT idx_a, idx_b, round(sim_score, 6) AS sim_score
            FROM scored
            WHERE NOT is_stage3 AND sim_score BETWEEN 0.4 AND 1.0
        """,
        "decision": """
            SELECT CAST(0.8 AS DOUBLE) AS match_threshold,
                   CAST(count(*) AS BIGINT) AS number_of_matched_pairs
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE abs(a.n_chars - b.n_chars) < 50
              AND (1.0 - abs(a.n_chars - b.n_chars) / 50.0) >= 0.8
        """,
        "tfidf_pairs": """
            WITH toks AS (
              SELECT doc_id, u.t AS term
              FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(t)
              WHERE u.t != '' AND doc_id IS NOT NULL
            ),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
              FROM toks GROUP BY 1, 2
            ),
            n AS (
              SELECT CAST(count(*) AS DOUBLE) AS n
              FROM documents WHERE doc_id IS NOT NULL
            ),
            dfreq AS (
              SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
            ),
            w AS (
              SELECT doc_id, term,
                     tf * (ln((1.0 + n.n) / (1.0 + df)) + 1.0) AS w_raw
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ),
            nrm AS (
              SELECT doc_id, sqrt(sum(w_raw * w_raw)) AS nn
              FROM w GROUP BY 1
            ),
            u AS (
              SELECT w.doc_id, term, w_raw / nn AS w
              FROM w JOIN nrm USING (doc_id)
            ),
            pairs AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b,
                     sum(a.w * b.w) AS cosine
              FROM u a JOIN u b
                ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT idx_a, idx_b, round(cosine, 6) AS cosine
            FROM pairs WHERE cosine >= 0.8
        """,
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[j.j : j.j + 4], ' ') AS gram
              FROM toks, LATERAL UNNEST(range(1, len(t) - 3)) AS j(j)
              WHERE len(t) >= 5
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
            tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0),
            hits AS (
              SELECT doc_id, count(*) AS n FROM tr
              JOIN ev USING (gram) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n, 0) AS n_contaminated_ngrams,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        "bloom_decontam": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[j.j : j.j + 4], ' ') AS gram
              FROM toks, LATERAL UNNEST(range(1, len(t) - 3)) AS j(j)
              WHERE len(t) >= 5
            ),
            ev_pos AS (
              SELECT DISTINCT
                CAST('0x' || substr(md5(gram), 1 + 8 * s.s, 8) AS BIGINT)
                  % 65536 AS p
              FROM (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0) e,
                   LATERAL UNNEST(range(0, 4)) AS s(s)
            ),
            trp AS (
              SELECT doc_id, gram,
                CAST('0x' || substr(md5(gram), 1 + 8 * s.s, 8) AS BIGINT)
                  % 65536 AS p
              FROM g, LATERAL UNNEST(range(0, 4)) AS s(s)
              WHERE doc_id % 20 <> 0
            ),
            -- a gram is flagged when ALL 4 positions are set; ev_pos
            -- is distinct so count(*)=4 holds iff each of the gram's
            -- (possibly duplicated) slice positions found its bit
            hitg AS (
              SELECT doc_id, gram FROM trp JOIN ev_pos USING (p)
              GROUP BY doc_id, gram HAVING count(*) = 4
            ),
            hits AS (SELECT doc_id, count(*) AS n FROM hitg GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(h.n, 0) AS n_flagged_ngrams,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        "dup_ngram_stats": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[j.j : j.j + 7], ' ') AS gram
              FROM toks, LATERAL UNNEST(range(1, len(t) - 6)) AS j(j)
              WHERE len(t) >= 8
            ),
            dupg AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
            tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
            dup AS (
              SELECT doc_id, count(*) AS n_dup_grams FROM g
              JOIN dupg USING (gram) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(t.n_grams, 0) AS n_grams,
                   coalesce(u.n_dup_grams, 0) AS n_dup_grams,
                   round(CASE WHEN coalesce(t.n_grams, 0) > 0
                         THEN coalesce(u.n_dup_grams, 0)
                              / CAST(t.n_grams AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_fraction
            FROM documents d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN dup u USING (doc_id)
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST('0x' || substr(
                    md5(concat_ws(chr(31), 'r5', CAST(doc_id AS VARCHAR))),
                    1, 8) AS BIGINT) % 10000
                  < CASE lang WHEN 'zh' THEN 10000 WHEN 'de' THEN 2500
                              WHEN 'en' THEN 5000 ELSE 1000 END
        """,
        "unigram_logprob": """
            WITH tok AS (
              SELECT doc_id, u.t AS token
              FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(t)
              WHERE u.t <> '' AND doc_id IS NOT NULL
            ),
            tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM tok GROUP BY doc_id, token
            ),
            cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cnt)
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_tokens,
                   round(sum(tf * ln(CAST(c AS DOUBLE) / (SELECT n FROM tot)))
                         / CAST(sum(tf) AS DOUBLE), 6) AS avg_logprob
            FROM tf JOIN cnt USING (token)
            GROUP BY doc_id
        """,
        "dsir_logweights": f"""
            WITH {_duckdb_dsir_ctes(_DSIR_BUCKETS, _DSIR_ALPHA)}
            SELECT doc_id, n_feats, round(log_weight, 6) AS log_weight
            FROM w
        """,
        "dsir_sample": f"""
            WITH {_duckdb_dsir_ctes(_DSIR_BUCKETS, _DSIR_ALPHA)},
            keyed AS (
              SELECT doc_id,
                     log_weight + (-ln(-ln(
                       (CAST('0x' || substr(md5(concat_ws(chr(31), 'r5',
                          CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)
                        + 0.5) / 4294967296.0))) AS gumbel_key
              FROM w
            )
            SELECT doc_id, round(gumbel_key, 6) AS gumbel_key
            FROM keyed
            ORDER BY gumbel_key DESC, doc_id
            LIMIT 50
        """,
        "pack_quota": f"""
            WITH base AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(concat_ws(chr(31), 'pack',
                       CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)
                       % {_PACK_BUCKETS} AS bucket,
                     CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
                       AS n_tokens
              FROM documents WHERE doc_id IS NOT NULL
            ),
            w AS (
              SELECT doc_id, bucket, n_tokens,
                     sum(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS cb
              FROM base
            )
            SELECT doc_id, bucket, n_tokens,
                   CAST(floor(CAST(coalesce(cb, 0) AS DOUBLE)
                              / {float(_PACK_MAX_TOKENS)}) AS BIGINT) AS shard
            FROM w
        """,
        "pack_greedy": f"""
            WITH RECURSIVE base AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(concat_ws(chr(31), 'pack',
                       CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)
                       % {_PACK_BUCKETS} AS bucket,
                     CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
                       AS n_tokens
              FROM documents WHERE doc_id IS NOT NULL
            ),
            ranked AS (
              SELECT doc_id, bucket, n_tokens,
                     row_number() OVER (
                       PARTITION BY bucket ORDER BY doc_id) AS rn
              FROM base
            ),
            st AS (
              -- per-bucket greedy reset state, stepped one local row
              -- per iteration; all buckets advance in the same step
              SELECT bucket, 0::BIGINT AS rn, 0::BIGINT AS running,
                     0::BIGINT AS shard, CAST(NULL AS BIGINT) AS doc_id,
                     0::BIGINT AS n_tokens
              FROM (SELECT DISTINCT bucket FROM ranked)
              UNION ALL
              SELECT r.bucket, r.rn,
                     CASE WHEN s.running > 0
                               AND s.running + r.n_tokens > {_PACK_MAX_TOKENS}
                          THEN r.n_tokens
                          ELSE s.running + r.n_tokens END,
                     CASE WHEN s.running > 0
                               AND s.running + r.n_tokens > {_PACK_MAX_TOKENS}
                          THEN s.shard + 1 ELSE s.shard END,
                     r.doc_id, r.n_tokens
              FROM st s JOIN ranked r
                ON r.bucket = s.bucket AND r.rn = s.rn + 1
            )
            SELECT doc_id, bucket, n_tokens, shard FROM st WHERE rn > 0
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                     AS n_distinct_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
        """,
        "quality": """
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                     len(list_distinct(string_split(text, ' '))) AS n_dis,
                     length(text) AS n_chars
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   round(CAST(n_dis AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
                   round(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 6)
                     AS avg_token_len,
                   round((least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                          + CAST(n_dis AS DOUBLE) / n_tokens
                          + least(1.0, (CAST(n_chars - n_tokens + 1 AS DOUBLE)
                                        / n_tokens) / 8.0)) / 3.0, 6)
                     AS quality_score
            FROM t
        """,
        "lang_id": """
            WITH t AS (
              SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
            ), h AS (
              SELECT doc_id,
                CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','a'], x))) AS INT) AS hits_en,
                CAST(len(list_filter(toks, x -> list_contains(['el','la','de','y','que'], x))) AS INT) AS hits_es,
                CAST(len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS INT) AS hits_de,
                CAST(len(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS INT) AS hits_fr,
                CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS INT) AS hits_zh
              FROM t
            )
            SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
                   CASE WHEN greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) = 0
                        THEN 'und'
                        WHEN hits_de = greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) THEN 'de'
                        WHEN hits_en = greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) THEN 'en'
                        WHEN hits_es = greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) THEN 'es'
                        WHEN hits_fr = greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) THEN 'fr'
                        ELSE 'zh' END AS lang_pred
            FROM h
        """,
        "lsh_ann_det": _duckdb_lsh_ann_sql(**_LSH_ANN_DET),
        "repetition_signals": _duckdb_repetition_sql(
            _REP_TOP_NS, _REP_DUP_NS
        ),
        "bpe_tokens": _duckdb_bpe_tokens_sql(),
        "minhash_det": _duckdb_minhash_sql(**_MINHASH_DET),
        "minhash_match_det": _duckdb_minhash_match_sql(**_MINHASH_MATCH_DET),
        "minhash_groups_det": _duckdb_minhash_groups_sql(**_MINHASH_GROUPS_DET),
        "simhash_det": _duckdb_simhash_sql(**_SIMHASH_DET),
        "simhash_match_det": _duckdb_simhash_sql(
            cand_cond="a.doc_id % 2 = 0 AND b.doc_id % 2 = 1", **_SIMHASH_DET
        ),
        # md5-pixel PPM decode twin: per-channel integer pixel sums
        # recovered exactly from the decoded float32 means (see
        # q_media_decode_ppm_det); pixel byte = first md5 hex pair
        "media_decode_ppm_det": """
            WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
            px AS (
              SELECT ids.doc_id, i.i % 3 AS ch,
                     (strpos('0123456789abcdef',
                             substr(md5(CAST(ids.doc_id AS VARCHAR) || ':'
                                        || CAST(i.i AS VARCHAR)), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                             substr(md5(CAST(ids.doc_id AS VARCHAR) || ':'
                                        || CAST(i.i AS VARCHAR)), 2, 1)) - 1) AS v
              FROM ids CROSS JOIN (SELECT unnest(range(192)) AS i) i
            )
            SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
                   CAST(8 AS INTEGER) AS width,
                   CAST(8 AS INTEGER) AS height,
                   CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS sum_b
            FROM px GROUP BY doc_id
        """,
        "line_dedup": """
            WITH d AS (
              SELECT doc_id, replace(text, ' table ', chr(10)) AS text
              FROM documents
            ),
            ex AS (
              SELECT doc_id, unnest(ls) AS line,
                     generate_subscripts(ls, 1) - 1 AS pos
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d)
            ),
            keepers AS (
              -- arg-min by (doc_id, pos): struct min is lexicographic
              SELECT line,
                     min(struct_pack(doc_id := doc_id, pos := pos)) AS k
              FROM ex WHERE length(line) >= 1 GROUP BY line
            ),
            kept AS (
              SELECT e.doc_id, e.pos, e.line
              FROM ex e LEFT JOIN keepers kk ON e.line = kk.line
              WHERE length(e.line) < 1
                 OR (kk.k.doc_id = e.doc_id AND kk.k.pos = e.pos)
            ),
            re AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN d.text IS NULL THEN 0
                        ELSE len(string_split(d.text, chr(10))) END AS INT)
                     AS n_lines,
                   CAST(COALESCE(r.n_kept, 0) AS INT) AS n_lines_kept,
                   CASE WHEN d.text IS NULL THEN NULL
                        ELSE COALESCE(r.text_dedup, '') END AS text_dedup
            FROM d LEFT JOIN re r USING (doc_id)
        """,
        "line_filter": """
            WITH d AS (
              SELECT doc_id,
                     string_split(replace(text, ' table ', chr(10)), chr(10))
                       AS ls
              FROM documents
            ),
            k AS (
              SELECT doc_id, ls,
                     list_filter(ls, x ->
                       len(string_split(x, ' ')) >= 3
                       AND NOT contains(x, 'slow slow')) AS kept
              FROM d
            )
            SELECT doc_id,
                   CAST(COALESCE(len(ls), 0) AS INT) AS n_lines,
                   CAST(COALESCE(len(kept), 0) AS INT) AS n_lines_kept,
                   -- DuckDB array_to_string([]) is NULL; Spark
                   -- array_join([]) is '' (NULL only for NULL input)
                   CASE WHEN ls IS NULL THEN NULL
                        ELSE COALESCE(array_to_string(kept, chr(10)), '')
                   END AS text_filtered
            FROM k
        """,
        "pii_redact": _duckdb_pii_sql(),
        "clean_pipeline": _duckdb_clean_pipeline_sql(),
        "dup_span_removal": _duckdb_dup_span_sql(),
        "url_pipeline": _DUCKDB_URL_DOMAIN_CTE + """
            SELECT doc_id, url_canon, domain,
                   domain IN ('example.org', 'shop.com.au') AS blocked
            FROM d4
        """,
        "chunk_documents": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE text IS NOT NULL
            ), starts AS (
              SELECT doc_id, t, CAST(s.s AS INT) AS s
              FROM toks, UNNEST(range(1, len(t) + 1, 32)) AS s(s)
              WHERE s.s = 1 OR s.s + 8 <= len(t)
            )
            SELECT doc_id,
                   CAST((s - 1) // 32 AS INT) AS chunk_idx,
                   array_to_string(t[s : s + 39], ' ') AS chunk_text,
                   CAST(least(40, len(t) - s + 1) AS INT) AS n_tokens
            FROM starts
        """,
        "curation_pipeline": _DUCKDB_URL_DOMAIN_CTE + """
            , kept AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (
                         PARTITION BY domain
                         ORDER BY md5(concat_ws(chr(31), 'r5',
                                      CAST(doc_id AS VARCHAR))), doc_id
                       ) AS rn
                FROM d4
              ) WHERE rn <= 3
            ), toks AS (
              SELECT d.doc_id, string_split(d.text, ' ') AS t
              FROM documents d JOIN kept USING (doc_id)
              WHERE d.text IS NOT NULL
            ), starts AS (
              SELECT doc_id, t, CAST(s.s AS INT) AS s
              FROM toks, UNNEST(range(1, len(t) + 1, 32)) AS s(s)
              WHERE s.s = 1 OR s.s + 8 <= len(t)
            ), chunks AS (
              SELECT CAST(doc_id AS VARCHAR) || ':'
                       || CAST((s - 1) // 32 AS VARCHAR) AS chunk_id,
                     array_to_string(t[s : s + 39], ' ') AS chunk_text
              FROM starts
            ), base AS (
              SELECT chunk_id,
                     CAST('0x' || substr(md5(concat_ws(chr(31), 'pack',
                       chunk_id)), 1, 8) AS BIGINT) % 16 AS bucket,
                     CAST(len(string_split(chunk_text, ' ')) AS BIGINT)
                       AS n_tokens
              FROM chunks
            ), w AS (
              SELECT chunk_id, bucket, n_tokens,
                     sum(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS cb
              FROM base
            )
            SELECT chunk_id, bucket, n_tokens,
                   CAST(floor(CAST(coalesce(cb, 0) AS DOUBLE) / 2000.0)
                        AS BIGINT) AS shard
            FROM w
        """,
        "domain_cap": _DUCKDB_URL_DOMAIN_CTE + """
            SELECT doc_id, domain FROM (
              SELECT doc_id, domain,
                     row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5(concat_ws(chr(31), 'r5',
                                    CAST(doc_id AS VARCHAR))), doc_id
                     ) AS rn
              FROM d4
            ) WHERE rn <= 3
        """,
        "domain_stats": _DUCKDB_URL_DOMAIN_CTE + """
            , q AS (
              SELECT doc_id,
                     round((least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                            + CAST(n_dis AS DOUBLE) / n_tokens
                            + least(1.0,
                                (CAST(n_chars - n_tokens + 1 AS DOUBLE)
                                 / n_tokens) / 8.0)) / 3.0, 6)
                       AS quality_score
              FROM (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                       len(list_distinct(string_split(text, ' '))) AS n_dis,
                       length(text) AS n_chars
                FROM documents
              )
            )
            SELECT d4.domain,
                   count(*) AS n_docs,
                   count(DISTINCT d4.url_canon) AS n_urls,
                   round(avg(q.quality_score), 6) AS avg_quality
            FROM d4 JOIN q USING (doc_id)
            GROUP BY d4.domain
        """,
        "keep_best": """
            WITH h AS (
              SELECT doc_id, md5(lower(substring(text, 1, 25))) AS hh
              FROM documents
            ), g AS (
              SELECT hh, min(doc_id) AS canonical_id, count(*) AS n
              FROM h GROUP BY hh
            ), mem AS (
              SELECT g.canonical_id AS group_id, h.doc_id
              FROM h JOIN g USING (hh) WHERE g.n > 1
            ), t AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                     len(list_distinct(string_split(text, ' '))) AS n_dis,
                     length(text) AS n_chars
              FROM documents
            ), q AS (
              SELECT doc_id,
                     round((least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                            + CAST(n_dis AS DOUBLE) / n_tokens
                            + least(1.0,
                                (CAST(n_chars - n_tokens + 1 AS DOUBLE)
                                 / n_tokens) / 8.0)) / 3.0, 6)
                       AS quality_score
              FROM t
            ), r AS (
              SELECT mem.group_id, mem.doc_id,
                     row_number() OVER (
                       PARTITION BY mem.group_id
                       ORDER BY q.quality_score DESC, mem.doc_id ASC
                     ) AS rn
              FROM mem JOIN q USING (doc_id)
            )
            SELECT doc_id, group_id, rn = 1 AS keep FROM r
        """,
        "exact_dedup": """
            WITH h AS (
              SELECT doc_id, md5(lower(substring(text, 1, 25))) AS hh FROM documents
            ), g AS (
              SELECT hh, min(doc_id) AS canonical_id, count(*) AS n FROM h GROUP BY hh
            )
            SELECT g.canonical_id, h.doc_id
            FROM h JOIN g ON h.hh = g.hh
            WHERE g.n > 1 AND h.doc_id <> g.canonical_id
        """,
        "ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS s
              FROM toks, UNNEST(range(1, len(t))) AS u(i)
            ), sizes AS (
              SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
            ), common AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b, count(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT idx_a, idx_b,
                   round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = idx_a
            JOIN sizes sb ON sb.doc_id = idx_b
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5
        """,
        "ngram_jaccard_match": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS s
              FROM toks, UNNEST(range(1, len(t))) AS u(i)
            ), sizes AS (
              SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
            ), common AS (
              SELECT a.doc_id AS idx_a, b.doc_id AS idx_b, count(*) AS c
              FROM sh a JOIN sh b
                ON a.s = b.s AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
              GROUP BY 1, 2
            )
            SELECT idx_a, idx_b,
                   round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = idx_a
            JOIN sizes sb ON sb.doc_id = idx_b
            WHERE round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) >= 0.5
        """,
        "cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 25
            ), c AS (
              SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ), scored AS (
              SELECT q.query_id, c.neighbor_id,
                     round(list_cosine_similarity(q.qv, c.cv), 6) AS cos
              FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                     ) AS INT) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
        """,
        "ivf_ann": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 25
            ), c AS (
              SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ), scored AS (
              SELECT q.query_id, c.neighbor_id,
                     round(list_cosine_similarity(q.qv, c.cv), 6) AS cos
              FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                     ) AS INT) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS idx_a, b.vec_id AS idx_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        """,
    }
