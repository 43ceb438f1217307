"""Extended reference-oracle parity: match mode (greedy 1:1 pruning),
Swap variator, filters — plus engine determinism under different
partitionings."""

from datamatch_spark import (
    ColumnsIndex,
    DissimilarFilter,
    JaroWinklerSimilarity,
    Swap,
    ThresholdMatcher,
)
from datamatch_spark.corpus import CorpusConfig, generate_documents, generate_flat_pandas, project_fields

from test_reference_parity import reference_datamatch  # noqa: F401 - fixture

CFG = CorpusConfig(n_docs=360, seed=19, profile="clean")
THRESHOLD = 0.8


def _spark_fields(spark, cfg=CFG):
    return project_fields(generate_documents(spark, cfg)).drop("spans")


def test_match_mode_parity(spark, reference_datamatch):
    """Two-dataset linkage incl. greedy 1:1 pruning vs the reference."""
    ref = reference_datamatch
    flat = generate_flat_pandas(CFG).set_index("doc_id")[
        ["last", "first", "dob", "agency", "blk"]
    ]
    is_even = [int(i[1:]) % 2 == 0 for i in flat.index]
    ref_a = flat[is_even]
    ref_b = flat[[not e for e in is_even]]
    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"),
        # include dob: members that share exact names (rank 0 vs rank 2)
        # would otherwise produce exact score TIES, where the
        # reference's greedy keep is generation-order-dependent
        {
            "last": ref.JaroWinklerSimilarity(),
            "first": ref.JaroWinklerSimilarity(),
            "dob": ref.DateSimilarity(),
        },
        ref_a,
        ref_b,
    )
    ref_pairs = set(m_ref.get_index_pairs_within_thresholds(THRESHOLD, 1.0))

    from pyspark.sql import functions as F

    fields = _spark_fields(spark)
    dfa = fields.where((F.col("doc_id").substr(2, 9).cast("int") % 2) == 0)
    dfb = fields.where((F.col("doc_id").substr(2, 9).cast("int") % 2) == 1)
    from datamatch_spark import DateSimilarity

    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {
            "last": JaroWinklerSimilarity(),
            "first": JaroWinklerSimilarity(),
            "dob": DateSimilarity(),
        },
        dfa,
        dfb,
        row_key="doc_id",
        validate=False,
    )
    got_pairs = set(m.collect_index_pairs_within_thresholds(THRESHOLD, 1.0))
    # greedy pruning order only differs on exact score ties; require
    # near-exact agreement
    inter = len(got_pairs & ref_pairs)
    f1 = 2 * inter / (len(got_pairs) + len(ref_pairs))
    assert f1 >= 0.99, (len(got_pairs), len(ref_pairs), f1)


def test_swap_variator_parity(spark, reference_datamatch):
    """Swap variator end-to-end vs the reference: swapped-field copies
    must match their originals in both engines identically."""
    ref = reference_datamatch
    flat = generate_flat_pandas(CFG).set_index("doc_id")[
        ["last", "first", "blk"]
    ].copy()
    # swap first/last on every 3rd row — the Swap variator must recover
    idx = [i for k, i in enumerate(flat.index) if k % 3 == 2]
    flat.loc[idx, ["last", "first"]] = flat.loc[idx, ["first", "last"]].values

    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"),
        {"last": ref.JaroWinklerSimilarity(), "first": ref.JaroWinklerSimilarity()},
        flat,
        variator=ref.Swap("first", "last"),
    )
    ref_pairs = {
        tuple(sorted(p)) for p in m_ref.get_index_pairs_within_thresholds(THRESHOLD, 1.0)
    }

    sdf = spark.createDataFrame(flat.reset_index())
    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        sdf,
        row_key="doc_id",
        variator=Swap("first", "last"),
        validate=False,
    )
    got_pairs = set(m.collect_index_pairs_within_thresholds(THRESHOLD, 1.0))
    assert got_pairs == ref_pairs
    assert len(got_pairs) > 50


def test_filter_parity(spark, reference_datamatch):
    """DissimilarFilter e2e vs the reference."""
    ref = reference_datamatch
    flat = generate_flat_pandas(CFG).set_index("doc_id")[
        ["last", "first", "agency", "blk"]
    ]
    m_ref = ref.ThresholdMatcher(
        ref.ColumnsIndex("blk"),
        {"last": ref.JaroWinklerSimilarity(), "first": ref.JaroWinklerSimilarity()},
        flat,
        filters=[ref.DissimilarFilter("agency")],
    )
    ref_pairs = {
        tuple(sorted(p)) for p in m_ref.get_index_pairs_within_thresholds(THRESHOLD, 1.0)
    }
    fields = _spark_fields(spark)
    m = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        fields,
        row_key="doc_id",
        filters=[DissimilarFilter("agency")],
        validate=False,
    )
    got_pairs = set(m.collect_index_pairs_within_thresholds(THRESHOLD, 1.0))
    assert got_pairs == ref_pairs


def test_determinism_across_partitionings(spark):
    """Identical results regardless of input partitioning and salting
    (SURVEY.md §5 test plan)."""
    from datamatch_spark.pairing import PairingConfig

    fields = _spark_fields(spark)
    variants = [
        dict(),
        dict(pairing_config=PairingConfig(salt_threshold=5, rows_per_shard=4)),
    ]
    results = []
    for i, kw in enumerate(variants):
        src = fields.repartition(3 + i * 7)
        m = ThresholdMatcher(
            ColumnsIndex("blk"),
            {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
            src,
            row_key="doc_id",
            validate=False,
            **kw,
        )
        pairs = sorted(
            (r["idx_a"], r["idx_b"], round(r["sim_score"], 9))
            for r in m.scored_pairs.collect()
        )
        clusters = sorted(
            tuple(sorted(c)) for c in m.get_index_clusters_within_thresholds(0.8)
        )
        results.append((pairs, clusters))
    assert results[0] == results[1]
