"""Corpus generator: determinism, span projection, span invariant."""

from datamatch_spark.corpus import (
    CorpusConfig,
    generate_documents,
    generate_flat_pandas,
    gold_pairs,
    gold_pairs_pandas,
    project_fields,
    spans_preserved,
)

CFG = CorpusConfig(n_docs=300, seed=42)


def test_deterministic_generation(spark):
    d1 = generate_documents(spark, CFG).collect()
    d2 = generate_documents(spark, CFG).repartition(7).collect()
    as_set = lambda rows: {(r["doc_id"], tuple(map(tuple, r["spans"]))) for r in rows}  # noqa: E731
    assert as_set(d1) == as_set(d2)
    assert len(d1) == CFG.n_docs


def test_projection_matches_flat(spark):
    docs = generate_documents(spark, CFG)
    proj = project_fields(docs).collect()
    flat = generate_flat_pandas(CFG).set_index("doc_id")
    assert len(proj) == CFG.n_docs
    for r in proj:
        f = flat.loc[r["doc_id"]]
        assert r["last"] == f["last"]
        assert r["first"] == f["first"]
        assert r["dob"] == f["dob"]
        assert r["blk"] == f["blk"]


def test_spans_carried_through_projection(spark):
    docs = generate_documents(spark, CFG)
    proj = project_fields(docs)
    assert spans_preserved(docs, proj)


def test_media_spans_present(spark):
    docs = generate_documents(spark, CFG)
    from pyspark.sql import functions as F

    n_media = docs.select(
        F.explode("spans").alias("s")
    ).where("s.kind = 'media'").count()
    # media slots are hash-drawn with replacement: 1..n_media_spans per doc
    assert CFG.n_docs <= n_media <= CFG.n_docs * CFG.n_media_spans


def test_gold_pairs_spark_matches_pandas(spark):
    got = {
        (r["idx_a"], r["idx_b"]) for r in gold_pairs(spark, CFG).collect()
    }
    assert got == gold_pairs_pandas(CFG)
    assert len(got) > 50


def test_spans_preserved_catches_duplication(spark):
    """A pipeline that doubles the corpus with intact spans must FAIL
    the invariant (review r5: the full-outer join alone matched every
    duplicated row to the same input row)."""
    from datamatch_spark.corpus import CorpusConfig, generate_documents, spans_preserved

    docs = generate_documents(spark, CorpusConfig(n_docs=40, seed=3))
    assert spans_preserved(docs, docs)
    assert not spans_preserved(docs, docs.unionAll(docs))


def test_effective_parallelism_floor_and_corpus_width(spark):
    """effective_parallelism must never report below the configured
    shuffle partitions: on a standalone cluster defaultParallelism is 2
    until executors register, and a corpus generated in that window
    previously landed on 2 partitions, serializing every downstream
    pre-shuffle stage (the round-5 scaling diagnosis)."""
    from datamatch_spark.corpus import CorpusConfig, generate_documents
    from datamatch_spark.session import effective_parallelism

    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    eff = effective_parallelism(spark)
    assert eff >= conf_p >= 1
    docs = generate_documents(spark, CorpusConfig(n_docs=2000, seed=7))
    assert docs.rdd.getNumPartitions() >= min(conf_p, 2000 // 250 + 1)
