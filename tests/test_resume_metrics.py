"""Resumability (stage manifest kill/resume) and the metrics sink."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datamatch_spark import (
    AbsoluteNumericalSimilarity,
    ColumnsIndex,
    JaroWinklerSimilarity,
    ThresholdMatcher,
)
from datamatch_spark.checkpointing import StageManifest
from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields
from datamatch_spark.metrics import MetricsSink


@pytest.fixture()
def fields(spark):
    cfg = CorpusConfig(n_docs=240, seed=21, profile="clean")
    return project_fields(generate_documents(spark, cfg)).drop("spans")


def _matcher(fields, **kw):
    return ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        fields,
        row_key="doc_id",
        validate=False,
        **kw,
    )


def test_checkpoint_resume(spark, fields, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    m1 = _matcher(fields, checkpoint_dir=ckpt)
    first = sorted(
        (r["idx_a"], r["idx_b"], round(r["sim_score"], 9))
        for r in m1.scored_pairs.collect()
    )
    manifest = json.loads(open(os.path.join(ckpt, "manifest.json")).read())
    assert "scored_pairs" not in manifest["stages"]  # staged as scored_raw
    assert "scored_raw" in manifest["stages"]

    # simulate a restarted driver: a NEW matcher over a CORRUPTED input
    # frame must NOT recompute — it resumes from the committed stage
    poisoned = fields.limit(0)
    m2 = _matcher(poisoned, checkpoint_dir=ckpt, defer=True)
    second = sorted(
        (r["idx_a"], r["idx_b"], round(r["sim_score"], 9))
        for r in m2.scored_pairs.collect()
    )
    assert second == first

    # resetting the stage forces recompute (now from the empty frame)
    StageManifest(ckpt).reset("scored_raw")
    m3 = _matcher(poisoned, checkpoint_dir=ckpt, defer=True)
    assert m3.scored_pairs.count() == 0


def test_metrics_sink(spark, fields, tmp_path):
    sink = MetricsSink(spark, str(tmp_path / "metrics"))
    m = _matcher(fields, metrics_sink=sink)
    n = m.scored_pairs.count()
    parts = sink.partitions().where(F.col("stage") == "scored_pairs")
    assert parts.agg(F.sum("n_rows")).collect()[0][0] == n
    assert parts.count() >= 1
    blocks = sink.blocks().where(F.col("stage") == "blocking")
    total_rows = blocks.agg(F.sum("n_rows")).collect()[0][0]
    assert total_rows == fields.count()
    # every block's pair count is n*(n-1)/2
    bad = blocks.where(
        F.col("n_pairs") != (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("long")
    ).count()
    assert bad == 0


def test_metrics_sink_second_run_appends(spark, fields, tmp_path):
    sink = MetricsSink(spark, str(tmp_path / "metrics2"))
    _matcher(fields, metrics_sink=sink).scored_pairs.count()
    n1 = sink.partitions().count()
    sink2 = MetricsSink(spark, str(tmp_path / "metrics2"))
    _matcher(fields, metrics_sink=sink2).scored_pairs.count()
    assert sink.partitions().count() > n1  # append-only across runs
    assert sink.partitions().select("run_id").distinct().count() == 2


def test_iceberg_seam_configs(spark, tmp_path):
    """The iceberg flag wires the standard catalog configs; actually
    creating a table is exercised only when the runtime jar is present
    (it is not in this sandbox — the parquet+manifest path is the
    fallback the other tests in this file cover)."""
    import pytest

    from datamatch_spark.session import iceberg_confs

    confs = iceberg_confs("ice", str(tmp_path / "wh"))
    assert confs["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.ice.type"] == "hadoop"
    assert confs["spark.sql.catalog.ice.warehouse"].endswith("wh")
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        pytest.skip("Iceberg runtime jar not on classpath")
    # jar present: prove the seam end-to-end with a real table commit
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.sql("CREATE TABLE ice.db.t (id BIGINT) USING iceberg")
    spark.sql("INSERT INTO ice.db.t VALUES (1)")
    assert spark.table("ice.db.t").count() == 1


def test_minhash_checkpoint_resume(spark, tmp_path):
    """minhash_lsh_pairs(checkpoint_dir=...) commits the signature
    stage; a second run reuses it (manifest marks the stage done)."""
    import json
    import os

    from datamatch_spark.extras.dedup import minhash_lsh_pairs

    rows = [(i, " ".join(f"w{i//2*40 + j}" for j in range(20))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ck = str(tmp_path / "mh")
    first = {
        (r["idx_a"], r["idx_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", n=2, threshold=0.5, checkpoint_dir=ck
        ).collect()
    }
    manifest = json.load(open(os.path.join(ck, "manifest.json")))
    assert "minhash_info_n2_p64_b16_cdoc_id__text" in manifest["stages"]
    second = {
        (r["idx_a"], r["idx_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", n=2, threshold=0.5, checkpoint_dir=ck
        ).collect()
    }
    assert first == second == {(2 * k, 2 * k + 1) for k in range(10)}


def test_blocking_quality_hand_computed(spark):
    """4 rows, 2 blocks; truth chosen so all three metrics are exact
    hand-computable fractions."""
    from datamatch_spark import ColumnsIndex
    from datamatch_spark.metrics import blocking_quality

    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x"), (3, "y")], "row_key long, blk string"
    )
    truth = spark.createDataFrame(
        [(0, 1), (2, 3)], "idx_a long, idx_b long"
    )
    row = blocking_quality(df, ColumnsIndex("blk"), "row_key", truth).collect()[0]
    assert row["n_rows"] == 4
    assert row["n_candidates"] == 3          # C(3,2) within block x
    assert row["n_truth"] == 2
    assert row["n_truth_covered"] == 1       # (0,1) yes; (2,3) crosses blocks
    assert row["reduction_ratio"] == 0.5     # 1 - 3/6
    assert row["pairs_completeness"] == 0.5
    assert abs(row["pairs_quality"] - 1 / 3) < 1e-6


def test_minhash_checkpoint_key_encodes_params(spark, tmp_path):
    """A rerun with different n_perm must MISS the cached stage, not
    silently reuse incompatible signatures (which would return zero
    pairs via the estimate prefilter)."""
    import os

    from datamatch_spark.extras.dedup import minhash_lsh_pairs

    rows = []
    for i in range(6):
        words = " ".join(f"w{(i // 2) * 50 + j}" for j in range(30))
        if i % 2:
            words = words.replace(f"w{(i // 2) * 50 + 3}", "zz", 1)
        rows.append((i, words))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ck = str(tmp_path / "mh2")
    p64 = {
        (r["idx_a"], r["idx_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=64, bands=16, threshold=0.5,
            checkpoint_dir=ck,
        ).collect()
    }
    p128 = {
        (r["idx_a"], r["idx_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", n=2, n_perm=128, bands=16, threshold=0.5,
            checkpoint_dir=ck,
        ).collect()
    }
    # both parameterizations must find the planted near-dups — the old
    # shared stage key would feed 64-wide signatures to the 128 run
    want = {(0, 1), (2, 3), (4, 5)}
    assert want <= p64 and want <= p128
    assert os.path.isdir(os.path.join(ck, "minhash_info_n2_p64_b16_cdoc_id__text"))
    assert os.path.isdir(os.path.join(ck, "minhash_info_n2_p128_b16_cdoc_id__text"))


def test_checkpoint_fingerprint_mismatch_raises(spark, fields, tmp_path):
    """Review r5: a second matcher with a DIFFERENT configuration
    sharing the checkpoint_dir must fail loudly, not silently serve the
    first configuration's scores."""
    ckpt = str(tmp_path / "ckpt_fp")
    _matcher(fields, checkpoint_dir=ckpt).scored_pairs.count()
    other = ThresholdMatcher(
        ColumnsIndex("blk"),
        {"last": JaroWinklerSimilarity()},  # different scorer config
        fields,
        row_key="doc_id",
        validate=False,
        checkpoint_dir=ckpt,
        defer=True,
    )
    with pytest.raises(ValueError, match="different configuration"):
        other.scored_pairs.count()
    # same config in a fresh matcher still resumes fine
    again = _matcher(fields, checkpoint_dir=ckpt, defer=True)
    assert again.scored_pairs.count() > 0
