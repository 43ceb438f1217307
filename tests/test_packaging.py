"""The engine must ship as a plain ``--py-files`` zip (north rule:
spark-submit --py-files on a multi-executor cluster). Verify the
package is fully importable through zipimport with no filesystem
dependencies."""

import os
import subprocess
import sys
import zipfile


def test_zipimport_package(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "datamatch_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "datamatch_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import datamatch_spark\n"
        "from datamatch_spark import ThresholdMatcher, ColumnsIndex\n"
        "from datamatch_spark.extras import dedup, simsearch, text, multimodal\n"
        "from datamatch_spark.extras import bloom, decontam, cleaning, urls\n"
        "from datamatch_spark.extras import dsir, lm, packing, sampling, tfidf\n"
        "from datamatch_spark import corpus, clustering, metrics, checkpointing\n"
        "assert 'datamatch_spark.zip' in datamatch_spark.__file__, datamatch_spark.__file__\n"
        "print('ZIPIMPORT_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so zipimport must resolve it
    )
    assert "ZIPIMPORT_OK" in out.stdout, out.stderr


def test_spark_submit_pyfiles_multi_executor(tmp_path):
    """The north rule made literal: `spark-submit --py-files <zip>` on a
    multi-executor master (local-cluster[2,2,1024] — two separate
    executor JVMs). The job's Arrow UDFs run on executor Python workers
    that can import datamatch_spark ONLY from the shipped zip (no
    PYTHONPATH to the repo is exported to executors)."""
    import shutil

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit binary not available")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "datamatch_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "datamatch_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    job = tmp_path / "job.py"
    job.write_text(
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "from datamatch_spark import (ColumnsIndex, JaroWinklerSimilarity,\n"
        "                             ThresholdMatcher)\n"
        "rows = [(i, 'b%d' % (i % 3), n) for i, n in enumerate(\n"
        "    ['freddie', 'freedie', 'fredie', 'cherri', 'cherrie', 'sherri'] * 20)]\n"
        "df = spark.createDataFrame(rows, 'row_key long, blk string, name string')\n"
        "m = ThresholdMatcher(ColumnsIndex('blk'),\n"
        "                     {'name': JaroWinklerSimilarity()}, df,\n"
        "                     validate=False)\n"
        "n = m.scored_pairs.count()\n"
        "c = m.get_clusters_within_threshold(0.9).count()\n"
        "assert n > 0 and c > 0, (n, c)\n"
        "print('SUBMIT_OK pairs=%d cluster_rows=%d' % (n, c))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [spark_submit, "--master", "local-cluster[2,2,1024]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zpath, str(job)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert "SUBMIT_OK" in out.stdout, out.stderr[-3000:]
