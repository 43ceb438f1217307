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
