"""Stage checkpointing for resumable pipelines.

North-rule requirement: "resumable from the last committed Iceberg
snapshot/checkpoint". The production design targets Iceberg table
commits; in this sandbox (no Iceberg runtime jar) the same contract is
realized as parquet stage outputs plus an atomic JSON manifest:

* ``materialize(stage, df)`` — if the manifest marks ``stage`` done,
  read its parquet back (skip recompute); otherwise compute, write
  parquet, then commit the manifest entry (write-temp + rename, atomic
  on POSIX).
* A restarted driver with the same ``checkpoint_dir`` therefore resumes
  after the last committed stage.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StageManifest"]


class StageManifest:
    def __init__(self, root: str) -> None:
        self._root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")

    def _read(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"stages": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self._root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic commit

    def is_done(self, stage: str) -> bool:
        return stage in self._read()["stages"]

    def stage_path(self, stage: str) -> str:
        return os.path.join(self._root, stage)

    def materialize(
        self,
        stage: str,
        df: DataFrame,
        spark: SparkSession | None = None,
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Compute-or-reuse: parquet-backed stage output. ``spark`` is
        derived from ``df`` when omitted (kept as an optional param
        for backward compatibility).

        ``fingerprint``: opaque configuration hash recorded with the
        stage. A reuse whose caller fingerprint differs from the stored
        one raises instead of silently serving another configuration's
        output (review r5 — a looped/reconfigured job sharing one
        checkpoint_dir). Data-content changes are NOT fingerprinted:
        the resume contract remains same-input re-runs."""
        spark = spark or df.sparkSession
        path = self.stage_path(stage)
        if self.is_done(stage):
            stored = self._read()["stages"][stage].get("fingerprint")
            if (
                fingerprint is not None
                and stored is not None
                and stored != fingerprint
            ):
                raise ValueError(
                    f"checkpoint stage {stage!r} at {path} was written "
                    f"under a different configuration (stored "
                    f"fingerprint {stored}, current {fingerprint}); "
                    f"reset({stage!r}) or use a fresh checkpoint_dir"
                )
            return spark.read.parquet(path)
        df.write.mode("overwrite").parquet(path)
        manifest = self._read()
        manifest["stages"][stage] = {"path": path, "fingerprint": fingerprint}
        self._commit(manifest)
        return spark.read.parquet(path)

    def reset(self, stage: str | None = None) -> None:
        manifest = self._read()
        if stage is None:
            manifest["stages"] = {}
        else:
            manifest["stages"].pop(stage, None)
        self._commit(manifest)
