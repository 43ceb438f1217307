#!/usr/bin/env python
"""Stage-by-stage profile of the minhash_dedup bench workload at sf0.1.

Replicates bench.bench_minhash's input construction, then times each
internal stage of minhash_lsh_pairs separately (cold, in one session,
in bench order) so we can see where the driver-recorded 313.9s went.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import build_session
from datamatch_spark.extras.dedup import (
    minhash_signatures,
    minhash_lsh_pairs,
    with_shingle_hashes,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")

tile = 40
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
big = (
    docs.crossJoin(spark.range(tile).select(F.col("id").alias("copy")))
    .select(
        (F.col("doc_id") * tile + F.col("copy")).alias("doc_id"),
        F.array_join(
            F.slice(F.split("text", " "), (F.col("copy") % 8 * 5 + 1).cast("int"), 35),
            " ",
        ).alias("text"),
    )
    .localCheckpoint()
)
print("docs:", big.count(), flush=True)

t = {}

t0 = time.time()
shing = with_shingle_hashes(
    big.select(F.col("doc_id").alias("__id"), "text"), "text", 3, "sh"
).select("__id", "sh")
shing.write.mode("overwrite").format("noop").save()
t["shingle_hashes"] = time.time() - t0
print("shingle_hashes", t["shingle_hashes"], flush=True)

t0 = time.time()
sigs = minhash_signatures(big, "doc_id", "text", 3, 64)
sigs.write.mode("overwrite").format("noop").save()
t["signatures"] = time.time() - t0
print("signatures", t["signatures"], flush=True)

# banding stage as in minhash_lsh_pairs (bands computed for thr 0.9)
n_perm, threshold = 64, 0.9
bands = 2
while True:
    nb = bands * 2
    r = n_perm // nb
    if r < 2 or (1.0 / nb) ** (1.0 / r) > threshold:
        break
    bands = nb
rows_per_band = n_perm // bands
print("bands", bands, "rows_per_band", rows_per_band, flush=True)

sigs_cp = minhash_signatures(big, "doc_id", "text", 3, 64).localCheckpoint()
t0 = time.time()
band_cols = [
    F.xxhash64(
        F.concat_ws(
            ",",
            *[
                F.col("sig")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)
            ],
        ),
        F.lit(b),
    ).alias(f"b{b}")
    for b in range(bands)
]
banded = sigs_cp.select("doc_id", *band_cols)
stacked = banded.select(
    F.col("doc_id").alias("__id"),
    F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bh"))
                for b in range(bands)
            ]
        )
    ).alias("bb"),
).select("__id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
l = stacked.select(F.col("__id").alias("idx_a"), "band", "bh")
r_ = stacked.select(F.col("__id").alias("idx_b"), "band", "bh")
cand = (
    l.join(r_, on=["band", "bh"])
    .where(F.col("idx_a") < F.col("idx_b"))
    .select("idx_a", "idx_b")
    .dropDuplicates(["idx_a", "idx_b"])
)
n_cand = cand.count()
t["banding_join"] = time.time() - t0
print("banding_join", t["banding_join"], "cands", n_cand, flush=True)

# prefilter + verify
t0 = time.time()
est = (
    F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("double")
    / 64.0
)
cand2 = (
    cand.join(
        sigs_cp.select(F.col("doc_id").alias("idx_a"), F.col("sig").alias("sig_a")),
        on="idx_a",
    )
    .join(
        sigs_cp.select(F.col("doc_id").alias("idx_b"), F.col("sig").alias("sig_b")),
        on="idx_b",
    )
    .where(est >= 0.9 - 0.12)
    .select("idx_a", "idx_b")
)
n2 = cand2.count()
t["prefilter"] = time.time() - t0
print("prefilter", t["prefilter"], "survivors", n2, flush=True)

t0 = time.time()
shing2 = with_shingle_hashes(
    big.select(F.col("doc_id").alias("__id"), "text"), "text", 3, "sh"
).select("__id", "sh")
verified = (
    cand2.join(
        shing2.select(F.col("__id").alias("idx_a"), F.col("sh").alias("sh_a")),
        on="idx_a",
    )
    .join(
        shing2.select(F.col("__id").alias("idx_b"), F.col("sh").alias("sh_b")),
        on="idx_b",
    )
    .withColumn(
        "jaccard",
        F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            6,
        ),
    )
)
nv = verified.where(F.col("jaccard") >= 0.9).count()
t["verify"] = time.time() - t0
print("verify", t["verify"], "pairs", nv, flush=True)

# and the full call end-to-end, same session (warm-ish)
t0 = time.time()
n = minhash_lsh_pairs(big, "doc_id", n=3, n_perm=64, threshold=0.9).count()
t["full_warm"] = time.time() - t0
print("full_warm", t["full_warm"], "pairs", n, flush=True)

print({k: round(v, 2) for k, v in t.items()}, flush=True)
spark.stop()
