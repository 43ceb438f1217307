#!/usr/bin/env python
"""Phase-level diagnosis of the N vs 4N executor-scaling gap.

Runs the same er_dedup job as executor_scaling_bench.py at
local-cluster[1,8] and local-cluster[4,8] (pinned), but times each
phase separately so the non-scaling phase is identifiable:

- t_gen:   corpus generation + localCheckpoint (untimed in the bench)
- t_cand:  candidate-pair materialization (blocking shuffle + join)
- t_score: pairwise Arrow-UDF scoring over cached candidates
- t_total: the bench's timed region for reference

Also warms EVERY Python worker first (the bench's fields.limit(2000)
warmup touches ~1 partition, so at 4x8 the timed region can pay ~32
cold numpy/pandas imports vs ~8 at 1x8 — an anti-scaling bias).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
n_exec = int(sys.argv[1]); cores = int(sys.argv[2]); mem = int(sys.argv[3])
n_docs = int(sys.argv[4])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder
    .master(f"local-cluster[{n_exec},{cores},{mem}]")
    .appName(f"exec-scaling-diag-{n_exec}")
    .config("spark.sql.shuffle.partitions", str(cores * n_exec))
    .config("spark.driver.memory", "8g")
    .config("spark.executorEnv.PYTHONPATH", os.getcwd())
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from datamatch_spark import (ColumnsIndex, DateSimilarity, JaroWinklerSimilarity,
                             PairingConfig, ThresholdMatcher)
from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields
from datamatch_spark.pairing import candidate_pairs

t = {}
t0 = time.time()
cfg = CorpusConfig(n_docs=n_docs, seed=42, profile="clean",
                   blk_buckets=max(50, n_docs // 40), hot_pct=2)
fields = project_fields(generate_documents(spark, cfg)).drop("spans").localCheckpoint()
t["gen"] = round(time.time() - t0, 3)

sims = {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity(),
        "dob": DateSimilarity()}
pcfg = PairingConfig(salt_threshold=1000, rows_per_shard=250)

# full-width warmup: same matcher shape, slice spread over EVERY core so
# all n_exec*cores Python workers import numpy/pandas before t0
warm_df = fields.limit(40 * cores * n_exec).repartition(cores * n_exec)
warm = ThresholdMatcher(ColumnsIndex("blk"), sims, warm_df,
                        row_key="doc_id", validate=False)
t0 = time.time()
warm.scored_pairs.count()
t["warmup"] = round(time.time() - t0, 3)

# phase 0: hot-block detection alone (driver-side collect — the
# serial Amdahl fraction inside every candidate_pairs call)
from datamatch_spark.pairing import _hot_blocks, keyed_side
t0 = time.time()
side = keyed_side(fields, ColumnsIndex("blk"), "doc_id",
                  ["last", "first", "dob"], "idx", "rec")
hot = _hot_blocks(side, pcfg)
t["hot_detect"] = round(time.time() - t0, 3)

# phase 1: candidate pairs count only. NOT persisted (~10 GB of wide
# pair rows OOMs a single 8 GB executor at any storage level, and the
# lost executor takes its localCheckpoint blocks with it). Note
# count() prunes the rec structs — this times the NARROW join.
t0 = time.time()
cand = candidate_pairs(fields, ColumnsIndex("blk"), "doc_id",
                       ["last", "first", "dob"], cfg=pcfg)
n_cand = cand.count()
t["cand_narrow"] = round(time.time() - t0, 3)

# phase 2: the bench's full timed region — matcher construction is
# EAGER (scored_pairs materializes in __init__), so construction must
# sit inside the timed block exactly like executor_scaling_bench
t0 = time.time()
m = ThresholdMatcher(ColumnsIndex("blk"), sims, fields, row_key="doc_id",
                     validate=False, pairing_config=pcfg)
n = m.scored_pairs.count()
t["total_bench_region"] = round(time.time() - t0, 3)

print(json.dumps({"executors": n_exec, "pairs": n, "n_cand": n_cand,
                  "phases": t,
                  "pairs_per_sec": round(n / t["total_bench_region"], 1)}))
"""


def run_level(n_exec, cores, mem, n_docs, pin=True):
    cmd = [sys.executable, "-c", WORKER, str(n_exec), str(cores), str(mem),
           str(n_docs)]
    if pin:
        hi = n_exec * cores - 1
        cmd = ["taskset", "-c", f"0-{hi}" if hi else "0"] + cmd
    for _ in range(3):
        out = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        import time
        time.sleep(10)
    raise RuntimeError(out.stderr[-2000:])


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=300_000)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    args = ap.parse_args()
    r1 = run_level(1, args.exec_cores, args.exec_mem_mb, args.n_docs)
    print(json.dumps(r1), flush=True)
    r4 = run_level(4, args.exec_cores, args.exec_mem_mb, args.n_docs)
    print(json.dumps(r4), flush=True)
    for k in r1["phases"]:
        a, b = r1["phases"][k], r4["phases"][k]
        if b:
            print(f"phase {k:>20}: 1x8 {a:8.2f}s  4x8 {b:8.2f}s  "
                  f"speedup {a / b:5.2f}x  eff {a / b / 4:5.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
