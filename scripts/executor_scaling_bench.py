#!/usr/bin/env python
"""N vs 4N EXECUTOR scaling via Spark's local-cluster mode.

``scaling_bench.py`` varies local[K] thread counts inside ONE JVM —
which conflates engine scaling with single-JVM contention (GC, one
allocator, one Arrow serialization path). This script instead launches
``local-cluster[N,8,mem]``: N genuinely separate executor JVMs with 8
cores each, each with its own heap, GC, shuffle server, and Python
worker pool — the faithful sandbox analogue of the north rule's
"N and 4N executors", with only the host's memory system still shared.

Per round, runs 1 executor then 4 executors back-to-back (same host
weather), fresh JVMs per level; reports every round plus the
median-efficiency round and appends to BENCH.md.

Usage: python scripts/executor_scaling_bench.py [--repeats 3]
       [--n-docs 300000] [--exec-cores 8] [--exec-mem-mb 8192]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
n_exec = int(sys.argv[1]); cores = int(sys.argv[2]); mem = int(sys.argv[3])
n_docs = int(sys.argv[4]); waves = int(sys.argv[5])
pairing_mode = sys.argv[6] if len(sys.argv) > 6 else "manual"
from pyspark.sql import SparkSession
spark = (SparkSession.builder
    .master(f"local-cluster[{n_exec},{cores},{mem}]")
    .appName(f"exec-scaling-{n_exec}")
    # `waves` tasks per core, not 1: a single wave makes the wall
    # equal to the SLOWEST of K tasks, and max-of-32 draws is worse
    # than max-of-8 — one-wave scheduling systematically penalizes
    # the 4N level. Multi-wave is also what any real 4N-executor
    # deployment runs (2-4x tasks per core is the standard guidance).
    .config("spark.sql.shuffle.partitions", str(waves * cores * n_exec))
    .config("spark.driver.memory", "8g")
    # executor Python workers run under the standalone worker's cwd;
    # they need an ABSOLUTE path to import the package (the deployment
    # analogue is spark-submit --py-files)
    .config("spark.executorEnv.PYTHONPATH", os.getcwd())
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from datamatch_spark import (ColumnsIndex, DateSimilarity, JaroWinklerSimilarity,
                             PairingConfig, ThresholdMatcher)
from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields
cfg = CorpusConfig(n_docs=n_docs, seed=42, profile="clean",
                   blk_buckets=max(50, n_docs // 40), hot_pct=2)
fields = project_fields(generate_documents(spark, cfg)).drop("spans").localCheckpoint()
sims = {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity(),
        "dob": DateSimilarity()}
# FULL-WIDTH warmup: limit(2000) collapses to ~1 partition (and AQE
# coalesces its tiny shuffles), so it spawns only ~1-2 Python workers
# per level — the timed region then pays ~31 cold numpy/pandas imports
# at 4x8 vs ~7 at 1x8, a pure anti-scaling bias with no production
# analogue (long-lived clusters run warm workers; the north rule
# measures steady-state throughput scaling).
#
# Two warmups: (1) an explicit-width mapInPandas over exactly
# n_exec*cores partitions — explicit repartition(N) is NOT AQE-
# coalesced, so N tasks land concurrently on N free slots and every
# executor forks + imports its full daemon pool before t0 (worker
# reuse keeps them warm across jobs); (2) the small matcher job to
# warm JVM codegen / broadcast paths.
def _warm_workers(batches):
    import numpy as _np  # noqa: F401  (heavy imports paid pre-t0)
    import pandas as _pd  # noqa: F401
    import datamatch_spark.kernels  # noqa: F401
    for b in batches:
        yield b
(fields.limit(40 * cores * n_exec)
    .repartition(cores * n_exec)
    .mapInPandas(_warm_workers, schema=fields.schema)
    .count())
warm = ThresholdMatcher(ColumnsIndex("blk"), sims, fields.limit(2000),
                        row_key="doc_id", validate=False)
warm.scored_pairs.count()
t0 = time.time()
# "manual": the hand-tuned shard size used since round 4. "adaptive":
# library defaults — rows_per_shard=2000 widened by cell_oversubscription
# toward >=4x as many cells as partitions (the untuned user experience).
# "adaptiveN" (e.g. adaptive16): defaults with cell_oversubscription=N.
if pairing_mode == "manual":
    pcfg = PairingConfig(salt_threshold=1000, rows_per_shard=250)
elif pairing_mode == "adaptive":
    pcfg = PairingConfig(salt_threshold=1000)
elif pairing_mode.startswith("adaptive"):
    pcfg = PairingConfig(salt_threshold=1000,
                         cell_oversubscription=float(pairing_mode[8:]))
else:  # a typo must not silently benchmark the default config
    raise SystemExit(f"unknown pairing mode {pairing_mode!r}")
m = ThresholdMatcher(ColumnsIndex("blk"), sims, fields, row_key="doc_id",
    validate=False, pairing_config=pcfg)
n = m.scored_pairs.count()
el = time.time() - t0
print(json.dumps({"executors": n_exec, "pairs": n, "seconds": round(el, 3),
                  "pairs_per_sec": round(n / el, 1)}))
"""


def hw_probe(seconds: float = 2.0) -> dict:
    """Same-window hardware 8->32-core scaling (scripts/ceiling_probe.py).

    The probe's `cpu_ceiling_eff` is what the host's vCPUs themselves
    scale to between the two pinned core sets — the hard upper bound
    any CPU-bound job can reach in that window (this virtualized box
    runs 8-core sets ~25-40% faster per core than 32-core sets).
    """
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ceiling_probe.py"),
             "--seconds", str(seconds)],
            capture_output=True, text=True, timeout=240,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as exc:  # probe failure must not kill the bench
        return {"error": str(exc)[:200], "valid": False}


def run_level(n_exec: int, cores: int, mem: int, n_docs: int,
              pin: bool = False, waves: int = 4,
              pairing: str = "manual") -> dict:  # noqa: D103
    last_err = ""
    cmd = [sys.executable, "-c", WORKER, str(n_exec), str(cores), str(mem),
           str(n_docs), str(waves), pairing]
    if pin:
        # bound the WHOLE tree (driver JVM + standalone worker +
        # executors + Python workers) to n_exec*cores host cores — the
        # honest analogue of N core-bounded executor hosts
        hi = n_exec * cores - 1
        cmd = ["taskset", "-c", f"0-{hi}" if hi else "0"] + cmd
    for _ in range(3):  # standalone worker/executor launch can race a
        # previous level's shutdown hooks; settle and retry
        out = subprocess.run(
            cmd,
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        last_err = out.stderr[-2000:]
        import time
        time.sleep(10)
    raise RuntimeError(last_err)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-docs", type=int, default=300_000)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--pin", action="store_true",
                    help="taskset each level's whole tree to N*cores cores")
    ap.add_argument("--warmup", action="store_true",
                    help="one discarded small run first (first JVM after "
                         "idle is reproducibly ~4x slow on this host)")
    ap.add_argument("--waves", type=int, default=4,
                    help="shuffle tasks per core (multi-wave load balance)")
    ap.add_argument("--pairing", default="adaptive",
                    help="adaptive (default): library defaults — "
                         "cell_oversubscription widening; measured fastest "
                         "at BOTH levels (scripts/ab_hl_r05_s10.out). "
                         "manual: the r4-era hand-tuned rows_per_shard=250; "
                         "adaptiveN: defaults with cell_oversubscription=N")
    args = ap.parse_args()

    if args.warmup:
        run_level(1, args.exec_cores, args.exec_mem_mb, 30_000, args.pin,
                  args.waves, args.pairing)
    rounds = []
    for _ in range(args.repeats):
        probe = hw_probe()
        r1 = run_level(1, args.exec_cores, args.exec_mem_mb, args.n_docs,
                       args.pin, args.waves, args.pairing)
        r4 = run_level(4, args.exec_cores, args.exec_mem_mb, args.n_docs,
                       args.pin, args.waves, args.pairing)
        e = (r4["pairs_per_sec"] / r1["pairs_per_sec"]) / 4.0
        # Pre-registered validity rule: a CPU-bound job cannot scale
        # superlinearly by more than scheduling noise. eff > 1.25 means
        # the two levels ran in DIFFERENT host regimes (this host's
        # 8-core memcpy has been observed collapsing ~100x for minutes
        # at a time) — the round is contamination, discarded exactly
        # like a contaminated sublinear loss would be.
        valid = e <= 1.25
        hw_eff = probe.get("cpu_ceiling_eff")
        rounds.append({
            "low": r1, "high": r4, "eff": round(e, 3),
            "valid_round": valid,
            "hw_cpu_eff_same_window": hw_eff,
            "hw_probe_valid": bool(probe.get("valid")),
            # engine scaling as a fraction of what the host's own
            # vCPUs scaled to in the same window (only meaningful
            # when the probe itself was healthy)
            "eff_vs_hw_ceiling": (
                round(e / hw_eff, 3)
                if probe.get("valid") and hw_eff else None),
        })
        print(json.dumps(rounds[-1]), flush=True)
    usable = [r for r in rounds if r["valid_round"]]
    if not usable:
        print(json.dumps({
            "rounds": [r["eff"] for r in rounds],
            "scaling_efficiency_1_to_4_executors": None,
            "note": "all rounds superlinear>1.25 — host regime shifted "
                    "between levels; no valid measurement this window"}))
        return 1
    mid = sorted(usable, key=lambda r: r["eff"])[len(usable) // 2]
    r1, r4, eff = mid["low"], mid["high"], mid["eff"]
    hw_effs = [r["hw_cpu_eff_same_window"] for r in usable
               if r.get("hw_probe_valid")]
    norm = [r["eff_vs_hw_ceiling"] for r in usable
            if r.get("eff_vs_hw_ceiling")]
    print(json.dumps({"rounds": [r["eff"] for r in rounds],
                      "valid_rounds": [r["eff"] for r in usable],
                      "hw_cpu_effs": hw_effs,
                      "eff_vs_hw_ceiling": norm,
                      "scaling_efficiency_1_to_4_executors": eff}))

    pin_note = (
        " --pin (each level's whole tree taskset-bound to N*8 cores)"
        if args.pin else " (unpinned)"
    )
    pin_note += f" --pairing {args.pairing}"
    md = f"""
## Executor scaling: N vs 4N separate executor JVMs (`local-cluster`)

`scripts/executor_scaling_bench.py{pin_note}`: same er_dedup job
({args.n_docs:,} docs), run on `local-cluster[1,{args.exec_cores},{args.exec_mem_mb}]`
vs `local-cluster[4,{args.exec_cores},{args.exec_mem_mb}]` — genuinely separate
executor JVMs (own heap/GC/shuffle server/Python workers), identical
per-executor shape at both levels; the faithful sandbox analogue of the
north rule's N -> 4N executors. {args.repeats} interleaved rounds,
median-efficiency VALID round reported (rounds with implied eff > 1.25
are host-regime contamination and excluded — see the pre-registered
rule in the script); {args.waves} task waves per core:
Round efficiencies: {[r['eff'] for r in rounds]} (valid: {[r['eff'] for r in usable]})
Same-window hardware 8->32-core CPU scaling (pinned probe): {hw_effs}
Engine efficiency / hardware ceiling: {norm}

| executors | pairs scored | wall (s) | pairs/sec |
|---|---|---|---|
| 1 x {args.exec_cores} cores | {r1['pairs']:,} | {r1['seconds']} | {r1['pairs_per_sec']:,} |
| 4 x {args.exec_cores} cores | {r4['pairs']:,} | {r4['seconds']} | {r4['pairs_per_sec']:,} |

**Executor-scaling efficiency (1 -> 4): {eff:.3f}** (target >= 0.8;
same-window hardware ceiling bounds any CPU-bound job — see the
normalized row above).
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH.md"), "a") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
