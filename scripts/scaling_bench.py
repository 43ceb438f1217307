#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

No real cluster exists in this sandbox, so the N -> 4N executor
scaling criterion is evidenced by running the SAME er_dedup job at
two parallelism levels on identical input and reporting
candidate-pairs-scored/sec at both, plus the scaling efficiency
    eff = (throughput_high / throughput_low) / (high / low).

Honest core accounting: ``--pin`` wraps each level in
``taskset -c`` so the WHOLE process tree (JVM task threads + GC +
Arrow serialization + Python UDF workers) is bounded to exactly N
cores — without pinning, local[1] pipelines the JVM and the Python
worker on ~2 physical cores and the baseline is inflated, understating
efficiency (a real N-executor cluster is core-bounded per executor,
which is what pinning reproduces).

Each level runs in its own subprocess (fresh JVM); best-of-N wall
times are used because this VM shows noisy-neighbor variance. Results
are appended to BENCH.md.

Usage: python scripts/scaling_bench.py [--repeats 3] [--n-docs 100000]
       [--low 8] [--pin]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time

cpus = int(sys.argv[1])
n_docs = int(sys.argv[2])

from datamatch_spark.session import get_spark
from datamatch_spark import (
    ColumnsIndex, DateSimilarity, JaroWinklerSimilarity, PairingConfig,
    ThresholdMatcher,
)
from datamatch_spark.corpus import CorpusConfig, generate_documents, project_fields
from pyspark.sql import functions as F

spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  app_name=f"scaling-{cpus}",
                  extra_conf={"spark.driver.memory": "48g"})
cfg = CorpusConfig(n_docs=n_docs, seed=42, profile="clean",
                   blk_buckets=max(50, n_docs // 40), hot_pct=2)
fields = project_fields(generate_documents(spark, cfg)).drop("spans").localCheckpoint()
# warm codegen + python workers on a small slice
warm = ThresholdMatcher(
    ColumnsIndex("blk"),
    {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity(),
     "dob": DateSimilarity()},
    fields.limit(2000), row_key="doc_id", validate=False)
warm.scored_pairs.count()

t0 = time.time()
m = ThresholdMatcher(
    ColumnsIndex("blk"),
    {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity(),
     "dob": DateSimilarity()},
    fields, row_key="doc_id", validate=False,
    pairing_config=PairingConfig(salt_threshold=1000))
n = m.scored_pairs.count()
elapsed = time.time() - t0
print(json.dumps({"cpus": cpus, "pairs": n, "seconds": round(elapsed, 3),
                  "pairs_per_sec": round(n / elapsed, 1)}))
"""


def run_level(cpus: int, n_docs: int, repeats: int, pin: bool) -> dict:  # noqa: D103
    best = None
    cmd = [sys.executable, "-c", WORKER, str(cpus), str(n_docs)]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    for _ in range(repeats):
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        if best is None or res["seconds"] < best["seconds"]:
            best = res
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--low", type=int, default=8, help="N; the high level is 4N")
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset-bound each level's process tree to exactly N cores",
    )
    args = ap.parse_args()

    n_low = args.low
    n_high = 4 * args.low
    # INTERLEAVED rounds: each round measures low then high back-to-back,
    # so the pair shares the same host weather (this VM's noisy-neighbor
    # load drifts minute-to-minute — comparing a level measured in a slow
    # minute against one measured in a fast minute corrupts the ratio;
    # per-round ratios are self-normalizing). Report every round plus the
    # median-ratio round.
    rounds = []
    for _ in range(args.repeats):
        rl = run_level(n_low, args.n_docs, 1, args.pin)
        rh = run_level(n_high, args.n_docs, 1, args.pin)
        e = (rh["pairs_per_sec"] / rl["pairs_per_sec"]) / (n_high / n_low)
        rounds.append({"low": rl, "high": rh, "eff": round(e, 3)})
    rounds_sorted = sorted(rounds, key=lambda r: r["eff"])
    mid = rounds_sorted[len(rounds_sorted) // 2]
    r8, r32, eff = mid["low"], mid["high"], mid["eff"]
    report = {
        "n_docs": args.n_docs,
        "rounds": [r["eff"] for r in rounds],
        "low": r8,
        "high": r32,
        f"scaling_efficiency_{n_low}_to_{n_high}": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    md = f"""
## Scaling evidence (N vs 4N parallelism, sandbox stand-in for executors)

Same er_dedup job (blocked salted self-join + JW×2 + date scoring) on an
identical {args.n_docs:,}-doc interleaved corpus; {args.repeats} interleaved
rounds (each round runs N then 4N back-to-back so both share the same host
weather; the median-efficiency round is reported, all rounds listed)
{"— each level's WHOLE process tree taskset-pinned to exactly N cores (JVM + GC + Arrow + Python UDF workers), the honest analogue of core-bounded executors" if args.pin else ""}:
Round efficiencies: {[r['eff'] for r in rounds]}

| parallelism | pairs scored | wall (s) | pairs/sec |
|---|---|---|---|
| local[{n_low}]  (N)  | {r8['pairs']:,} | {r8['seconds']} | {r8['pairs_per_sec']:,} |
| local[{n_high}] (4N) | {r32['pairs']:,} | {r32['seconds']} | {r32['pairs_per_sec']:,} |

**Scaling efficiency ({n_low} -> {n_high}): {eff:.3f}** (target >= 0.8).
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "a") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
