#!/usr/bin/env python
"""A/B the hot-block shard sizing on the executor-scaling job.

Interleaves `--pairing manual` (hand-tuned rows_per_shard=250) and
`--pairing adaptive` (library defaults: rows_per_shard=2000 widened by
cell_oversubscription=4.0 toward >=4x cells per partition) within the
SAME round, both levels pinned — so both modes see the same host
weather and the comparison is paired, not across windows.

Usage: python scripts/ab_pairing_scaling.py [--repeats 2]
       [--n-docs 1200000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from executor_scaling_bench import hw_probe, run_level  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n-docs", type=int, default=1_200_000)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--waves", type=int, default=4)
    args = ap.parse_args()

    # discard-first warmup (first JVM after idle is ~4x slow)
    run_level(1, args.exec_cores, args.exec_mem_mb, 30_000, True,
              args.waves, "manual")
    rounds = []
    for i in range(args.repeats):
        probe = hw_probe()
        rec = {"round": i, "hw_cpu_eff": probe.get("cpu_ceiling_eff"),
               "hw_valid": bool(probe.get("valid"))}
        for mode in ("manual", "adaptive"):
            r1 = run_level(1, args.exec_cores, args.exec_mem_mb,
                           args.n_docs, True, args.waves, mode)
            r4 = run_level(4, args.exec_cores, args.exec_mem_mb,
                           args.n_docs, True, args.waves, mode)
            rec[mode] = {
                "low": r1, "high": r4,
                "eff": round(r4["pairs_per_sec"] / r1["pairs_per_sec"] / 4.0, 3),
            }
        print(json.dumps(rec), flush=True)
        rounds.append(rec)
    print(json.dumps({
        "summary": {
            m: {
                "effs": [r[m]["eff"] for r in rounds],
                "high_pps": [r[m]["high"]["pairs_per_sec"] for r in rounds],
                "low_pps": [r[m]["low"]["pairs_per_sec"] for r in rounds],
            }
            for m in ("manual", "adaptive")
        }
    }))


if __name__ == "__main__":
    main()
