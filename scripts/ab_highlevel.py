#!/usr/bin/env python
"""Focused 4x8-level A/B of hot-block shard sizing modes.

The wide (4x8) level is where cell-placement balance matters most;
this interleaves the candidate modes within each rep so every mode
sees the same host weather; a same-minute hardware probe opens each
rep so a degraded window is visible in the record.

Usage: python scripts/ab_highlevel.py [--reps 3]
       [--modes manual,adaptive,adaptive16] [--n-docs 1200000]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="manual,adaptive,adaptive16")
    ap.add_argument("--n-docs", type=int, default=1_200_000)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--waves", type=int, default=4)
    args = ap.parse_args()
    modes = args.modes.split(",")

    run_level(1, args.exec_cores, args.exec_mem_mb, 30_000, True,
              args.waves, "manual")  # discard-first warmup
    reps = []
    for i in range(args.reps):
        probe = hw_probe()
        rec = {"rep": i, "hw_cpu_eff": probe.get("cpu_ceiling_eff"),
               "hw_valid": bool(probe.get("valid"))}
        for mode in modes:
            r4 = run_level(4, args.exec_cores, args.exec_mem_mb,
                           args.n_docs, True, args.waves, mode)
            rec[mode] = {"seconds": r4["seconds"],
                         "pairs_per_sec": r4["pairs_per_sec"]}
        print(json.dumps(rec), flush=True)
        reps.append(rec)
    print(json.dumps({
        "summary": {
            m: sorted(r[m]["pairs_per_sec"] for r in reps)[len(reps) // 2]
            for m in modes
        }
    }))


if __name__ == "__main__":
    main()
