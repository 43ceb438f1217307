#!/usr/bin/env python
"""Two-scale-factor bench: the same headline queries at sf and 5*sf.

VERDICT item: show per-query throughput holding (within 2x) across a
5x data-scale bump, i.e. the wall clock grows with the data, not
faster. er_dedup / er_swap / cc_cluster generate their corpus from
``sf`` directly; minhash tiles the documents table by ``sf``; all
four therefore scale natively without touching /root/testdata.

Usage: python scripts/scaleup_bench.py [--sf 0.1] [--mult 5] [--cpus 32]

Appends a markdown table to BENCH.md and prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_at(sf: float, sf_dir: str, cpus: int) -> dict:
    import bench

    spark = bench.build_session(cpus)
    bench._warmup(spark, sf_dir)
    out = {}
    t, n, m = bench.bench_er_dedup(spark, sf)
    out["er_dedup"] = {"sec": round(t, 2), "pairs": n,
                       "pairs_per_sec": round(n / t, 1)}
    t, n = bench.bench_cc_cluster(spark, m)
    out["cc_cluster"] = {"sec": round(t, 2), "members": n}
    t, n = bench.bench_er_swap(spark, sf)
    out["er_swap"] = {"sec": round(t, 2), "pairs": n,
                      "pairs_per_sec": round(n / t, 1)}
    t, n = bench.bench_minhash(spark, sf_dir, sf)
    out["minhash_dedup"] = {"sec": round(t, 2), "pairs": n}
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    lo = run_at(args.sf, sf_dir, args.cpus)
    hi = run_at(args.sf * args.mult, sf_dir, args.cpus)
    report = {"sf_low": args.sf, "sf_high": args.sf * args.mult, "low": lo,
              "high": hi}
    print(json.dumps(report))

    rows = []
    for q in lo:
        tl, th = lo[q]["sec"], hi[q]["sec"]
        wl = lo[q].get("pairs", lo[q].get("members"))
        wh = hi[q].get("pairs", hi[q].get("members"))
        tput_ratio = (wh / th) / (wl / tl) if wl and tl and th else None
        rows.append(
            f"| {q} | {tl} s / {wl:,} | {th} s / {wh:,} | "
            f"{wh / wl:.1f}x | {tput_ratio:.2f}x |"
        )
    md = f"""
## Scale-up bench: sf{args.sf} vs sf{args.sf * args.mult} (local[{args.cpus}], same session config)

Work (pairs for pair queries, members for cc_cluster) grows ~{args.mult}x;
the throughput ratio column is (work/s at high) / (work/s at low) — 1.0
means perfectly scale-proportional wall clock, >= 0.5 meets the
"within 2x" bar:

| query | sf{args.sf}: wall / work | sf{args.sf * args.mult}: wall / work | work growth | throughput ratio |
|---|---|---|---|---|
""" + "\n".join(rows) + "\n"
    with open(Path(__file__).resolve().parent.parent / "BENCH.md", "a") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
