"""Fire one full bench.py run in the first HEALTHY host window.

Same trigger discipline as scaling_watcher.py: every ``--interval``
seconds run ceiling_probe.py; when the probe is valid, the memcpy
8->32-core ceiling efficiency is >= --min-ceiling AND 1-min load is
< --max-load (so our own jobs can't contaminate the measurement), run
``python bench.py`` once, save its JSON line + the bracketing probes
to --out, and exit. Probes are appended to the shared probe log
either way.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def probe() -> dict:
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "ceiling_probe.py"), "--seconds", "2"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    d = json.loads(r.stdout.strip().splitlines()[-1])
    d["load1"] = os.getloadavg()[0]
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=480)
    ap.add_argument("--min-ceiling", type=float, default=0.5)
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--out", default=str(ROOT / "scripts" / "bench_r05_healthy_run.json"))
    ap.add_argument("--log", default=str(ROOT / "scripts" / "probe_log_r05.jsonl"))
    args = ap.parse_args()

    while True:
        try:
            p = probe()
        except Exception as exc:  # probe itself can die on a thrashing host
            print(f"probe failed: {exc}", flush=True)
            time.sleep(args.interval)
            continue
        with open(args.log, "a") as fh:
            fh.write(json.dumps(p) + "\n")
        ok = (
            p.get("valid")
            and p.get("memcpy_ceiling_eff", 0) >= args.min_ceiling
            and p.get("load1", 99) < args.max_load
        )
        print(
            f"{p.get('ts')} memcpy_eff={p.get('memcpy_ceiling_eff')} "
            f"valid={p.get('valid')} load={p.get('load1'):.2f} fire={bool(ok)}",
            flush=True,
        )
        if ok:
            # the fire path must survive anything (a mid-run host
            # collapse, a bench crash, malformed output): losing the
            # one healthy window AND dying would be the worst outcome
            bench_json, rc, err = None, None, None
            try:
                r = subprocess.run(
                    [sys.executable, str(ROOT / "bench.py")],
                    capture_output=True,
                    text=True,
                    timeout=3600,
                    cwd=str(ROOT),
                )
                rc = r.returncode
                for ln in r.stdout.splitlines():
                    if ln.startswith('{"metric"'):
                        try:
                            bench_json = json.loads(ln)
                        except ValueError:
                            err = f"unparseable bench line: {ln[:200]}"
            except Exception as exc:
                err = f"bench run failed: {exc}"
            closing = None
            try:
                closing = probe()
                with open(args.log, "a") as fh:
                    fh.write(json.dumps(closing) + "\n")
            except Exception:
                pass
            out = {
                "trigger_probe": p,
                "bench": bench_json,
                "closing_probe": closing,
                "rc": rc,
                "error": err,
            }
            try:
                with open(args.out, "w") as fh:
                    json.dump(out, fh, indent=1)
            except Exception as exc:
                print(f"could not save {args.out}: {exc}", flush=True)
            print(f"bench fired, rc={rc}, err={err}, saved {args.out}", flush=True)
            if bench_json is not None:
                return 0
            # else keep watching: the window was consumed but produced
            # no usable measurement
        time.sleep(args.interval)


if __name__ == "__main__":
    raise SystemExit(main())
