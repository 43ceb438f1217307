"""Summarize a Spark event log: per-pass stage wall/GC/run-time breakdown.

Usage: python scripts/analyze_evlog.py /tmp/evlog/<app>
Groups stages by the spark.job.description active when their job started
(probe_sf1_er sets one per pass), and prints the top stages by wall time.
"""
import json
import sys
from collections import defaultdict


def main(path):
    stage_to_desc = {}
    stage_sub = {}
    stage_done = {}
    stage_name = {}
    task_metrics = defaultdict(lambda: defaultdict(float))
    task_count = defaultdict(int)
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in e.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                stage_sub[si["Stage ID"]] = si.get("Submission Time")
                stage_name[si["Stage ID"]] = si.get("Stage Name", "")
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                stage_sub.setdefault(sid, si.get("Submission Time"))
                stage_done[sid] = si.get("Completion Time")
                stage_name[sid] = si.get("Stage Name", "")
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                tm = e.get("Task Metrics") or {}
                m = task_metrics[sid]
                m["run_ms"] += tm.get("Executor Run Time", 0)
                m["gc_ms"] += tm.get("JVM GC Time", 0)
                m["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                m["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                m["cpu_ns"] += tm.get("Executor CPU Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                m["shuf_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                m["shuf_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                m["shuf_fetch_ms"] += sr.get("Fetch Wait Time", 0)
                m["shuf_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                task_count[sid] += 1

    by_desc = defaultdict(list)
    for sid in stage_done:
        by_desc[stage_to_desc.get(sid, "?")].append(sid)
    for desc in sorted(by_desc):
        sids = by_desc[desc]
        total_wall = sum(
            (stage_done[s] - stage_sub[s]) / 1e3
            for s in sids
            if stage_sub.get(s)
        )
        print(f"\n=== {desc!r}  stages={len(sids)} wall_sum={total_wall:.1f}s")
        rows = sorted(
            sids,
            key=lambda s: -(stage_done[s] - (stage_sub.get(s) or stage_done[s])),
        )
        for s in rows[:8]:
            wall = (stage_done[s] - (stage_sub.get(s) or stage_done[s])) / 1e3
            m = task_metrics[s]
            print(
                f"  stage {s:4d} wall={wall:7.2f}s tasks={task_count[s]:4d} "
                f"run={m['run_ms']/1e3:8.1f}s cpu={m['cpu_ns']/1e9:8.1f}s "
                f"gc={m['gc_ms']/1e3:6.1f}s deser={m['deser_ms']/1e3:5.1f}s "
                f"shufW={m['shuf_write_ms']/1e3:5.1f}s/"
                f"{m['shuf_write_b']/1e9:.2f}GB "
                f"shufR={m['shuf_read_b']/1e9:.2f}GB  "
                f"{stage_name.get(s,'')[:60]}"
            )


if __name__ == "__main__":
    main(sys.argv[1])
