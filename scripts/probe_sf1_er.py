"""Probe-bracketed standalone timing of the sf1 er_dedup bench stage.

Runs bench.bench_er_dedup(spark, 1.0) N times in one JVM with a
hardware ceiling probe before/after each, to separate host-window noise
from engine behavior.  Usage: python scripts/probe_sf1_er.py [n]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import os

    xjo = os.environ.get("PROBE_DRIVER_XJO")
    evlog = os.environ.get("PROBE_EVENTLOG_DIR")
    if xjo or evlog:
        from datamatch_spark.session import get_spark

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark(
            master=f"local[{cpus}]",
            app_name="datamatch-bench",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
                "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
                    "SPARK_GRAFT_ARROW_BATCH", "20000"
                ),
                **({"spark.driver.extraJavaOptions": xjo} if xjo else {}),
                **(
                    {
                        "spark.eventLog.enabled": "true",
                        "spark.eventLog.dir": evlog,
                    }
                    if evlog
                    else {}
                ),
            },
        )
    else:
        spark = bench.build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = []
    for i in range(n):
        p0 = bench._ceiling_probe()
        spark.sparkContext.setJobDescription(f"probe_sf1_er pass {i}")
        t, pairs, m = bench.bench_er_dedup(spark, 1.0)
        p1 = bench._ceiling_probe()
        rec = {
            "pass": i,
            "sec": round(t, 3),
            "pairs": pairs,
            "pairs_per_sec": round(pairs / t, 1),
            "probe_before": p0,
            "probe_after": p1,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        del m
        for (rid, rdd) in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
            rdd.unpersist()
        time.sleep(2)
    print(json.dumps({"passes": [r["sec"] for r in out]}))
    spark.stop()


if __name__ == "__main__":
    main()
