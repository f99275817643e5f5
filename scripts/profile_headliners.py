#!/usr/bin/env python
"""Per-headliner profiling for the optimization rounds (guide §1).

For each headline query: DataFrame-BUILD time (driver-side Python/py4j/
planning work paid inside the bench's timed region), EXEC time (collect),
and the Spark job count per run — plus the formatted physical plan dumped
to a directory for before/after evidence.

Usage: python scripts/profile_headliners.py [out_dir] [name ...]
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  PROFILE_N           runs per query (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatacw1_spark.plans import formatted_plan  # noqa: E402
from bigdatacw1_spark.queries import REGISTRY  # noqa: E402
from bigdatacw1_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_dir = args[0] if args else None
    names = args[1:] if len(args) > 1 else sorted(
        n for n, s in REGISTRY.items() if s.headline
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("PROFILE_N", "5"))

    spark = get_spark(app_name="profile-headliners")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Warm-up identical to bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).schema

    report = {}
    for name in names:
        spec = REGISTRY[name]
        builds, execs, jobs = [], [], []
        plan = None
        for i in range(n_runs):
            sc.setJobDescription(f"profile:{name}:{i}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            jobs.append(j1 - j0)
            if plan is None:
                plan = formatted_plan(df)
        sc.setJobDescription(None)
        report[name] = {
            "build_ms_min": round(min(builds) * 1000, 1),
            "build_ms_mean": round(sum(builds) / len(builds) * 1000, 1),
            "exec_ms_min": round(min(execs) * 1000, 1),
            "exec_ms_mean": round(sum(execs) / len(execs) * 1000, 1),
            "total_ms_min": round(min(b + e for b, e in zip(builds, execs)) * 1000, 1),
            "jobs": jobs[-1],
        }
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(f"{name}: {json.dumps(report[name])}", flush=True)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
