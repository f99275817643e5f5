#!/usr/bin/env python
"""Headline benchmark (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully materialized (collect) — the timing includes scan,
shuffle, and result retrieval. A warm-up action runs first so JVM/codegen
startup is not charged to the first query.

Each query runs $SPARK_GRAFT_BENCH_N times (default 5). The headline
"queries" map carries the per-query MINIMUM (queries are deterministic and
side-effect-free, so the min is the least-noise estimate of the plan's true
cost — JIT warmup, GC pauses and page-cache misses only ever ADD time), and
"queries_detail" carries {min, mean, runs: [...]} per query so any round can
be compared to any other on either basis (the r2→r3 single-run → min-of-5
switch destroyed the trend line; this keeps both statistics forever).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatacw1_spark.queries import REGISTRY  # noqa: E402
from bigdatacw1_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    spark = get_spark(app_name="bigdatacw1-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in REGISTRY.items() if s.headline}

    # Warm-up: touch the biggest fact once (JVM + codegen + file listing)
    # and every table's footer (schema read), so per-query timings measure
    # the query, not first-contact file listing.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).schema

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_N", "5"))

    # Contention sentinel (VERDICT r4 #8): a fixed single-core CPython
    # spin timed before and after the suite. A JVM query probe cannot
    # play this role — C2 keeps compiling across the whole run, so the
    # same query speeds up 2× start→end on an IDLE box (measured) and
    # flags every file. The spin has no JIT and constant work; its wall
    # time inflates only when every core is busy — exactly the neighbor
    # contention that skews query timings (~15% per the r4 notes). Flag
    # at >10% divergence between the two probes (min-of-3 each).
    def probe() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0
            for i in range(10_000_000):
                acc += i
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    sentinel_start = probe()

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in sorted(headline):
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            headline[name].fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        detail[name] = {
            "min": min(runs),
            "mean": round(sum(runs) / len(runs), 3),
            "runs": runs,
        }

    sentinel_end = probe()
    lo, hi = sorted([sentinel_start, sentinel_end])
    contended = bool(lo > 0 and (hi - lo) / lo > 0.10)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_detail": detail,
        "method": f"min-of-{n_runs}; first run per query is cold (see runs[0])",
        # r5 drift investigation (VERDICT r4 #9): three back-to-back idle
        # runs of this suite spanned 9.57-10.15s total (±6% run-to-run,
        # per-query up to ±15% on the sub-second entries), with plan
        # shapes unchanged — the r3→r4 "+8% fleet drift" sits inside that
        # spread, i.e. run-to-run variance, not a setup or plan
        # regression. Compare rounds on the min over multiple FILES, or
        # on the >1s queries only, before reading anything into <10%.
        "run_to_run_note": "idle-box total varies ±6% between bench invocations",
        "sentinel": {
            "probe": "cpython-spin-10M",
            "start_sec": sentinel_start,
            "end_sec": sentinel_end,
            "contended": contended,
        },
        "sf": sf,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
