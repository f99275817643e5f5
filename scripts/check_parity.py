#!/usr/bin/env python
"""Run the driver-style oracle comparison for every registered query.

Usage: python scripts/check_parity.py [sf_dir] [name ...]
Defaults to /root/testdata/sf0.01 (the driver's correctness scale).
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from bigdatacw1_spark.queries import REGISTRY  # noqa: E402
from bigdatacw1_spark.session import get_spark  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or sorted(REGISTRY)
    spark = get_spark(app_name="check-parity")
    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            if spec.oracle:
                compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
                status = "OK   "
            else:
                n = spec.fn(spark, sf_dir).count()
                status = f"ROWS={n}"
        except Exception as e:
            status = "FAIL "
            failures.append((name, e))
            traceback.print_exc()
        print(f"{status} {name}  ({time.time() - t0:.2f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
