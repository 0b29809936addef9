#!/usr/bin/env python
"""Matched A/B timing of registered queries in ONE session/window.

Usage: python tools/ab_query.py <name>[,<name>...] [sf_dir] [--reps N]

Per query: warmup pass, then min of N timed .count() runs (same action
as bench.py). Prints one line per query. Run it twice around a code
edit (same window) for a matched pair, or rely on the before/after
bench for the committed evidence.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2 and not sys.argv[2].startswith("--")
        else "/root/testdata/sf0.1"
    )
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="quackml-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        qd = REGISTRY[name]
        qd.builder(spark, sf_dir).count()  # warmup
        ts = []
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qd.builder(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(ts):.3f}s  runs "
            + " ".join(f"{t:.3f}" for t in ts),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
