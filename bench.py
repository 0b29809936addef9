#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every registry query tagged "bench" against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count); a
warmup pass first triggers JVM/codegen warm paths so numbers reflect
steady-state execution, like a long-running cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="quackml-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = {n: qd for n, qd in sorted(REGISTRY.items()) if "bench" in qd.tags}

    # Warmup: run every bench query once so one-time JVM / codegen /
    # MLlib class-loading costs are paid outside the timed pass — the
    # timed numbers then reflect steady-state execution, like a
    # long-running cluster.
    for qd in bench.values():
        qd.builder(spark, sf_dir).count()

    # min of 2 timed runs per query: container CPU contention adds
    # multi-second noise to single samples; the minimum reports the
    # reproducible floor (standard microbenchmark practice). A JVM GC
    # before each query isolates it from garbage accumulated by earlier
    # queries in the shared session (r2 showed uniform +20-30% drift on
    # UNCHANGED queries from exactly this cross-query pressure).
    timings: dict[str, float] = {}
    for name, qd in bench.items():
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qd.builder(spark, sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    out = {
        "metric": "quackml_spark bench: headline queries wall-clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": "per-query: JVM GC, warmup pass, min of 2 timed runs",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
