#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every registry query tagged "bench" against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count); a
warmup pass first triggers JVM/codegen warm paths so numbers reflect
steady-state execution, like a long-running cluster.

Fault isolation: every query (warmup and timed) runs under try/except —
one failing query is recorded in "errors" and CANNOT zero out the other
queries' numbers (r5 lost all 20 timings to a single AnalysisException).
If the JVM/session itself dies, the session is rebuilt and the run
continues.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback


def _fresh_session():
    from quackml_spark.session import get_spark

    spark = get_spark(app_name="quackml-bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _session_alive(spark) -> bool:
    try:
        spark.sql("SELECT 1").count()
        return True
    except Exception:
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    spark = _fresh_session()

    bench = {n: qd for n, qd in sorted(REGISTRY.items()) if "bench" in qd.tags}
    errors: dict[str, str] = {}

    # Warmup: run every bench query once so one-time JVM / codegen /
    # MLlib class-loading costs are paid outside the timed pass — the
    # timed numbers then reflect steady-state execution, like a
    # long-running cluster.
    for name, qd in bench.items():
        try:
            qd.builder(spark, sf_dir).count()
        except Exception:
            errors[name] = traceback.format_exc(limit=2).strip().splitlines()[-1]
            if not _session_alive(spark):
                spark = _fresh_session()

    # min of 2 timed runs per query: container CPU contention adds
    # multi-second noise to single samples; the minimum reports the
    # reproducible floor (standard microbenchmark practice). A JVM GC
    # before each query isolates it from garbage accumulated by earlier
    # queries in the shared session (r2 showed uniform +20-30% drift on
    # UNCHANGED queries from exactly this cross-query pressure).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name, qd in bench.items():
        if name in errors:
            continue
        try:
            spark.sparkContext._jvm.System.gc()
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                df = qd.builder(spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception:
            errors[name] = traceback.format_exc(limit=2).strip().splitlines()[-1]
            if not _session_alive(spark):
                spark = _fresh_session()

    out = {
        "metric": "quackml_spark bench: headline queries wall-clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": f"per-query: JVM GC, warmup pass, min of {repeats} "
        "timed runs; per-query fault isolation (failures in 'errors', not "
        "fatal)",
        "repeats": repeats,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
