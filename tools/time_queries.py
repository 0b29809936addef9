#!/usr/bin/env python
"""Time registered queries across scale dirs — the SCALE.md sweep
protocol (§12/§14/§23): one warmup pass, then min-of-2 timed runs per
(query, SF), local[32]. Spark wall-clock only (oracle replays are the
sweep tool's job); per-query fault isolation so one blow-up doesn't
lose the row.

Usage: python tools/time_queries.py q34_pagerank_trade_graph,q38_... \
           /root/testdata/sf0.01 /root/testdata/sf0.1 [...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.1"]

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="quackml-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        qd = REGISTRY[name]
        for sf in sf_dirs:
            try:
                spark.sparkContext._jvm.System.gc()
                qd.builder(spark, sf).collect()  # warm
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = len(qd.builder(spark, sf).collect())
                    ts.append(time.perf_counter() - t0)
                print(
                    f"{name} @ {sf}: min {min(ts):.2f}s "
                    f"(runs {[round(t, 2) for t in ts]}, {n} rows)",
                    flush=True,
                )
            except Exception:
                err = traceback.format_exc(limit=2).strip().splitlines()[-1]
                print(f"{name} @ {sf}: ERROR {err[:200]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
