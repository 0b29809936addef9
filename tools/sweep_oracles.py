#!/usr/bin/env python
"""Run EVERY oracled registry query (graded + extra) against DuckDB at
an arbitrary SF dir — the full-surface version of the driver's 50-query
correctness gate. pytest covers the full registry at sf0.001; this
sweep catches scale-dependent oracle divergence (decimal overflow,
rank ties, window ordering) the small SF can't expose.

Usage: python tools/sweep_oracles.py [sf_dir] [name_filter]
Exit code = number of failures.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.session import get_spark
    from quackml_spark.testing import compare, duckdb_connection

    _load_all()
    spark = get_spark(app_name="quackml-oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)

    fails: list[tuple[str, str]] = []
    n_checked = 0
    t0 = time.perf_counter()
    for name, qd in sorted(REGISTRY.items()):
        if qd.oracle is None or name_filter not in name:
            continue
        n_checked += 1
        try:
            ok, msg = compare(qd.builder(spark, sf_dir), con, qd.oracle)
        except Exception as e:
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        if not ok:
            fails.append((name, msg))
            print(f"FAIL {name}: {msg[:300]}", flush=True)
    print(
        f"checked {n_checked} oracled queries at {sf_dir}: "
        f"{len(fails)} failed ({time.perf_counter() - t0:.0f}s)"
    )
    spark.stop()
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
