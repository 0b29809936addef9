#!/usr/bin/env python
"""Profile one registered query: capture .explain('formatted') and the
per-stage wall-clock breakdown of a timed run (guide §1/§7 — find WHERE
the time goes before touching anything).

Usage: python tools/profile_query.py <name>[,<name>...] [sf_dir] [--explain-only]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt (default r14)
when SPARK_GRAFT_PLAN_TAG is set
(e.g. before/after); always prints the top stages by duration from the
Spark UI REST API (UI enabled on an ephemeral port for this process).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_stages(port: int) -> list[dict]:
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
    )


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    explain_only = "--explain-only" in sys.argv

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="quackml-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")
    plan_round = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", plan_round)
    os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        qd = REGISTRY[name]
        df = qd.builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if tag:
            p = os.path.join(plan_dir, f"{name}_{tag}.txt")
            with open(p, "w") as fh:
                fh.write(plan)
            print(f"# plan -> {p}")
        else:
            print(plan)
        if explain_only:
            continue
        # timed run with stage attribution: snapshot completed stages,
        # run, diff. (builder re-invoked so lifecycle rows redo their
        # side work, like the bench does)
        before_ids = {(s["stageId"], s["attemptId"]) for s in _ui_stages(port)}
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        qd.builder(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        stages = [
            s
            for s in _ui_stages(port)
            if (s["stageId"], s["attemptId"]) not in before_ids
        ]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in stages)
        print(f"\n== {name}: wall {wall:.2f}s, {len(stages)} stages, "
              f"sum executorRunTime {total_run/1000:.2f}s (over all cores)")
        for s in stages[:18]:
            sub = time.strftime("%H:%M:%S", time.localtime())
            first = (s.get("submissionTime") or "")[11:23]
            print(
                f"  stage {s['stageId']:>4} run {(s.get('executorRunTime') or 0)/1000:7.2f}s "
                f"tasks {s.get('numCompleteTasks', '?'):>3} "
                f"in {(s.get('inputBytes') or 0)>>20:>5}M sh_r {(s.get('shuffleReadBytes') or 0)>>20:>4}M "
                f"sh_w {(s.get('shuffleWriteBytes') or 0)>>20:>4}M @{first} {s.get('name','')[:60]}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
