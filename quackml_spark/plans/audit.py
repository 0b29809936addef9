"""User-facing plan audit: the engine's 100 TB scale rules (SCALE.md
§1, enforced on our own queries by tests/test_plans.py) exposed as a
diagnostic for ANY DataFrame a user is about to run at scale.

`audit_plan(df)` inspects the pre-AQE physical plan and reports the
known scale killers: cartesian products, broadcast-nested-loop joins,
partition-less windows (single-reducer serialization points), and the
exchange (shuffle) count; `explain_scale(df)` renders the same as a
one-row DataFrame for notebooks/SQL users. AQE can improve a plan at
runtime but never un-cartesian one — auditing the declared strategy is
the right time to catch these."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def partitionless_windows(plan: str) -> list[str]:
    """Window specs whose FIRST top-level argument is already a sort
    spec (no partition columns): Spark funnels these through a
    SinglePartition exchange — a one-reducer bottleneck."""
    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, start = m.end(), 1, m.end()
        while depth and i < len(plan):
            depth += plan[i] == "("
            depth -= plan[i] == ")"
            i += 1
        args = plan[start : i - 1]
        first, d = "", 0
        for ch in args:
            if ch == "," and d == 0:
                break
            d += ch == "("
            d -= ch == ")"
            first += ch
        if " ASC" in first or " DESC" in first:
            # the engine's reserved __pid offsets window (ranked_by)
            # runs over a <= n_shards-row per-partition-counts table —
            # config-bounded, never data-sized; recognize its EXACT
            # shape (attribute named __pid + the exclusive running-sum
            # frame), not a bare name prefix a user column could alias
            if re.fullmatch(r"__pid#\d+L? ASC NULLS FIRST", first.strip()) and (
                "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
                in args
            ):
                continue
            out.append(args[:120])
    return out


def audit_plan(df: DataFrame) -> dict:
    """Scale-rule findings for ``df``'s physical plan (see module doc).
    Keys: cartesian_product, broadcast_nested_loop, global_windows
    (list), n_exchanges, clean (no findings)."""
    plan = _formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]
    gw = partitionless_windows(plan)
    res = {
        "cartesian_product": "CartesianProduct" in plan,
        "broadcast_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "global_windows": gw,
        "n_exchanges": sum("Exchange" in ln for ln in tree.splitlines()),
    }
    res["clean"] = not (
        res["cartesian_product"] or res["broadcast_nested_loop"] or gw
    )
    return res


def explain_scale(df: DataFrame) -> DataFrame:
    """One-row DataFrame rendering of :func:`audit_plan`."""
    a = audit_plan(df)
    from quackml_spark.session import local_rows

    return local_rows(
        df.sparkSession,
        [
            (
                a["clean"],
                a["cartesian_product"],
                a["broadcast_nested_loop"],
                len(a["global_windows"]),
                a["n_exchanges"],
            )
        ],
        "clean boolean, cartesian_product boolean, "
        "broadcast_nested_loop boolean, n_global_windows int, "
        "n_exchanges int",
    )
