"""General asof_join vs DuckDB's native ASOF JOIN, both directions."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.operators.joins import asof_join
from quackml_spark.sources import load_table


def _duck_pairs(duck, direction):
    # compare the matched TIMESTAMP, not the row id: when several right
    # rows share (key, ts), DuckDB's ASOF picks an unspecified one while
    # asof_join picks the greatest payload deterministically — the
    # as-of semantics (which instant matched) are what both must agree on.
    op = ">=" if direction == "backward" else "<="
    rows = duck.execute(f"""
        SELECT e.event_id, o.o_orderdate
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts {op} o.o_orderdate
        ORDER BY e.event_id
    """).fetchall()
    return {r[0]: r[1] for r in rows}


def test_asof_backward_matches_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(ev, orders, on="ts", by_left="user_id", by_right="o_custkey")
    got = {r["event_id"]: r["ts_right"] for r in out.collect()}
    want = _duck_pairs(duck, "backward")
    assert got == want


def test_asof_forward_matches_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(
        ev, orders, on="ts", by_left="user_id", by_right="o_custkey",
        direction="forward",
    )
    got = {r["event_id"]: r["ts_right"] for r in out.collect()}
    want = _duck_pairs(duck, "forward")
    assert got == want


def test_asof_null_right_rows_never_match(spark):
    """A right row with NULL ts (or NULL key) must not be carried as a
    match — SQL ASOF/merge_asof semantics (code-review catch: NULLs
    sort first in the ascending window, so an unfiltered null-ts row's
    payload landed on every left row with no real match)."""
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "event_id bigint, k bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [(999, 1, None), (888, None, "2024-01-01 09:00:00")],
        "quote_id bigint, k bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(ev, quotes, on="ts", by_left="k", by_right="k").collect()
    assert len(out) == 1 and out[0]["quote_id"] is None


def test_asof_tie_breaks_to_greatest_payload(spark):
    """Two right rows at the identical (key, ts): the greatest payload
    struct wins, deterministically, on every run."""
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "event_id bigint, k bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [(7, 1, "2024-01-01 09:00:00"), (9, 1, "2024-01-01 09:00:00")],
        "quote_id bigint, k bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for _ in range(3):
        out = asof_join(ev, quotes, on="ts", by_left="k", by_right="k").collect()
        assert out[0]["quote_id"] == 9


def test_asof_tolerance_nulls_stale_matches(spark):
    # key 1: quote 10 s before the trade (fresh); key 2: quote 1 h
    # before (stale under a 60 s tolerance). Left rows always survive.
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 2, "2024-01-01 10:00:00")],
        "event_id bigint, k bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [(101, 1, "2024-01-01 09:59:50"), (202, 2, "2024-01-01 09:00:00")],
        "quote_id bigint, k bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    loose = asof_join(ev, quotes, on="ts", by_left="k", by_right="k")
    tight = asof_join(
        ev, quotes, on="ts", by_left="k", by_right="k", tolerance_seconds=60.0
    )
    assert {r["event_id"]: r["quote_id"] for r in loose.collect()} == {1: 101, 2: 202}
    assert {r["event_id"]: r["quote_id"] for r in tight.collect()} == {1: 101, 2: None}
    assert tight.count() == ev.count()  # left rows all kept


def test_asof_plan_single_shuffle_no_range_explosion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(ev, orders, on="ts", by_left="user_id", by_right="o_custkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_property_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof — the canonical
    as-of semantics (backward + forward, inclusive, left rows kept).
    Matched TIMESTAMPS are compared (pandas breaks payload ties by
    input order, asof_join by greatest payload — the matched instant is
    the defined semantics both must share)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(4):
        n_l, n_r = 40, 30
        base = pd.Timestamp("2024-01-01")
        left = pd.DataFrame({
            "k": rng.integers(0, 4, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 1000, n_l), unit="s"),
            "lid": np.arange(n_l),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 4, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 1000, n_r), unit="s"),
            "rid": np.arange(n_r),
        })
        for direction in ("backward", "forward"):
            want_df = pd.merge_asof(
                left.sort_values("ts", kind="mergesort"),
                right.sort_values("ts", kind="mergesort").rename(
                    columns={"ts": "r_ts"}
                ),
                left_on="ts",
                right_on="r_ts",
                by="k",
                direction=direction,
            )
            want = {
                int(r.lid): (None if pd.isna(r.r_ts) else r.r_ts)
                for r in want_df.itertuples()
            }
            out = asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="ts",
                by_left="k",
                by_right="k",
                direction=direction,
            ).collect()
            got = {
                int(r["lid"]): (None if r["ts_right"] is None else pd.Timestamp(r["ts_right"]))
                for r in out
            }
            assert got == want, f"trial {trial} {direction}"


def test_interval_join_point_in_time_matches_duckdb(spark, sf_dir, duck):
    """SCD2 point-in-time: build per-user interval history from events
    (q29 shape), probe each order date into it, and match DuckDB's
    explicit range join row-for-row (including out-of-range NULLs)."""
    from quackml_spark.operators.joins import interval_join
    from quackml_spark.sources import load_table

    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    intervals = ev.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(win).alias("valid_to"),
    )
    probes = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("user_id"),
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 32 YEARS")).alias("at"),
    )
    out = interval_join(
        probes, intervals, on="at", by_left="user_id", by_right="user_id"
    )
    got = {r["o_orderkey"]: r["version_id"] for r in out.collect()}

    want_rows = duck.execute("""
        WITH iv AS (
          SELECT user_id, event_id AS version_id, ts AS valid_from,
                 LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
          FROM events
        )
        SELECT o.o_orderkey, iv.version_id
        FROM (SELECT o_orderkey, o_custkey,
                     o_orderdate + INTERVAL 32 YEAR AS at FROM orders) o
        LEFT JOIN iv
          ON iv.user_id = o.o_custkey
         AND iv.valid_from <= o.at
         AND (iv.valid_to IS NULL OR o.at < iv.valid_to)
    """).fetchall()
    want = {r[0]: r[1] for r in want_rows}
    assert got == want
    assert any(v is not None for v in got.values())
    assert any(v is None for v in got.values())


def test_asof_tolerance_on_date_columns(spark):
    """tolerance_seconds on a DATE 'on' column must work: DATE cannot
    cast straight to DOUBLE, so the tolerance path crashed with an
    AnalysisException on inputs the tolerance-less join handled fine
    (review catch)."""
    left = spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-03-01")], "id long, d string"
    ).select("id", F.lit(1).alias("k"), F.to_date("d").alias("d"))
    right = spark.createDataFrame(
        [("2024-01-08", 100.0)], "d string, px double"
    ).select(F.lit(1).alias("k"), F.to_date("d").alias("d"), "px")
    out = {
        r["id"]: r["px"]
        for r in asof_join(
            left, right, on="d", by_left="k", by_right="k",
            tolerance_seconds=7 * 86400,
        ).collect()
    }
    assert out[1] == 100.0       # 2 days back, inside tolerance
    assert out[2] is None        # 53 days back, outside


def test_range_point_join_overlapping_and_negatives(spark):
    """Overlapping unkeyed intervals: each qualifying (point, interval)
    pair appears EXACTLY once (a point has one bucket), boundaries are
    inclusive, negative domains bucket correctly (trunc-div is
    monotone), and the plan is an equi-join — no cartesian /
    broadcast-nested-loop."""
    from quackml_spark.operators.joins import range_point_join

    points = spark.createDataFrame(
        [(-15,), (-10,), (0,), (5,), (10,), (25,)], "p long"
    )
    intervals = spark.createDataFrame(
        [(1, -12, 6), (2, 0, 10), (3, 4, 30), (4, 100, 110)],
        "iid long, lo long, hi long",
    )
    out = range_point_join(points, intervals, "p", "lo", "hi", bucket_width=7)
    got = sorted((r["p"], r["iid"]) for r in out.collect())
    want = sorted(
        (p, i)
        for p in (-15, -10, 0, 5, 10, 25)
        for i, lo, hi in [(1, -12, 6), (2, 0, 10), (3, 4, 30), (4, 100, 110)]
        if lo <= p <= hi
    )
    assert got == want
    # no pair twice, boundary point 10 matched interval 2 (hi inclusive)
    assert len(got) == len(set(got)) and (10, 2) in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # default width derives from the MEDIAN interval length (r13)
    auto = range_point_join(points, intervals, "p", "lo", "hi")
    assert sorted((r["p"], r["iid"]) for r in auto.collect()) == want


def test_range_point_join_heavy_tail_and_span_cap(spark):
    """The r12 foot-gun: one mega-interval (10^6 : 1 length skew)
    inflated the MEAN default width so points fanned into few giant
    buckets. The median default must keep the width at the typical
    interval length, results must equal the brute-force theta truth,
    and max_span_buckets (two-stage explode) must not change a single
    pair while bounding per-task fan-out."""
    from quackml_spark.operators.joins import range_point_join

    # 200 unit-ish intervals + ONE spanning the whole domain
    ivals = [(i, 10 * i, 10 * i + 4) for i in range(200)]
    ivals.append((999, 0, 4_000_000))
    pts = [(37 * i % 2100,) for i in range(300)] + [(3_999_999,), (2_500_000,)]
    points = spark.createDataFrame(pts, "p long")
    intervals = spark.createDataFrame(ivals, "iid long, lo long, hi long")
    want = sorted(
        (p, i) for (p,) in pts for i, lo, hi in ivals if lo <= p <= hi
    )

    auto = range_point_join(points, intervals, "p", "lo", "hi")
    assert sorted((r["p"], r["iid"]) for r in auto.collect()) == want

    capped = range_point_join(
        points, intervals, "p", "lo", "hi", max_span_buckets=1000
    )
    assert sorted((r["p"], r["iid"]) for r in capped.collect()) == want

    # the median default is typical-length-sized: the mega-interval
    # explodes to ~4e6/5 buckets under it, which the 2 s budget below
    # could not survive if the width had collapsed to 1 — and the MEAN
    # default would be ~20k wide, fanning every point into buckets
    # shared with ~2000 others. Pin the chosen width via the exact
    # quantile the default uses.
    from quackml_spark.operators.profile import exact_quantiles
    from pyspark.sql import functions as F

    med = exact_quantiles(
        intervals.select((F.col("hi") - F.col("lo")).alias("len")),
        "len",
        ps=((1, 2),),
    ).first()["value"]
    assert med == 4  # typical length, untouched by the outlier
