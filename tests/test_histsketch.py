"""Histogram-sketch properties: exact mergeability (union-of-parts ==
sketch-of-whole, bit-identical), quantile estimates within one binary
magnitude of the true quantile, and edge bins."""

from __future__ import annotations

import math


def test_union_of_parts_equals_sketch_of_whole(spark):
    from quackml_spark.operators.histsketch import hist_merge, hist_sketch

    rows = [(i % 3, (i * 37) % 1000 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v long")
    whole = {
        (r["g"], r["bin"]): r["n"]
        for r in hist_sketch(df, "v", ["g"]).collect()
    }
    parts = [
        hist_sketch(df.where(f"v % 4 = {k}"), "v", ["g"]) for k in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {
        (r["g"], r["bin"]): r["n"] for r in hist_merge(u, ["g"]).collect()
    }
    assert merged == whole


def test_quantile_estimate_within_one_magnitude(spark):
    from quackml_spark.operators.histsketch import hist_quantiles, hist_sketch

    vals = sorted((i * 7919) % 5000 + 1 for i in range(1000))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = hist_quantiles(hist_sketch(df, "v")).collect()[0]
    for name, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        true_q = vals[math.ceil(p * len(vals)) - 1]
        est = out[name]
        # the estimate is a bin's inclusive upper bound: it can never
        # undershoot the true quantile and overshoots < 2x
        assert true_q <= est < 2 * true_q, (name, true_q, est)


def test_zero_and_negative_values_bin_separately(spark):
    from quackml_spark.operators.histsketch import hist_sketch

    df = spark.createDataFrame(
        [(0,), (-5,), (1,), (2,), (3,)], "v long"
    )
    bins = {r["bin"]: r["n"] for r in hist_sketch(df, "v").collect()}
    assert bins[-1] == 2          # 0 and -5
    assert bins[0] == 1           # v=1 -> floor(log2)=0
    assert bins[1] == 2           # v in {2,3}
