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


def test_streaming_sketch_merges_across_batches(spark, tmp_path):
    """Force multiple micro-batches (maxFilesPerTrigger=1 over several
    part files): the drained streaming sketch must equal the batch
    sketch — the state-store merge IS hist_merge."""
    from quackml_spark.operators.histsketch import _bin_expr, hist_sketch

    from pyspark.sql import functions as F

    rows = [(i % 4, (i * 131) % 3000 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "g int, v long")
    p = str(tmp_path / "parts")
    df.repartition(3).write.parquet(p)

    batch = {
        (r["g"], r["bin"]): r["n"] for r in hist_sketch(df, "v", ["g"]).collect()
    }
    stream = (
        spark.readStream.schema("g int, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(p)
        .groupBy("g", _bin_expr(F.col("v")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hist_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["g"], r["bin"]): r["n"]
        for r in spark.table("hist_stream_test").collect()
    }
    assert streamed == batch


def test_streaming_corpus_profile_folds_across_batches(spark, tmp_path):
    """Multi-batch live dataset card: volumes and percentiles fold
    EXACTLY across micro-batches; the HLL distinct estimate lands
    within its documented ~2% band of the exact answer."""
    import math

    from pyspark.sql import functions as F

    from quackml_spark.streaming.events import (
        profile_from_state,
        streaming_corpus_profile,
    )

    rows = [
        (i, f"doc {i % 150} body {'x' * (i % 37)}", f"s{i % 2}")
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    src = str(tmp_path / "docs")
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = streaming_corpus_profile(
        stream, state, query_name="profile_fold_test"
    )
    q.awaitTermination()
    card = {r["source"]: r.asDict() for r in profile_from_state(spark, state).collect()}

    exact = {
        r["source"]: r.asDict()
        for r in df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .collect()
    }
    for s in ("s0", "s1"):
        assert card[s]["n_docs"] == exact[s]["n_docs"]
        assert card[s]["total_chars"] == exact[s]["total_chars"]
        est, true = card[s]["distinct_est"], exact[s]["n_distinct"]
        assert math.isclose(est, true, rel_tol=0.05), (s, est, true)


def test_null_values_land_in_bin_minus_one(spark):
    """A NULL value must bin to -1 explicitly: a NULL bin row sorts
    NULLS FIRST in Spark's cumulative window but NULLS LAST under the
    DuckDB oracle's ORDER BY, silently shifting every percentile
    (review catch)."""
    from quackml_spark.operators.histsketch import hist_quantiles, hist_sketch

    df = spark.createDataFrame(
        [(1,), (None,), (0,), (7,), (100,)], "v long"
    )
    sk = {r["bin"]: r["n"] for r in hist_sketch(df, "v").collect()}
    assert None not in sk
    assert sk[-1] == 2  # the NULL and the 0
    out = hist_quantiles(hist_sketch(df, "v")).collect()[0]
    assert out["n_rows"] == 5
    assert out["p50"] is not None


def test_profile_fold_is_idempotent_under_replayed_appends(spark, tmp_path):
    """At-least-once delivery: re-appending one micro-batch's part-state
    rows (same batch_id — exactly what a replayed foreachBatch writes)
    must NOT change the folded card. Without the batch_id dedup the
    volumes double-count (review catch)."""
    from quackml_spark.streaming.events import (
        profile_from_state,
        streaming_corpus_profile,
    )

    rows = [
        (i, f"doc {i % 50} body {'y' * (i % 23)}", f"s{i % 2}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    src = str(tmp_path / "docs")
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = streaming_corpus_profile(stream, state, query_name="profile_replay_test")
    q.awaitTermination()
    before = sorted(
        tuple(r) for r in profile_from_state(spark, state).collect()
    )

    # replay: duplicate the FIRST batch's appends verbatim
    for part in ("volumes", "hll", "hist"):
        p = f"{state}/{part}"
        d = spark.read.parquet(p)
        first = d.agg({"batch_id": "min"}).collect()[0][0]
        d.where(f"batch_id = {first}").write.mode("append").parquet(p)

    after = sorted(
        tuple(r) for r in profile_from_state(spark, state).collect()
    )
    assert after == before
