from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.plans import REGISTRY, _load_all
from quackml_spark.plans.relational import q07_events_hourly
from quackml_spark.streaming.events import (
    read_event_stream,
    run_to_completion,
    streaming_transform,
)

_load_all()


def test_streaming_equals_batch(spark, sf_dir):
    stream_out = REGISTRY["streaming_events_hourly"].builder(spark, sf_dir)
    batch = q07_events_hourly(spark, sf_dir).select(
        "hour", "event_type", "n_events", "sum_value"
    )
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_sessionize_equals_batch_oracle(spark, sf_dir):
    """The stateful streaming sessionizer must match q18_sessionize_batch
    (which is itself DuckDB-oracle-checked) — so the streaming operator's
    semantics are transitively oracle-verified."""
    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        sessionize,
    )

    q18 = REGISTRY["q18_sessionize_batch"].builder(spark, sf_dir)
    batch = q18.groupBy("user_id").agg(
        F.max("session_no").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
    s_out = run_to_completion(
        sessionize(read_event_stream(spark, sf_dir), gap="30 minutes"),
        "qml_test_sess_eq",
    )
    stream = s_out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
    assert {tuple(r) for r in batch.collect()} == {tuple(r) for r in stream.collect()}


def test_sessionize_counts(spark, sf_dir):
    out = REGISTRY["streaming_sessionize"].builder(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_sessions"] >= 1 for r in rows)


def test_streaming_transform(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    enriched = streaming_transform(
        stream.withColumn("text", F.col("event_type")), "text-classification", "text"
    )
    out = run_to_completion(
        enriched.select("event_id", "transform_result"),
        "qml_test_stream_transform",
        output_mode="append",
    )
    assert out.count() > 0
    assert out.where(F.col("transform_result").isNull()).count() == 0


def test_streaming_predict_equals_batch(spark, sf_dir, tmp_path):
    """Stream scoring (portable UDF) must match batch predict() (MLlib
    transform) on the same rows."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import predict, train
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        streaming_predict,
    )

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    feats = lambda df: df.select(
        "event_id" if "event_id" in df.columns else F.lit(None).alias("event_id"),
        F.col("user_id").cast("double").alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        *([F.col("value")] if "value" in df.columns else []),
    )
    batch = load_table(spark, sf_dir, "events")
    train(
        spark, "sp eq", task="regression",
        df=feats(batch).drop("event_id"), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    scored_stream = run_to_completion(
        streaming_predict(
            feats(read_event_stream(spark, sf_dir)).drop("value"),
            "sp eq", catalog=catalog,
        ).select("event_id", "prediction"),
        "qml_sp_eq", output_mode="append",
    )
    scored_batch = predict(
        feats(batch).drop("value"), "sp eq", catalog=catalog
    ).select("event_id", F.col("prediction").alias("bpred"))
    joined = scored_stream.join(scored_batch, "event_id")
    bad = joined.where(F.abs(F.col("prediction") - F.col("bpred")) > 1e-6).count()
    assert bad == 0
    assert scored_stream.count() == batch.count()


def test_ewma_cross_batch_state(spark, sf_dir, tmp_path):
    """applyInPandasWithState must carry per-user state ACROSS
    micro-batches: the stream is split into two time-ordered files
    processed one per trigger, and the resulting EWMAs must equal a
    single-pass batch computation."""
    import time as _time

    import pandas as pd

    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import ewma_stream

    events = load_table(spark, sf_dir, "events")
    pdf = events.select("user_id", "event_id", "ts", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    cut = pdf["ts"].median()
    d = tmp_path / "stream_in"
    d.mkdir()
    spark.createDataFrame(pdf[pdf.ts <= cut]).coalesce(1).write.parquet(
        str(d / "part0")
    )
    _time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(pdf[pdf.ts > cut]).coalesce(1).write.parquet(
        str(d / "part1")
    )
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d) + "/part*")
    )
    q = (
        ewma_stream(stream, alpha=0.3)
        .writeStream.format("memory")
        .queryName("qml_ewma_2batch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.table("qml_ewma_2batch").collect()
    }
    # single-pass batch expectation
    exp = {}
    last: dict = {}
    for _, row in pdf.iterrows():
        u, v = row["user_id"], float(row["value"])
        last[u] = v if u not in last else 0.3 * v + 0.7 * last[u]
        exp[row["event_id"]] = last[u]
    assert len(got) == len(exp)
    bad = [k for k in exp if abs(got[k] - exp[k]) > 1e-9]
    assert not bad, f"{len(bad)} mismatches, e.g. {bad[:3]}"


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed aggregation must DROP an event that arrives
    after the watermark passed its window. Two separate runs share a
    checkpoint, so the watermark persists between them like a restarted
    production stream."""
    import pandas as pd

    from quackml_spark.streaming.events import streaming_hourly_aggregate

    base = pd.Timestamp("2024-01-01 10:00:00")

    def mk(rows):
        return pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": [base + pd.Timedelta(minutes=m) for m, _ in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [v for _, v in rows],
                "props": ["{}"] * len(rows),
            }
        )

    src = tmp_path / "late_in"
    src.mkdir()
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(str(src))
        q = (
            streaming_hourly_aggregate(stream, watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: 10:05..11:55 -> watermark persists at 11:25; the [10:00,11:00)
    # window finalizes and is emitted
    spark.createDataFrame(
        mk([(5, 1.0), (20, 1.0), (65, 1.0), (115, 1.0)])
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # run 2: one LATE event at 09:30 — its window closed when the
    # watermark passed 10:00 — plus an on-time event at 12:05
    spark.createDataFrame(mk([(-30, 99.0), (125, 1.0)])).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()

    out = {
        r["hour"]: r["n_events"] for r in spark.read.parquet(out_dir).collect()
    }
    assert "2024-01-01 09:00:00" not in out, out
    assert out.get("2024-01-01 10:00:00") == 2, out


def test_streaming_dedup_equals_batch_first_per_key(spark, sf_dir):
    from quackml_spark.plans import REGISTRY

    n_stream = REGISTRY["streaming_dedup_events"].builder(spark, sf_dir).collect()[0][
        "n_kept"
    ]
    from quackml_spark.sources import load_table

    n_batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n_stream == n_batch


def test_stream_stream_join_equals_batch_lookback(spark, sf_dir):
    """The stream-stream lookback self-join must produce exactly the
    pair counts that the oracle-checked batch RANGE-frame window (q19)
    reports per event."""
    from quackml_spark.plans import REGISTRY
    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        stream_stream_lookback_join,
    )

    joined = stream_stream_lookback_join(read_event_stream(spark, sf_dir))
    out = run_to_completion(
        joined.select("l_event", "r_event"), "qml_ss_join", output_mode="append"
    )
    stream_counts = {
        r["l_event"]: r["n"]
        for r in out.groupBy("l_event").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch = REGISTRY["q19_events_lookback_window"].builder(spark, sf_dir)
    batch_counts = {
        r["event_id"]: r["n_prior_30m"]
        for r in batch.collect()
        if r["n_prior_30m"] > 0
    }
    assert stream_counts == batch_counts


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Restarting a checkpointed file-sink stream over the same source
    emits NOTHING new: the checkpoint records the processed files, so a
    crash/redeploy cannot double-write output — the exactly-once
    contract a production ingest job relies on."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        ev = read_event_stream(spark, sf_dir).select(
            "event_id", "user_id", "value"
        )
        q = (
            ev.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    run_once()  # same checkpoint, no new source files -> no new rows
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_streaming_predict_numpy_ensemble(spark, sf_dir, tmp_path):
    """Non-portable numpy-backend models (CART bagging here) also score
    streams: the parameter dump rides the pandas-UDF closure. Stream
    output must equal batch predict row-for-row."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import predict, train
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        streaming_predict,
    )

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    feats = lambda df: df.select(
        "event_id" if "event_id" in df.columns else F.lit(None).alias("event_id"),
        F.col("user_id").cast("double").alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        *([F.col("value")] if "value" in df.columns else []),
    )
    batch = load_table(spark, sf_dir, "events")
    res = train(
        spark, "sp np", task="regression",
        df=feats(batch).drop("event_id"), y_column_name="value",
        algorithm="bagging", hyperparams={"n_estimators": 3, "max_depth": 4},
        catalog=catalog, test_sampling="random",
    )
    assert res.metrics["backend"] == "numpy"
    scored_stream = run_to_completion(
        streaming_predict(
            feats(read_event_stream(spark, sf_dir)).drop("value"),
            "sp np", catalog=catalog,
        ).select("event_id", "prediction"),
        "qml_sp_np", output_mode="append",
    )
    scored_batch = predict(
        feats(batch).drop("value"), "sp np", catalog=catalog
    ).select("event_id", F.col("prediction").alias("bpred"))
    joined = scored_stream.join(scored_batch, "event_id")
    bad = joined.where(F.abs(F.col("prediction") - F.col("bpred")) > 1e-9).count()
    assert bad == 0
    assert scored_stream.count() == batch.count()


def test_drift_monitor_on_scoring_stream(spark, sf_dir, tmp_path):
    """foreachBatch PSI over streaming_predict output: a planted shift
    on an input feature MUST be flagged, and the unshifted control run
    must stay quiet — the monitor hook is only useful if both hold."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        drift_monitor_stream,
        read_event_stream,
        streaming_predict,
    )

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    feats = lambda df, shift=0.0: df.select(
        (F.col("user_id").cast("double") + F.lit(shift)).alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        *([F.col("value")] if "value" in df.columns else []),
    )
    batch = load_table(spark, sf_dir, "events")
    train(
        spark, "drift mon", task="regression",
        df=feats(batch), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    reference = feats(batch).drop("value")

    def run(shift):
        alerts: list = []
        q = drift_monitor_stream(
            streaming_predict(
                feats(read_event_stream(spark, sf_dir), shift).drop("value"),
                "drift mon", catalog=catalog,
            ),
            reference,
            ["f_user"],
            sink=alerts,
            query_name=f"qml_drift_{int(shift)}",
        )
        q.awaitTermination()
        return alerts

    quiet = run(shift=0.0)
    assert quiet and not any(a["drift"] for a in quiet), quiet
    # shift f_user far outside the reference span → PSI must fire
    loud = run(shift=1e6)
    assert loud and all(a["drift"] for a in loud if a["feature"] == "f_user"), loud


def test_streaming_bloom_dedup_cross_batch(spark, sf_dir, tmp_path):
    """The Bloom bitmap must persist ACROSS micro-batches: duplicates of
    batch-0 keys arriving in batch 1 are dropped, and every key keeps
    exactly one survivor (no false positives at 2^17 bits for this key
    cardinality). Mirrors the ewma two-file split."""
    import time as _time

    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_bloom_dedup

    events = load_table(spark, sf_dir, "events")
    pdf = (
        events.select("user_id", "event_id", "ts", "value", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    cut = pdf["ts"].median()
    d = tmp_path / "bloom_stream_in"
    d.mkdir()
    spark.createDataFrame(pdf[pdf.ts <= cut]).coalesce(1).write.parquet(str(d / "p0"))
    _time.sleep(1.1)
    spark.createDataFrame(pdf[pdf.ts > cut]).coalesce(1).write.parquet(str(d / "p1"))
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d) + "/p*")
    )
    q = (
        streaming_bloom_dedup(stream, ["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName("qml_bloom_dedup_2batch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = spark.table("qml_bloom_dedup_2batch").collect()
    n_exact = (
        events.select("user_id", "event_type").distinct().count()
    )
    # no duplicates survive; at this cardinality vs 32x2^17 bits the
    # false-positive expectation is << 1, so the count is exact
    assert len(kept) == n_exact, (len(kept), n_exact)
    # and cross-batch specifically: keys present in BOTH halves must
    # keep only their batch-0 occurrence
    import pandas as _pd

    both = _pd.merge(
        pdf[pdf.ts <= cut][["user_id", "event_type"]].drop_duplicates(),
        pdf[pdf.ts > cut][["user_id", "event_type"]].drop_duplicates(),
    )
    assert len(both) > 0, "fixture must exercise cross-batch duplicates"


def test_streaming_bloom_dedup_registered_query(spark, sf_dir):
    """The registered row returns the kept KEY SET; at the 512 KiB
    default sizing the test corpus has no false positives, so it must
    equal the exact distinct-key relation."""
    from quackml_spark.plans import REGISTRY
    from quackml_spark.sources import load_table

    got = sorted(
        map(
            tuple,
            REGISTRY["streaming_bloom_dedup_events"]
            .builder(spark, sf_dir)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .distinct()
            .collect(),
        )
    )
    assert got == want and got


def test_streaming_bloom_dedup_false_positive_oracle_branch(spark, tmp_path):
    """The registered oracle's false-positive predicate (a key drops
    iff each of its k positions is covered by an earlier-first-
    occurring key in its shard — valid because the bitmap is always
    the UNION of all processed keys' bits, kept or dropped) must match
    the engine's sequential bitmap EXACTLY. The testdata never
    collides at 512 KiB, so force collisions: m_bits=64, one shard,
    200 keys — dozens of genuine false positives."""
    from quackml_spark.streaming.events import (
        _bloom_positions,
        streaming_bloom_dedup,
    )

    n, m_bits, k = 200, 64, 2
    rows = [(i, 1000 + i, f"t{i}") for i in range(n)]  # ts=i, uid, etype
    src = tmp_path / "fp_in"
    spark.createDataFrame(
        rows, "ts long, user_id long, event_type string"
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "ts long, user_id long, event_type string"
    ).parquet(str(src))
    q = (
        streaming_bloom_dedup(
            stream, ["user_id", "event_type"], n_shards=1, m_bits=m_bits, k=k
        )
        .select("user_id")
        .writeStream.format("memory")
        .queryName("qml_bloom_fp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["user_id"] for r in spark.table("qml_bloom_fp").collect())

    # the oracle predicate, replayed: first-occurrence order is ts
    # order here (unique ts per key), coverage is vs ALL earlier keys
    seen_union: set[int] = set()
    want = []
    for i in range(n):
        pos = set(_bloom_positions(f"{1000 + i}\x1ft{i}", k, m_bits))
        if not pos <= seen_union:
            want.append(1000 + i)
        seen_union |= pos
    assert 0 < len(want) < n, "fixture must force real false positives"
    assert got == want


def test_bloom_state_version_guard():
    """Persisted Bloom blobs carry a layout-version byte; unversioned
    blobs (the pre-r9 layout — same length, DIFFERENT bit layout after
    the r8 _bloom_positions fix) must be refused loudly, never
    silently reinterpreted (advisor catch)."""
    import pytest as _pytest

    from quackml_spark.streaming.events import (
        _BLOOM_STATE_V,
        _bloom_state_decode,
    )

    m_bits = 1 << 10
    bitmap = bytes(m_bits // 8)
    # current layout round-trips
    assert _bloom_state_decode(bytes([_BLOOM_STATE_V]) + bitmap, m_bits) == bytearray(
        bitmap
    )
    # legacy unversioned blob (exactly m_bits//8 bytes): rejected
    with _pytest.raises(ValueError, match="FRESH"):
        _bloom_state_decode(bitmap, m_bits)
    # wrong version byte: rejected
    with _pytest.raises(ValueError, match="FRESH"):
        _bloom_state_decode(bytes([_BLOOM_STATE_V + 1]) + bitmap, m_bits)
    # m_bits mismatch (different blob length): rejected
    with _pytest.raises(ValueError, match="FRESH"):
        _bloom_state_decode(bytes([_BLOOM_STATE_V]) + bitmap, m_bits * 2)


def test_streaming_bloom_dedup_generic_schema(spark, tmp_path):
    """The operator must work on ANY keyed stream, not just the events
    fixture: a document stream keyed by doc_id keeps one row per key
    and preserves the full input schema in the output."""
    from quackml_spark.streaming.events import streaming_bloom_dedup

    d = tmp_path / "docs_stream"
    d.mkdir()
    rows = [(i % 7, f"text-{i % 7}", float(i)) for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, body string, score double"
    ).coalesce(1).write.parquet(str(d / "p0"))
    stream = (
        spark.readStream.schema("doc_id long, body string, score double")
        .parquet(str(d) + "/p*")
    )
    q = (
        streaming_bloom_dedup(stream, ["doc_id"])
        .writeStream.format("memory")
        .queryName("qml_bloom_generic")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = spark.table("qml_bloom_generic").collect()
    assert sorted(kept[0].asDict()) == ["body", "doc_id", "score"]
    assert sorted(r["doc_id"] for r in kept) == list(range(7))
    # deterministic survivor: stable sort keeps the lowest score row
    assert all(r["score"] == float(r["doc_id"]) for r in kept)


def test_streaming_countmin_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Constant-state streaming CM: cells accumulate across batches, and
    a key emitted in the final batch carries exactly the estimate the
    batch-built sketch over ALL rows would give (same md5 cell map,
    n_shards=1). Estimates never undercount the true count."""
    import time as _time

    from pyspark.sql import functions as F

    from quackml_spark.operators.text import countmin_build, countmin_estimate
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_countmin

    events = load_table(spark, sf_dir, "events")
    pdf = (
        events.select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    cut = pdf["ts"].median()
    d = tmp_path / "cm_stream_in"
    d.mkdir()
    spark.createDataFrame(pdf[pdf.ts <= cut]).coalesce(1).write.parquet(str(d / "p0"))
    _time.sleep(1.1)
    spark.createDataFrame(pdf[pdf.ts > cut]).coalesce(1).write.parquet(str(d / "p1"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d) + "/p*")
    )
    q = (
        streaming_countmin(stream, "event_type", n_shards=1)
        .writeStream.format("memory")
        .queryName("qml_cm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("qml_cm_stream").toPandas()
    # last emission per key = estimate over the full prefix
    last = emitted.groupby("key")["cm_estimate"].last()

    items = events.select(F.col("event_type").cast("string").alias("gram"))
    sketch = countmin_build(items)
    keys = items.distinct()
    batch = {
        r["gram"]: r["cm_estimate"]
        for r in countmin_estimate(keys, sketch).collect()
    }
    true_counts = {
        r["gram"]: r["n"]
        for r in items.groupBy("gram").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every key that appears in the final batch must match the batch
    # sketch exactly — which also pins the never-undercount bound,
    # since countmin_estimate >= true_count by construction
    final_keys = set(pdf[pdf.ts > cut]["event_type"].unique())
    assert final_keys, "fixture must put keys in the final batch"
    for k in final_keys:
        assert last[k] == batch[k], (k, last[k], batch[k])
        assert batch[k] >= true_counts[k]


def test_auto_rollback_on_drift(spark, sf_dir, tmp_path):
    """Drift must TRIGGER the rollback deployment strategy exactly once:
    train two models (v1 then v2 deployed), stream drifted features ->
    the deployment flips back to v1; a quiet stream leaves it alone."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        auto_rollback_on_drift,
        read_event_stream,
        streaming_predict,
    )

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    feats = lambda df, shift=0.0: df.select(
        (F.col("user_id").cast("double") + F.lit(shift)).alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        *([F.col("value")] if "value" in df.columns else []),
    )
    batch = load_table(spark, sf_dir, "events")
    r1 = train(
        spark, "rb proj", task="regression",
        df=feats(batch), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    r2 = train(
        spark, "rb proj", task="regression", algorithm="ridge",
        df=feats(batch), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    from quackml_spark.ml.predict import deploy

    deploy("rb proj", strategy="specific", model_id=r2.model_id, catalog=catalog)
    reference = feats(batch).drop("value")

    def run(shift, qname):
        alerts: list = []
        q = auto_rollback_on_drift(
            streaming_predict(
                feats(read_event_stream(spark, sf_dir), shift).drop("value"),
                "rb proj", catalog=catalog,
            ),
            reference,
            ["f_user"],
            "rb proj",
            catalog=catalog,
            sink=alerts,
            query_name=qname,
        )
        q.awaitTermination()
        return alerts

    def deployed_id():
        dm = catalog.deployed_models()
        return int(dm.iloc[0]["model_id"])

    quiet = run(0.0, "qml_rb_quiet")
    assert quiet and not any(a["drift"] for a in quiet)
    assert deployed_id() == r2.model_id  # still the challenger

    loud = run(1e6, "qml_rb_loud")
    assert any(a["drift"] for a in loud)
    rollbacks = [a["rolled_back_to"] for a in loud if a["rolled_back_to"]]
    assert rollbacks, loud
    assert deployed_id() == r1.model_id  # rolled back to v1


def test_streaming_topk_cross_batch_state(spark, sf_dir, tmp_path):
    """transformWithStateInPandas running top-k: with the event stream
    split into multiple micro-batches, each user's final leaderboard
    (row with max n_seen) must equal the batch top-k over ALL their
    events — only true if state carries across batches."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (auto-promotes "
        "the moment it is installed, like tests/test_live_backends.py)",
    )
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_topk

    batch = load_table(spark, sf_dir, "events").select("user_id", "value")
    # split into 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    in_dir = tmp_path / "in"
    batch.withColumn("__b", F.col("user_id") % 3).repartition(3, "__b").drop(
        "__b"
    ).write.parquet(str(in_dir))

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = run_to_completion(
        streaming_topk(stream, k=3), "qml_topk_stream", output_mode="append"
    )
    w = out.groupBy("user_id").agg(F.max("n_seen").alias("n_seen"))
    final = {
        r["user_id"]: (list(r["topk"]), r["n_seen"])
        for r in out.join(w, ["user_id", "n_seen"]).collect()
    }
    expected = {}
    for r in batch.groupBy("user_id").agg(
        F.slice(F.sort_array(F.collect_list("value"), asc=False), 1, 3).alias("t"),
        F.count("value").alias("n"),
    ).collect():
        expected[r["user_id"]] = (list(r["t"]), r["n"])
    assert final == expected


def test_streaming_topk_gated_without_protobuf(spark):
    """Without protobuf the operator must raise the honest gate, not
    crash the streaming runner mid-query."""
    try:
        import google.protobuf  # noqa: F401

        return  # live path covered by the cross-batch test above
    except ImportError:
        pass
    import pytest

    from quackml_spark.streaming.events import streaming_topk

    stream = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "CAST(value AS DOUBLE) AS value"
    )
    with pytest.raises(NotImplementedError, match="protobuf"):
        streaming_topk(stream)


def test_serve_with_auto_rollback_flips_model_mid_stream(spark, sf_dir, tmp_path):
    """r7 verdict item 7 — the last seam of the monitoring loop: after
    the drift breach triggers the rollback, SUBSEQUENT micro-batches
    must score through the restored model, not the drifted champion.
    Every batch here is drifted, so batch 0 is scored by the champion
    (drift detected after scoring) and every later batch must carry the
    rolled-back model id."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.ml.predict import deploy
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import serve_with_auto_rollback

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    feats = lambda df, shift=0.0: df.select(
        (F.col("user_id").cast("double") + F.lit(shift)).alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        *([F.col("value")] if "value" in df.columns else []),
    )
    batch = load_table(spark, sf_dir, "events")
    r1 = train(
        spark, "serve rb", task="regression",
        df=feats(batch), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    r2 = train(
        spark, "serve rb", task="regression", algorithm="ridge",
        df=feats(batch), y_column_name="value",
        catalog=catalog, test_sampling="random",
    )
    deploy("serve rb", strategy="specific", model_id=r2.model_id, catalog=catalog)
    reference = feats(batch).drop("value")

    # 3 parquet files -> 3 micro-batches, all drifted
    drifted = feats(batch, 1e6).drop("value")
    src = str(tmp_path / "stream_src")
    drifted.limit(300).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(drifted.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    alerts: list = []
    scores: list = []
    q = serve_with_auto_rollback(
        stream, reference, ["f_user"], "serve rb",
        catalog=catalog, sink=alerts, scores=scores,
        query_name="qml_serve_rb_test",
    )
    q.awaitTermination()

    assert len(scores) >= 2, scores
    by_batch = sorted(scores, key=lambda s: s["batch_id"])
    assert by_batch[0]["model_id"] == r2.model_id  # champion scored batch 0
    rolled = [a for a in alerts if a.get("rolled_back_to")]
    assert rolled and rolled[0]["rolled_back_to"] == r1.model_id
    for s in by_batch[1:]:  # every post-rollback batch serves v1
        assert s["model_id"] == r1.model_id, by_batch
    dm = catalog.deployed_models()
    assert int(dm.iloc[0]["model_id"]) == r1.model_id


def test_streaming_curate_batch_split_invariant(spark, sf_dir, tmp_path):
    """streaming_curate under ID-MONOTONE arrival (the order where
    first-accepted-wins coincides with the min-id rule — see the
    docstring) must give IDENTICAL decisions whether the corpus arrives
    as one micro-batch or four: the cross-batch hash log must carry
    exactly what the intra-batch window rule would have decided.
    Planted: an exact duplicate pair split across batches."""
    import os

    from quackml_spark.operators.text import _decon_grams, clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup_of_3 = spark.createDataFrame(
        [(900001, docs.where("doc_id = 3").first()["text"])],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(dup_of_3)
    bench = _decon_grams(
        docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", clean_text_expr("text").alias("text")
        )
    )
    n = corpus.count()

    def run(src_dir, state_dir, n_files, qname):
        # id-ordered range files with ascending mtimes: the file source
        # orders by (mtime, path), so batches arrive id-monotone
        os.makedirs(src_dir)
        step = (900002 // n_files) + 1
        for i in range(n_files):
            part = corpus.where(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            )
            if i == n_files - 1:
                part = corpus.where(F.col("doc_id") >= i * step)
            f = f"{src_dir}/part{i:02d}"
            part.coalesce(1).write.parquet(f)
            for root, _, files in os.walk(f):
                for name in files:
                    os.utime(os.path.join(root, name), (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/part*")
        )
        sink: list = []
        q = streaming_curate(
            stream, state_dir, min_quality=0.35, benchmark_grams=bench,
            sink=sink, query_name=qname,
        )
        q.awaitTermination()
        return {r["doc_id"]: (r["accepted"], r["reason"]) for r in sink}

    one = run(str(tmp_path / "src1"), str(tmp_path / "st1"), 1, "qml_sc_one")
    many = run(str(tmp_path / "src3"), str(tmp_path / "st3"), 4, "qml_sc_many")
    assert one == many
    assert len(one) == corpus.count()
    # the planted exact duplicate lost to its smaller-id twin
    assert one[900001] == (False, "dup")
    # state landed: manifest holds exactly the accepted docs
    accepted = {d for d, (a, _) in one.items() if a}
    manifest = spark.read.parquet(str(tmp_path / "st1" / "manifest"))
    assert {r["doc_id"] for r in manifest.select("doc_id").collect()} == accepted


def test_bloom_positions_decorrelated_from_shard(spark):
    """Hash 0's bit position must be independent of the shard
    expression: the earlier single-digest slicing made pos0 % n_shards
    equal the key's shard for power-of-two (n_shards, m_bits),
    confining hash 0 to 1/n_shards of its shard's bitmap and inflating
    the false-positive rate ~n_shards-fold (review catch). With
    prefixed per-hash md5s the residues spread."""
    from quackml_spark.operators.text import md5_int32
    from quackml_spark.streaming.events import _bloom_positions

    n_shards, m_bits = 32, 1 << 17
    # keys all landing in ONE shard (the regime where the old scheme
    # collapsed): compute shards with the same expression the operator
    # uses, then check hash-0 residues within the shard
    keys = [f"k{i}" for i in range(4000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    import pyspark.sql.functions as F

    shards = {
        r["k"]: r["s"]
        for r in df.select("k", (md5_int32(F.col("k")) % n_shards).alias("s")).collect()
    }
    one_shard = [k for k in keys if shards[k] == 0][:50]
    assert len(one_shard) >= 30
    residues = {
        _bloom_positions(k, 1, m_bits)[0] % n_shards for k in one_shard
    }
    # old scheme: residues == {0}; decorrelated: spread over many values
    assert len(residues) > 10, residues


def test_ewma_null_value_does_not_poison_state(spark, tmp_path):
    """A NULL event value must not enter the EWMA recurrence: one NaN
    would propagate to every later event of that user across all
    micro-batches (review catch). NULL rows pass through carrying the
    current EWMA; subsequent real values keep updating it."""
    import math

    from quackml_spark.streaming.events import ewma_stream

    d = tmp_path / "ewma_null_in"
    d.mkdir()
    rows = [
        (1, 10, "2024-01-01 00:00:00", 4.0),
        (1, 11, "2024-01-01 00:01:00", None),
        (1, 12, "2024-01-01 00:02:00", 8.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(d / "p0")
    )
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double"
        )
        .parquet(str(d) + "/p*")
    )
    q = (
        ewma_stream(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("qml_ewma_null")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.table("qml_ewma_null").collect()
    }
    assert got[10] == 4.0
    assert got[11] == 4.0  # NULL passes through with the current EWMA
    assert got[12] == 6.0  # 0.5*8 + 0.5*4 — the NaN never entered
    assert all(not math.isnan(v) for v in got.values())


def test_streaming_curate_seen_filter_excludes_own_batch(spark, sf_dir, tmp_path):
    """The accepted-hash probe must see EARLIER batches' hashes but
    never the current batch id's own (a replayed batch would match its
    first attempt's appends and flag every accepted doc 'dup',
    permanently losing the batch — review catch). Seeded directly:
    one doc's hash planted with batch_id=-5 (past -> dup), another
    with batch_id=9999 under THIS run's run_key (own/future attempt ->
    invisible). The planted past row uses the PRE-run_key legacy
    schema (h, batch_id only), so this also pins the mixed-schema
    read: legacy rows must keep deduplicating after the upgrade
    (advisor catch)."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.text import clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # two docs that pass the quality gate in the registered run
    probe = docs.where(F.col("doc_id").isin(3, 4)).select(
        "doc_id",
        F.md5(F.lower(F.trim(clean_text_expr("text")))).alias("h"),
    )
    hashes = {r["doc_id"]: r["h"] for r in probe.collect()}
    state = str(tmp_path / "curate_state")
    spark.createDataFrame(
        [(hashes[3], -5)], "h string, batch_id long"
    ).write.parquet(f"{state}/hashes")
    spark.createDataFrame(
        [(hashes[4], 9999, "rk-own")],
        "h string, batch_id long, run_key string",
    ).write.mode("append").parquet(f"{state}/hashes")

    sink: list = []
    from quackml_spark.streaming.events import stream_parquet_table

    stream = stream_parquet_table(
        spark, sf_dir, "documents.parquet", "doc_id long, text string"
    ).select("doc_id", "text")
    q = streaming_curate(
        stream, state, min_quality=0.0, sink=sink,
        query_name="qml_curate_seen_filter", run_key="rk-own",
    )
    q.awaitTermination()
    decisions = {r["doc_id"]: r for r in sink}
    assert decisions[3]["reason"] == "dup"      # legacy-schema hash counts
    assert decisions[4]["reason"] is None        # own-attempt hash ignored
    assert decisions[4]["accepted"] is True


def test_streaming_curate_checkpointless_restart_still_dedups(
    spark, sf_dir, tmp_path
):
    """A NEW run without a checkpoint restarts batch ids at 0; the old
    bare ``batch_id < bid`` seen-filter then hid EVERY committed hash
    and silently re-accepted cross-run duplicates (advisor catch).
    With run_key scoping, run 2 must flag run 1's accepted docs
    'dup'."""
    from quackml_spark.streaming.events import (
        stream_parquet_table,
        streaming_curate,
    )

    state = str(tmp_path / "curate_state")
    stream = stream_parquet_table(
        spark, sf_dir, "documents.parquet", "doc_id long, text string"
    ).select("doc_id", "text")

    sink1: list = []
    q1 = streaming_curate(
        stream, state, min_quality=0.0, sink=sink1,
        query_name="qml_curate_run1",
    )
    q1.awaitTermination()
    accepted1 = {r["doc_id"] for r in sink1 if r["accepted"]}
    assert accepted1  # the fixture has filter-passing docs

    # restart: fresh query, NO checkpoint — batch ids reset to 0
    sink2: list = []
    q2 = streaming_curate(
        stream, state, min_quality=0.0, sink=sink2,
        query_name="qml_curate_run2",
    )
    q2.awaitTermination()
    re_accepted = {r["doc_id"] for r in sink2 if r["accepted"]}
    dup2 = {r["doc_id"] for r in sink2 if r["reason"] == "dup"}
    assert re_accepted == set()  # nothing slips through twice
    assert accepted1 <= dup2     # every run-1 acceptance now a dup


def test_streaming_index_dedup_replay_does_not_self_match(spark, tmp_path):
    """Bands appended by a failed attempt of the SAME batch id must be
    invisible to the index probe on replay — otherwise every
    previously-novel doc flips to is_dup='index' (review catch). Bands
    from the initial build (batch_id=-1) and earlier batches still
    count."""
    from quackml_spark.operators.dedup import (
        dedup_index_build,
        doc_band_keys,
    )
    from quackml_spark.streaming.events import streaming_index_dedup

    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    dedup_index_build(base, index_path)

    novel = spark.createDataFrame(
        [(7, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    # simulate the failed first attempt of batch 0: its bands are
    # already in the index, tagged with the (run_key, batch id) the
    # replay reuses
    (
        doc_band_keys(novel)
        .withColumn("batch_id", F.lit(0).cast("bigint"))
        .withColumn("run_key", F.lit("rk-replay"))
        .repartition("band_id")
        .write.mode("append")
        .partitionBy("band_id")
        .parquet(f"{index_path}/bands")
    )

    d = tmp_path / "replay_in"
    d.mkdir()
    novel.coalesce(1).write.parquet(str(d / "p0"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(d) + "/p*")
    )
    sink: list = []
    q = streaming_index_dedup(
        stream, index_path, sink=sink, query_name="qml_idx_replay",
        run_key="rk-replay",
    )
    q.awaitTermination()
    assert len(sink) == 1
    # the replayed batch (id 0) must NOT match its own appended bands
    assert sink[0]["is_dup"] is False and sink[0]["via"] is None

    # but a PRIOR run's committed batch-0 bands (same batch id,
    # DIFFERENT run_key) must still count — the advisor-caught hole:
    # a new checkpoint-less run's batch 0 used to exclude them
    index2 = str(tmp_path / "idx2")
    dedup_index_build(base, index2)
    (
        doc_band_keys(novel)
        .withColumn("batch_id", F.lit(0).cast("bigint"))
        .withColumn("run_key", F.lit("rk-prior-run"))
        .repartition("band_id")
        .write.mode("append")
        .partitionBy("band_id")
        .parquet(f"{index2}/bands")
    )
    sink2: list = []
    q2 = streaming_index_dedup(
        stream, index2, sink=sink2, query_name="qml_idx_replay2"
    )
    q2.awaitTermination()
    assert sink2[0]["is_dup"] is True and sink2[0]["via"] == "index"

    # legacy pre-upgrade appends (batch_id but NO run_key column) also
    # keep counting: NULL/absent run_key reads as '' and is never
    # excluded (advisor catch — NULL comparisons used to drop them)
    index3 = str(tmp_path / "idx3")
    dedup_index_build(base, index3)
    (
        doc_band_keys(novel)
        .withColumn("batch_id", F.lit(0).cast("bigint"))
        .repartition("band_id")
        .write.mode("append")
        .partitionBy("band_id")
        .parquet(f"{index3}/bands")
    )
    sink3: list = []
    q3 = streaming_index_dedup(
        stream, index3, sink=sink3, query_name="qml_idx_replay3"
    )
    q3.awaitTermination()
    assert sink3[0]["is_dup"] is True and sink3[0]["via"] == "index"


def test_curate_report_int_one_rejected(spark):
    """report=1 must raise, not silently select lazy mode: 1 == True in
    Python, so a membership test would let it through (review catch)."""
    import pytest as _pytest

    from quackml_spark.operators.pipeline import curate

    docs = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="report must be"):
        curate(docs, report=1)


def _curate_doc(i: int, salt: str) -> tuple[int, str]:
    return (
        i,
        f"document {salt} number {i} with plenty of distinct tokens so "
        f"the quality gate and hashing behave normally in this test",
    )


def test_streaming_curate_resumed_checkpoint_legacy_own_attempt(
    spark, tmp_path
):
    """A checkpointed batch replayed across the r9 upgrade: its failed
    first attempt's hash rows were written by the PRE-run_key engine
    (legacy schema). Under a RESUMED checkpoint, batch ids are durable,
    so a legacy row with bid >= the current batch can only be that own
    attempt and must stay invisible — without the fallback the batch
    replays into all-dup and is permanently lost (review catch).
    Legacy rows with EARLIER bids still count as seen."""
    from pyspark.sql import functions as F

    from quackml_spark.streaming.events import streaming_curate

    state = str(tmp_path / "curate_state")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "in"
    src.mkdir()
    schema = "doc_id long, text string"

    # run 1 (batch 0) commits the checkpoint lineage
    spark.createDataFrame(
        [_curate_doc(i, "alpha") for i in range(3)], schema
    ).coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema(schema).parquet(str(src) + "/p*")
    s1: list = []
    q = streaming_curate(
        stream, state, min_quality=0.0, sink=s1,
        query_name="qml_curate_legacy_r1", checkpoint_location=ckpt,
    )
    q.awaitTermination()
    assert all(r["accepted"] for r in s1)

    # batch 1's docs: their pre-upgrade FAILED attempt left legacy
    # (no-run_key) hash rows at bid 1; doc 13 additionally has a
    # legacy row from an EARLIER batch (bid -5) -> genuinely seen
    batch1 = [_curate_doc(i, "beta") for i in (11, 12, 13)]
    probe = spark.createDataFrame(batch1, schema).select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("h")
    )
    hashes = {r["doc_id"]: r["h"] for r in probe.collect()}
    spark.createDataFrame(
        [(hashes[11], 1), (hashes[12], 1), (hashes[13], -5)],
        "h string, batch_id long",
    ).write.mode("append").parquet(f"{state}/hashes")

    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "p1")
    )
    s2: list = []
    q = streaming_curate(
        stream, state, min_quality=0.0, sink=s2,
        query_name="qml_curate_legacy_r2", checkpoint_location=ckpt,
    )
    q.awaitTermination()
    decisions = {r["doc_id"]: r for r in s2}
    assert set(decisions) == {11, 12, 13}
    assert decisions[11]["reason"] is None  # own pre-upgrade attempt ignored
    assert decisions[12]["reason"] is None
    assert decisions[13]["reason"] == "dup"  # earlier legacy bid counts


def test_streaming_curate_fresh_checkpoint_keeps_legacy_history(
    spark, sf_dir, tmp_path
):
    """A FRESH checkpoint pointed at a pre-upgrade state dir must NOT
    apply the own-attempt fallback: its batch 0 carries no prior
    attempts, and excluding legacy bid-0 rows would re-accept the
    state dir's whole committed history (review catch on the first
    fallback implementation)."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.text import clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        stream_parquet_table,
        streaming_curate,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probe = docs.where(F.col("doc_id") == 4).select(
        "doc_id",
        F.md5(F.lower(F.trim(clean_text_expr("text")))).alias("h"),
    )
    h4 = probe.collect()[0]["h"]
    state = str(tmp_path / "curate_state")
    # legacy history written by a pre-upgrade checkpoint-less run,
    # including bid 0 — the new run's first batch id
    spark.createDataFrame(
        [(h4, 0)], "h string, batch_id long"
    ).write.parquet(f"{state}/hashes")

    sink: list = []
    stream = stream_parquet_table(
        spark, sf_dir, "documents.parquet", "doc_id long, text string"
    ).select("doc_id", "text")
    q = streaming_curate(
        stream, state, min_quality=0.0, sink=sink,
        query_name="qml_curate_fresh_ckpt",
        checkpoint_location=str(tmp_path / "fresh_ckpt"),
    )
    q.awaitTermination()
    decisions = {r["doc_id"]: r for r in sink}
    assert decisions[4]["reason"] == "dup"  # history stays visible


def test_checkpoint_resumed_probe(spark, tmp_path):
    """_checkpoint_resumed: False for None / missing / empty-offsets
    checkpoints and unreadable URI locations (the safe direction —
    history stays visible); True once committed offsets exist."""
    import os

    from quackml_spark.streaming.events import _checkpoint_resumed

    assert _checkpoint_resumed(spark, None) is False
    fresh = str(tmp_path / "ck")
    assert _checkpoint_resumed(spark, fresh) is False
    os.makedirs(os.path.join(fresh, "offsets"))
    assert _checkpoint_resumed(spark, fresh) is False  # dir but no commits
    with open(os.path.join(fresh, "offsets", "0"), "w") as f:
        f.write("{}")
    assert _checkpoint_resumed(spark, fresh) is True
    # unreadable scheme resolves False, never raises
    assert _checkpoint_resumed(spark, "nosuchfs://x/ck") is False


def test_streaming_curate_stop_restart_decision_equality(
    spark, sf_dir, tmp_path
):
    """END-TO-END stop/restart: a checkpointed streaming_curate run is
    stopped mid-stream (only half the source files exist when the
    first availableNow drain terminates — from the engine's view a
    graceful stop between micro-batches), then RESTARTED from the same
    checkpoint once the rest of the corpus lands. The combined
    decisions must be IDENTICAL to an unbroken run over the full
    corpus: checkpointed batch ids stay monotone across the restart,
    the persisted hash log keeps deduplicating across the boundary
    (the planted duplicate arrives AFTER the restart, its twin
    before), and no doc is decided twice. The crash-REPLAY half of
    restart safety (a batch re-attempted after dying between its hash
    append and manifest append) is pinned separately by the
    seen-filter unit tests; this covers the resume lineage end to end."""
    import os

    from quackml_spark.operators.text import _decon_grams, clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup_of_3 = spark.createDataFrame(
        [(900001, docs.where("doc_id = 3").first()["text"])],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(dup_of_3)
    bench = _decon_grams(
        docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", clean_text_expr("text").alias("text")
        )
    )
    n_files, step = 4, (900002 // 4) + 1

    def write_part(src_dir, i):
        os.makedirs(src_dir, exist_ok=True)
        part = corpus.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        if i == n_files - 1:
            part = corpus.where(F.col("doc_id") >= i * step)
        f = f"{src_dir}/part{i:02d}"
        part.coalesce(1).write.parquet(f)
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (1000 + i, 1000 + i))

    def drain(src_dir, state_dir, ckpt, qname):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/part*")
        )
        sink: list = []
        q = streaming_curate(
            stream, state_dir, min_quality=0.35, benchmark_grams=bench,
            sink=sink, query_name=qname, checkpoint_location=ckpt,
        )
        q.awaitTermination()
        return sink

    # unbroken reference run: all four files visible from the start
    srcA, stA, ckA = (str(tmp_path / d) for d in ("srcA", "stA", "ckA"))
    for i in range(n_files):
        write_part(srcA, i)
    unbroken = drain(srcA, stA, ckA, "qml_sc_unbroken")

    # split run: drain files 0-1, stop, land files 2-3, RESTART
    srcB, stB, ckB = (str(tmp_path / d) for d in ("srcB", "stB", "ckB"))
    for i in (0, 1):
        write_part(srcB, i)
    phase1 = drain(srcB, stB, ckB, "qml_sc_phase1")
    for i in (2, 3):
        write_part(srcB, i)
    phase2 = drain(srcB, stB, ckB, "qml_sc_phase2")

    assert phase1 and phase2
    # checkpointed batch ids are monotone across the restart
    assert max(r["batch_id"] for r in phase1) < min(
        r["batch_id"] for r in phase2
    )
    combined = {
        r["doc_id"]: (r["accepted"], r["reason"]) for r in phase1 + phase2
    }
    reference = {
        r["doc_id"]: (r["accepted"], r["reason"]) for r in unbroken
    }
    # no doc decided twice across the boundary
    assert len(combined) == len(phase1) + len(phase2)
    assert combined == reference
    # the planted duplicate arrived after the restart and still lost
    # to its pre-restart twin via the persisted hash log
    assert combined[900001] == (False, "dup")
    # state equivalence: both manifests hold exactly the accepted set
    accepted = {d for d, (a, _) in combined.items() if a}
    for st in (stA, stB):
        got = {
            r["doc_id"]
            for r in spark.read.parquet(f"{st}/manifest")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert got == accepted


def _write_id_ordered_parts(spark, corpus, src_dir, parts, max_id, n_files):
    """Range-split corpus into ``n_files`` id-ordered ranges and write
    the files named in ``parts``, with ascending mtimes so the file
    source drains them id-monotone."""
    import os

    os.makedirs(src_dir, exist_ok=True)
    step = (max_id // n_files) + 1
    for j, i in enumerate(parts):
        part = corpus.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        f = f"{src_dir}/part{i:02d}"
        part.coalesce(1).write.parquet(f)
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (1000 + i, 1000 + i))


def test_streaming_pack_batch_split_and_restart(spark, sf_dir, tmp_path):
    """streaming_pack's accumulated layout must be IDENTICAL whether
    the corpus arrives as one batch or four, and across a checkpointed
    stop/restart mid-stream — the CAS-carried offset is what makes the
    stream continue exactly where it stopped."""
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_pack

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_files, max_id = 4, 1 + docs.agg(F.max("doc_id")).first()[0]

    def drain(src, st, ck, qname):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/part*")
        )
        q = streaming_pack(
            stream, st, seq_len=256, query_name=qname,
            checkpoint_location=ck,
        )
        q.awaitTermination()

    def layout(st):
        return {
            r["doc_id"]: (
                r["n_tokens"], r["start_token"], r["first_seq"], r["last_seq"]
            )
            for r in spark.read.parquet(f"{st}/packed").distinct().collect()
        }

    # one-batch reference
    srcA, stA, ckA = (str(tmp_path / d) for d in ("srcA", "stA", "ckA"))
    _write_id_ordered_parts(spark, docs, srcA, range(1), max_id, 1)
    drain(srcA, stA, ckA, "qml_sp_one")
    ref = layout(stA)

    # four micro-batches with a stop/restart after the first two files
    srcB, stB, ckB = (str(tmp_path / d) for d in ("srcB", "stB", "ckB"))
    _write_id_ordered_parts(spark, docs, srcB, (0, 1), max_id, n_files)
    drain(srcB, stB, ckB, "qml_sp_p1")
    _write_id_ordered_parts(spark, docs, srcB, (2, 3), max_id, n_files)
    drain(srcB, stB, ckB, "qml_sp_p2")
    got = layout(stB)

    assert got == ref
    # the stream actually crossed the restart with a nonzero base
    p2_docs = {r["doc_id"] for r in spark.read.parquet(f"{stB}/packed")
               .where(F.col("batch_id") >= 2).collect()}
    assert p2_docs and min(got[d][1] for d in p2_docs) > 0


def test_streaming_pack_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    """A replayed micro-batch (foreachBatch is at-least-once) must
    re-append byte-identical rows and leave the manifest untouched —
    both when the crash hit BEFORE the manifest commit and AFTER it."""
    from quackml_spark.operators._manifest import read_manifest
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import _pack_batch, streaming_pack

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.where("doc_id < 50")
    b1 = docs.where("doc_id >= 50 AND doc_id < 100")
    st = str(tmp_path / "st")
    # init via a drain of an empty-free stream is overkill — reuse the
    # public entry on a tiny one-file source to initialize state
    src = str(tmp_path / "src")
    b0.coalesce(1).write.parquet(src + "/part00")
    q = streaming_pack(
        spark.readStream.schema("doc_id long, text string")
        .parquet(src + "/part*"),
        st, seq_len=128, query_name="qml_sp_replay", run_key="runA",
    )
    q.awaitTermination()
    man1 = read_manifest(spark, st)[1]
    rows1 = spark.read.parquet(f"{st}/packed").distinct().count()

    # crash-AFTER-commit replay: same run_key, same batch_id 0
    _pack_batch(b0, 0, st, "runA", 128)
    man2 = read_manifest(spark, st)[1]
    assert man2 == man1  # manifest untouched
    assert spark.read.parquet(f"{st}/packed").distinct().count() == rows1

    # next batch continues from the committed total
    _pack_batch(b1, 1, st, "runA", 128)
    man3 = read_manifest(spark, st)[1]
    assert man3["last_batch"] == 1
    assert man3["prev_total"] == man1["total_tokens"]
    packed = spark.read.parquet(f"{st}/packed").distinct()
    starts = {r["doc_id"]: r["start_token"] for r in packed.collect()}
    # batch-1 docs start exactly at batch-0's total
    b1_min = min(starts[d] for d in starts if d >= 50)
    assert b1_min == man1["total_tokens"]
    # crash-BEFORE-commit replay of batch 1: manifest already advanced
    # is the AFTER case; simulate BEFORE by replaying batch 1 again and
    # checking idempotence (prev_total path re-derives the same base)
    n_before = packed.count()
    _pack_batch(b1, 1, st, "runA", 128)
    assert read_manifest(spark, st)[1] == man3
    assert (
        spark.read.parquet(f"{st}/packed").distinct().count() == n_before
    )


def test_streaming_curate_pack_batch_split_invariant(spark, sf_dir, tmp_path):
    """The chained curate->pack stream must produce the SAME packed
    layout whether the corpus arrives as one micro-batch or four
    (id-monotone arrival): the accepted set is batch-split invariant
    (the hash log) and the pack offsets carry across batches (the CAS
    manifest)."""
    from quackml_spark.operators.text import _decon_grams, clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = _decon_grams(
        docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", clean_text_expr("text").alias("text")
        )
    )
    max_id = 1 + docs.agg(F.max("doc_id")).first()[0]

    def run(src, st, n_files, qname):
        _write_id_ordered_parts(
            spark, docs, src, range(n_files), max_id, n_files
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/part*")
        )
        q = streaming_curate(
            stream, st, min_quality=0.35, benchmark_grams=bench,
            sink=[], pack_seq_len=256, query_name=qname,
        )
        q.awaitTermination()
        return {
            r["doc_id"]: (r["n_tokens"], r["start_token"], r["last_seq"])
            for r in spark.read.parquet(f"{st}/pack/packed")
            .distinct()
            .collect()
        }

    one = run(str(tmp_path / "s1"), str(tmp_path / "t1"), 1, "qml_cp_one")
    four = run(str(tmp_path / "s4"), str(tmp_path / "t4"), 4, "qml_cp_four")
    assert one and one == four
    # only accepted docs are packed: the bench split never appears
    assert not any(d % 97 == 0 for d in one)


def test_streaming_setsim_dedup_multibatch_exact(spark, tmp_path):
    """The EXACT streaming dedup across MULTIPLE micro-batches: a copy
    of an ACCEPTED earlier-batch doc flags 'index' (the novel append
    grew the index mid-stream), a copy of a DROPPED earlier-batch doc
    also flags 'index' (its original was accepted further back —
    first-accepted-wins chains through the index, not through dropped
    docs), intra-batch copies flag 'batch' for the larger id, and a
    near-dup BELOW the threshold passes as novel (exact semantics —
    an LSH band index could false-positive here)."""
    from quackml_spark.operators.dedup import setsim_index_build
    from quackml_spark.streaming.events import streaming_setsim_dedup

    base = " ".join(f"w{i}" for i in range(12))          # 10 shingles
    far = " ".join(f"w{i}" for i in range(6, 18))        # J=4/16=0.25 vs base
    other = " ".join(f"v{i}" for i in range(12))
    # batch file 0: 10 (base, novel), 11 (base copy -> 'batch')
    # batch file 1: 20 (base copy -> 'index' via 10), 21 (far -> novel)
    # batch file 2: 30 (base copy -> 'index'), 31 (other, novel)
    batches = {
        0: [(10, base), (11, base)],
        1: [(20, base), (21, far)],
        2: [(30, base), (31, other)],
    }
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for b, rows in batches.items():
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(in_dir / f"b{b}"))
    idx = str(tmp_path / "idx")
    setsim_index_build(
        spark.createDataFrame([(1, "seed doc " + " ".join("s%d" % i for i in range(10)))],
                              "doc_id long, text string"),
        idx,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    sink: list = []
    q = streaming_setsim_dedup(
        stream, idx, sink=sink, query_name="qml_ss_multibatch"
    )
    q.awaitTermination()
    got = {r["doc_id"]: (r["is_dup"], r["via"]) for r in sink}
    assert got[10] == (False, None)
    assert got[11] == (True, "batch")
    assert got[21] == (False, None)  # J=0.25 < 0.5: exactness passes it
    assert got[31] == (False, None)
    # later copies of the accepted base doc hit the GROWN index
    assert got[20] == (True, "index")
    assert got[30] == (True, "index")
    # batches arrived separately (files drained one per trigger)
    assert len({r["batch_id"] for r in sink}) == 3
