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
