"""Streaming queries for the driver gate.

streaming_events_hourly drains the event stream with
trigger(availableNow) in complete mode — its output equals the batch
aggregate, so it shares q07's oracle SQL shape (count-distinct is
replaced by approx_count_distinct in the stream, so the oracle checks
the exact columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.session import local_rows
from quackml_spark.plans._exact import sql_out
from quackml_spark.streaming.events import (
    read_event_stream,
    run_to_completion,
    sessionize,
    stream_parquet_table,
    streaming_hourly_aggregate,
)


@register(
    "streaming_events_hourly",
    doc="Structured Streaming tumbling-window aggregate drained with "
    "availableNow; output equals the batch twin (q07), oracle-checked.",
    oracle=f"""
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
  event_type,
  COUNT(*) AS n_events,
  {sql_out("SUM(CAST(value AS DECIMAL(18,6)))")} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("streaming",),
)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, sf_dir)
    agg = streaming_hourly_aggregate(stream)
    out = run_to_completion(agg, f"qml_stream_hourly_{abs(hash(sf_dir)) % 99999}")
    return out.select("hour", "event_type", "n_events", "sum_value").orderBy(
        "hour", "event_type"
    )


@register(
    "streaming_sessionize",
    extra=True,
    doc="Gap-based per-user session windows (session_window stateful "
    "operator) drained with availableNow. Oracle: the classic "
    "gaps-and-islands replay — a session break is a gap >= 10 minutes "
    "from the previous event (session_window's end bound is exclusive, "
    "so ts == prev + gap starts a NEW session); event timestamps are "
    "microsecond-granular in the testdata, so Spark's us and DuckDB's "
    "ns clocks agree exactly.",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN pts IS NULL
                          OR ts - pts >= INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS total_events
FROM lagged
GROUP BY user_id
ORDER BY user_id
""",
    tags=("streaming",),
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, sf_dir)
    sessions = sessionize(stream, gap="10 minutes")
    out = run_to_completion(
        sessions, f"qml_stream_sessions_{abs(hash(sf_dir)) % 99999}"
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_predict_events",
    extra=True,
    doc="Deployed-model scoring over the event stream: train a regression "
    "on the batch events table, then stream-score with snapshot-replay "
    "preprocessing + portable-parameter pandas UDF (stateless). Oracle: "
    "every event is scored exactly once and OLS over never-null "
    "features yields no null predictions, so both counts equal the "
    "event count (the model VALUES are pinned separately by the graded "
    "ml_predict_regression / ml_predict_row_replay rows — this row's "
    "registered output is the stream-coverage contract).",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(COUNT(*) AS BIGINT) AS n_not_null
FROM events
""",
    tags=("streaming",),
)
def streaming_predict_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from pyspark.sql import functions as F

    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        streaming_predict,
    )

    catalog = Catalog(warehouse=ephemeral_dir("qml_wh_"))
    batch = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("double").alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
        F.col("value").alias("value"),
    )
    train(
        spark,
        "stream scorer",
        task="regression",
        df=batch,
        y_column_name="value",
        catalog=catalog,
        test_sampling="random",
    )
    stream = read_event_stream(spark, sf_dir).select(
        "event_id",
        F.col("user_id").cast("double").alias("f_user"),
        F.hour("ts").cast("double").alias("f_hour"),
    )
    scored = streaming_predict(stream, "stream scorer", catalog=catalog)
    out = run_to_completion(
        scored.select("event_id", "prediction"),
        "qml_stream_predict",
        output_mode="append",
    )
    return out.select(
        F.count(F.lit(1)).alias("n_scored"),
        F.count(F.when(F.col("prediction").isNotNull(), 1)).alias("n_not_null"),
    )


@register(
    "streaming_ewma",
    extra=True,
    doc="Custom stateful operator via applyInPandasWithState: per-user "
    "EWMA recurrence whose state survives across micro-batches "
    "(cross-batch continuity is pytest-asserted against a single-pass "
    "batch computation). Oracle: a recursive-CTE replay of the exact "
    "recurrence — `0.3*v + 0.7*prev` is the same two correctly-rounded "
    "IEEE double ops in both engines (1.0-0.3 == 0.7 exactly as a "
    "double), applied in the same (ts, event_id) order, so the FINAL "
    "per-user state compares bit-identical with NO rounding. The "
    "registered output is that final state (max_by the event order "
    "key), not a double AVG — averaging raw doubles is aggregation-"
    "order-dependent, which the oracle discipline bans.",
    oracle="""
WITH RECURSIVE ordered AS MATERIALIZED (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
),
rec AS (
  SELECT user_id, rn, cnt,
         CASE WHEN value IS NOT NULL AND NOT isnan(value)
              THEN value END AS ewma
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.cnt,
         CASE WHEN o.value IS NULL OR isnan(o.value) THEN r.ewma
              WHEN r.ewma IS NULL THEN o.value
              ELSE 0.3 * o.value + 0.7 * r.ewma END
  FROM rec r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id,
       CAST(cnt AS BIGINT) AS n_events,
       ewma AS final_ewma
FROM rec
WHERE rn = cnt
ORDER BY user_id
""",
    tags=("streaming",),
)
def streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from quackml_spark.streaming.events import (
        ewma_stream,
        read_event_stream,
        run_to_completion,
    )

    out = run_to_completion(
        ewma_stream(read_event_stream(spark, sf_dir), alpha=0.3),
        "qml_streaming_ewma",
        output_mode="append",
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("ewma", F.struct("ts", "event_id")).alias("final_ewma"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_dedup_events",
    extra=True,
    doc="Streaming exact dedup (first event per (user_id, event_type), "
    "watermark-bounded state) — kept-row count equals the batch "
    "first-per-key count, replayed by the oracle as the distinct-key "
    "count (the availableNow drain sees no beyond-watermark lateness).",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_kept
FROM (SELECT DISTINCT user_id, event_type FROM events)
""",
    tags=("streaming",),
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        streaming_dedup,
    )

    out = run_to_completion(
        streaming_dedup(
            read_event_stream(spark, sf_dir), ["user_id", "event_type"]
        ).select("user_id", "event_type"),
        "qml_streaming_dedup",
        output_mode="append",
    )
    return out.agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "streaming_bloom_dedup_events",
    extra=True,
    doc="Streaming Bloom dedup (first event per (user_id, event_type), "
    "CONSTANT 512 KiB state for an unbounded stream — the "
    "no-watermark-eviction complement of streaming_dedup_events). "
    "Fully oracle-checked INCLUDING false positives: the bitmap after "
    "any processed prefix equals the UNION of all processed keys' bit "
    "positions regardless of keep/drop (a dropped key's bits were "
    "already covered), so the order-dependent sequential filter "
    "collapses to one order-independent SQL predicate — a key is "
    "false-positive-dropped iff each of its 4 md5 positions is shared "
    "with some key whose first occurrence (stable (ts, key) order) "
    "precedes it in the same shard. Exact under the single-batch "
    "availableNow drain, which the builder ASSERTS (multi-batch "
    "reorders first occurrences batch-first; cross-batch state "
    "continuity is pinned separately in pytest).",
    oracle="""
WITH keys AS (
  SELECT user_id, event_type,
         CAST(user_id AS VARCHAR) || chr(31) || event_type AS key,
         MIN(ts) AS first_ts
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, event_type, key,
         ROW_NUMBER() OVER (
           PARTITION BY ('0x' || substr(md5(key), 1, 8))::BIGINT % 32
           ORDER BY first_ts, user_id, event_type) AS rnk,
         ('0x' || substr(md5(key), 1, 8))::BIGINT % 32 AS shard
  FROM keys
),
pos AS (
  SELECT key, shard, rnk, i,
         ('0x' || substr(md5(i::VARCHAR || '|' || key), 1, 8))::BIGINT
           % 131072 AS p
  FROM ranked, unnest([0, 1, 2, 3]) AS t(i)
),
fp AS (
  SELECT a.key
  FROM pos a JOIN pos b ON b.shard = a.shard AND b.p = a.p AND b.rnk < a.rnk
  GROUP BY a.key
  HAVING COUNT(DISTINCT a.i) >= 4
)
SELECT user_id, event_type
FROM ranked
WHERE key NOT IN (SELECT key FROM fp)
ORDER BY user_id, event_type
""",
    tags=("streaming",),
)
def streaming_bloom_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from quackml_spark.streaming.events import (
        read_event_stream,
        streaming_bloom_dedup,
    )

    name = f"qml_streaming_bloom_dedup_{abs(hash(sf_dir)) % 99999}"
    q = (
        streaming_bloom_dedup(
            read_event_stream(spark, sf_dir), ["user_id", "event_type"]
        )
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the oracle's first-occurrence ranking assumes ONE micro-batch (the
    # setsim/countmin convention): assert it rather than assume it
    data_batches = [
        p for p in q.recentProgress
        if json.loads(p.json).get("numInputRows", 0) > 0
    ]
    if len(data_batches) > 1:
        raise AssertionError(
            "single-batch drain assumption violated: "
            f"{len(data_batches)} non-empty micro-batches"
        )
    return spark.table(name).orderBy("user_id", "event_type")


@register(
    "streaming_countmin_events",
    extra=True,
    doc="Constant-state streaming count-min over event_type: per-shard "
    "depth x width int64 grids (32 KiB/shard) for an unbounded stream; "
    "estimates overcount-only. The n_shards=1 batch-equality test pins "
    "the shared cell map; sharded grids are tighter, never looser. "
    "Oracle: the full deterministic cell map replayed in SQL — keys "
    "shard by the engine-wide md5_int32 %% 8, each (depth, key) cell is "
    "md5('i|key')[:8] %% 1024 offset by i*1024, cell totals accumulate "
    "per shard, estimate = MIN over the key's depth cells. Exact under "
    "the single-batch availableNow drain (asserted: a key emitting in "
    "two batches would miss later collisions), the same convention the "
    "setsim streaming row documents.",
    oracle="""
WITH keys AS (
  SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS c
  FROM events GROUP BY 1
),
sharded AS (
  SELECT key, c,
         ('0x' || substr(md5(key), 1, 8))::BIGINT % 8 AS shard
  FROM keys
),
pos AS (
  SELECT key, c, shard, i,
         ('0x' || substr(md5(i::VARCHAR || '|' || key), 1, 8))::BIGINT
           % 1024 + i * 1024 AS p
  FROM sharded, unnest([0, 1, 2, 3]) AS t(i)
),
cells AS (SELECT shard, p, SUM(c) AS total FROM pos GROUP BY 1, 2)
SELECT k.key, CAST(MIN(cl.total) AS BIGINT) AS cm_estimate
FROM pos k JOIN cells cl ON cl.shard = k.shard AND cl.p = k.p
GROUP BY k.key
ORDER BY k.key
""",
    tags=("streaming",),
)
def streaming_countmin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from quackml_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        streaming_countmin,
    )

    out = run_to_completion(
        streaming_countmin(read_event_stream(spark, sf_dir), "event_type"),
        "qml_streaming_countmin",
        output_mode="append",
    )
    multi = out.groupBy("key").count().where(F.col("count") > 1).count()
    if multi:
        raise AssertionError(
            f"single-batch drain assumption violated: {multi} keys "
            "emitted in more than one micro-batch"
        )
    return (
        out.groupBy("key")
        .agg(F.max("cm_estimate").alias("cm_estimate"))
        .orderBy("key")
    )


@register(
    "streaming_index_dedup_docs",
    doc="Incremental dedup of a document stream against the PERSISTED "
    "MinHash-LSH band index: the corpus docs with doc_id < 250 are "
    "indexed up front, then the whole documents table streams through "
    "foreachBatch — each doc is flagged 'index' (shares a band with an "
    "indexed doc), 'batch' (shares a band with a smaller-id doc in its "
    "own micro-batch), or passes as novel, and novel docs' bands are "
    "appended so later batches dedup against them. Fully ORACLE-checked: "
    "the decision relation is replayed in SQL from the shared band CTE "
    "(index hit = band match vs doc_id<250, batch hit = band match vs a "
    "smaller doc_id).",
    oracle=None,  # set below — needs the dedup module's band SQL
    tags=("streaming", "dedup"),
)
def streaming_index_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_index_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = ephemeral_dir("qml_stream_idx_")
    from quackml_spark.operators.dedup import dedup_index_build

    dedup_index_build(docs.where("doc_id < 250"), index_path)

    sink: list = []
    q = streaming_index_dedup(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        ).select("doc_id", "text"),
        index_path,
        sink=sink,
        query_name=f"qml_stream_idx_dedup_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return local_rows(
        spark,
        [(r["doc_id"], r["is_dup"], r["via"]) for r in sink],
        "doc_id long, is_dup boolean, via string",
    ).orderBy("doc_id")


def _install_index_dedup_oracle() -> None:
    from quackml_spark.operators.dedup import _SQL_BAND_ROWS
    from quackml_spark.plans import REGISTRY

    REGISTRY["streaming_index_dedup_docs"].oracle = f"""
WITH bands AS ({_SQL_BAND_ROWS}),
hit_index AS (
  SELECT DISTINCT b.doc_id
  FROM bands b JOIN bands i ON b.band_id = i.band_id
   AND b.band_key = i.band_key AND i.doc_id < 250
),
hit_batch AS (
  SELECT DISTINCT b.doc_id
  FROM bands b JOIN bands c ON b.band_id = c.band_id
   AND b.band_key = c.band_key AND c.doc_id < b.doc_id
)
SELECT d.doc_id,
       (hi.doc_id IS NOT NULL OR hb.doc_id IS NOT NULL) AS is_dup,
       CASE WHEN hi.doc_id IS NOT NULL THEN 'index'
            WHEN hb.doc_id IS NOT NULL THEN 'batch' END AS via
FROM documents d
LEFT JOIN hit_index hi ON d.doc_id = hi.doc_id
LEFT JOIN hit_batch hb ON d.doc_id = hb.doc_id
ORDER BY d.doc_id
"""


_install_index_dedup_oracle()


@register(
    "streaming_setsim_dedup_docs",
    extra=True,
    doc="Incremental EXACT dedup of a document stream against the "
    "persisted set-similarity index: docs with doc_id < 250 are "
    "indexed up front (frozen rare-first token order), then the whole "
    "documents table streams through foreachBatch — each doc is "
    "flagged 'index' (TRUE word-3-gram Jaccard >= 0.5 vs an indexed "
    "doc; indexed docs hit their own J=1 reflection, same contract as "
    "the band twin), 'batch' (exact pair with a smaller-id doc in its "
    "own micro-batch), or passes as novel and is appended under the "
    "frozen order. Unlike streaming_index_dedup_docs' LSH candidates "
    "this decision relation is exact, so the oracle is the brute-force "
    "Jaccard ground truth.",
    oracle=None,  # set below — shares the dedup module's shingle twin
    tags=("streaming", "dedup"),
)
def streaming_setsim_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.operators.dedup import setsim_index_build
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_setsim_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = ephemeral_dir("qml_stream_ssidx_")
    setsim_index_build(
        docs.where("doc_id < 250").select("doc_id", "text"), index_path
    )
    sink: list = []
    q = streaming_setsim_dedup(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        ).select("doc_id", "text"),
        index_path,
        sink=sink,
        query_name=f"qml_stream_ssidx_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    # The oracle below labels via='index' only for matches to the
    # PRE-BUILT index (doc_id < 250) — correct ONLY because availableNow
    # with no maxFilesPerTrigger drains the table in one micro-batch, so
    # no doc can match a mid-stream-APPENDED novel doc via the index.
    # Multi-batch semantics (where that labeling differs) are pinned by
    # test_streaming_setsim_dedup_multibatch_exact; here the single-batch
    # assumption is asserted, not assumed (advice r11).
    batch_ids = {r["batch_id"] for r in sink}
    if len(batch_ids) > 1:
        raise AssertionError(
            f"single-batch drain assumption violated: {sorted(batch_ids)}"
        )
    return local_rows(
        spark,
        [(r["doc_id"], r["is_dup"], r["via"]) for r in sink],
        "doc_id long, is_dup boolean, via string",
    ).orderBy("doc_id")


def _install_setsim_dedup_oracle() -> None:
    from quackml_spark.operators.dedup import _SQL_SHINGLES
    from quackml_spark.plans import REGISTRY

    REGISTRY["streaming_setsim_dedup_docs"].oracle = f"""
WITH shingles AS ({_SQL_SHINGLES}),
toks AS MATERIALIZED (SELECT DISTINCT doc_id, shingle AS tok FROM shingles),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
jpairs AS MATERIALIZED (
  -- exact J >= 0.5 pairs, BOTH orders, self-pairs included (an indexed
  -- doc streaming through hits its own J=1 reflection, like the band
  -- twin's self band-match)
  SELECT p.da AS qd, p.db AS id_
  FROM (
    SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
    FROM toks a JOIN toks b ON a.tok = b.tok
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON sa.doc_id = p.da
  JOIN sizes sb ON sb.doc_id = p.db
  WHERE p.c * 1000000 >= 500000 * (sa.n + sb.n - p.c)
),
hit_index AS (
  SELECT DISTINCT qd AS doc_id FROM jpairs WHERE id_ < 250
),
hit_batch AS (
  SELECT DISTINCT qd AS doc_id FROM jpairs WHERE id_ < qd
)
SELECT d.doc_id,
       (hi.doc_id IS NOT NULL OR hb.doc_id IS NOT NULL) AS is_dup,
       CASE WHEN hi.doc_id IS NOT NULL THEN 'index'
            WHEN hb.doc_id IS NOT NULL THEN 'batch' END AS via
FROM documents d
LEFT JOIN hit_index hi ON d.doc_id = hi.doc_id
LEFT JOIN hit_batch hb ON d.doc_id = hb.doc_id
ORDER BY d.doc_id
"""


_install_setsim_dedup_oracle()


@register(
    "streaming_bm25_ingest_docs",
    extra=True,
    doc="Continuous BM25 indexing: docs with doc_id < 250 are indexed "
    "up front, the rest of the documents table STREAMS into the index "
    "through foreachBatch appends (postings + df deltas + stats rows — "
    "only each batch is tokenized, nothing rewritten), and the "
    "standard %% 101 query set is searched after the drain. BM25's "
    "statistics are additive over disjoint batches, so the streamed "
    "index is bit-identical to one-shot indexing of the full corpus — "
    "the oracle is literally text_bm25_topk's corpus-rescanning SQL. "
    "Unlike the dedup twins there is NO single-batch assumption: "
    "additivity makes the final index drain-shape-independent "
    "(multi-batch + restart-replay pytest-pinned).",
    oracle=None,  # set below — shares the BM25 SQL body
    tags=("streaming", "textops", "similarity"),
)
def streaming_bm25_ingest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.operators.text import (
        _bm25_std_queries,
        bm25_index_build,
        bm25_index_search,
    )
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_bm25_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = ephemeral_dir("qml_stream_bm25_") + "/idx"
    bm25_index_build(docs.where("doc_id < 250"), index_path)
    q = streaming_bm25_ingest(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        )
        .select("doc_id", "text")
        .where("doc_id >= 250"),
        index_path,
        query_name=f"qml_stream_bm25_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return bm25_index_search(spark, index_path, _bm25_std_queries(docs))


def _install_bm25_ingest_oracle() -> None:
    from quackml_spark.operators.text import _SQL_BM25_BODY
    from quackml_spark.plans import REGISTRY

    REGISTRY["streaming_bm25_ingest_docs"].oracle = f"""
WITH {_SQL_BM25_BODY}
SELECT query_id, doc_id,
       CAST(ROUND(score, 6) AS DOUBLE) AS bm25, rnk
FROM lex
WHERE rnk <= 10
ORDER BY query_id, rnk
"""


_install_bm25_ingest_oracle()


@register(
    "streaming_curate_docs",
    doc="Continuous corpus curation (streaming_curate) value-checked "
    "END-TO-END: the documents table streams through foreachBatch — "
    "clean -> quality gate (the graded text_quality_score arithmetic) "
    "-> exact dedup against the persisted accepted-hash log (+ the "
    "intra-batch min-id rule) -> benchmark-gram decontamination "
    "(doc_id %% 97 docs play the eval suite). First-accepted-wins "
    "across batches, min-id within one; under the id-monotone "
    "availableNow drain used here the two coincide ('dup' = a "
    "smaller-id filter-passing doc shares the hash), so the whole run "
    "replays as ONE SQL query over the full corpus.",
    oracle=None,  # set below — shares the pipeline clean/STOP SQL
    tags=("streaming", "textops", "pipeline"),
)
def streaming_curate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.operators.text import _decon_grams, clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents")
    bench_grams = _decon_grams(
        docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", clean_text_expr("text").alias("text")
        )
    )
    state_path = ephemeral_dir("qml_stream_curate_")
    sink: list = []
    q = streaming_curate(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        ).select("doc_id", "text"),
        state_path,
        min_quality=0.35,
        benchmark_grams=bench_grams,
        sink=sink,
        query_name=f"qml_stream_curate_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return local_rows(
        spark,
        [(r["doc_id"], r["accepted"], r["reason"]) for r in sink],
        "doc_id long, accepted boolean, reason string",
    ).orderBy("doc_id")


def _install_streaming_curate_oracle() -> None:
    from quackml_spark.operators.pipeline import _CLEAN_SQL
    from quackml_spark.operators.text import _DECON_K, STOPWORDS
    from quackml_spark.plans import REGISTRY

    k = _DECON_K
    REGISTRY["streaming_curate_docs"].oracle = rf"""
WITH cleaned AS (
  SELECT doc_id, {_CLEAN_SQL} AS ct FROM documents
), t AS (
  SELECT doc_id, ct, length(ct) AS n_chars,
         regexp_extract_all(lower(ct), '\S+') AS toks
  FROM cleaned
), m AS (
  SELECT doc_id, ct,
    CAST(ROUND(
      CAST(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END
           AS DECIMAL(18,6)) * 0.4
      + CAST(length(list_filter(toks, x -> list_contains({STOPWORDS!r}, x)))
             AS DECIMAL(18,6)) / greatest(length(toks), 1) * 0.3
      + CAST(length(list_distinct(toks)) AS DECIMAL(18,6))
        / greatest(length(toks), 1) * 0.3
    , 6) AS DOUBLE) AS q
  FROM t
), passing AS (
  SELECT doc_id, ct, md5(lower(trim(ct))) AS h FROM m WHERE q >= 0.35
), dup AS (
  SELECT DISTINCT a.doc_id
  FROM passing a JOIN passing b ON a.h = b.h AND b.doc_id < a.doc_id
), keepers AS (
  SELECT doc_id, ct FROM passing
  WHERE doc_id NOT IN (SELECT doc_id FROM dup)
), ktoks AS (
  SELECT doc_id, regexp_extract_all(lower(ct), '\S+') AS toks FROM keepers
), kgrams AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(toks[i:i+{k - 1}], 'string_agg', ' ')) AS gram
  FROM ktoks, unnest(range(1, length(toks) - {k - 2})) AS t(i)
  WHERE length(toks) >= {k}
), btoks AS (
  SELECT doc_id, regexp_extract_all(lower(ct), '\S+') AS toks
  FROM cleaned WHERE doc_id % 97 = 0
), bgrams AS (
  SELECT DISTINCT
         md5(list_aggregate(toks[i:i+{k - 1}], 'string_agg', ' ')) AS gram
  FROM btoks, unnest(range(1, length(toks) - {k - 2})) AS t(i)
  WHERE length(toks) >= {k}
), contaminated AS (
  SELECT DISTINCT g.doc_id FROM kgrams g JOIN bgrams USING (gram)
)
SELECT d.doc_id,
       (r.reason IS NULL) AS accepted, r.reason
FROM documents d
LEFT JOIN (
  SELECT m.doc_id,
         CASE WHEN m.q < 0.35 THEN 'quality'
              WHEN dup.doc_id IS NOT NULL THEN 'dup'
              WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         END AS reason
  FROM m
  LEFT JOIN dup ON dup.doc_id = m.doc_id
  LEFT JOIN contaminated c ON c.doc_id = m.doc_id
) r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


_install_streaming_curate_oracle()


@register(
    "streaming_ann_ingest_vecs",
    extra=True,
    doc="Continuous ANN ingestion value-checked END-TO-END: the IVF-PQ "
    "index builds on vec_id < 100, the remaining embeddings STREAM in "
    "through foreachBatch (fixed-quantizer assign + encode + "
    "partition-local append, FAISS add semantics), and the post-drain "
    "search must return exactly what the one-shot index over the whole "
    "table returns — so this row shares ann_ivfpq_topk's oracle SQL "
    "verbatim (the medoid centroids and first-16 codebook derive from "
    "vec_id < 8/16, inside the pre-built half either way).",
    oracle=None,  # set below — shared verbatim with ann_ivfpq_topk
    tags=("streaming", "similarity"),
)
def streaming_ann_ingest_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.operators.ivfpq import (
        ivfpq_index_build,
        ivfpq_index_search,
    )
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_ann_ingest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    index_path = ephemeral_dir("qml_ann_ingest_") + "/idx"
    ivfpq_index_build(
        emb.where(F.col("vec_id") < 100), index_path,
        n_lists=8, m=8, k_codes=16, quantizer="medoid",
    )
    stream = stream_parquet_table(
        spark, sf_dir, "embeddings.parquet",
        emb.schema,
    ).where(F.col("vec_id") >= 100)
    sink: list = []
    q = streaming_ann_ingest(
        stream, index_path, sink=sink,
        query_name=f"qml_ann_ingest_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    queries = emb.where(F.col("vec_id") < 5)
    return ivfpq_index_search(spark, index_path, queries, k=10, nprobe=3)


def _install_ann_ingest_oracle() -> None:
    from quackml_spark.plans import REGISTRY

    REGISTRY["streaming_ann_ingest_vecs"].oracle = REGISTRY[
        "ann_ivfpq_topk"
    ].oracle


_install_ann_ingest_oracle()


@register(
    "streaming_length_histogram_docs",
    extra=True,
    doc="Live dataset card: the mergeable power-of-two histogram "
    "sketch maintained as a plain streaming aggregation — the sketch "
    "state is (source, bin) counts, bounded by |sources| x 64 keys, "
    "so Spark's state store IS the sketch and every micro-batch "
    "merge is the exact hist_merge sum. Drained output equals the "
    "batch sketch_length_histogram bit-for-bit (shared oracle).",
    tags=("streaming", "textops", "sketch"),
)
def streaming_length_histogram_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quackml_spark.operators.histsketch import _bin_expr, hist_quantiles
    from quackml_spark.sources import load_table

    batch_schema = load_table(spark, sf_dir, "documents").schema
    stream = stream_parquet_table(
        spark, sf_dir, "documents.parquet", batch_schema
    ).select("source", F.length("text").alias("len"))
    sketch_stream = stream.groupBy(
        "source", _bin_expr(F.col("len")).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    sketch = run_to_completion(
        sketch_stream,
        f"qml_stream_hist_{abs(hash(sf_dir)) % 99999}",
        output_mode="complete",
    )
    return hist_quantiles(sketch, group_cols=["source"]).select(
        "source",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("p50").cast("bigint").alias("p50"),
        F.col("p90").cast("bigint").alias("p90"),
        F.col("p99").cast("bigint").alias("p99"),
    )


def _install_stream_hist_oracle() -> None:
    from quackml_spark.plans import REGISTRY

    REGISTRY["streaming_length_histogram_docs"].oracle = REGISTRY[
        "sketch_length_histogram"
    ].oracle


_install_stream_hist_oracle()


@register(
    "streaming_corpus_profile_docs",
    extra=True,
    doc="Live dataset card from purely MERGEABLE state: per micro-batch "
    "the stream appends per-source part-states (exact volume sums, an "
    "HLL sketch of text hashes, the power-of-two length histogram) "
    "and profile_from_state folds them at any time with no raw-data "
    "rescan. Oracle checks the EXACT columns (counts, volumes, "
    "histogram percentiles) — the streaming_events_hourly precedent; "
    "the HLL distinct/dup-rate estimates are pinned in pytest "
    "against the exact batch answer instead.",
    oracle=r"""
WITH d AS (
  SELECT source, length(text) AS len,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens
  FROM documents
), vol AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len) AS BIGINT) AS total_chars,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM d GROUP BY source
), s AS (
  SELECT source,
         CASE WHEN len IS NULL OR len <= 0 THEN -1
              ELSE length(bin(len)) - 1 END AS bin,
         COUNT(*) AS n
  FROM d GROUP BY 1, 2
), c AS (
  SELECT source, bin, n,
         SUM(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY source) AS total
  FROM s
), q AS (
  SELECT source,
    CAST(MIN(CASE WHEN cum >= (total + 1) // 2
        THEN CASE WHEN bin < 0 THEN 0
             ELSE (CAST(1 AS BIGINT) << (bin + 1)) - 1 END END) AS BIGINT)
      AS p50_chars,
    CAST(MIN(CASE WHEN cum >= (total * 9 + 9) // 10
        THEN CASE WHEN bin < 0 THEN 0
             ELSE (CAST(1 AS BIGINT) << (bin + 1)) - 1 END END) AS BIGINT)
      AS p90_chars
  FROM c GROUP BY source
)
SELECT vol.source, n_docs, total_chars, total_tokens, p50_chars, p90_chars
FROM vol JOIN q USING (source)
ORDER BY vol.source
""",
    tags=("streaming", "textops", "pipeline", "sketch"),
)
def streaming_corpus_profile_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import (
        profile_from_state,
        streaming_corpus_profile,
    )

    batch_schema = load_table(spark, sf_dir, "documents").schema
    stream = stream_parquet_table(
        spark, sf_dir, "documents.parquet", batch_schema
    )
    state = ephemeral_dir("qml_stream_profile_")
    q = streaming_corpus_profile(
        stream, state,
        query_name=f"qml_stream_profile_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return profile_from_state(spark, state).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("p50_chars").cast("bigint").alias("p50_chars"),
        F.col("p90_chars").cast("bigint").alias("p90_chars"),
    )


@register(
    "streaming_pack_docs",
    extra=True,
    doc="Continuous sequence packing (streaming_pack) value-checked "
    "END-TO-END: documents stream through foreachBatch, each batch "
    "packs onto the end of the global token stream with the offset "
    "carried across batches in the CAS manifest. Under the id-monotone "
    "availableNow drain used here the accumulated layout equals the "
    "batch concat-and-chunk cumsum in doc_id order — the oracle.",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         SUM(length(regexp_extract_all(lower(text), '\S+')))
           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS first_seq,
       CAST(FLOOR((cum - 1) / 512) AS BIGINT) AS last_seq
FROM t WHERE n_tokens > 0
ORDER BY doc_id
""",
    tags=("streaming", "textops", "sampling"),
)
def streaming_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.streaming.events import streaming_pack

    state_path = ephemeral_dir("qml_stream_pack_")
    q = streaming_pack(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        ).select("doc_id", "text"),
        state_path,
        seq_len=512,
        query_name=f"qml_stream_pack_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{state_path}/packed")
        .select(
            "doc_id", "n_tokens", "start_token", "first_seq", "last_seq"
        )
        .distinct()
        .orderBy("doc_id")
    )


@register(
    "streaming_curate_pack_docs",
    extra=True,
    doc="The FULL streaming training-data pipeline in ONE query: "
    "streaming_curate's clean -> quality -> cross-batch dedup -> "
    "decontaminate chain with the terminal pack stage — accepted docs "
    "flow straight onto the continuing global token stream "
    "(CAS-carried offset). Under the id-monotone availableNow drain "
    "the packed layout equals the batch cumsum over exactly the "
    "accepted set, which the oracle replays by extending the "
    "streaming_curate_docs CTE chain.",
    oracle=None,  # installed below — shares the curate CTE chain
    tags=("streaming", "textops", "pipeline", "sampling"),
)
def streaming_curate_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    from quackml_spark.operators.text import _decon_grams, clean_text_expr
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_curate

    docs = load_table(spark, sf_dir, "documents")
    bench_grams = _decon_grams(
        docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", clean_text_expr("text").alias("text")
        )
    )
    state_path = ephemeral_dir("qml_stream_cpack_")
    q = streaming_curate(
        stream_parquet_table(
            spark, sf_dir, "documents.parquet", "doc_id long, text string"
        ).select("doc_id", "text"),
        state_path,
        min_quality=0.35,
        benchmark_grams=bench_grams,
        sink=[],
        pack_seq_len=512,
        query_name=f"qml_stream_cpack_{abs(hash(sf_dir)) % 99999}",
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{state_path}/pack/packed")
        .select(
            "doc_id", "n_tokens", "start_token", "first_seq", "last_seq"
        )
        .distinct()
        .orderBy("doc_id")
    )


def _install_streaming_curate_pack_oracle() -> None:
    from quackml_spark.plans import REGISTRY

    base = REGISTRY["streaming_curate_docs"].oracle
    # reuse the curate CTE chain verbatim: swap the decision SELECT for
    # a cumsum over the accepted set's cleaned-text token counts
    head, _, _ = base.partition("SELECT d.doc_id,")
    REGISTRY["streaming_curate_pack_docs"].oracle = (
        head
        + r""", accepted AS (
  SELECT k.doc_id, k.ct FROM keepers k
  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = k.doc_id)
), sized AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(ct), '\S+')) AS n_tokens
  FROM accepted
), summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM sized WHERE n_tokens > 0
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS first_seq,
       CAST(FLOOR((cum - 1) / 512) AS BIGINT) AS last_seq
FROM summed
ORDER BY doc_id
"""
    )


_install_streaming_curate_pack_oracle()
