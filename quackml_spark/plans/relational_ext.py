"""Extended relational surface: anti-join, as-of join, pivot, JSON
extraction, batch sessionization, and an embed-UDF parity check.

These widen the oracle-checked operator inventory beyond the §2.6 core:

  * as-of join — the classic time-series operator Spark lacks natively;
    implemented as the scalable union+window pattern (one shuffle on the
    join key, linear scan — no range-explosion), DuckDB oracle uses its
    native ASOF JOIN.
  * batch sessionization — the batch twin of streaming.sessionize, so
    the stateful streaming operator has an oracle-checked reference
    semantics.
  * llm_embed_parity — re-derives the deterministic hash-embedding in
    pure SQL and cross-checks the pandas-UDF output, turning the embed
    path from a rows-only check into a value-checked one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.plans._exact import SQL_DISC_PRICE, dec, disc_price, out_double, sql_out
from quackml_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q14 — anti join (NOT EXISTS).
# ---------------------------------------------------------------------------
@register(
    "q14_customers_without_orders",
    extra=True,
    doc="Anti join (NOT EXISTS) + grouped count — Spark LEFT ANTI join.",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("relational",),
)
def q14_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: left-anti shuffles both sides on the key; the orders side is
    # pruned to the single join column before the exchange.
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q15 — as-of join: latest order at-or-before each event.
# ---------------------------------------------------------------------------
@register(
    "q15_asof_latest_order",
    doc="As-of join (events -> most recent order per user at ts): "
    "union+window pattern — one shuffle on the key, linear scan, no "
    "range-join explosion. DuckDB oracle uses native ASOF LEFT JOIN.",
    oracle="""
SELECT e.event_id, o.o_orderdate AS asof_orderdate
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
    tags=("relational", "bench"),
)
def q15_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One implementation of the union+tag+window trick for the whole
    # engine: the general operators/joins.py::asof_join (backward,
    # inclusive) — this query keeps only the oracle inline. The payload
    # is the order date; ties (several orders, same custkey+date) all
    # carry the same date, so the output is tie-invariant.
    from quackml_spark.operators.joins import asof_join

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )
    return (
        asof_join(ev, orders, on="ts", by_left="user_id", by_right="user_id")
        .select("event_id", "asof_orderdate")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q16 — pivot via conditional aggregation.
# ---------------------------------------------------------------------------
@register(
    "q16_pivot_status_revenue",
    # extra since round 7 (cont.): conditional-aggregate pivot shares
    # its CASE-aggregate shape with the graded q22 grouping-sets rollup
    # (and the q30 CUBE lattice); its graded slot went to
    # text_bigram_perplexity so the KN bigram LM gets driver grading
    # pressure.
    extra=True,
    doc="Pivot (orderstatus -> columns) as conditional DECIMAL aggregates; "
    "explicit CASE aggregates keep column names engine-independent.",
    oracle=f"""
SELECT o_orderpriority,
  {sql_out("SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END)")} AS total_f,
  {sql_out("SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END)")} AS total_o,
  {sql_out("SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END)")} AS total_p,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational",),
)
def q16_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def piv(status: str):
        return out_double(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == status, dec("o_totalprice")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            )
        )

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            piv("F").alias("total_f"),
            piv("O").alias("total_o"),
            piv("P").alias("total_p"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q17 — JSON extraction (reference force-loads DuckDB's json extension).
# ---------------------------------------------------------------------------
@register(
    "q17_events_json_extract",
    doc="JSON path extraction + integer aggregate over events.props "
    "(reference JSON reliance: lib.rs:38-39, task.rs:116-126).",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("relational",),
)
def q17_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q18 — batch sessionization (gap-based), twin of streaming.sessionize.
# ---------------------------------------------------------------------------
@register(
    "q18_sessionize_batch",
    extra=True,
    doc="Gap-based sessionization (30-min gap) via lag + running sum — the "
    "oracle-checked batch semantics for streaming.sessionize.",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       DATE_DIFF('second', MIN(ts), MAX(ts)) AS duration_s
FROM sess
GROUP BY user_id, session_no
ORDER BY user_id, session_no
""",
    tags=("relational", "bench"),
)
def q18_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both windows run on one hash partitioning of user_id; the
    # session aggregate keys on (user_id, session_no), which that
    # partitioning already co-locates; the tail sort exists only for
    # deterministic oracle output.
    from quackml_spark.sources.tables import ts_epoch_micros, ts_epoch_seconds

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compares MICROSECONDS: the oracle's `ts - LAG(ts) > INTERVAL
    # 30 MINUTE` is exact, so a floor-to-second gap of exactly 1800 s
    # whose true interval is 1800.x s sessionized differently per
    # engine (review catch; q19 already compares micros). duration_s
    # stays on floor-second epochs — DuckDB's date_diff('second')
    # counts boundary crossings, which IS the floor-epoch difference.
    gap = ts_epoch_micros("ts") - F.lag(ts_epoch_micros("ts")).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_epoch_seconds("ts")) - F.min(ts_epoch_seconds("ts"))).alias(
                "duration_s"
            ),
        )
        .orderBy("user_id", "session_no")
    )


# ---------------------------------------------------------------------------
# llm_embed_parity — value-checks the hash-embedding UDF against SQL.
# ---------------------------------------------------------------------------
@register(
    "llm_embed_parity",
    doc="Cross-checks the deterministic hash-embedding pandas UDF "
    "(functions/embed.py) against a pure-SQL re-derivation: per-doc "
    "non-zero dimension count and argmax bucket are exact integers, "
    "robust to float32-vs-double normalization.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents
), vals AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
         CASE WHEN (('0x' || substr(md5(tok), 9, 2))::INT & 1) = 1
              THEN 1 ELSE -1 END AS sign
  FROM toks
), bux AS (
  SELECT doc_id, bucket, SUM(sign) AS c FROM vals GROUP BY 1, 2
), agg AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE c <> 0) AS nnz,
         MAX(ABS(c)) AS mx
  FROM bux GROUP BY 1
)
SELECT a.doc_id, a.nnz,
       CASE WHEN a.mx = 0 THEN -1
            ELSE (SELECT MIN(b.bucket) FROM bux b
                  WHERE b.doc_id = a.doc_id AND ABS(b.c) = a.mx)
       END AS top_bucket
FROM agg a
ORDER BY a.doc_id
""",
    tags=("llm",),
)
def llm_embed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import embed

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = embed(docs, "hash", "text", {"dimensions": 64})
    absv = F.transform("embedding", lambda x: F.abs(x))
    amax = F.array_max(absv)
    return emb.select(
        "doc_id",
        F.size(F.filter("embedding", lambda x: x != 0)).cast("bigint").alias("nnz"),
        F.when(amax == 0, F.lit(-1))
        .otherwise(F.array_position(absv, amax) - 1)
        .cast("bigint")
        .alias("top_bucket"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q19 — range-frame window (self-range-join expressed scalably).
# ---------------------------------------------------------------------------
@register(
    "q19_events_lookback_window",
    extra=True,
    doc="Per event: count + value-sum of the same user's events in the "
    "preceding 30 minutes. A self-range-join ('events within t-30m of "
    "each other') expressed as a RANGE-frame window — one shuffle on "
    "user_id and a linear scan, instead of a bucketed self-join's "
    "candidate explosion.",
    oracle="""
SELECT event_id,
       COUNT(*) OVER w AS n_prior_30m,
       COALESCE(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 0)::DOUBLE AS prior_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND 1 PRECEDING)
ORDER BY event_id
""",
    tags=("relational",),
)
def q19_events_lookback_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.sources.tables import ts_epoch_micros

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_epoch_micros("ts"))
        .rangeBetween(-1800 * 1000 * 1000, -1)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_prior_30m"),
        F.coalesce(F.sum(dec("value")).over(w), F.lit(0).cast("decimal(28,6)"))
        .cast("double")
        .alias("prior_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q20 — set operations (INTERSECT / EXCEPT).
# ---------------------------------------------------------------------------
@register(
    "q20_customer_set_ops",
    extra=True,
    doc="INTERSECT / EXCEPT between yearly buyer cohorts — Spark "
    "intersect()/exceptAll() distinct set semantics.",
    oracle="""
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT 'only_96', COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
UNION ALL
SELECT 'only_97', COUNT(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
ORDER BY cohort
""",
    tags=("relational",),
)
def q20_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = cohort("1996-01-01", "1997-01-01")
    y97 = cohort("1997-01-01", "1998-01-01")
    rows = [
        ("both", y96.intersect(y97)),
        # subtract == EXCEPT-distinct, exactly the oracle's EXCEPT; the
        # earlier exceptAll(intersect(...)) planned a redundant extra
        # INTERSECT exchange per cohort for the same result (review
        # catch)
        ("only_96", y96.subtract(y97)),
        ("only_97", y97.subtract(y96)),
    ]
    out = None
    for name, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("cohort"), "n"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("cohort")


# ---------------------------------------------------------------------------
# q21 — scalar subquery / grouped HAVING over a global aggregate.
# ---------------------------------------------------------------------------
@register(
    "q21_above_average_parts",
    extra=True,
    doc="Scalar subquery: parts whose revenue exceeds 2x the average "
    "part revenue (global aggregate joined back — Catalyst turns the "
    "scalar subquery into a broadcast).",
    oracle=f"""
WITH rev AS (
  SELECT l_partkey, {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_parts,
       {sql_out("SUM(CAST(revenue AS DECIMAL(18,6)))")} AS total_rev
FROM rev
WHERE CAST(revenue AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM rev)
      > 2 * (SELECT SUM(CAST(revenue AS DECIMAL(18,6))) FROM rev)
""",
    tags=("relational",),
)
def q21_above_average_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "revenue > 2*avg" compared as revenue*count > 2*sum — all-DECIMAL
    # (exact, order-independent), so the cohort boundary cannot flip on
    # a floating-point ulp between engines.
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(out_double(F.sum(disc_price())).alias("revenue"))
    rev.createOrReplaceTempView("__qml_rev")
    return li.sparkSession.sql(
        """
        SELECT COUNT(*) AS n_parts,
               CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_rev
        FROM __qml_rev
        WHERE CAST(revenue AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM __qml_rev)
              > 2 * (SELECT SUM(CAST(revenue AS DECIMAL(18,6))) FROM __qml_rev)
        """
    )


# ---------------------------------------------------------------------------
# q22 — time-hierarchy rollup (hypertable-style continuous aggregate).
# ---------------------------------------------------------------------------
@register(
    "q22_time_rollup",
    # extra since r12: overlaps streaming_events_hourly's graded hourly agg
    # shape; demoted to free a graded slot for pipeline_curate_ppjoin.
    # Still oracle-checked every pytest run.
    extra=True,
    doc="Hypertable-style rollup: event counts/value at (day, hour) and "
    "(day) and grand-total granularities in ONE grouping-sets pass — "
    "the shape a continuous aggregate materializes.",
    oracle="""
SELECT COALESCE(STRFTIME(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       COALESCE(STRFTIME(date_trunc('hour', ts), '%H:00'), 'ALL') AS hour,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                        (date_trunc('day', ts)), ())
ORDER BY day, hour
""",
    tags=("relational", "bench"),
)
def q22_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    return (
        ev.rollup(day.alias("d"), hour.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            out_double(F.sum(dec("value"))).alias("sum_value"),
        )
        .select(
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            F.coalesce(F.date_format("h", "HH:00"), F.lit("ALL")).alias("hour"),
            "n_events",
            "sum_value",
        )
        .orderBy("day", "hour")
    )


# ---------------------------------------------------------------------------
# sketch_distinct_users — HLL sketch next to the exact answer.
# ---------------------------------------------------------------------------
@register(
    "sketch_distinct_users",
    doc="Distinct-user counts per event_type: exact (oracle-checked) "
    "next to the HLL sketch the 100 TB path would use; sketch accuracy "
    "vs exact is pytest-asserted (approx values are engine-specific, so "
    "only exact columns face the oracle).",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("relational",),
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users_exact"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q23 — salted two-phase aggregation (skew pattern, identical results).
# ---------------------------------------------------------------------------
@register(
    "q23_salted_aggregate",
    extra=True,
    doc="Skew-safe aggregation: phase 1 groups on (key, salt) so a hot "
    "key spreads over 16 reducers, phase 2 merges the partials per key. "
    "DECIMAL partials are exact under re-aggregation, so the result is "
    "IDENTICAL to the direct GROUP BY the oracle runs — the salt only "
    "changes the physical distribution.",
    oracle=f"""
SELECT l_returnflag,
  {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational",),
)
def q23_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(disc_price()).alias("__rev"), F.count(F.lit(1)).alias("__n")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            out_double(F.sum("__rev")).alias("revenue"),
            F.sum("__n").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q24 — rank-family window functions.
# ---------------------------------------------------------------------------
@register(
    "q24_customer_value_ranks",
    extra=True,
    doc="percent_rank + cume_dist + ntile over per-customer order value "
    "within market segment — the analytic rank family in one pass.",
    oracle=f"""
WITH cust_val AS (
  SELECT c_custkey, c_mktsegment,
         {sql_out("SUM(CAST(o_totalprice AS DECIMAL(18,6)))")} AS total
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
)
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS pct_rank,
       CAST(ROUND(CUME_DIST() OVER w, 6) AS DOUBLE) AS cume,
       NTILE(4) OVER w AS quartile
FROM cust_val
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total, c_custkey)
ORDER BY c_custkey
""",
    tags=("relational",),
)
def q24_customer_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cv = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(out_double(F.sum(dec("o_totalprice"))).alias("total"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("total", "c_custkey")
    return cv.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q25 — ratio-to-report (share of parent group).
# ---------------------------------------------------------------------------
@register(
    "q25_nation_revenue_share",
    extra=True,
    doc="Ratio-to-report: each nation's share of its region's revenue — "
    "grouped aggregate + windowed sum over the parent group; the share "
    "is one DECIMAL/DECIMAL division, bit-identical across engines.",
    oracle=f"""
WITH nat AS (
  SELECT r_name, n_name,
         {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(ROUND(CAST(revenue AS DECIMAL(18,6))
            / SUM(CAST(revenue AS DECIMAL(18,6))) OVER (PARTITION BY r_name), 6)
            AS DOUBLE) AS region_share
FROM nat
ORDER BY r_name, n_name
""",
    tags=("relational",),
)
def q25_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    nat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(out_double(F.sum(disc_price())).alias("revenue"))
    )
    w = Window.partitionBy("r_name")
    share = F.col("revenue").cast("decimal(18,6)") / F.sum(
        F.col("revenue").cast("decimal(18,6)")
    ).over(w)
    return nat.select(
        "r_name", "n_name", F.round(share, 6).cast("double").alias("region_share")
    ).orderBy("r_name", "n_name")


# ---------------------------------------------------------------------------
# q26 — fuzzy matching via edit distance.
# ---------------------------------------------------------------------------
@register(
    "q26_fuzzy_nation_match",
    extra=True,
    doc="Fuzzy-matching primitive: Levenshtein distance from every "
    "nation name to a probe string — exact integer in both engines; "
    "the broadcast-dim pattern a fuzzy join builds on.",
    oracle="""
SELECT n_name, levenshtein(n_name, 'UNITED STATS') AS dist
FROM nation
ORDER BY dist, n_name
""",
    tags=("relational",),
)
def q26_fuzzy_nation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    return nation.select(
        "n_name", F.levenshtein("n_name", F.lit("UNITED STATS")).alias("dist")
    ).orderBy("dist", "n_name")


# ---------------------------------------------------------------------------
# q27 — calendar extraction battery.
# ---------------------------------------------------------------------------
@register(
    "q27_orders_by_calendar",
    extra=True,
    doc="EXTRACT battery: orders by (year, quarter, ISO weekday) — "
    "engines disagree on weekday numbering (DuckDB dow Sunday=0, Spark "
    "dayofweek Sunday=1), so both sides use ISO day-of-week explicitly.",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       EXTRACT(isodow FROM o_orderdate) AS iso_dow,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3
ORDER BY yr, qtr, iso_dow
""",
    tags=("relational",),
)
def q27_orders_by_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("yr", "qtr", "iso_dow")
    )


# ---------------------------------------------------------------------------
# q28 — rolling z-score anomaly detection over the events stream.
# ---------------------------------------------------------------------------
@register(
    "q28_events_zscore_anomaly",
    extra=True,
    doc="Per event: z-score of `value` against the same user's preceding "
    "20 events (ROWS frame, excluding current) — the classic streaming "
    "ops-metric anomaly rule, batch-expressed. One shuffle on user_id; "
    "the window's sum/sum-of-squares accumulate in exact DECIMAL "
    "(Spark multiplies at width 18 — a 19x19 product would overflow "
    "precision 38 and silently truncate the scale; the oracle keeps "
    "width 19 to stay off DuckDB's int64 multiply path) and reach "
    "DOUBLE through the correctly-rounded VARCHAR hop, making the "
    "double-valued z bit-identical across engines at any magnitude.",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
    COUNT(*) OVER win AS n,
    CAST(SUM(CAST(value AS DECIMAL(19,6))) OVER win
         AS DECIMAL(19,6)) AS s_dec,
    CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
         OVER win AS DECIMAL(30,12)) AS sq_dec,
    CAST(CAST(SUM(CAST(value AS DECIMAL(19,6))) OVER win AS VARCHAR)
         AS DOUBLE) AS s,
    CAST(CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
         OVER win AS VARCHAR) AS DOUBLE) AS sq
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id,
  CAST(n AS BIGINT) AS n_window,
  (v - s / n) / sqrt((sq - s * s / n) / (n - 1)) AS z
FROM w
WHERE n >= 5
  AND CAST(n AS DECIMAL(3,0)) * sq_dec > s_dec * s_dec
  AND (sq - s * s / n) > 0
ORDER BY event_id
""",
    tags=("relational",),
)
def q28_events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    # width 18, not 19: Spark's (19,6)x(19,6) product needs precision
    # 39 and truncates the scale to 11 per row (the q08 bug class,
    # caught at sf1.0 where replicated events make near-zero-variance
    # windows that amplify the loss). (18,6)x(18,6) = (37,12), exact.
    d = F.col("value").cast("decimal(18,6)")
    n = F.count(F.lit(1)).over(win)
    s_dec = F.sum(d).over(win).cast("decimal(18,6)")
    # (30,12), not (26,12): 18 integer digits lets the sum-of-squares
    # hold |value| up to ~2e8 over a 20-row window; at (26,12) a window
    # of ~1e8 values overflows the cast — an ANSI error, not a wrong
    # answer, but the operator should survive any plausible metric
    # magnitude (review catch)
    sq_dec = F.sum(d * d).over(win).cast("decimal(30,12)")
    s = s_dec.cast("double")
    sq = sq_dec.cast("double")
    v = F.col("value").cast("double")
    var = (sq - s * s / n) / (n - 1)
    z = (v - s / n) / F.sqrt(var)
    # Degenerate windows (all values equal -> true variance ZERO) must
    # be excluded by the EXACT integer identity n*Σx² > (Σx)², not by
    # `float_var > 0`: the float variance of a zero-variance window is
    # pure cancellation noise, and the resulting z (deviation / noise)
    # is astronomically large AND engine-dependent. z itself is
    # emitted as the raw double — every op in its chain is IEEE
    # correctly-rounded on bit-identical inputs, whereas ROUND on a
    # ~1e9 double disagrees between engines (the rounding grain sits
    # below the double's own resolution there).
    nondegenerate = (
        n.cast("decimal(3,0)") * sq_dec > s_dec * s_dec
    )
    # The converse hazard (review catch): a window whose TRUE variance
    # is positive but tiny relative to the values' magnitude passes the
    # exact identity while the FLOAT sq - s*s/n cancels to <= 0 — then
    # sqrt gives NaN (or z = ±Inf at exactly 0.0). Both engines compute
    # the identical doubles, so guarding on the float sign is itself
    # bit-portable; the dropped rows are exactly the cancellation-
    # dominated ones whose z would be numeric noise anyway.
    float_positive = (sq - s * s / n) > 0
    return (
        ev.select(
            "event_id",
            n.cast("bigint").alias("n_window"),
            (nondegenerate & float_positive).alias("__nd"),
            z.alias("z"),
        )
        .where((F.col("n_window") >= 5) & F.col("__nd"))
        .drop("__nd")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q29 — SCD2 interval history (slowly-changing-dimension type 2).
# ---------------------------------------------------------------------------
@register(
    "q29_scd2_intervals",
    extra=True,
    doc="SCD2 history build: each per-user event version becomes a "
    "[valid_from, valid_to) interval via lead() over (ts, event_id) — "
    "the standard warehouse dimension-history shape, one window "
    "shuffle on the natural key. The open (current) version has NULL "
    "valid_to; a point-in-time lookup is then an asof/range probe "
    "(see operators/joins.py::asof_join).",
    oracle="""
SELECT user_id, event_id,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM events
ORDER BY user_id, valid_from, event_id
""",
    tags=("relational",),
)
def q29_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


# ---------------------------------------------------------------------------
# q30 — CUBE + GROUPING() ids: the full 2^k grouping-sets lattice.
# ---------------------------------------------------------------------------
@register(
    "q30_cube_status_year",
    extra=True,
    doc="CUBE(o_orderstatus, order-year) order-value lattice with the "
    "GROUPING_ID disambiguator (a real 'ALL' vs a NULL-valued group "
    "key stay distinct — COALESCE alone cannot). One pass over "
    "orders; Spark expands the cube into a single Expand+Aggregate "
    "(partial map-side combine on all 4 grouping sets at once), so "
    "the lattice costs one shuffle, not 2^k scans. Exact DECIMAL "
    "money sum.",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), -1) AS order_year,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(EXTRACT(year FROM o_orderdate)) AS INT)
         AS gid,
       COUNT(*) AS n_orders,
       {sql_out("SUM(CAST(o_totalprice AS DECIMAL(18,6)))")} AS total_value
FROM orders
GROUP BY CUBE(o_orderstatus, EXTRACT(year FROM o_orderdate))
ORDER BY gid, status, order_year
""",
    tags=("relational",),
)
def q30_cube_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.col("o_totalprice"),
    )
    return (
        orders.cube("o_orderstatus", "yr")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            out_double(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            ).alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("yr", F.lit(-1)).alias("order_year"),
            "gid",
            "n_orders",
            "total_value",
        )
        .orderBy("gid", "status", "order_year")
    )


# ---------------------------------------------------------------------------
# q31 — multi-step event funnel (strict temporal ordering per user).
# ---------------------------------------------------------------------------
@register(
    "q31_event_funnel",
    extra=True,
    doc="view -> click -> purchase conversion funnel: per user, the "
    "earliest view, the earliest click STRICTLY AFTER that view, the "
    "earliest purchase strictly after that click; one output row per "
    "step with the surviving-user count. Each step is one "
    "type-filtered scan joined on user_id to the previous step's "
    "(user, ts) frontier — key-partitioned joins and "
    "map-side-combined MIN aggregates, no windows, no per-user event "
    "arrays materialized.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
) ORDER BY step_idx
""",
    tags=("relational",),
)
def q31_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def step(prev: DataFrame | None, etype: str) -> DataFrame:
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col("t")).drop("t")
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = step(None, "view")
    c = step(v, "click")
    p = step(c, "purchase")
    counts = [
        (1, "view", v),
        (2, "click", c),
        (3, "purchase", p),
    ]
    out = None
    for idx, name, frame in counts:
        row = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("step_idx"), F.lit(name).alias("step"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step_idx")


# ---------------------------------------------------------------------------
# q32 — cohort retention triangle.
# ---------------------------------------------------------------------------
@register(
    "q32_cohort_retention",
    extra=True,
    doc="Weekly cohort retention: users cohorted by first-seen week; "
    "retention(k) = share of the cohort active k weeks later. One "
    "groupBy(user) for the cohort assignment, one distinct over "
    "(user, week) activity, a user-keyed join, and a (cohort, offset) "
    "aggregate — all map-side-combined key shuffles; cohort sizes "
    "re-enter via a weeks-sized join AQE broadcasts on its own. "
    "Percentages are exact-integer-derived (100.0*n/n over day counts "
    "that are multiples of 7), rounded to 2.",
    oracle="""
WITH firstw AS (
  SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cw
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS w FROM events
), cohort_sizes AS (
  SELECT cw, COUNT(*) AS n_cohort FROM firstw GROUP BY cw
), joined AS (
  SELECT f.cw, CAST(date_diff('day', f.cw, a.w) / 7 AS INT) AS week_offset,
         a.user_id
  FROM firstw f JOIN active a ON f.user_id = a.user_id
)
SELECT STRFTIME(j.cw, '%Y-%m-%d') AS cohort_week,
       j.week_offset,
       COUNT(*) AS n_active,
       MAX(cs.n_cohort) AS n_cohort,
       CAST(ROUND(100.0 * COUNT(*) / MAX(cs.n_cohort), 2) AS DOUBLE)
         AS retention_pct
FROM joined j JOIN cohort_sizes cs ON j.cw = cs.cw
GROUP BY j.cw, j.week_offset
ORDER BY cohort_week, week_offset
""",
    tags=("relational",),
)
def q32_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    )
    firstw = ev.groupBy("user_id").agg(F.min("w").alias("cw"))
    active = ev.distinct()
    sizes = firstw.groupBy("cw").agg(F.count(F.lit(1)).alias("n_cohort"))
    joined = firstw.join(active, "user_id").select(
        "cw",
        (F.datediff(F.col("w"), F.col("cw")) / 7).cast("int").alias("week_offset"),
    )
    return (
        joined.join(sizes, "cw")
        .groupBy("cw", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.max("n_cohort").alias("n_cohort"),
        )
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(100.0 * F.col("n_active") / F.col("n_cohort"), 2)
            .cast("double")
            .alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q43 — unkeyed overlapping range join (the nested-loop-explosion case).
# ---------------------------------------------------------------------------
@register(
    "q43_range_point_join",
    extra=True,
    doc="Point-in-interval aggregation over OVERLAPPING, unkeyed "
    "windows: every 97th event spawns a ±2-minute window, and each "
    "window counts/sums ALL events inside it. The raw theta join "
    "(p BETWEEN lo AND hi) plans as a nested-loop explosion; "
    "range_point_join bucketizes epoch-microsecond time so it becomes "
    "one equi-join on the bucket id with bounded interval replication "
    "— the keyed-SCD2 interval_join and one-match asof_join cannot "
    "express this shape. Oracle is the literal theta join.",
    oracle=f"""
WITH iv AS (
  SELECT event_id AS interval_id,
         epoch_us(ts) - 120000000 AS lo,
         epoch_us(ts) + 120000000 AS hi
  FROM events WHERE event_id % 97 = 0
),
p AS (SELECT epoch_us(ts) AS pu, value FROM events)
SELECT iv.interval_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_out("SUM(CAST(p.value AS DECIMAL(18,6)))")} AS sum_value
FROM iv JOIN p ON p.pu BETWEEN iv.lo AND iv.hi
GROUP BY iv.interval_id
ORDER BY interval_id
""",
    tags=("relational", "joins"),
)
def q43_range_point_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.joins import range_point_join

    ev = t(spark, sf_dir, "events")
    points = ev.select(
        F.unix_micros("ts").alias("pu"), F.col("value")
    )
    intervals = ev.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("interval_id"),
        (F.unix_micros("ts") - 120_000_000).alias("lo"),
        (F.unix_micros("ts") + 120_000_000).alias("hi"),
    )
    return (
        range_point_join(points, intervals, "pu", "lo", "hi")
        .groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            out_double(F.sum(dec("value"))).alias("sum_value"),
        )
        .orderBy("interval_id")
    )


# ---------------------------------------------------------------------------
# q44 — robust anomaly scan: exact median/IQR bounds, no sort, no window.
# ---------------------------------------------------------------------------
@register(
    "q44_anomaly_scan",
    extra=True,
    doc="Robust outlier scan over events: per event_type EXACT "
    "median/IQR (grouped histogram selection in integer cents — no "
    "window, no sort) give Tukey-style bounds median ± 3*(q75-q25); "
    "events outside are anomalies. Counts and bounds are all exact "
    "integers, so the oracle's literal per-type rank definition "
    "replays bit-for-bit. The monitoring sweep a pipeline runs before "
    "trusting a new feed.",
    oracle="""
WITH v AS (
  SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
nn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY g),
r AS (
  SELECT g, cents, ROW_NUMBER() OVER (PARTITION BY g ORDER BY cents) AS rn
  FROM v
),
q AS (
  SELECT w.g, w.p_num,
         MIN(r.cents) AS val
  FROM (
    SELECT nn.g, t.p_num, (t.p_num * nn.n + 3) // 4 AS rank
    FROM nn, (VALUES (1), (2), (3)) AS t(p_num)
  ) w JOIN r ON r.g = w.g AND r.rn >= w.rank
  GROUP BY w.g, w.p_num
),
b AS (
  SELECT g,
         MAX(CASE WHEN p_num = 2 THEN val END)
           - 3 * (MAX(CASE WHEN p_num = 3 THEN val END)
                  - MAX(CASE WHEN p_num = 1 THEN val END)) AS lo,
         MAX(CASE WHEN p_num = 2 THEN val END)
           + 3 * (MAX(CASE WHEN p_num = 3 THEN val END)
                  - MAX(CASE WHEN p_num = 1 THEN val END)) AS hi
  FROM q GROUP BY g
)
SELECT v.g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN v.cents < b.lo OR v.cents > b.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       b.lo AS lo_cents, b.hi AS hi_cents
FROM v JOIN b USING (g)
GROUP BY v.g, b.lo, b.hi
ORDER BY event_type
""",
    tags=("relational", "profile"),
)
def q44_anomaly_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.profile import grouped_exact_quantiles

    ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    quart = grouped_exact_quantiles(
        ev, "event_type", cents, ps=((1, 4), (1, 2), (3, 4))
    )
    bounds = (
        quart.groupBy("event_type")
        .agg(
            # key on BOTH p_num and p_den: a bare p_num == 1 would match
            # the (1,2) median row too and silently take max(q25, med)
            F.max(
                F.when(
                    (F.col("p_num") == 1) & (F.col("p_den") == 4),
                    F.col("value"),
                )
            ).alias("q25"),
            F.max(
                F.when(
                    (F.col("p_num") == 1) & (F.col("p_den") == 2),
                    F.col("value"),
                )
            ).alias("med"),
            F.max(
                F.when(
                    (F.col("p_num") == 3) & (F.col("p_den") == 4),
                    F.col("value"),
                )
            ).alias("q75"),
        )
        .select(
            "event_type",
            (F.col("med") - 3 * (F.col("q75") - F.col("q25"))).alias("lo"),
            (F.col("med") + 3 * (F.col("q75") - F.col("q25"))).alias("hi"),
        )
    )
    return (
        ev.select("event_type", cents.alias("cents"))
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    (F.col("cents") < F.col("lo"))
                    | (F.col("cents") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .select(
            "event_type", "n_events", "n_anomalies",
            F.col("lo").alias("lo_cents"), F.col("hi").alias("hi_cents"),
        )
        .orderBy("event_type")
    )
