"""Relational substrate queries (SURVEY.md §2.6) with DuckDB oracles.

The reference delegates all relational work to DuckDB; this module is the
proof that the Spark engine clears the same bar — scans, projections,
filters, equi-joins (broadcast + shuffled), aggregates, windows,
DISTINCT-ON/top-1-per-group, deterministic sampling orderings, rollups,
percentiles — expressed declaratively so Catalyst supplies pushdown,
pruning, join selection, and AQE.

Scale notes (100 TB design stance), per query, in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table
from quackml_spark.plans._exact import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    dec,
    disc_price,
    one,
    out_double,
    sql_out,
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): filter + wide aggregate.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    doc="Filter pushdown + grouped exact aggregates over lineitem "
    "(reference relies on DuckDB for scan/agg: snapshot.rs:778-801).",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  {sql_out("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} AS sum_qty,
  {sql_out("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} AS sum_base_price,
  {sql_out(f"SUM({SQL_DISC_PRICE})")} AS sum_disc_price,
  {sql_out(f"SUM({SQL_CHARGE})")} AS sum_charge,
  {sql_out("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} / COUNT(*) AS avg_qty,
  {sql_out("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} / COUNT(*) AS avg_price,
  {sql_out("SUM(CAST(l_discount AS DECIMAL(12,6)))")} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("relational", "bench"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: single scan + partial (map-side) aggregation into a tiny
    # grouped result — the shuffle moves only |groups| * partitions rows.
    li = t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            out_double(F.sum(dec("l_quantity"))).alias("sum_qty"),
            out_double(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            out_double(F.sum(disc_price())).alias("sum_disc_price"),
            out_double(F.sum(charge())).alias("sum_charge"),
            (out_double(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
            (out_double(F.sum(dec("l_extendedprice"))) / cnt).alias("avg_price"),
            (out_double(F.sum(dec("l_discount", 12))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — regional revenue: 5-way join with broadcast dimensions.
# ---------------------------------------------------------------------------
@register(
    "q02_regional_revenue",
    extra=True,
    doc="lineitem⋈orders⋈customer⋈nation⋈region; nation/region broadcast "
    "(catalog views in the reference join 3-4 ways: schema.sql:146-209).",
    oracle=f"""
SELECT r_name, n_name,
  {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue,
  COUNT(*) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""",
    tags=("relational", "bench"),
)
def q02_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: orders/customer join shuffles on keys (AQE picks broadcast if
    # the filtered side is small); nation (25) and region (5) are
    # *explicitly* broadcast — they are constant-size at any SF.
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    # Partial aggregation below the join: lineitem collapses to one
    # (DECIMAL revenue, line count) row per order before shuffling —
    # exact under re-aggregation (DECIMAL sums are associative), and the
    # join moves |orders| rows instead of |lineitem|.
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(disc_price()).alias("__rev"), F.count(F.lit(1)).alias("__nl")
    )
    return (
        li_agg.join(orders, li_agg.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            out_double(F.sum("__rev")).alias("revenue"),
            F.sum("__nl").alias("line_count"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# q03 — top-k by computed aggregate with deterministic tiebreak.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    doc="Join + aggregate + ORDER BY/LIMIT top-k (reference: best-model "
    "selection ORDER BY ... LIMIT 1, api.rs:748-783).",
    oracle=f"""
SELECT o_orderkey,
  {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("relational", "bench"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: TakeOrderedAndProject — Spark computes per-partition top-10
    # then merges on the driver; no global sort materialization.
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    # Pre-aggregate lineitem revenue per orderkey before the joins: the
    # join input shrinks |lineitem| -> |orders| and the shuffle moves
    # one DECIMAL per order instead of every line (map-side combine).
    li_rev = li.groupBy("l_orderkey").agg(F.sum(disc_price()).alias("__rev"))
    return (
        li_rev.join(orders, li_rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            out_double(F.col("__rev")).alias("revenue"),
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS / semi-join.
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority",
    extra=True,
    doc="Semi-join (EXISTS) + grouped count — Spark LEFT SEMI join.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational",),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: left-semi shuffles only (orderkey, shipdate) after pruning;
    # count aggregates map-side.
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — DISTINCT ON / latest-per-group (deployment resolution idiom).
# ---------------------------------------------------------------------------
@register(
    "q05_latest_order_per_customer",
    extra=True,
    doc="DISTINCT ON(project_id) ... ORDER BY created_at DESC parity "
    "(schema.sql:182-186) as row_number()=1.",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) o
JOIN customer ON o_custkey = c_custkey
WHERE rn = 1
ORDER BY c_custkey
""",
    tags=("relational",),
)
def q05_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle on o_custkey for the window; the customer join
    # reuses nothing but is an equi-join AQE can broadcast at low SF.
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        latest.join(cust, latest.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q06 — running total window aggregate (exact decimal).
# ---------------------------------------------------------------------------
@register(
    "q06_running_total",
    extra=True,
    doc="Window running SUM per customer — exact decimal so the running "
    "values are partitioning-independent.",
    oracle=f"""
SELECT o_custkey, o_orderkey,
  {sql_out("SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
""",
    tags=("relational",),
)
def q06_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            out_double(F.sum(dec("o_totalprice")).over(w)).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q07 — time-bucketed aggregation over the events table.
# ---------------------------------------------------------------------------
@register(
    "q07_events_hourly",
    extra=True,
    doc="Tumbling 1-hour aggregation over events (batch twin of the "
    "streaming operator in quackml_spark.streaming).",
    oracle=f"""
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  {sql_out("SUM(CAST(value AS DECIMAL(18,6)))")} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("relational", "bench"),
)
def q07_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            out_double(F.sum(dec("value"))).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# q08 — per-group column statistics (snapshot analyze parity).
# ---------------------------------------------------------------------------
@register(
    "q08_segment_stats",
    extra=True,
    doc="Column::analyze-style statistics (snapshot.rs:252-366): "
    "min/max/mean/variance computed via exact decimal sums.",
    oracle=f"""
SELECT c_mktsegment,
  COUNT(*) AS n,
  COUNT(DISTINCT c_nationkey) AS distinct_nations,
  MIN(c_acctbal) AS min_bal,
  MAX(c_acctbal) AS max_bal,
  {sql_out("SUM(CAST(c_acctbal AS DECIMAL(18,6)))")} / COUNT(*) AS mean_bal,
  ({sql_out("SUM(CAST(c_acctbal AS DECIMAL(19,6)) * CAST(c_acctbal AS DECIMAL(19,6)))")}
   - {sql_out("SUM(CAST(c_acctbal AS DECIMAL(18,6)))")}
     * {sql_out("SUM(CAST(c_acctbal AS DECIMAL(18,6)))")} / COUNT(*)
  ) / (COUNT(*) - 1) AS var_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("relational", "ml"),
)
def q08_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    # ASYMMETRIC widths, both exact: Spark multiplies at (18,6) — a
    # (19,6)x(19,6) product needs precision 39 > 38 and Spark resolves
    # the overflow by TRUNCATING the scale to 11, which accumulated
    # half-ulp-per-row losses into the 6th decimal of var_bal at sf0.1
    # (caught by tools/sweep_oracles.py; invisible at sf<=0.01). The
    # DuckDB oracle keeps (19,6) factors because DuckDB multiplies
    # width-18 decimals in int64, which overflows per-row — width 19
    # forces int128. (18,6)x(18,6)=(37,12) in Spark and
    # (19,6)x(19,6)=(38,12) in DuckDB are both EXACT, so the sums are
    # equal.
    bal = dec("c_acctbal", 18)
    n = F.count(F.lit(1))
    s1 = out_double(F.sum(bal))
    s2 = out_double(F.sum(bal * bal))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            n.alias("n"),
            F.countDistinct("c_nationkey").alias("distinct_nations"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            (s1 / n).alias("mean_bal"),
            ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("var_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q09 — deterministic stratified split (sampling.rs parity).
# ---------------------------------------------------------------------------
@register(
    "q09_stratified_split",
    doc="Stratified train/test assignment (sampling.rs:54-68) made "
    "deterministic: ORDER BY RANDOM() → ORDER BY md5(key). Returns "
    "per-(segment, split) counts at test_size=0.25.",
    oracle="""
SELECT c_mktsegment, split, COUNT(*) AS n
FROM (
  SELECT c_mktsegment,
         CASE WHEN rn <= CAST(FLOOR(cnt * 0.75) AS BIGINT)
              THEN 'train' ELSE 'test' END AS split
  FROM (
    SELECT c_mktsegment,
           ROW_NUMBER() OVER (
             PARTITION BY c_mktsegment
             ORDER BY MD5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn,
           COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
    FROM customer
  )
)
GROUP BY c_mktsegment, split
ORDER BY c_mktsegment, split
""",
    tags=("relational", "ml"),
)
def q09_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    wc = Window.partitionBy("c_mktsegment")
    return (
        cust.select(
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("cnt"),
        )
        .withColumn(
            "split",
            F.when(
                F.col("rn") <= F.floor(F.col("cnt") * 0.75).cast("bigint"),
                F.lit("train"),
            ).otherwise(F.lit("test")),
        )
        .groupBy("c_mktsegment", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "split")
    )


# ---------------------------------------------------------------------------
# q10 — exact interpolated percentiles per group.
# ---------------------------------------------------------------------------
@register(
    "q10_group_percentiles",
    extra=True,
    doc="Exact percentiles (snapshot ventiles, snapshot.rs:279-363): Spark "
    "percentile() and DuckDB quantile_cont use the same interpolation.",
    oracle=f"""
SELECT l_returnflag,
  {sql_out("CAST(QUANTILE_CONT(l_quantity, 0.5) AS DECIMAL(18,6))")} AS median_qty,
  {sql_out("CAST(QUANTILE_CONT(l_quantity, 0.9) AS DECIMAL(18,6))")} AS p90_qty,
  {sql_out("CAST(QUANTILE_CONT(l_extendedprice, 0.5) AS DECIMAL(18,6))")} AS median_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "ml"),
)
def q10_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            out_double(F.percentile("l_quantity", F.lit(0.5)).cast("decimal(18,6)")).alias(
                "median_qty"
            ),
            out_double(F.percentile("l_quantity", F.lit(0.9)).cast("decimal(18,6)")).alias(
                "p90_qty"
            ),
            out_double(
                F.percentile("l_extendedprice", F.lit(0.5)).cast("decimal(18,6)")
            ).alias("median_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q11 — closed-form OLS via exact sums (train(linear) oracle).
# ---------------------------------------------------------------------------
@register(
    "q11_ols_closed_form",
    extra=True,
    doc="Simple linear regression (slope/intercept/r2) computed from exact "
    "decimal moment sums — the SQL-expressible oracle for "
    "train(task='regression', algorithm='linear').",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag AS grp,
    COUNT(*) AS n,
    {sql_out("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} AS sx,
    {sql_out("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} AS sy,
    {sql_out("SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6)))")} AS sxx,
    {sql_out("SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)))")} AS syy,
    {sql_out("SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)))")} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT grp, n,
  CAST(ROUND(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DECIMAL(28,10)), 6) AS DOUBLE) AS slope,
  CAST(ROUND(CAST((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS DECIMAL(28,10)), 6) AS DOUBLE) AS intercept,
  CAST(ROUND(CAST(
    ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS DECIMAL(28,10)), 6) AS DOUBLE) AS r2
FROM m
ORDER BY grp
""",
    tags=("relational", "ml", "bench"),
)
def q11_ols_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # width 18, not 19, on the SPARK side: a (19,6)x(19,6) product needs
    # precision 39 > 38 and Spark silently truncates the scale to 11 per
    # row — the q08 bug class (commit f20bd2b), latent here until a
    # larger SF amplifies the cancellation-prone n*sxx - sx*sx forms
    # (review catch). The oracle keeps width 19: DuckDB's width-18
    # multiply runs in int64 and overflows per-row.
    x = dec("l_quantity", 18)
    y = dec("l_extendedprice", 18)
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        out_double(F.sum(x)).alias("sx"),
        out_double(F.sum(y)).alias("sy"),
        out_double(F.sum(x * x)).alias("sxx"),
        out_double(F.sum(y * y)).alias("syy"),
        out_double(F.sum(x * y)).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )

    def rd(c):
        return F.round(c.cast("decimal(28,10)"), 6).cast("double")

    return m.select(
        "grp",
        "n",
        rd(slope).alias("slope"),
        rd(intercept).alias("intercept"),
        rd(r2).alias("r2"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# q12 — top-k per group (rank window).
# ---------------------------------------------------------------------------
@register(
    "q12_top_parts_per_brand",
    doc="Top-3 revenue parts per brand — rank() over aggregated revenue.",
    oracle=f"""
SELECT p_brand, p_partkey, revenue, rnk FROM (
  SELECT p_brand, p_partkey, revenue,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
  FROM (
    SELECT p_brand, p_partkey,
      {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_partkey
  )
)
WHERE rnk <= 3
ORDER BY p_brand, rnk
""",
    tags=("relational", "bench"),
)
def q12_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: part is the small side at any SF ratio (1:30 vs lineitem) but
    # grows with SF — leave the join strategy to AQE rather than forcing a
    # broadcast that would OOM at SF1e4; aggregate before ranking so the
    # window input is |parts|, not |lineitem|.
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Pre-aggregate lineitem to |parts| rows BEFORE the join — the join
    # then moves 30× fewer rows, and the partkey grouping is exact
    # because p_partkey is part's key (brand is functionally dependent).
    li_rev = li.groupBy("l_partkey").agg(F.sum(disc_price()).alias("__rev"))
    rev = (
        li_rev.join(part, li_rev.l_partkey == part.p_partkey)
        .select("p_brand", "p_partkey", out_double(F.col("__rev")).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .orderBy("p_brand", "rnk")
    )


# ---------------------------------------------------------------------------
# q13 — ROLLUP hierarchy aggregate.
# ---------------------------------------------------------------------------
@register(
    "q13_rollup_revenue",
    extra=True,
    doc="ROLLUP(region, nation) revenue — grouping-sets aggregate.",
    oracle=f"""
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       {sql_out(f"SUM({SQL_DISC_PRICE})")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY region, nation
""",
    tags=("relational",),
)
def q13_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(out_double(F.sum(disc_price())).alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
        )
        .orderBy("region", "nation")
    )
