"""Model monitoring: feature-drift detection between serving windows.

The reference has no monitoring surface; a production engine needs one
— a deployed model's inputs drift, and the catalog's deployment
lifecycle (deploy/rollback) is only actionable with a drift signal.

``feature_drift_psi`` computes the Population Stability Index per
feature between a reference window and a current window:

    PSI = Σ_bins (cur% − ref%) · ln(cur% / ref%)

over ``n_bins`` equal-width bins spanning the combined min/max, with
the standard 1e-6 floor on empty-bin rates. Rule of thumb: <0.1 stable,
0.1–0.25 moderate drift, >0.25 action.

Scale shape (all features in ONE pass): the features are stacked into a
(feature, value, window) relation, so k features cost one span
aggregate + one bucketize+groupBy over the serving log — two
map-side-combined jobs total, independent of k, with zero driver
collects. Works identically as a batch audit or a foreachBatch hook on
a scoring stream (see streaming.events.drift_monitor_stream).

``feature_drift_ks`` is the exact two-sample Kolmogorov–Smirnov
statistic. Its CDF cumsum runs as the two-phase shard-offset pattern
(per-shard partial sums -> bounded offset collect -> intra-shard
window), so the plan never contains a partition-less window; above
``max_distinct`` distinct values the feature is auto-binned first (the
grouped relation, not the raw data, is re-binned — no extra scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from quackml_spark.session import local_rows

EPS = 1e-6


def feature_drift_psi(
    df: DataFrame,
    features: list[str],
    window_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """PSI per feature between window_col==false (reference) and
    window_col==true (current). Returns (feature, psi, n_bins), one row
    per feature that has at least one non-null value (an all-null or
    empty feature yields no row rather than a crash — check the output
    row count if you need to assert coverage).

    Single pass over ``df`` for all k features: stack -> per-feature
    span aggregate -> broadcast the k-row span table back -> bucketize
    -> groupBy(feature, bin). No driver collect anywhere; the plan is
    two shuffles of (feature, bin)-sized data regardless of k.
    """
    if not features:
        raise ValueError("feature_drift_psi: empty feature list")
    win = window_col.cast("int")
    cols = [
        F.col(f).cast("double").alias(f"__f{i}") for i, f in enumerate(features)
    ]
    stack_args = ", ".join(
        "'{}', __f{}".format(feat.replace("'", "\\'"), i)
        for i, feat in enumerate(features)
    )
    stacked = (
        df.select(win.alias("win"), *cols)
        .select(
            "win",
            F.expr(f"stack({len(features)}, {stack_args}) as (feature, v)"),
        )
        .where(F.col("v").isNotNull())
    )
    spans = stacked.groupBy("feature").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    width = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / n_bins
    ).otherwise(F.lit(1.0))
    binned = stacked.join(F.broadcast(spans), "feature").select(
        "feature",
        "win",
        F.least(
            F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("win") == 0, 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(F.col("win") == 1, 1).otherwise(0)).alias("cur_n"),
    )
    tot = counts.groupBy("feature").agg(
        F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
    )
    r = F.greatest(F.col("ref_n") / F.col("ref_t"), F.lit(EPS))
    c = F.greatest(F.col("cur_n") / F.col("cur_t"), F.lit(EPS))
    # A feature with ZERO rows in one window has no distribution to
    # compare: 0/0 is NULL, greatest() skips NULLs, and every bin rate
    # floors to eps — PSI ≈ ln(1/eps) ≈ 13.8, fake extreme drift that
    # would fire auto-rollback on every batch (review catch). Fail
    # loudly instead, the same contract as the KS twin below; the
    # raise_error stays inside the lazy plan, so the check costs
    # nothing until the bad case actually exists.
    bad = (F.col("ref_t") == 0) | (F.col("cur_t") == 0)
    err = F.raise_error(
        F.concat(
            F.lit("feature_drift_psi: feature '"),
            F.col("feature"),
            F.lit(
                "' has zero rows in one window — PSI is undefined; "
                "check the window predicate"
            ),
        )
    ).cast("double")
    term = F.when(bad, err).otherwise((c - r) * F.log(c / r))
    return (
        counts.join(F.broadcast(tot), "feature")
        .groupBy("feature")
        .agg(
            F.round(F.sum(term), 6).alias("psi"),
            F.count(F.lit(1)).alias("n_bins"),
        )
        .orderBy("feature")
    )


def feature_drift_ks(
    df: DataFrame,
    feature: str,
    window_col: Column,
    max_distinct: int = 100_000,
    auto_bins: int = 10_000,
    n_shards: int = 32,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    reference (window_col==false) and current (window_col==true)
    windows: max |F_ref(v) − F_cur(v)| over observed values.

    Scale shape: groupBy(value) first (map-side combine shrinks the
    relation to |distinct values| rows). If the grouped relation still
    exceeds ``max_distinct`` rows the GROUPED relation is re-binned
    into ``auto_bins`` equal-width bins (weighted by the grouped counts
    — no second scan of the raw data); KS over binned values is the
    discrete KS of the binned distributions, exact to bin resolution.
    The CDF cumsum then runs two-phase: percentile-derived range shards
    -> per-shard partial sums (bounded ``n_shards``-row collect) ->
    intra-shard window with the shard offset added. The plan contains
    no partition-less window at any cardinality.

    Raises ValueError when either window has no non-null values (a KS
    statistic against an empty sample is undefined).
    """
    v = F.col(feature).cast("double")
    win = window_col.cast("int")
    # `grouped` stays bound to the PERSISTED relation for the whole
    # function — `counts` may be rebound to the re-binned view below,
    # and unpersisting the rebound name would leak the cached original
    # in the CacheManager forever (one leaked entry per monitoring
    # call). The cache serves the 3-4 eager aggregates here; the
    # returned lazy one-row plan recomputes the grouped scan once when
    # the caller evaluates it, which is the deliberate trade against
    # holding cache entries across the function boundary.
    grouped = (
        df.select(v.alias("v"), win.alias("win"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("win") == 0, 1).otherwise(0)).alias("ref_n"),
            F.sum(F.when(F.col("win") == 1, 1).otherwise(0)).alias("cur_n"),
        )
    ).persist()
    counts = grouped
    try:
        n_vals = counts.count()
        if n_vals == 0:
            raise ValueError(
                f"feature_drift_ks: no non-null values for {feature!r}"
            )
        if n_vals > max_distinct:
            span = counts.agg(
                F.min("v").alias("lo"), F.max("v").alias("hi")
            ).collect()[0]
            lo, hi = float(span["lo"]), float(span["hi"])
            width = (hi - lo) / auto_bins or 1.0
            bin_edge = (
                F.least(
                    F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                    F.lit(auto_bins - 1),
                )
                * F.lit(width)
                + F.lit(lo)
            )
            counts = (
                counts.groupBy(bin_edge.alias("v"))
                .agg(F.sum("ref_n").alias("ref_n"), F.sum("cur_n").alias("cur_n"))
            )
        tot = counts.agg(
            F.sum("ref_n").alias("rt"), F.sum("cur_n").alias("ct")
        ).collect()[0]
        rt, ct = int(tot["rt"]), int(tot["ct"])
        if rt == 0 or ct == 0:
            raise ValueError(
                f"feature_drift_ks: the "
                f"{'reference' if rt == 0 else 'current'} window has no "
                f"non-null values for {feature!r}"
            )
        cdfs = _two_phase_cdf(counts, rt, ct, n_shards)
        return cdfs.agg(
            F.lit(feature).alias("feature"),
            F.round(F.max(F.abs(F.col("ref_cdf") - F.col("cur_cdf"))), 6).alias(
                "ks"
            ),
        )
    finally:
        grouped.unpersist()


def _two_phase_cdf(counts: DataFrame, rt: int, ct: int, n_shards: int) -> DataFrame:
    """Distributed cumsum over the value-ordered (v, ref_n, cur_n)
    relation: range-shard by approximate percentile boundaries, collect
    the bounded per-shard partial sums, broadcast cumulative offsets
    back, finish with an intra-shard window. Exact regardless of how
    uneven the percentile sharding is — the offsets carry the slack."""
    from pyspark.sql import Window as W

    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = counts.agg(
        F.percentile_approx("v", qs, 10_000).alias("b")
    ).collect()[0]["b"] or []
    # shard(v) = number of boundaries strictly below v — monotone in v,
    # so shard order IS value order and offsets compose correctly.
    barr = F.array(*[F.lit(float(b)) for b in bounds]) if bounds else F.array()
    shard = F.size(F.filter(barr, lambda x: x < F.col("v")))
    sharded = counts.withColumn("__shard", shard)
    shard_sums = (
        sharded.groupBy("__shard")
        .agg(F.sum("ref_n").alias("r"), F.sum("cur_n").alias("c"))
        .orderBy("__shard")
        .collect()
    )
    offs, r_run, c_run = [], 0, 0
    for row in shard_sums:
        offs.append((int(row["__shard"]), r_run, c_run))
        r_run += int(row["r"])
        c_run += int(row["c"])
    off_df = F.broadcast(
        local_rows(
            counts.sparkSession, offs, "__shard int, __roff bigint, __coff bigint"
        )
    )
    w = (
        W.partitionBy("__shard")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return sharded.join(off_df, "__shard").select(
        "v",
        ((F.col("__roff") + F.sum("ref_n").over(w)) / F.lit(float(rt))).alias(
            "ref_cdf"
        ),
        ((F.col("__coff") + F.sum("cur_n").over(w)) / F.lit(float(ct))).alias(
            "cur_cdf"
        ),
    )
