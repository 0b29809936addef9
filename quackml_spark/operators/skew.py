"""Skew-safe aggregation: the salted two-phase groupBy as an operator.

For a hot grouping key (one customer with 10% of all events, one
near-duplicate cluster, ...) a direct groupBy funnels the hot group
through one reducer. Salting splits phase 1 over ``n_salts`` reducers
and merges the partials in phase 2. The caller supplies RE-AGGREGATABLE
aggregate specs (sum/count/min/max — DECIMAL sums stay exact), so the
result is IDENTICAL to the direct groupBy; only the physical
distribution changes. q23_salted_aggregate is the oracle-checked
instance of this pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge function per phase-1 aggregate kind
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase grouped aggregation.

    ``aggs`` maps output name -> (kind, expression) with kind in
    {sum, count, min, max}. ``salt_on`` picks the salting hash input
    (defaults to a content hash of ALL columns: deterministic across
    task retries — a partition-id/monotonic-id salt could re-bucket rows
    when a failed map task recomputes, double-counting phase-1 partials
    against an earlier partial fetch).

    LIMITATION of the default content-hash salt: EXACTLY-duplicate rows
    (and any df whose columns equal the group keys) hash to one salt
    bucket, so the hot-key mitigation silently disappears for the
    classic duplicate-row hot key. When the input is a direct file scan,
    pass a retry-stable per-row ordinal instead, e.g.
    ``salt_on=F.col("_metadata.row_index")`` (the parquet row index —
    stable per (file, row) across task retries, unlike
    monotonically_increasing_id / spark_partition_id); otherwise pass
    any unique id column."""
    unknown = {k for k, (kind, _) in aggs.items() if kind not in _MERGE}
    if unknown:
        raise ValueError(f"non-re-aggregatable kinds for {sorted(unknown)}")
    salt_input = [salt_on] if salt_on is not None else [F.col(c) for c in df.columns]
    salt = F.pmod(F.xxhash64(*salt_input), F.lit(n_salts))
    phase1 = df.withColumn("__qml_salt", salt).groupBy(*keys, "__qml_salt")
    p1_aggs = []
    for name, (kind, expr) in aggs.items():
        fn = F.count if kind == "count" else getattr(F, kind)
        p1_aggs.append(fn(expr).alias(f"__p1_{name}"))
    partial = phase1.agg(*p1_aggs)
    p2_aggs = [
        _MERGE[kind](F.col(f"__p1_{name}")).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*p2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the BIG side's hot keys across
    ``n_salts`` reducers and replicate the SMALL side once per salt, so
    one hot join key no longer funnels through a single task. Results
    are row-identical to ``big.join(small, key, how)``; only the
    physical distribution changes. Use when AQE's runtime skew split
    can't engage (e.g. the skewed stage feeds a window) or when the
    skew is known up front.

    Supported ``how``: inner / left (the replicated-small shapes where
    per-row multiplicity is preserved). The salt input defaults to a
    content hash of the big side's columns — deterministic across task
    retries; pass a unique id column when big-side rows can be exact
    duplicates (same caveat as salted_groupby)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_input = (
        [salt_on] if salt_on is not None else [F.col(c) for c in big.columns]
    )
    salt = F.pmod(F.xxhash64(*salt_input), F.lit(n_salts))
    big_s = big.withColumn("__qml_salt", salt)
    small_s = small.withColumn(
        "__qml_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = big_s.join(small_s, [key, "__qml_salt"], how)
    return out.drop("__qml_salt")
