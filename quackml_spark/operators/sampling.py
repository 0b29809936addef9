"""Corpus mixing & deterministic sampling for training-data pipelines.

The last mile of a pretraining data pipeline: given cleaned, deduped
sources, pick WHAT ACTUALLY SHIPS — per-source budgets (chars/tokens),
mixture weights, and a reproducible sample that any worker on any
cluster derives identically (no RNG state, no seed files: membership is
a pure function of the row's id).

Scale shape: one map-side-combined aggregate for per-source totals
(|sources| rows — broadcast back), then a map-only hash filter over the
corpus. The sampling decision never shuffles the data; only the small
audit aggregate at the end regroups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table

PPM = 1_000_000


def hash_ppm(id_col, seed: int = 0):
    """Deterministic per-row draw in [0, 1e6): the first 8 md5 hex chars
    of "<seed>|<id>" as an integer, mod 1e6. Identical in DuckDB via
    ('0x' || substr(md5(...), 1, 8))::BIGINT % 1000000 — no engine RNG
    involved, so samples are reproducible across engines, retries, and
    partitionings."""
    key = F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % PPM


def mixture_sample(
    df: DataFrame,
    rates_ppm: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Keep each row iff its deterministic draw < its source's rate
    (parts-per-million). ``rates_ppm`` is a tiny (source, rate_ppm)
    table — broadcast, so sampling is a map-only filter."""
    return df.join(F.broadcast(rates_ppm), source_col).where(
        hash_ppm(id_col, seed) < F.col("rate_ppm")
    )


def budget_rates(
    df: DataFrame,
    budget_chars: int,
    source_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Integer ppm sampling rate per source to hit ``budget_chars``
    per source in expectation: floor(1e6 * budget / total), capped at
    1e6. Pure bigint arithmetic — bit-identical across engines."""
    totals = df.groupBy(source_col).agg(
        F.sum(weight_col).alias("total_chars"), F.count(F.lit(1)).alias("n_docs")
    )
    return totals.select(
        source_col,
        "total_chars",
        "n_docs",
        # PPM * budget precomputed in Python: the product exceeds int32
        # and must enter the plan as a single bigint literal
        F.least(
            F.lit(PPM).cast("bigint"),
            F.floor(F.lit(PPM * budget_chars) / F.col("total_chars")).cast("bigint"),
        ).alias("rate_ppm"),
    )


_BUDGET = 3000  # chars per source for the registered demo query


@register(
    "text_mixture_sample",
    doc="Per-source token-budget mixture sampling (the DoReMi/Pile-style "
    "mixture step): per-source char totals -> exact integer ppm rate to "
    "hit a 3000-char budget -> deterministic md5-hash membership -> "
    "per-source audit (kept docs/chars vs rate). The sample is a pure "
    "function of doc_id, reproducible across engines/retries/"
    "partitionings; the corpus itself is touched by one map-only "
    "filter (rates broadcast), never shuffled.",
    oracle=f"""
WITH rates AS (
  SELECT source,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(*) AS n_docs,
         LEAST(CAST({PPM} AS BIGINT),
               CAST(FLOOR({PPM * _BUDGET} / SUM(n_chars)) AS BIGINT)
         ) AS rate_ppm
  FROM documents GROUP BY source
), kept AS (
  SELECT d.source, d.doc_id, d.n_chars, r.rate_ppm, r.total_chars, r.n_docs
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE ('0x' || substr(md5('0|' || d.doc_id::VARCHAR), 1, 8))::BIGINT
        % {PPM} < r.rate_ppm
)
SELECT source,
       CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       MAX(total_chars) AS total_chars,
       MAX(rate_ppm) AS rate_ppm,
       COUNT(*) AS kept_docs,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM kept
GROUP BY source
ORDER BY source
""",
    tags=("textops", "bench"),
)
def text_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rates = budget_rates(docs, _BUDGET)
    kept = mixture_sample(docs, rates)
    return (
        kept.groupBy("source")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.max("total_chars").alias("total_chars"),
            F.max("rate_ppm").alias("rate_ppm"),
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )
