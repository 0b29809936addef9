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
from quackml_spark.session import local_rows
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
    per source in expectation: clamp(floor(1e6 * budget / total), 1,
    1e6). Pure bigint arithmetic — bit-identical across engines. The
    1-ppm floor keeps a source bigger than 1e6 x budget from flooring
    to rate 0 and vanishing from the mixture (a sub-ppm budget then
    overshoots: E[kept] = total/1e6 chars — minimal representation
    beats silent total exclusion; review-catch class shared with
    cluster_balanced_sample)."""
    totals = df.groupBy(source_col).agg(
        F.sum(weight_col).alias("total_chars"), F.count(F.lit(1)).alias("n_docs")
    )
    return totals.select(
        source_col,
        "total_chars",
        "n_docs",
        # PPM * budget precomputed in Python: the product exceeds int32
        # and must enter the plan as a single bigint literal
        F.greatest(
            F.lit(1).cast("bigint"),
            F.least(
                F.lit(PPM).cast("bigint"),
                # bigint `div`, not floor(double /) — r14 advice fix:
                # IEEE double floor diverges from the exact integer
                # quotient by 1 ppm once the product passes 2^53
                # (per-source budgets over ~9e9 chars), and curate's
                # inline budget stage computes the exact Python integer
                # floor it claims to replicate — the two now agree at
                # every magnitude.
                F.expr(f"{PPM * budget_chars} div total_chars"),
            ),
        ).alias("rate_ppm"),
    )


_BUDGET = 3000  # chars per source for the registered demo query


@register(
    "text_mixture_sample",
    extra=True,  # demoted r13 to free a graded slot: the sampling family
    # keeps text_dsir_select as its graded representative.
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
         GREATEST(CAST(1 AS BIGINT),
           LEAST(CAST({PPM} AS BIGINT),
                 CAST(FLOOR({PPM * _BUDGET} / SUM(n_chars)) AS BIGINT))
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


def weighted_sample(
    df: DataFrame,
    weight_col,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws key = ln(u)/w with u an md5-derived uniform in
    (0,1); the k LARGEST keys are exactly a weight-proportional sample.

    Deterministic (seeded md5, replayable in any engine) and fully
    distributed: the only non-map work is a TakeOrdered top-k — no
    global sort, no per-partition reservoir state. This is the
    quality-weighted corpus selection step (weight = token count,
    quality score, ...) next to text_token_budget_sample's budgeted
    variant."""
    from quackml_spark.operators.text import md5_int32

    u = (
        md5_int32(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))) + 1
    ) / F.lit(4294967297.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__es_key", key)
        .orderBy(F.desc("__es_key"), F.asc(id_col))
        .limit(k)
        .drop("__es_key")
    )


@register(
    "text_weighted_sample",
    extra=True,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis): "
    "20 docs drawn proportional to their character length via "
    "ln(md5-uniform)/weight keys — deterministic, engine-replayable, "
    "and distributed as a map-only key draw + TakeOrdered top-k (no "
    "global sort, no reservoir state).",
    oracle="""
SELECT doc_id, n_chars
FROM (
  SELECT doc_id, length(text) AS n_chars,
         ln((('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
            / 4294967297.0) / length(text) AS k
  FROM documents
)
ORDER BY k DESC, doc_id
LIMIT 20
""",
    tags=("textops", "sampling"),
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    return weighted_sample(docs, "n_chars", 20, seed=0)


def temperature_rates(
    df: DataFrame,
    budget_chars: int,
    alpha: float = 0.5,
    source_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Temperature-based mixture rates (XLM-R / mT5 style): source i
    gets budget share ∝ (chars_i)^alpha, flattening the head so
    low-resource sources are up-sampled relative to proportional
    sampling (alpha=1 reduces to proportional; alpha→0 to uniform).

    rate_ppm_i = min(PPM, floor(share_i · PPM · budget / chars_i)).

    Determinism: the per-source powers are rounded to DECIMAL(28,10)
    and summed exactly, so the share denominator is independent of
    aggregation order; the remaining arithmetic is a fixed-order
    per-row double expression. sqrt (alpha=0.5) is IEEE-correctly-
    rounded everywhere, making the oracle bit-exact; other alphas go
    through pow, whose ulp may differ across libm builds — fine for
    production sampling, not pinned by an oracle. One groupBy over the
    corpus + a 1-row broadcast; the corpus itself is never shuffled."""
    totals = df.groupBy(source_col).agg(
        F.sum(weight_col).alias("total_chars"), F.count(F.lit(1)).alias("n_docs")
    )
    base = F.col("total_chars").cast("double")
    p = F.sqrt(base) if abs(alpha - 0.5) < 1e-12 else F.pow(base, float(alpha))
    t = totals.withColumn("__p", F.round(p, 10).cast("decimal(28,10)"))
    tot = t.agg(F.sum("__p").alias("__tp"))
    return t.join(F.broadcast(tot)).select(
        source_col,
        "total_chars",
        "n_docs",
        F.least(
            F.lit(PPM).cast("bigint"),
            F.floor(
                F.col("__p").cast("double")
                / F.col("__tp").cast("double")
                * F.lit(float(PPM) * budget_chars)
                / F.col("total_chars").cast("double")
            ).cast("bigint"),
        ).alias("rate_ppm"),
    )


_TEMP_BUDGET = 6000  # total chars across sources for the demo query


@register(
    "text_temperature_mixture",
    extra=True,
    doc="Temperature-flattened mixture sampling (alpha=0.5, the XLM-R "
    "low-resource up-sampling step): per-source budget share ∝ "
    "sqrt(chars), exact-DECIMAL share denominator, deterministic "
    "md5-ppm membership; per-source audit row. Corpus touched by one "
    "groupBy + one map-only filter.",
    oracle=f"""
WITH totals AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(*) AS n_docs
  FROM documents GROUP BY source
), p AS (
  SELECT *, CAST(ROUND(sqrt(CAST(total_chars AS DOUBLE)), 10)
                 AS DECIMAL(28,10)) AS pw
  FROM totals
), tot AS (SELECT SUM(pw) AS tp FROM p),
rates AS (
  SELECT source, total_chars, n_docs,
         LEAST(CAST({PPM} AS BIGINT),
               CAST(FLOOR(CAST(pw AS DOUBLE)
                          / CAST((SELECT tp FROM tot) AS DOUBLE)
                          * {float(PPM) * _TEMP_BUDGET!r}
                          / CAST(total_chars AS DOUBLE)) AS BIGINT)
         ) AS rate_ppm
  FROM p
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
    tags=("textops", "sampling"),
)
def text_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rates = temperature_rates(docs, _TEMP_BUDGET, alpha=0.5)
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


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------


def dsir_features(
    docs: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed bag-of-ngrams features, the DSIR representation: unigrams
    + space-joined bigrams of the whitespace tokens, each hashed into
    ``buckets`` via the engine's shared 32-bit md5 integer. One
    map-only explode per corpus — (id_col, bucket) with multiplicity
    kept. DuckDB twin: the same md5 idiom over
    list_concat(toks, list_transform(...)).

    The doc frame fans out to the session parallelism first: the
    explode amplifies ~200x, and a small-file scan's single partition
    would serialize that entire stream through one core (fan_out is a
    no-op whenever the scan is already parallel — any real corpus)."""
    from quackml_spark.operators.text import fan_out, grams_expr, md5_int32

    return fan_out(docs).select(
        F.col(id_col), F.explode(grams_expr(text_col)).alias("__g")
    ).select(id_col, (md5_int32(F.col("__g")) % buckets).alias("bucket"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight: log of the
    likelihood ratio of the doc's hashed-ngram features under the
    TARGET distribution vs the RAW distribution, the published
    data-selection criterion (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"). Both distributions
    are add-``alpha``-smoothed bag-of-hashed-ngram models over
    ``buckets`` buckets.

    Returns (id_col, log_w DECIMAL(25,12)) — EVERY raw doc appears
    (featureless docs get 0, the empty product).

    Determinism & scale shape: each corpus is tokenized EXACTLY ONCE
    (r13: the raw gram explode previously ran twice — histogram +
    scoring — and the two histograms were two sequential jobs; now the
    raw features materialize as per-doc bucket counts via a lazy
    localCheckpoint and one job collects both histograms). The bucket
    histogram COLLECTS to the driver bounded by ``buckets`` rows (the
    ADC-LUT pattern — bounded by config, never by data) so the
    per-bucket log-ratio lambda table is built once driver-side
    instead of re-deriving the corpus explode through the lazy
    lambda/totals dependency graph. Lambda
    is rounded to DECIMAL(20,12) Spark-side (safe: log ulps live at
    the ~16th digit of O(10) values) and joined back BROADCAST, so
    scoring is one map-side join + one docs-sized groupBy whose
    partial sums are EXACT decimal — log_w is independent of
    aggregation order and partitioning, hence identical across
    engines, retries, and cluster sizes. The corpus itself is never
    collected or shuffled except the doc-keyed score combine."""
    import math

    spark = raw.sparkSession
    # ONE tokenize+gram+md5 pass per corpus (guide §1.2 — the explode
    # is the dominant cost; profiled at bench scale the raw pass ran
    # TWICE, once for the bucket histogram collect and once inside the
    # scoring job, and the two histogram collects were two sequential
    # jobs). Raw features aggregate to per-doc bucket counts once and
    # lazily localCheckpoint: the histogram AND the scoring combine
    # both read the materialized ints-only (id, bucket, n) frame —
    # far smaller than re-running the corpus explode — and both
    # histograms come back in ONE bounded collect (union the target
    # gram stream with the materialized raw counts, <= buckets rows).
    pf = (
        dsir_features(raw, buckets, id_col, text_col)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    cnts = (
        dsir_features(target, buckets, id_col, text_col)
        .select(
            "bucket",
            F.lit(1).cast("bigint").alias("n"),
            F.lit(True).alias("is_t"),
        )
        .unionByName(
            pf.select(
                "bucket",
                F.col("n").cast("bigint").alias("n"),
                F.lit(False).alias("is_t"),
            )
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_t"), F.col("n")).otherwise(F.lit(0))).alias("ct"),
            F.sum(F.when(~F.col("is_t"), F.col("n")).otherwise(F.lit(0))).alias("cr"),
        )
        .collect()  # bounded: <= buckets rows
    )
    tcnt = {int(r["bucket"]): int(r["ct"]) for r in cnts if r["ct"]}
    rcnt = {int(r["bucket"]): int(r["cr"]) for r in cnts if r["cr"]}
    nt, nr = sum(tcnt.values()), sum(rcnt.values())
    ab = float(alpha) * buckets
    lam_rows = [
        (
            b,
            math.log((tcnt.get(b, 0) + float(alpha)) / (nt + ab))
            - math.log((rcnt.get(b, 0) + float(alpha)) / (nr + ab)),
        )
        for b in sorted(set(tcnt) | set(rcnt))
    ]
    lam = local_rows(
        spark, lam_rows, "bucket bigint, lam_raw double"
    ).select(
        "bucket",
        F.round("lam_raw", 12).cast("decimal(20,12)").alias("lam"),
    )
    # n * lam is exactly lam summed n times (decimal multiply at
    # (17,0)x(20,12) -> (38,12) is exact, at precision 38 exactly), so
    # log_w is bit-identical to the per-occurrence sum it replaces.
    # (17,0), not (9,0) — r14 advice fix: a doc with >= 1e9
    # occurrences of one bucket overflowed the narrower cast (ANSI
    # throw / silent null depending on mode); (17,0) carries counts to
    # 1e17 with the same scale-12 result.
    scored = (
        pf.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n").cast("decimal(17,0)") * F.col("lam"))
            .cast("decimal(25,12)")
            .alias("log_w")
        )
    )
    zero = F.lit("0").cast("decimal(25,12)")
    return raw.select(id_col).join(scored, id_col, "left").select(
        id_col, F.coalesce(F.col("log_w"), zero).alias("log_w")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_select: int,
    buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``n_select`` raw docs distributed like the TARGET corpus:
    Gumbel top-k over the DSIR importance log-weights — the paper's
    sampling-without-replacement step, made reproducible: each doc's
    Gumbel noise g = -ln(-ln(u)) derives from the engine's
    deterministic md5-ppm draw u = (hash_ppm(id)+0.5)/1e6, so the
    selection is a pure function of (corpus, target, seed) — no RNG
    state, identical on any cluster and in the DuckDB oracle.

    Returns (id_col, log_w, sel_key) for the winners, highest key
    first. Scale shape: everything in dsir_log_weights plus ONE
    TakeOrdered(n_select) — no partition-less window, no collect."""
    logw = dsir_log_weights(raw, target, buckets, alpha, id_col, text_col)
    u = (hash_ppm(id_col, seed) + F.lit(0.5)) / F.lit(float(PPM))
    g = F.round(-F.log(-F.log(u)), 12).cast("decimal(20,12)")
    return (
        logw.withColumn("sel_key", (F.col("log_w") + g).cast("decimal(26,12)"))
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(n_select)
        .select(
            # exact decimals cast straight to double: both engines
            # convert the same rational to the same nearest double,
            # so no rounding step (and no tie risk) is needed
            id_col,
            F.col("log_w").cast("double").alias("log_w"),
            F.col("sel_key").cast("double").alias("sel_key"),
        )
    )


_DSIR_BUCKETS = 4096
_DSIR_N = 100


@register(
    "text_dsir_select",
    doc="DSIR targeted data selection (Xie et al. 2023): docs with "
    "doc_id % 7 == 0 act as the TARGET domain, the rest as the RAW "
    "pool; hashed unigram+bigram bag models (4096 md5 buckets, "
    "add-1 smoothing) give each raw doc a log importance weight, and "
    "a deterministic Gumbel top-100 (md5-ppm noise) samples the pool "
    "toward the target distribution. Two bounded bucket aggregations "
    "+ one broadcast join + one docs-sized exact-decimal combine + "
    "TakeOrdered — no collect, no partition-less window.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_concat(
           toks,
           list_transform(range(1, length(toks)),
                          i -> toks[i] || ' ' || toks[i+1]))) AS g
  FROM toks
), feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM grams
), tcnt AS (
  SELECT bucket, COUNT(*) AS ct FROM feats WHERE doc_id % 7 = 0
  GROUP BY bucket
), rcnt AS (
  SELECT bucket, COUNT(*) AS cr FROM feats WHERE doc_id % 7 <> 0
  GROUP BY bucket
), tot AS (
  SELECT (SELECT COALESCE(SUM(ct), 0) FROM tcnt) AS nt,
         (SELECT COALESCE(SUM(cr), 0) FROM rcnt) AS nr
), lam AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
         CAST(ROUND(ln((COALESCE(ct, 0) + 1.0) / (nt + {_DSIR_BUCKETS}.0))
                    - ln((COALESCE(cr, 0) + 1.0) / (nr + {_DSIR_BUCKETS}.0)),
                    12) AS DECIMAL(20,12)) AS lam
  FROM tcnt t FULL OUTER JOIN rcnt r ON t.bucket = r.bucket, tot
), scored AS (
  SELECT f.doc_id, CAST(SUM(l.lam) AS DECIMAL(25,12)) AS log_w
  FROM feats f JOIN lam l USING (bucket)
  WHERE f.doc_id % 7 <> 0
  GROUP BY f.doc_id
), keyed AS (
  SELECT d.doc_id,
         COALESCE(s.log_w, CAST(0 AS DECIMAL(25,12))) AS log_w,
         CAST(COALESCE(s.log_w, CAST(0 AS DECIMAL(25,12)))
              + CAST(ROUND(-ln(-ln(
                  ((('0x' || substr(md5('0|' || d.doc_id::VARCHAR), 1, 8))::BIGINT
                    % {PPM}) + 0.5) / {PPM}.0)), 12) AS DECIMAL(20,12))
              AS DECIMAL(26,12)) AS sel_key
  FROM documents d LEFT JOIN scored s USING (doc_id)
  WHERE d.doc_id % 7 <> 0
)
SELECT doc_id, CAST(log_w AS DOUBLE) AS log_w,
       CAST(sel_key AS DOUBLE) AS sel_key
FROM keyed
ORDER BY sel_key DESC, doc_id
LIMIT {_DSIR_N}
""",
    tags=("textops", "sampling", "llm", "bench"),
)
def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.where(F.col("doc_id") % 7 == 0)
    raw = docs.where(F.col("doc_id") % 7 != 0)
    return dsir_select(raw, target, _DSIR_N, buckets=_DSIR_BUCKETS, seed=0)
