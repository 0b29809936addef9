"""Corpus profiling ("dataset card") and per-domain cap sampling.

The first report a pipeline engineer produces for a new crawl snapshot
(what the reference's users would run as ad-hoc SQL over their corpus
tables — cf. the analyze/summarize surface in
/root/reference/src/orm/snapshot.rs and the per-source bookkeeping in
its snapshot materialization) and the RefinedWeb-style *domain cap*
that keeps any single source from dominating a pretraining mix.

Determinism: every ratio is exact-DECIMAL then rounded; every
percentile is a *discrete* rank statistic computed with integer-only
rank arithmetic (``ceil(p*n)`` as ``(p_num*n + p_den - 1) // p_den``),
so no floating-point percentile interpolation can diverge between
Spark and the DuckDB oracle.

Scale shape (100 TB): the text-hash aggregation shuffles on
(source, md5) with map-side combine; the rank statistics sort WITHIN
source partitions only (the same partition-ful window shape as
``ranked_by``); language counts are bounded by |sources| x |langs|;
nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table


def _int_ceil_rank(n_name: str, p_num: int, p_den: int):
    """ceil(p_num/p_den * n) in pure integer arithmetic — the rank of
    the discrete percentile (smallest value with cume_dist >= p).
    Spark SQL's ``div`` is integral division on BIGINTs, so no double
    ever appears — `/`-then-floor would round through IEEE double
    (0.9*10 is 9.000000000000002, and past 2^53 the quotient itself
    loses ulps), diverging from DuckDB's exact `//`."""
    return F.expr(f"({n_name} * {p_num} + {p_den - 1}) div {p_den}")


def corpus_profile(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """One row per source: doc counts, exact-duplicate rate, char/token
    volume, discrete length percentiles, and the modal language — the
    dataset card a curation run starts from.

    Columns: source, n_docs, distinct_texts, dup_docs, dup_rate,
    total_chars, total_tokens, mean_doc_tokens, p50_chars, p90_chars
    [, top_lang, top_lang_docs], ordered by source.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"\S+"), 0
    )
    d = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.md5(F.col(text_col)).alias("h"),
        *([F.col(lang_col).alias("lang")] if lang_col else []),
    )

    # Exact-duplicate accounting: per-(source, text-hash) counts, then
    # per-source rollup. Both aggregations are map-side combinable.
    per_hash = d.groupBy("source", "h").agg(F.count(F.lit(1)).alias("c"))
    dup = per_hash.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
            "dup_docs"
        ),
    )

    vol = d.groupBy("source").agg(
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
    )

    # Discrete percentiles: sort within each source partition, pick the
    # row at the integer rank ceil(p*n). Partition-ful window — the
    # per-source sort is the whole cost, and it parallelizes across
    # sources exactly like ranked_by's range exchange.
    # Explicit NULLS LAST on both engines: Spark's ASC default is
    # NULLS FIRST, DuckDB's is NULLS LAST — on a corpus with NULL text
    # the percentile rows would silently diverge otherwise.
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc_nulls_last(), F.col("doc_id").asc_nulls_last()
    )
    ranked = d.select("source", "n_chars", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    ).drop("doc_id")
    ranked = ranked.join(F.broadcast(dup.select("source", "n_docs")), "source")
    p50 = (
        ranked.where(F.col("rn") == _int_ceil_rank("n_docs", 1, 2))
        .select("source", F.col("n_chars").alias("p50_chars"))
    )
    p90 = (
        ranked.where(F.col("rn") == _int_ceil_rank("n_docs", 9, 10))
        .select("source", F.col("n_chars").alias("p90_chars"))
    )

    out = (
        dup.join(vol, "source")
        .join(p50, "source")
        .join(p90, "source")
        .select(
            "source",
            "n_docs",
            "distinct_texts",
            "dup_docs",
            F.round(
                F.col("dup_docs").cast("decimal(20,6)") / F.col("n_docs"), 6
            )
            .cast("double")
            .alias("dup_rate"),
            "total_chars",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("decimal(20,6)") / F.col("n_docs"),
                6,
            )
            .cast("double")
            .alias("mean_doc_tokens"),
            "p50_chars",
            "p90_chars",
        )
    )

    if lang_col:
        lw = Window.partitionBy("source").orderBy(
            F.col("lang_docs").desc_nulls_last(),
            F.col("lang").asc_nulls_last(),
        )
        top_lang = (
            d.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("lang_docs"))
            .withColumn("lr", F.row_number().over(lw))
            .where(F.col("lr") == 1)
            .select(
                "source",
                F.col("lang").alias("top_lang"),
                F.col("lang_docs").alias("top_lang_docs"),
            )
        )
        out = out.join(top_lang, "source")

    return out.orderBy("source")


def domain_cap_sample(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` documents per source, chosen by a
    deterministic md5 shuffle — the RefinedWeb-style *domain cap* that
    stops one crawl domain from dominating a pretraining mixture.

    A pure function of (corpus, cap, seed): the per-source order is
    md5("<seed>|<id>") with id as the tiebreak, so the same corpus
    yields the same sample on any cluster, any partitioning, and in
    the DuckDB oracle. Partition-ful window (one sort per source) —
    no collect, no global window.
    """
    key = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    # NULLS LAST on both engines: a NULL id's md5 key is NULL, which
    # Spark's plain ASC sorts FIRST (always inside the cap, displacing
    # a real doc) while DuckDB sorts it LAST — the exact divergence
    # corpus_profile's window already guards (review catch)
    w = Window.partitionBy(source_col).orderBy(
        key.asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


_CAP = 60


@register(
    "text_corpus_profile",
    # graded representative of the (new) corpus-profiling family —
    # promoted in the r8 session curation in place of the
    # dedup_ngram_jaccard twin
    doc="Dataset card: one row per source with doc counts, exact-dup "
    "rate, char/token volume, integer-exact discrete length "
    "percentiles (rank = ceil(p*n) computed integer-only), and the "
    "modal language — two bounded aggregations + one partition-ful "
    "per-source sort, no collect.",
    oracle=r"""
WITH d AS (
  SELECT source, doc_id,
         length(text) AS n_chars,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         md5(text) AS h,
         lang
  FROM documents
), per_hash AS (
  SELECT source, h, COUNT(*) AS c FROM d GROUP BY source, h
), dup AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         COUNT(*) AS distinct_texts,
         CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
           AS dup_docs
  FROM per_hash GROUP BY source
), vol AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM d GROUP BY source
), ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars NULLS LAST,
                                     doc_id NULLS LAST) AS rn
  FROM d
), p50 AS (
  SELECT r.source, r.n_chars AS p50_chars
  FROM ranked r JOIN dup USING (source)
  WHERE r.rn = (dup.n_docs + 1) // 2
), p90 AS (
  SELECT r.source, r.n_chars AS p90_chars
  FROM ranked r JOIN dup USING (source)
  WHERE r.rn = (dup.n_docs * 9 + 9) // 10
), top_lang AS (
  SELECT source, lang AS top_lang, lang_docs AS top_lang_docs
  FROM (
    SELECT source, lang, COUNT(*) AS lang_docs,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC NULLS LAST,
                                       lang NULLS LAST) AS lr
    FROM d GROUP BY source, lang
  ) WHERE lr = 1
)
SELECT dup.source, n_docs, distinct_texts, dup_docs,
       CAST(ROUND(CAST(dup_docs AS DECIMAL(20,6)) / n_docs, 6) AS DOUBLE)
         AS dup_rate,
       total_chars, total_tokens,
       CAST(ROUND(CAST(total_tokens AS DECIMAL(20,6)) / n_docs, 6) AS DOUBLE)
         AS mean_doc_tokens,
       p50_chars, p90_chars, top_lang, top_lang_docs
FROM dup
JOIN vol USING (source)
JOIN p50 USING (source)
JOIN p90 USING (source)
JOIN top_lang USING (source)
ORDER BY source
""",
    tags=("textops", "pipeline", "bench"),
)
def text_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus_profile(docs)


@register(
    "text_domain_cap",
    extra=True,
    doc=f"RefinedWeb-style domain cap: keep at most {_CAP} docs per "
    "source by deterministic md5 shuffle (seed|doc_id) — a pure "
    "function of (corpus, cap, seed). One partition-ful per-source "
    "sort; no collect.",
    oracle=f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('0|' || doc_id::VARCHAR), doc_id) AS rn
  FROM documents
) WHERE rn <= {_CAP}
ORDER BY doc_id
""",
    tags=("textops", "sampling", "pipeline"),
)
def text_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return domain_cap_sample(docs, _CAP).orderBy("doc_id")
