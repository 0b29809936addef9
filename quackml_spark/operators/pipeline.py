"""End-to-end training-corpus construction — the composed pipeline.

Every stage below exists as a standalone oracle-checked operator; this
module chains them into the canonical dataset-build flow a user of the
engine actually runs, and value-checks the WHOLE composition against a
single DuckDB replay — so stage interactions (a filter reordered past a
dedup, a gram set computed on uncleaned text) are caught, not just the
stages in isolation:

  clean -> quality filter -> exact dedup -> benchmark decontamination
        -> per-doc manifest (doc_id, source, n_tokens)

Scale shape: stages 1-2 are map-only expression chains; dedup is one
groupBy on the content hash; decontamination is the broadcast-probe
(or Bloom) shape. Nothing here adds a shuffle beyond the standalone
operators' own.

Determinism: the quality threshold is integer arithmetic
(n_stop * 25 >= n_tokens, i.e. stopword ratio >= 4%) — no decimal
division whose scale could differ between engines at the filter
boundary. The corpus is augmented with the 10 planted verbatim copies
(vec-dedup precedent) so the dedup stage provably drops rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.operators.text import (
    STOPWORDS,
    _decon_grams,
    clean_text_expr,
    tokens_expr,
)
from quackml_spark.operators.text import _DECON_K  # shared shingle width
from quackml_spark.plans import register
from quackml_spark.session import local_rows
from quackml_spark.sources import load_table

_CLEAN_SQL = r"""trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, 'https?://[^\s]+', ' ', 'g'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
      '\s+', ' ', 'g'))"""


def build_corpus(docs: DataFrame, bench_mod: int = 97) -> DataFrame:
    """The composed pipeline over a (doc_id, source, text) frame."""
    cleaned = docs.select(
        "doc_id", "source", clean_text_expr("text").alias("ct")
    )
    toks = tokens_expr("ct")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    measured = cleaned.select(
        "doc_id",
        "source",
        "ct",
        F.length("ct").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("bigint")
        .alias("n_stop"),
    )
    quality = measured.where(
        F.col("n_chars").between(50, 10000)
        & (F.col("n_stop") * 25 >= F.col("n_tokens"))
    )
    w = Window.partitionBy(F.md5(F.lower("ct")))
    deduped = (
        quality.withColumn("__keep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )
    # the SAME gram extraction text_decontaminate uses (shared helper —
    # a shingle-length change there must change this pipeline stage too,
    # or decontamination drifts from the standalone operator)
    grams = _decon_grams(deduped.select("doc_id", F.col("ct").alias("text")))
    bench = grams.where(F.col("doc_id") % bench_mod == 0)
    contaminated = (
        grams.where(F.col("doc_id") % bench_mod != 0)
        .join(F.broadcast(bench.select("gram").distinct()), "gram")
        .select("doc_id")
        .distinct()
    )
    return (
        deduped.where(F.col("doc_id") % bench_mod != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    )


@register(
    "pipeline_corpus_manifest",
    doc="The COMPOSED dataset-construction pipeline as one value-checked "
    "query: clean (URL/email strip + whitespace collapse) -> quality "
    "filter (50..10000 chars AND stopword ratio >= 4%%, exact integer "
    "arithmetic) -> exact dedup on md5 of the cleaned text (keep min "
    "doc_id; 10 planted verbatim copies prove the stage) -> benchmark "
    "decontamination (docs sharing a cleaned 5-gram with the doc_id%%97 "
    "bench split drop; bench docs excluded) -> final manifest "
    "(doc_id, source, n_tokens). Stage interactions — gram sets on "
    "CLEANED text, dedup before bench exclusion — are exactly replayed "
    "by the oracle.",
    oracle=rf"""
WITH aug AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text FROM documents WHERE doc_id < 10
), cleaned AS (
  SELECT doc_id, source, {_CLEAN_SQL} AS ct FROM aug
), measured AS (
  SELECT doc_id, source, ct,
         length(ct) AS n_chars,
         length(regexp_extract_all(lower(ct), '\S+')) AS n_tokens,
         length(list_filter(regexp_extract_all(lower(ct), '\S+'),
                x -> list_contains({STOPWORDS!r}, x))) AS n_stop
  FROM cleaned
), quality AS (
  SELECT * FROM measured
  WHERE n_chars BETWEEN 50 AND 10000 AND n_stop * 25 >= n_tokens
), deduped AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(lower(ct))) AS keep
    FROM quality
  ) WHERE doc_id = keep
), toks AS (
  SELECT doc_id, regexp_extract_all(lower(ct), '\S+') AS toks FROM deduped
), grams AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(toks[i:i+{_DECON_K - 1}], 'string_agg', ' ')) AS gram
  FROM toks, unnest(range(1, length(toks) - {_DECON_K - 2})) AS t(i)
  WHERE length(toks) >= {_DECON_K}
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
), contaminated AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id % 97 <> 0
)
SELECT d.doc_id, d.source, CAST(d.n_tokens AS BIGINT) AS n_tokens
FROM deduped d
LEFT JOIN contaminated c ON c.doc_id = d.doc_id
WHERE d.doc_id % 97 <> 0 AND c.doc_id IS NULL
ORDER BY d.doc_id
""",
    tags=("textops", "dedup", "pipeline"),
    extra=True,
)
def pipeline_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    aug = docs.union(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "source", "text"
        )
    )
    return build_corpus(aug)


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Snapshot diff manifest between two corpus versions: one row per
    doc present in either, with status added / removed / changed /
    unchanged (content compared by md5, never by the full text — the
    join payload is (id, 32-byte hash), so diffing two 100 TB
    snapshots shuffles ~50 bytes/row). One full outer join on the id."""
    o = old.select(F.col(id_col).alias("id"), F.md5(text_col).alias("__ho"))
    n = new.select(F.col(id_col).alias("id"), F.md5(text_col).alias("__hn"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__ho").isNull(), "added")
            .when(F.col("__hn").isNull(), "removed")
            .when(F.col("__ho") != F.col("__hn"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )


@register(
    "pipeline_corpus_diff",
    extra=True,
    doc="Corpus snapshot diff (data-versioning manifest): v2 removes "
    "docs with doc_id %% 11 == 0 and rewrites the text of doc_id %% 7 "
    "== 0; the diff labels every doc added/removed/changed/unchanged "
    "from (id, md5) pairs only — one full outer join, ~50 bytes/row "
    "shuffle payload whatever the document sizes.",
    oracle="""
SELECT doc_id,
       CASE
         WHEN doc_id % 11 = 0 THEN 'removed'
         WHEN doc_id % 7 = 0 THEN 'changed'
         ELSE 'unchanged'
       END AS status
FROM documents
ORDER BY doc_id
""",
    tags=("textops",),
)
def pipeline_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = docs.where(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit("EDITED "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(docs, v2).orderBy("doc_id")


def curate(
    docs: DataFrame,
    *,
    clean: bool = True,
    line_dedup_max_freq: int | None = None,
    langs: set[str] | None = None,
    min_quality: float | None = None,
    quality_model=None,
    quality_model_threshold: float = 0.5,
    dedup: str | None = "exact",
    minhash_verify_threshold: float | None = None,
    ppjoin_threshold_ppm: int = 500_000,
    ppjoin_lpa_iters: int = 3,
    benchmark: DataFrame | None = None,
    decontaminate_mode: str = "exact",
    curriculum_band_size: int | None = None,
    budget_chars: int | None = None,
    temperature_alpha: float | None = None,
    fim_rate_ppm: int | None = None,
    fim_seed: int = 0,
    epochs_ppm: DataFrame | None = None,
    epoch_seed: int = 1,
    pack_seq_len: int | None = None,
    pack_seed: int = 0,
    pack_n_tokens: DataFrame | None = None,
    source_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    report: bool = True,
) -> dict:
    """The user-facing one-call curation pipeline: configurable stages
    over any (id, text) frame, each reusing the engine's standalone
    oracle-checked operator, plus a per-stage attrition report —
    the first thing a pipeline engineer asks of a curation run
    ("where did my documents go?").

    Stages (in order, each optional):

      line_dedup          drop corpus-frequent lines (boilerplate),
                          reassemble survivors in order — runs BEFORE
                          clean, whose whitespace normalization
                          collapses the newlines line-level ops key on
      clean               unicode/whitespace normalization (map-only)
      langid              keep docs whose marker-lexicon language is in
                          ``langs`` (same argmax the graded text_langid
                          query pins)
      quality             keep docs with composite quality_score >=
                          ``min_quality`` (same arithmetic the graded
                          text_quality_score query pins)
      quality_model       keep docs a trained fastText-style classifier
                          (qualityclf.train_quality_classifier's
                          (hashing_tf, lr_model) pair) scores >=
                          ``quality_model_threshold`` — map-only
                          scoring, coefficients ride the MLlib
                          broadcast
      dedup='exact'       md5 content groups, keep min-id per group
      dedup='minhash_best'  like 'minhash' but each cluster keeps its
                          HIGHEST-quality member (heuristic score,
                          ties to the smaller id) — the RefinedWeb
                          arbitration (near_dup_keep_best)
      dedup='ppjoin_best' EXACT near-dup arbitration: PPJoin exact
                          Jaccard >= ppjoin_threshold_ppm/1e6 pairs
                          (lossless, unlike LSH candidates) ->
                          ppjoin_lpa_iters rounds of synchronous label
                          propagation (splits duplicate cliques joined
                          by thin false-positive bridges, which
                          connected components would merge) -> each
                          community keeps its HIGHEST-quality member
                          (heuristic score, ties to the smaller id).
                          The quality-sensitive exact-dedup mode a
                          production corpus build runs when LSH recall
                          bounds aren't acceptable (ppjoin_keep_best)
      dedup='minhash'     NEAR-duplicate clusters (MinHash-LSH bands ->
                          in-bucket pairs -> connected components),
                          keep the min-id representative per cluster —
                          runs the iterative component labeling at
                          build time (O(diameter) driver rounds);
                          ``minhash_verify_threshold`` gates each
                          candidate pair on its TRUE word-3-gram
                          Jaccard first (the RefinedWeb precision
                          step, candidate-bounded)
      decontaminate       drop docs sharing any benchmark n-gram (pass
                          the eval-suite frame). decontaminate_mode
                          'exact' = broadcast gram probe; 'bloom' =
                          map-only Bloom bitmap probe (the 100 TB
                          shape — drops a SUPERSET of exact: false
                          positives only, the conservative direction)
      budget              deterministic md5-ppm sampling toward
                          ``budget_chars`` total — equal per-source
                          budgets, or temperature-flattened shares
                          when ``temperature_alpha`` is set (needs
                          ``source_col``; without one the whole corpus
                          is a single source)
      curriculum          attach (band, curriculum_pos): easiest-first
                          quality rank in ``curriculum_band_size``-doc
                          bands, md5-shuffled within bands — the
                          training order a loader consumes directly.
                          Runs after budget so positions stay gap-free
                          over the documents that actually survive
                          sampling
      fim                 fill-in-the-middle PSM transform of a
                          deterministic ``fim_rate_ppm`` fraction of
                          documents (document-level, keyed on doc_id —
                          every epoch copy of a doc gets the same
                          carve). Map-only; adds ``fim_applied``. Runs
                          before epochs/pack so the packing token
                          counts price the carved text, sentinels
                          included
      epochs              per-source fractional epoch expansion (the
                          LLaMA data-recipe step): ``epochs_ppm`` is a
                          tiny (source, epochs_ppm) frame (2.4 epochs =
                          2_400_000); every doc expands to floor(e)
                          copies plus an md5-coin extra for frac(e).
                          Row grain becomes COPIES — (copy_idx,
                          n_copies) columns appear. Broadcast join +
                          map-only explode (epoch_expand)
      pack                concat-and-chunk training-sequence layout
                          (pack_sequences): token counts lay copies
                          out in deterministic md5-shuffled order into
                          ``pack_seq_len``-token sequences. Counts
                          default to whitespace tokens; pass
                          ``pack_n_tokens`` — an (id, n_tokens) frame,
                          e.g. bpe_token_counts(...) for
                          tokenizer-TRUE layout — to override (docs
                          absent from the frame count zero and drop);
                          adds (n_tokens, start_token, first_seq,
                          last_seq, n_segments), drops zero-token docs.
                          The two-phase distributed prefix sum — no
                          global window — so the layout is exact at any
                          corpus size. These two TERMINAL stages turn
                          the curated corpus into the frame a training
                          loader consumes directly

    Returns {"docs": curated DataFrame, "report": DataFrame(stage,
    docs_in, docs_out, dropped)}. ``report`` modes:

      True      one count per stage boundary (k stages -> k actions —
                the interactive audit run)
      "fused"   SAME report values in ONE Spark job: the per-stage
                survivor frames union into a single
                groupBy(stage).count() action (each unioned branch
                replays its stage prefix inside the one job — total
                work matches report=True, driver round-trips drop
                from k to 1)
      False     a single lazy plan, no counting jobs; stage names
                recorded with NULL counts"""
    from quackml_spark.operators.text import (
        _decon_grams,
        clean_text_expr,
        decontaminate,
        line_dedup,
        predict_lang,
        score_quality,
    )

    spark = docs.sparkSession
    src = (
        F.col(source_col) if source_col else F.lit("corpus")
    )
    # deliberately NOT fanned out at entry: measured at sf0.1, an
    # entry repartition made the fused report ~45% SLOWER (2.2 ->
    # 3.3 s) — the expression stages are map-light, the dedup/
    # decontaminate stages shuffle to full parallelism on their own,
    # and the heavy near-dup path fans out inside word_shingles where
    # the per-row work justifies the row shuffle
    cur = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        src.alias("__source"),
    )
    cur0 = cur
    # identity checks, not `in (True, False, "fused")`: 1 == True in
    # Python, so report=1 would slip past the membership test and then
    # silently select lazy mode (review catch)
    if not (report is True or report is False or report == "fused"):
        raise ValueError(
            f"report must be True, False or 'fused', got {report!r}"
        )
    fused = report == "fused"
    stages: list[tuple] = []
    fused_frames: list[tuple[str, DataFrame]] = []
    # fused-mode stages whose count PROVABLY equals the previous
    # stage's (pure projections — clean): no union branch is spent on
    # them; the counting loop copies the neighbor's value (r14)
    same_count: set[str] = set()
    n_prev = cur.count() if report is True else None

    def _mark(stage: str, nxt: DataFrame, preserves_count: bool = False) -> DataFrame:
        nonlocal n_prev
        if report is True:
            n = nxt.count()
            stages.append((stage, n_prev, n))
            n_prev = n
        else:
            # lazy/fused modes still record WHICH stages ran — counts
            # stay NULL here (fused fills them in from its one job)
            stages.append((stage, None, None))
            if fused:
                if not preserves_count:
                    # CHAINED lazy checkpoint (r14): every counted
                    # frame materializes once and every consumer —
                    # the next stage, the counting union's branch,
                    # decontaminate's broadcast build, the returned
                    # docs — reads the SAME RDD. The r13 shape
                    # persist()ed the frames at count time instead and
                    # relied on CacheManager plan-substitution, which
                    # missed the broadcast subtrees and the racing
                    # union branches then recomputed the text-heavy
                    # prefix per branch: measured at sf0.1, the fused
                    # count ran 31-104 s executor vs 7.7 s for
                    # sequential counting; with the checkpoint chain
                    # it is one job and one evaluation per stage
                    # (RDD block locking serializes concurrent branch
                    # tasks instead of duplicating the work).
                    # Count-preserving projections (clean) stay
                    # unmaterialized — nothing counts them.
                    nxt = nxt.localCheckpoint(eager=False)
                fused_frames.append((stage, nxt))
                if preserves_count:
                    same_count.add(stage)
        return nxt

    if line_dedup_max_freq is not None:
        cur = _mark(
            "line_dedup",
            line_dedup(cur, max_freq=line_dedup_max_freq)
            .where(F.col("n_kept") > 0)
            .select("doc_id", F.col("clean_text").alias("text"))
            .join(cur.select("doc_id", "__source"), "doc_id"),
        )
    if clean:
        cur = _mark(
            "clean",
            cur.select(
                "doc_id", clean_text_expr("text").alias("text"), "__source"
            ),
            # a projection keeps every row: docs_in == docs_out by
            # construction, so fused mode need not count it
            preserves_count=True,
        )
    if langs is not None:
        keep_lang = (
            predict_lang(cur)
            .where(F.col("predicted_lang").isin(sorted(langs)))
            .select("doc_id")
        )
        cur = _mark("langid", cur.join(keep_lang, "doc_id"))
    if min_quality is not None:
        cur = _mark(
            "quality",
            score_quality(cur)
            .where(F.col("quality_score") >= min_quality)
            .select("doc_id", "text", "__source"),
        )
    if quality_model is not None:
        # learned quality filter (the CCNet/GPT-3 classifier stage):
        # a (hashing_tf, lr_model) pair from train_quality_classifier —
        # map-only scoring, coefficients ride the MLlib broadcast
        from quackml_spark.operators.qualityclf import (
            score_quality_classifier,
        )

        keep_ql = (
            score_quality_classifier(
                cur.select("doc_id", "text"), quality_model
            )
            .where(F.col("ql_prob") >= quality_model_threshold)
            .select("doc_id")
        )
        cur = _mark("quality_model", cur.join(keep_ql, "doc_id"))
    if dedup == "exact":
        keepers = (
            cur.groupBy(F.md5(F.lower(F.trim("text"))).alias("__h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        cur = _mark("dedup_exact", cur.join(keepers, "doc_id"))
    elif dedup == "minhash":
        # NEAR-duplicate clusters (MinHash-LSH band buckets -> in-bucket
        # pairs -> min-label connected components), each collapsed to
        # its min-id representative. The component labeling is
        # driver-iterative (O(diameter) rounds), so unlike every other
        # stage this one runs jobs at curate() build time.
        from quackml_spark.operators.dedup import near_dup_drops

        drops = near_dup_drops(
            cur.select("doc_id", "text"),
            verify_threshold=minhash_verify_threshold,
        )
        cur = _mark("dedup_minhash", cur.join(drops, "doc_id", "left_anti"))
    elif dedup == "minhash_best":
        # near-dup clusters collapse to their HIGHEST-QUALITY member
        # (RefinedWeb arbitration, ties to the smaller id) instead of
        # the arbitrary min id — the near_dup_keep_best operator over
        # the heuristic score. Docs outside any cluster pass through.
        from quackml_spark.operators.dedup import near_dup_keep_best
        from quackml_spark.operators.text import score_quality

        decisions = near_dup_keep_best(
            cur.select("doc_id", "text"),
            score_quality(cur.select("doc_id", "text"), keep_cols=False)
            .select("doc_id", "quality_score"),
            verify_threshold=minhash_verify_threshold,
        )
        drops = decisions.where(~F.col("is_keeper")).select("doc_id")
        cur = _mark(
            "dedup_minhash_best", cur.join(drops, "doc_id", "left_anti")
        )
    elif dedup == "ppjoin_best":
        # EXACT Jaccard pair graph (PPJoin) -> LPA community refinement
        # -> keep-best quality arbitration. Like the minhash modes, the
        # pair join + label rounds run jobs at curate() build time.
        from quackml_spark.operators.dedup import ppjoin_keep_best
        from quackml_spark.operators.text import score_quality

        decisions = ppjoin_keep_best(
            cur.select("doc_id", "text"),
            score_quality(cur.select("doc_id", "text"), keep_cols=False)
            .select("doc_id", "quality_score"),
            threshold_ppm=ppjoin_threshold_ppm,
            lpa_iters=ppjoin_lpa_iters,
        )
        drops = decisions.where(~F.col("is_keeper")).select("doc_id")
        cur = _mark(
            "dedup_ppjoin_best", cur.join(drops, "doc_id", "left_anti")
        )
    elif dedup is not None:
        raise ValueError(
            f"unknown dedup mode {dedup!r} "
            "(supported: 'exact', 'minhash', 'minhash_best', "
            "'ppjoin_best', None)"
        )
    if benchmark is not None:
        bench = benchmark.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        if decontaminate_mode == "exact":
            leaked = decontaminate(
                _decon_grams(cur), _decon_grams(bench)
            ).select("doc_id")
        elif decontaminate_mode == "bloom":
            # The 100 TB path: the benchmark gram set packs into an
            # m-bit Bloom bitmap (collect bounded by m set positions,
            # never by benchmark size) and the corpus side is a
            # map-only probe — no gram join at all. Drops a SUPERSET
            # of exact mode (false positives only, rate set by m/k) —
            # the conservative direction for decontamination. Builds
            # the bitmap at curate() build time (one bounded job).
            from quackml_spark.operators.text import bloom_build, bloom_probe

            bitmap = bloom_build(_decon_grams(bench))
            leaked = (
                bloom_probe(_decon_grams(cur), bitmap)
                .where(F.col("bloom_hit"))
                .select("doc_id")
                .distinct()
            )
        else:
            raise ValueError(
                f"unknown decontaminate_mode {decontaminate_mode!r} "
                "(supported: 'exact', 'bloom')"
            )
        cur = _mark("decontaminate", cur.join(leaked, "doc_id", "left_anti"))
    # The terminal stages below each consume `cur` more than once per
    # run (budget: rates broadcast build; curriculum: the score branch
    # + the join; epochs: the expansion + the join-back; pack: the
    # prefix-sum offsets broadcast + the main branch) and every
    # broadcast build executes its subtree independently — so without
    # a cut, each one REPLAYS the whole filtering prefix (quality
    # arithmetic over text, the dedup shuffle, decontamination): 3-4
    # full corpus passes at 100 TB. One lazy localCheckpoint caps all
    # of them at a single materialization (r13; the same
    # materialize-the-proxy discipline as DSIR and BM25 top-k).
    if any(
        x is not None
        for x in (budget_chars, curriculum_band_size, epochs_ppm, pack_seq_len)
    ):
        cur = cur.localCheckpoint(eager=False)
    if budget_chars is not None:
        from quackml_spark.operators.sampling import (
            PPM,
            mixture_sample,
            temperature_rates,
        )

        sized = cur.withColumn("__n_chars", F.length("text"))
        if temperature_alpha is not None:
            rates = temperature_rates(
                sized,
                budget_chars,
                alpha=temperature_alpha,
                source_col="__source",
                weight_col="__n_chars",
            )
        else:
            # ONE bounded pass (collect <= |sources| rows) yields the
            # source totals AND their count — this was two separate
            # jobs (a distinct().count() plus the budget_rates
            # broadcast build, each replaying the prefix). The rate
            # arithmetic is the same exact bigint clamp(floor(1e6 *
            # per_source_budget / total), 1, 1e6) budget_rates pins.
            tot = sorted(
                (r["__source"], int(r["t"]), int(r["n"]))
                for r in sized.groupBy("__source")
                .agg(
                    F.sum("__n_chars").alias("t"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            per = max(1, budget_chars // max(len(tot), 1))
            src_dt = sized.schema["__source"].dataType.simpleString()
            rates = local_rows(
                spark,
                [
                    (
                        s,
                        t,
                        n,
                        max(1, min(PPM, PPM * per // t)) if t > 0 else 1,
                    )
                    for s, t, n in tot
                ],
                f"__source {src_dt}, total_chars bigint, n_docs bigint, "
                "rate_ppm bigint",
            )
        cur = _mark(
            "budget",
            mixture_sample(
                sized, rates.select("__source", "rate_ppm"), source_col="__source"
            ).select("doc_id", "text", "__source"),
        )


    if curriculum_band_size is not None:
        from quackml_spark.operators.text import curriculum_order, score_quality

        order = curriculum_order(
            score_quality(cur, keep_cols=False).select(
                "doc_id", "quality_score"
            ),
            "quality_score",
            band_size=curriculum_band_size,
        )
        cur = _mark("curriculum", cur.join(order, "doc_id"))
    if fim_rate_ppm is not None:
        from quackml_spark.operators.packing import fim_split

        cur = _mark(
            "fim",
            fim_split(
                cur,
                text_col="text",
                id_col="doc_id",
                rate_ppm=fim_rate_ppm,
                seed=fim_seed,
            ),
        )
    if epochs_ppm is not None:
        from quackml_spark.operators.packing import epoch_expand

        eps_cols = [c for c in epochs_ppm.columns if c != "epochs_ppm"]
        if "epochs_ppm" not in epochs_ppm.columns or len(eps_cols) != 1:
            raise ValueError(
                "epochs_ppm must be a (source, epochs_ppm) frame; got "
                f"columns {epochs_ppm.columns}"
            )
        eps = epochs_ppm.select(
            F.col(eps_cols[0]).alias("__source"), "epochs_ppm"
        )
        expanded = epoch_expand(
            cur.select("doc_id", "__source"),
            eps,
            source_col="__source",
            seed=epoch_seed,
        )
        cur = _mark("epochs", expanded.join(cur.drop("__source"), "doc_id"))
    if pack_seq_len is not None:
        from quackml_spark.operators.packing import pack_sequences
        from quackml_spark.operators.text import md5_int32, tokens_expr

        has_copies = epochs_ppm is not None
        prio_parts = [F.lit(str(pack_seed)), F.col("doc_id").cast("string")]
        order = ["__prio", "doc_id"]
        if has_copies:
            prio_parts.append(F.col("copy_idx").cast("string"))
            order.append("copy_idx")
        if pack_n_tokens is not None:
            nt_cols = [c for c in pack_n_tokens.columns if c != "n_tokens"]
            if "n_tokens" not in pack_n_tokens.columns or len(nt_cols) != 1:
                raise ValueError(
                    "pack_n_tokens must be an (id, n_tokens) frame; got "
                    f"columns {pack_n_tokens.columns}"
                )
            nt = pack_n_tokens.select(
                F.col(nt_cols[0]).alias("doc_id"),
                F.col("n_tokens").cast("bigint").alias("__nt"),
            )
            sized = cur.join(nt, "doc_id", "left").withColumn(
                "__n_tokens", F.coalesce(F.col("__nt"), F.lit(0)).cast("bigint")
            ).drop("__nt")
        else:
            sized = cur.withColumn(
                "__n_tokens", F.size(tokens_expr("text")).cast("bigint")
            )
        sized = sized.withColumn(
            "__prio", md5_int32(F.concat_ws("|", *prio_parts))
        )
        carry = tuple(
            c
            for c in sized.columns
            if c not in ("doc_id", "__n_tokens", "__prio")
        )
        cur = _mark(
            "pack",
            pack_sequences(
                sized,
                pack_seq_len,
                n_tokens_col="__n_tokens",
                order_cols=order,
                carry_cols=carry,
            ),
        )
    cur = (
        cur.withColumnRenamed("__source", source_col)
        if source_col
        else cur.drop("__source")
    )
    if fused and stages:
        from functools import reduce

        # ONE counting job over the union of the checkpointed stage
        # frames (see _mark): each branch reads its frame's RDD, the
        # lazy checkpoints materialize bottom-up inside this job, and
        # the blocks are freed by the ContextCleaner when the plan is
        # garbage-collected — no unpersist protocol (the ranked_by
        # lesson from round 7). Count-preserving stages (same_count)
        # get no union branch at all; their value is copied from the
        # predecessor.
        counted = [
            (s, df) for s, df in fused_frames if s not in same_count
        ]
        union = reduce(
            DataFrame.unionByName,
            [
                df.select(F.lit(s).alias("__stage"), "doc_id")
                for s, df in [("__input", cur0)] + counted
            ],
        )
        counts = {
            r["__stage"]: r["n"]
            for r in union.groupBy("__stage")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # an EMPTY corpus yields no union rows at all — every count 0
        n_prev = counts.get("__input", 0)
        stages = []
        for s, _ in fused_frames:
            n = n_prev if s in same_count else counts.get(s, 0)
            stages.append((s, n_prev, n))
            n_prev = n
    rep = local_rows(
        spark,
        [
            (s, i, o, (i - o) if i is not None else None)
            for s, i, o in stages
        ],
        "stage string, docs_in bigint, docs_out bigint, dropped bigint",
    )
    return {"docs": cur, "report": rep}


_CUR_BOILER = (
    "subscribe to our newsletter for updates",
    "copyright 2024 example corp all rights reserved",
    "click here to accept cookies",
)
_CUR_MINQ = 0.35
# clean applied to the line-dedup output column `t`
_CUR_CLEAN_SQL = _CLEAN_SQL.replace("(text,", "(t,")


@register(
    "pipeline_curate_report",
    doc="curate()'s END-TO-END attrition accounting value-checked as "
    "one oracle query: planted boilerplate footers -> line_dedup(5) "
    "-> clean -> quality >= 0.35 -> exact dedup -> decontaminate "
    "(benchmark = raw docs with doc_id %% 97 == 0). The oracle "
    "replays all five stages AND the per-stage in/out/dropped "
    "counts, so a stage reordering or filter drift in the composed "
    "pipeline (e.g. clean collapsing newlines before line ops) "
    "breaks a value check, not just a unit test.",
    oracle=rf"""
WITH multi AS (
  SELECT doc_id,
         text || chr(10) ||
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN '{_CUR_BOILER[0]}'
           WHEN 1 THEN '{_CUR_BOILER[1]}'
           ELSE '{_CUR_BOILER[2]}'
         END AS t
  FROM documents
), split_ AS (
  SELECT doc_id, string_split(t, chr(10)) AS ls FROM multi
), lines AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM split_, unnest(range(1, length(ls) + 1)) AS u(i)
), counts AS (
  SELECT line, COUNT(*) AS c FROM lines GROUP BY line
), ld AS (
  SELECT l.doc_id,
         STRING_AGG(CASE WHEN c.c <= 5 THEN l.line END, chr(10) ORDER BY l.pos)
           AS t,
         SUM(CASE WHEN c.c <= 5 THEN 1 ELSE 0 END) AS n_kept
  FROM lines l JOIN counts c USING (line)
  GROUP BY l.doc_id
), ld_kept AS (
  SELECT doc_id, t FROM ld WHERE n_kept > 0
), cleaned AS (
  SELECT doc_id, {_CUR_CLEAN_SQL} AS t FROM ld_kept
), q AS (
  SELECT doc_id, t,
    length(t) AS n_chars,
    regexp_extract_all(lower(t), '\S+') AS toks
  FROM cleaned
), qm AS (
  SELECT doc_id, t,
    CAST(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END
         AS DECIMAL(18,6)) * 0.4
    + CAST(length(list_filter(toks, x -> list_contains({{STOPWORDS}}, x)))
           AS DECIMAL(18,6)) / greatest(length(toks), 1) * 0.3
    + CAST(length(list_distinct(toks)) AS DECIMAL(18,6))
      / greatest(length(toks), 1) * 0.3 AS score
  FROM q
), quality AS (
  SELECT doc_id, t FROM qm
  WHERE CAST(ROUND(score, 6) AS DOUBLE) >= {_CUR_MINQ}
), dedup AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, t,
           MIN(doc_id) OVER (PARTITION BY md5(lower(trim(t)))) AS keep
    FROM quality
  ) WHERE doc_id = keep
), train_toks AS (
  SELECT doc_id, regexp_extract_all(lower(t), '\S+') AS toks FROM dedup
), train_grams AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(toks[i:i+4], 'string_agg', ' ')) AS gram
  FROM train_toks, unnest(range(1, length(toks) - 3)) AS u(i)
  WHERE length(toks) >= 5
), bench_toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents WHERE doc_id % 97 = 0
), bench_grams AS (
  SELECT DISTINCT md5(list_aggregate(toks[i:i+4], 'string_agg', ' ')) AS gram
  FROM bench_toks, unnest(range(1, length(toks) - 3)) AS u(i)
  WHERE length(toks) >= 5
), leaked AS (
  SELECT DISTINCT g.doc_id FROM train_grams g JOIN bench_grams USING (gram)
), decon AS (
  SELECT d.doc_id FROM dedup d
  WHERE NOT EXISTS (SELECT 1 FROM leaked l WHERE l.doc_id = d.doc_id)
)
SELECT stage, docs_in, docs_out, docs_in - docs_out AS dropped FROM (
  SELECT 'line_dedup' AS stage,
         (SELECT COUNT(*) FROM multi) AS docs_in,
         (SELECT COUNT(*) FROM ld_kept) AS docs_out
  UNION ALL SELECT 'clean',
         (SELECT COUNT(*) FROM ld_kept), (SELECT COUNT(*) FROM cleaned)
  UNION ALL SELECT 'quality',
         (SELECT COUNT(*) FROM cleaned), (SELECT COUNT(*) FROM quality)
  UNION ALL SELECT 'dedup_exact',
         (SELECT COUNT(*) FROM quality), (SELECT COUNT(*) FROM dedup)
  UNION ALL SELECT 'decontaminate',
         (SELECT COUNT(*) FROM dedup), (SELECT COUNT(*) FROM decon)
)
ORDER BY stage
""".replace("{STOPWORDS}", repr(list(STOPWORDS))),
    tags=("textops", "pipeline", "bench"),
)
def pipeline_curate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    boiler = F.element_at(
        F.array(*[F.lit(b) for b in _CUR_BOILER]),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    multi = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit("\n"), boiler).alias("text")
    )
    bench = docs.where(F.col("doc_id") % 97 == 0).select("text")
    out = curate(
        multi,
        line_dedup_max_freq=5,
        min_quality=_CUR_MINQ,
        dedup="exact",
        benchmark=bench,
        report="fused",  # same values as report=True, ONE counting job
    )
    return out["report"].orderBy("stage")


def _sql_band_rows_from_aug() -> str:
    """dedup's band-row SQL twin re-pointed at the ``aug`` CTE — single
    source-table substitution so the near-dup curate oracle can never
    drift from the shared MinHash geometry."""
    from quackml_spark.operators.dedup import _SQL_BAND_ROWS

    return _SQL_BAND_ROWS.replace("FROM documents", "FROM aug")


@register(
    "pipeline_curate_neardup",
    extra=True,
    doc="curate(dedup='minhash') value-checked END-TO-END: two planted "
    "near-copies of existing docs (one trailing-edit, one prefix-edit "
    "— invisible to exact dedup) join the corpus; the pipeline's "
    "MinHash-LSH bands -> in-bucket pairs -> connected components -> "
    "min-id keeper chain must agree with DuckDB's recursive-CTE "
    "transitive closure over the SAME deterministic band keys, doc by "
    "doc (md5 of the surviving text). Determinism makes the check "
    "exact whether or not any given pair collides: both engines hash "
    "identically, so they drop identically.",
    oracle="""
WITH RECURSIVE
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zq trailing marker'
  FROM documents WHERE doc_id = 3
  UNION ALL
  SELECT doc_id + 2000000, 'zq prefix marker ' || text
  FROM documents WHERE doc_id = 5
),
bands AS ({BANDS}),
edges AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
)
SELECT a.doc_id, md5(a.text) AS content_md5
FROM aug a LEFT JOIN comp c ON c.doc_id = a.doc_id
WHERE c.doc_id IS NULL OR c.component = a.doc_id
ORDER BY a.doc_id
""".replace("{BANDS}", _sql_band_rows_from_aug()),
    tags=("textops", "dedup", "pipeline"),
)
def pipeline_curate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.unionByName(
        docs.where(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq trailing marker")).alias("text"),
        )
    ).unionByName(
        docs.where(F.col("doc_id") == 5).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.lit("zq prefix marker "), F.col("text")).alias("text"),
        )
    )
    out = curate(aug, clean=False, dedup="minhash", report=False)
    return (
        out["docs"]
        .select("doc_id", F.md5("text").alias("content_md5"))
        .orderBy("doc_id")
    )


# --- pipeline_curate_full: curate() at its MAXIMAL configuration -----------
#
# The r8 verdict's item 6: per-stage oracles can't see stage-interaction
# bugs, so the full chain — heuristic quality + LEARNED quality
# classifier + minhash near-dup + Bloom decontaminate + budget +
# curriculum, all in ONE curate() call — gets one end-to-end DuckDB
# replay. The learned stage is made SQL-replayable BY CONSTRUCTION:
# planted spam docs use a disjoint zzq* vocabulary, so the classifier
# trained on (aug, label = not-spam) is linearly separable with a huge
# margin and its keep set on this corpus is exactly "id above the spam
# band" (planted ids are negative; spam <= -1e6) — which the oracle
# states as a predicate valid at ANY corpus id range. Every other stage reuses the
# established SQL twin (quality score CTE, shared MinHash band SQL,
# Bloom position arithmetic, ppm budget rate, two-phase curriculum
# rank).

_FULL_SPAM = (
    "zzqalpha zzqbeta zzqgamma zzqdelta zzqepsilon zzqzeta "
    "zzqeta zzqtheta zzqiota zzqkappa"
)
_FULL_BUDGET = 50_000  # chars; < corpus total at sf>=0.01, so the
# budget stage genuinely drops docs at the graded SFs (at sf0.001 the
# rate caps at 1e6 and the stage passes everything through — both
# engines replay the same arithmetic either way)

_QSCORE_SQL = """
    CAST(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END
         AS DECIMAL(18,6)) * 0.4
    + CAST(length(list_filter(toks, x -> list_contains({STOP}, x)))
           AS DECIMAL(18,6)) / greatest(length(toks), 1) * 0.3
    + CAST(length(list_distinct(toks)) AS DECIMAL(18,6))
      / greatest(length(toks), 1) * 0.3
"""


def _curate_full_oracle() -> str:
    from quackml_spark.operators.dedup import _SQL_BAND_ROWS
    from quackml_spark.operators.sampling import PPM
    from quackml_spark.operators.text import (
        _BLOOM_K,
        _BLOOM_M,
        _bloom_pos_sql,
    )

    gram = (
        f"md5(list_aggregate(toks[i:i+{_DECON_K - 1}], 'string_agg', ' '))"
    )
    gram_range = (
        f"unnest(range(1, length(toks) - {_DECON_K - 2})) AS u(i) "
        f"WHERE length(toks) >= {_DECON_K}"
    )
    return (
        rf"""
WITH RECURSIVE
aug AS (
  -- planted docs take NEGATIVE ids so their identity is independent
  -- of the corpus id range (positive +1M offsets collided with the
  -- sf1.0 replica ids >= 1e9 and broke the qmodel predicate — caught
  -- by the three-scale sweep): markers in (-1e6, 0), spam <= -1e6
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -doc_id - 1, text || ' zq trailing marker'
  FROM documents WHERE doc_id = 3
  UNION ALL
  SELECT -doc_id - 1000, 'zq prefix marker ' || text
  FROM documents WHERE doc_id = 5
  UNION ALL
  SELECT -doc_id - 1000000, '{_FULL_SPAM}'
  FROM documents WHERE doc_id % 10 = 7
),
qtoks AS (
  SELECT doc_id, text, length(text) AS n_chars,
         regexp_extract_all(lower(text), '\S+') AS toks
  FROM aug
),
qscore AS (
  SELECT doc_id, text, {_QSCORE_SQL} AS score FROM qtoks
),
quality AS (
  SELECT doc_id, text FROM qscore
  WHERE CAST(ROUND(score, 6) AS DOUBLE) >= {_CUR_MINQ}
),
qmodel AS (
  -- learned-filter keep set (see module comment: separable by
  -- construction, so keep == not-planted-spam == id above the spam
  -- band)
  SELECT doc_id, text FROM quality WHERE doc_id > -1000000
),
bands AS ({{BANDS}}),
edges AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
neardup AS (
  SELECT a.doc_id, a.text
  FROM qmodel a LEFT JOIN comp c ON c.doc_id = a.doc_id
  WHERE c.doc_id IS NULL OR c.component = a.doc_id
),
ndtoks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
  FROM neardup
),
ndgrams AS (
  SELECT DISTINCT doc_id, {gram} AS gram FROM ndtoks, {gram_range}
),
btoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents WHERE doc_id % 97 = 0
),
bgrams AS (
  SELECT DISTINCT {gram} AS gram FROM btoks, {gram_range}
),
bits AS (
  SELECT DISTINCT {_bloom_pos_sql('gram', _BLOOM_M)} AS pos
  FROM bgrams, range({_BLOOM_K}) t(i)
),
probe AS (
  SELECT doc_id, gram, {_bloom_pos_sql('gram', _BLOOM_M)} AS pos
  FROM ndgrams, range({_BLOOM_K}) t(i)
),
leaked AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, gram,
           (COUNT(*) FILTER (WHERE b.pos IS NOT NULL)) = COUNT(*) AS hit
    FROM probe p LEFT JOIN bits b USING (pos)
    GROUP BY doc_id, gram
  ) WHERE hit
),
decon AS (
  SELECT n.doc_id, n.text FROM neardup n
  WHERE NOT EXISTS (SELECT 1 FROM leaked l WHERE l.doc_id = n.doc_id)
),
rate AS (
  SELECT GREATEST(CAST(1 AS BIGINT),
           LEAST(CAST({PPM} AS BIGINT),
                 CAST(FLOOR({PPM * _FULL_BUDGET} / SUM(length(text)))
                      AS BIGINT))) AS rate_ppm
  FROM decon
),
budget AS (
  SELECT d.doc_id, d.text FROM decon d, rate r
  WHERE ('0x' || substr(md5('0|' || d.doc_id::VARCHAR), 1, 8))::BIGINT
        % {PPM} < r.rate_ppm
),
ctoks AS (
  SELECT doc_id, text, length(text) AS n_chars,
         regexp_extract_all(lower(text), '\S+') AS toks
  FROM budget
),
cscore AS (
  SELECT doc_id, text, {_QSCORE_SQL} AS q FROM ctoks
),
cranked AS (
  SELECT doc_id, text,
         CAST(FLOOR((ROW_NUMBER() OVER (
                 ORDER BY CAST(ROUND(q, 6) AS DOUBLE) DESC, doc_id) - 1)
               / 100) AS BIGINT) AS band,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM cscore
)
SELECT doc_id, md5(text) AS content_md5, band,
       CAST(ROW_NUMBER() OVER (ORDER BY band, prio, doc_id) - 1 AS BIGINT)
         AS curriculum_pos
FROM cranked
ORDER BY doc_id
"""
        .replace("{BANDS}", _SQL_BAND_ROWS.replace("FROM documents", "FROM qmodel"))
        .replace("{STOP}", repr(list(STOPWORDS)))
    )


@register(
    "pipeline_curate_full",
    extra=True,
    doc="curate() at its MAXIMAL configuration, value-checked "
    "END-TO-END in one oracle: heuristic quality (>= 0.35) -> learned "
    "fastText-style quality classifier (planted disjoint-vocabulary "
    "spam, separable by construction so the keep set is "
    "SQL-stateable) -> MinHash-LSH near-dup clusters (planted "
    "trailing/prefix near-copies) -> Bloom benchmark decontamination "
    "-> ppm char-budget sampling -> banded curriculum order. The "
    "oracle replays every stage in curate()'s exact order over the "
    "same augmented corpus, so a stage reordering, a filter drifting "
    "past a dedup, or a budget computed over the wrong stage's chars "
    "breaks a value check, not just a unit test.",
    oracle=None,  # installed below (composed from the shared SQL twins)
    tags=("textops", "pipeline", "dedup", "sampling"),
)
def pipeline_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.qualityclf import train_quality_classifier

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # planted docs take NEGATIVE ids (markers in (-1e6, 0), spam at
    # <= -1e6) so identification never collides with the corpus id
    # range — positive offsets broke at sf1.0 where replica ids are
    # >= 1e9 (three-scale sweep catch)
    aug = (
        docs.unionByName(
            docs.where(F.col("doc_id") == 3).select(
                (-F.col("doc_id") - 1).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zq trailing marker")).alias(
                    "text"
                ),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") == 5).select(
                (-F.col("doc_id") - 1000).alias("doc_id"),
                F.concat(F.lit("zq prefix marker "), F.col("text")).alias(
                    "text"
                ),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 7).select(
                (-F.col("doc_id") - 1000000).alias("doc_id"),
                F.lit(_FULL_SPAM).alias("text"),
            )
        )
    )
    labeled = aug.withColumn(
        "label", (F.col("doc_id") > -1000000).cast("int")
    )
    model = train_quality_classifier(labeled)
    bench = docs.where(F.col("doc_id") % 97 == 0).select("text")
    out = curate(
        aug,
        clean=False,
        min_quality=_CUR_MINQ,
        quality_model=model,
        dedup="minhash",
        benchmark=bench,
        decontaminate_mode="bloom",
        budget_chars=_FULL_BUDGET,
        curriculum_band_size=100,
        report=False,
    )
    return (
        out["docs"]
        .select(
            "doc_id",
            F.md5("text").alias("content_md5"),
            "band",
            "curriculum_pos",
        )
        .orderBy("doc_id")
    )


# --- pipeline_curate_train: curate() through its TERMINAL stages ----------
#
# The r9 verdict's item 5: the curation chain now continues past
# budget/curriculum into the two stages a real pretraining pipeline
# ships — per-source fractional epoch expansion and concat-and-chunk
# sequence packing — so one curate() call emits the frame a training
# loader consumes. This row value-checks the WHOLE chain end-to-end
# (quality -> exact dedup -> per-source char budget -> epochs -> pack)
# in one DuckDB replay: a budget computed over copies instead of docs,
# an epoch coin drawn before dedup, or a packing order that loses the
# copy dimension all break a value check here, not just a unit test.

_TRAIN_BUDGET = 80_000  # chars per the budget stage (per-source split)
_TRAIN_SEQ = 256


def _curate_train_oracle() -> str:
    from quackml_spark.operators.sampling import PPM

    ws = r"regexp_extract_all(lower(text), '\S+')"
    return (
        rf"""
WITH qtoks AS (
  SELECT doc_id, text, source, length(text) AS n_chars, {ws} AS toks
  FROM documents
),
qscore AS (
  SELECT doc_id, text, source, {_QSCORE_SQL} AS score FROM qtoks
),
quality AS (
  SELECT doc_id, text, source FROM qscore
  WHERE CAST(ROUND(score, 6) AS DOUBLE) >= {_CUR_MINQ}
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM quality
  GROUP BY md5(lower(trim(text)))
),
deduped AS (
  SELECT q.doc_id, q.text, q.source
  FROM quality q JOIN keepers USING (doc_id)
),
nsrc AS (SELECT COUNT(DISTINCT source) AS n FROM deduped),
rates AS (
  SELECT source,
         GREATEST(CAST(1 AS BIGINT),
           LEAST(CAST({PPM} AS BIGINT),
             CAST(FLOOR({PPM} * (SELECT GREATEST(1,
                      CAST(FLOOR({_TRAIN_BUDGET}.0 / GREATEST(n, 1))
                           AS BIGINT)) FROM nsrc)
                   / SUM(length(text))) AS BIGINT))) AS rate_ppm
  FROM deduped GROUP BY source
),
budget AS (
  SELECT d.doc_id, d.text, d.source
  FROM deduped d JOIN rates r USING (source)
  WHERE ('0x' || substr(md5('0|' || d.doc_id::VARCHAR), 1, 8))::BIGINT
        % {PPM} < r.rate_ppm
),
eps AS (
  SELECT source,
         500000 + ('0x' || substr(md5(source), 1, 8))::BIGINT % 2000000
           AS epochs_ppm
  FROM (SELECT DISTINCT source FROM documents)
),
ncopies AS (
  SELECT b.doc_id, b.text, b.source,
         CAST(FLOOR(e.epochs_ppm / 1000000.0) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5('1|' || b.doc_id::VARCHAR), 1, 8))
                     ::BIGINT % {PPM} < e.epochs_ppm % {PPM}
                THEN 1 ELSE 0 END AS n_copies
  FROM budget b LEFT JOIN eps e USING (source)
),
copies AS (
  SELECT doc_id, text, source, CAST(u.i AS BIGINT) AS copy_idx
  FROM ncopies, unnest(range(0, n_copies)) AS u(i)
  WHERE n_copies > 0
),
sized AS (
  SELECT doc_id, source, copy_idx,
         length({ws}) AS n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR || '|'
                             || copy_idx::VARCHAR), 1, 8))::BIGINT AS prio
  FROM copies
  WHERE length({ws}) > 0
),
summed AS (
  SELECT doc_id, source, copy_idx, n_tokens,
         SUM(n_tokens) OVER (ORDER BY prio, doc_id, copy_idx
                             ROWS UNBOUNDED PRECEDING) AS prefix_sum
  FROM sized
)
SELECT doc_id, copy_idx, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix_sum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((prefix_sum - n_tokens) / {_TRAIN_SEQ}) AS BIGINT)
         AS first_seq,
       CAST(FLOOR((prefix_sum - 1) / {_TRAIN_SEQ}) AS BIGINT) AS last_seq,
       CAST(FLOOR((prefix_sum - 1) / {_TRAIN_SEQ})
            - FLOOR((prefix_sum - n_tokens) / {_TRAIN_SEQ}) + 1 AS BIGINT)
         AS n_segments
FROM summed
ORDER BY doc_id, copy_idx
"""
    ).replace("{STOP}", repr(list(STOPWORDS)))


@register(
    "pipeline_curate_train",
    extra=True,
    doc="curate() run through its TERMINAL training-prep stages, "
    "value-checked END-TO-END: heuristic quality (>= 0.35) -> exact "
    "dedup -> per-source ppm char budget -> per-source fractional "
    "epoch expansion (LLaMA recipe; row grain becomes copies) -> "
    "concat-and-chunk sequence packing on the distributed prefix sum. "
    "One call emits the frame a training loader consumes — "
    "(doc, copy) with exact stream offsets and sequence spans; the "
    "oracle replays the whole chain in curate()'s exact stage order.",
    oracle=None,  # installed below (composed from the shared SQL twins)
    tags=("textops", "pipeline", "sampling", "bench"),
)
def pipeline_curate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import md5_int32

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    eps = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.lit(500000) + md5_int32(F.col("source")) % 2000000)
            .cast("bigint")
            .alias("epochs_ppm"),
        )
    )
    out = curate(
        docs,
        clean=False,
        min_quality=_CUR_MINQ,
        dedup="exact",
        budget_chars=_TRAIN_BUDGET,
        epochs_ppm=eps,
        pack_seq_len=_TRAIN_SEQ,
        source_col="source",
        report=False,
    )
    return (
        out["docs"]
        .select(
            "doc_id",
            "copy_idx",
            "source",
            "n_tokens",
            "start_token",
            "first_seq",
            "last_seq",
            "n_segments",
        )
        .orderBy("doc_id", "copy_idx")
    )


# composed after registration so the builder above stays the single
# source of stage order; the SQL reuses the dedup module's band twin
from quackml_spark.plans import REGISTRY as _REG  # noqa: E402

_REG["pipeline_curate_full"].oracle = _curate_full_oracle()
_REG["pipeline_curate_train"].oracle = _curate_train_oracle()


def _curate_fim_oracle() -> str:
    """DuckDB replay of curate(fim_rate_ppm=500000, pack_seq_len=512):
    the FIM carve (packing.fim_carve_sql) feeds whitespace token counts
    into the same prefix-sum packing layout text_pack_sequences pins —
    sentinels priced into the counts, exactly like the engine."""
    from quackml_spark.operators.packing import fim_carve_sql

    carve = fim_carve_sql(500_000, 0).strip()
    return rf"""
WITH fimd AS (
{carve}
), t AS (
  SELECT doc_id, fim_applied,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM fimd
), sized AS (
  SELECT * FROM t WHERE n_tokens > 0
), summed AS (
  SELECT doc_id, fim_applied, n_tokens,
         SUM(n_tokens) OVER (ORDER BY prio, doc_id
                             ROWS UNBOUNDED PRECEDING) AS prefix_sum
  FROM sized
)
SELECT doc_id, fim_applied,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix_sum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((prefix_sum - n_tokens) / 512) AS BIGINT) AS first_seq,
       CAST(FLOOR((prefix_sum - 1) / 512) AS BIGINT) AS last_seq,
       CAST(FLOOR((prefix_sum - 1) / 512)
            - FLOOR((prefix_sum - n_tokens) / 512) + 1 AS BIGINT)
         AS n_segments
FROM summed
ORDER BY doc_id
"""


@register(
    "pipeline_curate_fim",
    extra=True,
    doc="curate() with the FIM stage chained into the terminal packing "
    "stage: a deterministic 50% of documents are PSM-carved "
    "(fill-in-the-middle) and the concat-and-chunk layout then prices "
    "the CARVED text — sentinels included — through the distributed "
    "prefix sum. One DuckDB query replays carve + token counts + "
    "offsets end to end, value-checking the stage WIRING, not just "
    "each operator alone.",
    tags=("pipeline", "textops"),
)
def pipeline_curate_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = curate(
        docs,
        clean=False,
        dedup=None,
        fim_rate_ppm=500_000,
        fim_seed=0,
        pack_seq_len=512,
        report=False,
    )
    return (
        out["docs"]
        .select(
            "doc_id",
            "fim_applied",
            "n_tokens",
            "start_token",
            "first_seq",
            "last_seq",
            "n_segments",
        )
        .orderBy("doc_id")
    )


_REG["pipeline_curate_fim"].oracle = _curate_fim_oracle()


def _curate_ppjoin_oracle(threshold_ppm: int = 500_000, iters: int = 3) -> str:
    """DuckDB replay of curate(min_quality=0.35, dedup='ppjoin_best'):
    the heuristic-quality stage feeds the PPJoin pair CTEs (shingled
    over the QUALITY SURVIVORS, not raw documents — the stage wiring
    under test), the unrolled LPA rounds, the per-community quality
    argmax, and the final drop anti-join. Every fragment is the shared
    SQL twin its standalone oracle uses (dedup._ppjoin_ctes,
    _graphtwins.lpa_round_ctes), so the composed replay can't drift from the
    operator replays."""
    from quackml_spark.operators.dedup import _ppjoin_ctes, _shingles_sql
    from quackml_spark.operators._graphtwins import lpa_round_ctes

    qual = rf"""qtoks AS (
  SELECT doc_id, text, length(text) AS n_chars,
         regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
),
qscore AS (
  SELECT doc_id, text, {_QSCORE_SQL} AS score FROM qtoks
),
quality AS MATERIALIZED (
  SELECT doc_id, text, CAST(ROUND(score, 6) AS DOUBLE) AS quality_score
  FROM qscore
  WHERE CAST(ROUND(score, 6) AS DOUBLE) >= {_CUR_MINQ}
)"""
    ctes = [
        qual,
        _ppjoin_ctes(_shingles_sql("quality"), threshold_ppm),
        "praw AS (SELECT doc_a AS s, doc_b AS d FROM pairs)",
        "und AS MATERIALIZED (SELECT s, d FROM praw "
        "UNION SELECT d, s FROM praw)",
        *lpa_round_ctes(iters),
        f"""decisions AS (
  SELECT m.node AS doc_id,
         ROW_NUMBER() OVER (PARTITION BY m.label
                            ORDER BY q.quality_score DESC, m.node) = 1
           AS is_keeper
  FROM l{iters} m JOIN quality q ON q.doc_id = m.node
)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT q.doc_id, q.quality_score
FROM quality q LEFT JOIN decisions d USING (doc_id)
WHERE COALESCE(d.is_keeper, TRUE)
ORDER BY doc_id
"""
    ).replace("{STOP}", repr(list(STOPWORDS)))


@register(
    "pipeline_curate_ppjoin",
    doc="curate() in its EXACT near-dup arbitration mode, value-checked "
    "END-TO-END: heuristic quality (>= 0.35) -> PPJoin exact Jaccard "
    ">= 0.5 pairs over the quality survivors -> 3 synchronous LPA "
    "rounds refine communities across thin false-positive bridges -> "
    "each community keeps its highest-quality member (ties to the "
    "smaller id), everything outside the pair graph passes through. "
    "The quality-sensitive exact-dedup curation a production corpus "
    "build runs when LSH recall bounds aren't acceptable; the oracle "
    "replays the whole chain in curate()'s exact stage order from the "
    "same SQL twins the standalone operator oracles use.",
    oracle=None,  # installed below (needs the dedup/graph twins)
    tags=("textops", "pipeline", "dedup", "graph"),
)
def pipeline_curate_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import score_quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = curate(
        docs,
        clean=False,
        min_quality=_CUR_MINQ,
        dedup="ppjoin_best",
        report=False,
    )
    scored = score_quality(docs, keep_cols=False).select(
        "doc_id", "quality_score"
    )
    return (
        out["docs"]
        .select("doc_id")
        .join(scored, "doc_id")
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


_REG["pipeline_curate_ppjoin"].oracle = _curate_ppjoin_oracle()
