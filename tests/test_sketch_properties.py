"""Hypothesis property tests for the probabilistic operators: the
directional guarantees (Bloom never false-negative, count-min never
undercount, budget prefix contiguity) must hold for ARBITRARY inputs,
not just the corpus fixtures. Spark jobs per example are small; example
counts are tuned so each test stays in tens of seconds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_gram = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bench=st.sets(_gram, min_size=1, max_size=30),
    probe_extra=st.sets(_gram, min_size=0, max_size=30),
    m=st.sampled_from([64, 256, 4096]),
    k=st.integers(min_value=1, max_value=4),
)
def test_bloom_never_false_negative(spark, bench, probe_extra, m, k):
    """EVERY benchmark gram must hit its own filter, at any geometry —
    the one-sided error direction is structural, not statistical."""
    from quackml_spark.operators.text import bloom_build, bloom_probe

    bench_df = spark.createDataFrame([(g,) for g in sorted(bench)], "gram string")
    probe = spark.createDataFrame(
        [(g,) for g in sorted(bench | probe_extra)], "gram string"
    )
    bitmap = bloom_build(bench_df, m=m, k=k)
    out = {r["gram"]: r["bloom_hit"] for r in bloom_probe(probe, bitmap, m=m, k=k).collect()}
    for g in bench:
        assert out[g], f"false negative for {g!r} at m={m}, k={k}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(_gram, min_size=1, max_size=120),
    depth=st.integers(min_value=1, max_value=4),
    width=st.sampled_from([4, 64, 1024]),
)
def test_countmin_never_undercounts_property(spark, items, depth, width):
    """min-over-rows estimates >= true multiplicity for every item of an
    arbitrary multiset, at any sketch geometry."""
    import pyspark.sql.functions as F

    from quackml_spark.operators.text import countmin_build, countmin_estimate

    df = spark.createDataFrame([(g,) for g in items], "gram string")
    truth = df.groupBy("gram").agg(F.count(F.lit(1)).alias("true_count"))
    sketch = countmin_build(df, depth=depth, width=width)
    rows = countmin_estimate(truth, sketch, depth=depth, width=width).collect()
    assert len(rows) == len(set(items))
    for r in rows:
        assert r["cm_estimate"] >= r["true_count"], (r, depth, width)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.text(alphabet="ab ", min_size=1, max_size=40),
        ),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=1, max_value=30),
)
def test_token_budget_prefix_property(spark, docs, budget):
    """For arbitrary corpora and budgets: every kept doc starts below
    the budget, per-source keeps form a contiguous prefix, and coverage
    reaches the budget whenever the source has enough tokens."""
    import pyspark.sql.functions as F

    from quackml_spark.operators.text import token_budget_sample

    rows = [(i, src, txt) for i, (src, txt) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, budget, n_shards=4).collect()
    per_src: dict = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r)
    totals = {
        r["source"]: r["t"]
        for r in df.groupBy("source")
        .agg(F.sum(F.size(F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)"))).alias("t"))
        .collect()
    }
    for src, kept in per_src.items():
        kept.sort(key=lambda r: r["start_tok"])
        acc = 0
        for r in kept:
            assert r["start_tok"] == acc
            assert r["start_tok"] < budget
            acc += r["n_tokens"]
    for src, total in totals.items():
        kept_toks = sum(r["n_tokens"] for r in per_src.get(src, []))
        if total >= budget:
            assert kept_toks >= budget, (src, kept_toks, total)
        else:
            assert kept_toks == total, (src, kept_toks, total)
