"""Value checks for corpus_profile / domain_cap_sample beyond the
DuckDB parity rows: planted duplicate accounting, integer-exact
percentile ranks, NULL ordering, and the cap contract."""

from __future__ import annotations


def test_profile_counts_and_percentiles(spark):
    from quackml_spark.operators.profile import corpus_profile

    rows = [
        # src a: 4 docs, one exact dup pair, lengths 1..4 chars
        (0, "x", "en", "a"),
        (1, "xy", "en", "a"),
        (2, "xyz", "fr", "a"),
        (3, "x", "en", "a"),
        # src b: 2 distinct docs
        (4, "hello world", "en", "b"),
        (5, "bye", "fr", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r.asDict() for r in corpus_profile(df).collect()}
    a = out["a"]
    assert a["n_docs"] == 4 and a["distinct_texts"] == 3 and a["dup_docs"] == 2
    assert a["dup_rate"] == 0.5
    assert a["top_lang"] == "en" and a["top_lang_docs"] == 3
    # lengths sorted: [1, 1, 2, 3]; p50 rank=ceil(4/2)=2 -> 1,
    # p90 rank=ceil(3.6)=4 -> 3
    assert a["p50_chars"] == 1 and a["p90_chars"] == 3
    b = out["b"]
    assert b["n_docs"] == 2 and b["dup_docs"] == 0 and b["dup_rate"] == 0.0
    # lengths [3, 11]: p50 rank=1 -> 3, p90 rank=ceil(1.8)=2 -> 11
    assert b["p50_chars"] == 3 and b["p90_chars"] == 11


def test_profile_nulls_sort_last(spark):
    """NULL text lengths and NULL langs must rank LAST (the DuckDB
    default) — the review-caught Spark ASC-NULLS-FIRST divergence."""
    from quackml_spark.operators.profile import corpus_profile

    rows = [
        (0, "ab", "en", "s"),
        (1, "abcd", None, "s"),
        (2, None, "en", "s"),
        (3, "a", None, "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    r = corpus_profile(df).collect()[0]
    # lengths NULLS LAST: [1, 2, 4, NULL]; p50 rank=2 -> 2, p90 rank=4 -> NULL
    assert r["p50_chars"] == 2
    assert r["p90_chars"] is None
    # lang counts: en=2, NULL=2 — the tie must resolve to the non-NULL lang
    assert r["top_lang"] == "en"


def test_domain_cap_contract(spark):
    from quackml_spark.operators.profile import domain_cap_sample

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap_sample(df, cap=4)
    per_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert per_src == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic: same corpus + seed -> same sample
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in domain_cap_sample(df, cap=4).collect())
    assert a == b
    # different seed -> (almost surely) different sample, same sizes
    c = sorted(r["doc_id"] for r in domain_cap_sample(df, cap=4, seed=1).collect())
    assert len(c) == len(a)


def test_corpus_diff_statuses_and_null_text(spark):
    """added/removed/changed/unchanged all classified; NULL text hashes
    as '' (a present-with-NULL doc diffs instead of vanishing through
    md5(NULL))."""
    from quackml_spark.operators.profile import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged", 2: "changed", 3: "removed",
        4: "unchanged", 5: "added",
    }


def test_exact_quantiles_match_sorted_reference(spark):
    """Property: exact_quantiles == the sorted-list rank definition on
    arbitrary integer multisets — including values past 2^53, where a
    double-division bucketing would silently mis-bucket (the operator
    uses integer div), negatives, heavy ties, and single-value sets.

    The load-bearing inputs are PINNED @example cases (past-2^53
    values, negatives, heavy ties, a singleton — each of which caught
    or would catch a real bug class) so they run every time instead of
    depending on the random draw; the residual random examples are
    fewer (r14: each example is ~16 sequential bucket-16 narrowing
    rounds = ~2-6 s of driver-iterative jobs, and this test was the
    suite's slowest)."""
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st

    from quackml_spark.operators.profile import exact_quantiles

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @example(vals=[2**62, 2**62 - 1, -(2**62), 2**53 + 1, 2**53 - 1])
    @example(vals=[-7, -7, -7, 0, 0, 3, 3, 3, 3])
    @example(vals=[42])
    @example(vals=[-(2**62)] * 5 + [2**62] * 4)
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.integers(min_value=-100, max_value=100),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def run(vals):
        ps = ((1, 2), (9, 10), (99, 100))
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {
            (r["p_num"], r["p_den"]): r["value"]
            for r in exact_quantiles(df, "x", ps=ps, buckets=16).collect()
        }
        s = sorted(vals)
        n = len(s)
        want = {
            (pn, pd): s[(pn * n + pd - 1) // pd - 1] for pn, pd in ps
        }
        assert got == want

    run()


def test_exact_quantiles_empty_and_nulls(spark):
    from quackml_spark.operators.profile import exact_quantiles

    empty = spark.createDataFrame([], "x long")
    assert exact_quantiles(empty, "x").count() == 0
    withnull = spark.createDataFrame(
        [(None,), (5,), (None,), (7,)], "x long"
    )
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles(withnull, "x").collect()
    }
    # n = 2 (nulls excluded): p50 rank 1 -> 5, p90/p99 rank 2 -> 7
    assert got == {(1, 2): 5, (9, 10): 7, (99, 100): 7}


def test_grouped_exact_quantiles_match_sorted_reference(spark):
    """Per-group selection == per-group sorted-rank definition on
    arbitrary small multisets, including 2^62-scale values (integer-div
    bucketing), single-value groups, and groups of very different
    sizes/ranges (each narrows independently).

    Load-bearing inputs pinned as @example cases, fewer random
    residuals — the same round-count economics as the ungrouped
    property test above (r14)."""
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st

    from quackml_spark.operators.profile import grouped_exact_quantiles

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @example(
        data={
            "a": [2**62, -(2**62), 2**53 + 1, 0],
            "b": [5],
            "c": [-3, -3, -3, 7, 7],
        }
    )
    @example(data={"a": [-(2**62)], "b": list(range(-12, 13))})
    @given(
        data=st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.lists(
                st.one_of(
                    st.integers(min_value=-(2**62), max_value=2**62),
                    st.integers(min_value=-50, max_value=50),
                ),
                min_size=1,
                max_size=25,
            ),
            min_size=1,
        )
    )
    def run(data):
        ps = ((1, 2), (9, 10))
        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, x long")
        got = {
            (r["g"], r["p_num"], r["p_den"]): r["value"]
            for r in grouped_exact_quantiles(
                df, "g", "x", ps=ps, buckets=8
            ).collect()
        }
        want = {}
        for g, vs in data.items():
            s = sorted(vs)
            n = len(s)
            for pn, pd in ps:
                want[(g, pn, pd)] = s[(pn * n + pd - 1) // pd - 1]
        assert got == want

    run()


def test_exact_quantiles_range_wider_than_int64(spark):
    """A value range spanning more than int64 (lo < 0 < hi with
    hi - lo > 2^63 - 1) must not overflow the bucketing subtraction
    under ANSI — the hypothesis-found r13 regression, pinned
    deterministically for both the grouped and ungrouped selectors."""
    from quackml_spark.operators.profile import (
        exact_quantiles,
        grouped_exact_quantiles,
    )

    lo, hi = -(2**62), 2**62
    df = spark.createDataFrame([(v,) for v in (lo, hi)], "x long")
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles(df, "x", ps=((1, 2),), buckets=8).collect()
    }
    assert got == {(1, 2): lo}
    gdf = spark.createDataFrame(
        [("a", lo), ("a", hi), ("b", 7)], "g string, x long"
    )
    ggot = {
        (r["g"], r["p_num"], r["p_den"]): r["value"]
        for r in grouped_exact_quantiles(
            gdf, "g", "x", ps=((1, 2), (9, 10)), buckets=8
        ).collect()
    }
    assert ggot == {
        ("a", 1, 2): lo,
        ("a", 9, 10): hi,
        ("b", 1, 2): 7,
        ("b", 9, 10): 7,
    }
