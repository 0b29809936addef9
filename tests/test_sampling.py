"""Deterministic mixture sampling: reproducibility + budget behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.operators.sampling import (
    PPM,
    budget_rates,
    hash_ppm,
    mixture_sample,
)
from quackml_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )


def test_sample_is_reproducible(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rates = budget_rates(docs, 3000)
    a = sorted(r["doc_id"] for r in mixture_sample(docs, rates).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(docs, rates).collect())
    assert a == b and len(a) > 0


def test_seed_changes_membership(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rates = budget_rates(docs, 3000)
    a = set(r["doc_id"] for r in mixture_sample(docs, rates, seed=0).collect())
    b = set(r["doc_id"] for r in mixture_sample(docs, rates, seed=1).collect())
    assert a != b  # different deterministic draws


def test_budget_rates_bounds(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    for row in budget_rates(docs, 10**9).collect():
        assert row["rate_ppm"] == PPM  # budget >> totals -> keep all
    for row in budget_rates(docs, 3000).collect():
        assert 0 < row["rate_ppm"] < PPM
        assert row["rate_ppm"] == PPM * 3000 // row["total_chars"]


def test_hash_ppm_uniformity(spark, sf_dir):
    # crude sanity: draws spread over [0, 1e6), mean near 500k
    docs = _docs(spark, sf_dir)
    stats = docs.select(hash_ppm("doc_id").alias("h")).agg(
        F.min("h"), F.max("h"), F.avg("h")
    ).first()
    assert 0 <= stats[0] and stats[1] < PPM
    assert 350_000 < stats[2] < 650_000


def test_weighted_sample_is_weight_proportional(spark):
    """Directional guarantee: rows with 50x the weight must win the
    single-slot sample in the overwhelming majority of seeds (exact
    A-ES property; md5-uniforms stand in for RNG)."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.sampling import weighted_sample

    rows = [(i, 50.0 if i < 5 else 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    heavy_wins = 0
    for seed in range(30):
        got = weighted_sample(df, "w", 1, seed=seed).collect()[0]["doc_id"]
        heavy_wins += got < 5
    # heavy rows hold 250/295 of the total weight -> expect ~85% wins;
    # demand a clear majority with slack for 30-draw noise
    assert heavy_wins >= 18, heavy_wins


def test_temperature_rates_flatten_toward_low_resource(spark):
    """alpha=0.5 gives the smaller source a LARGER sampling rate than
    proportional sampling would, and budget shares follow sqrt(chars)."""
    from quackml_spark.operators.sampling import temperature_rates

    rows = [(i, "big", 100) for i in range(900)] + [
        (1000 + i, "small", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    temp = {r["source"]: r for r in temperature_rates(df, 10_000).collect()}
    # sqrt shares: sqrt(90000):sqrt(10000) = 3:1 -> small gets 1/4 of
    # the total budget (vs 1/10 under proportional, alpha=1, sampling)
    assert temp["small"]["rate_ppm"] > temp["big"]["rate_ppm"]
    share_small = temp["small"]["rate_ppm"] * 10_000
    share_big = temp["big"]["rate_ppm"] * 90_000
    assert abs(share_small / (share_small + share_big) - 0.25) < 0.01


def test_temperature_rates_alpha_one_is_proportional(spark):
    from quackml_spark.operators.sampling import temperature_rates

    rows = [(i, "a", 50) for i in range(200)] + [
        (500 + i, "b", 50) for i in range(800)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    rates = {r["source"]: r for r in temperature_rates(df, 5_000, alpha=1.0).collect()}
    # alpha=1: share ∝ chars -> every source keeps the same fraction
    assert abs(rates["a"]["rate_ppm"] - rates["b"]["rate_ppm"]) <= 1


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def _dsir_corpus(spark):
    """Raw pool: 40 'code-like' + 40 'prose-like' docs; target: 20
    code-like docs. DSIR must prefer the code-like half of the pool."""
    rows = []
    for i in range(40):
        rows.append((i, f"def fn{i % 5} return value import module end"))
    for i in range(40, 80):
        rows.append((i, f"the cat sat on the warm mat today {i % 5}"))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, "def helper return import module value code") for i in range(20)],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_log_weights_cover_every_doc(spark):
    from quackml_spark.operators.sampling import dsir_log_weights

    raw, target = _dsir_corpus(spark)
    # add a featureless doc: empty text -> no n-grams -> log_w must be 0
    raw = raw.union(spark.createDataFrame([(999, "")], raw.schema))
    got = {r["doc_id"]: float(r["log_w"]) for r in dsir_log_weights(raw, target).collect()}
    assert len(got) == 81  # every raw doc exactly once
    assert got[999] == 0.0


def test_dsir_prefers_target_like_docs(spark):
    from quackml_spark.operators.sampling import dsir_log_weights, dsir_select

    raw, target = _dsir_corpus(spark)
    logw = {r["doc_id"]: float(r["log_w"])
            for r in dsir_log_weights(raw, target).collect()}
    code_mean = sum(logw[i] for i in range(40)) / 40
    prose_mean = sum(logw[i] for i in range(40, 80)) / 40
    assert code_mean > prose_mean  # likelihood ratio separates the domains
    # Gumbel top-20 should be dominated by code-like docs
    sel = [r["doc_id"] for r in dsir_select(raw, target, 20).collect()]
    assert len(sel) == 20
    assert sum(1 for d in sel if d < 40) >= 15


def test_dsir_select_is_deterministic_and_seed_sensitive(spark):
    from quackml_spark.operators.sampling import dsir_select

    raw, target = _dsir_corpus(spark)
    a = [r["doc_id"] for r in dsir_select(raw, target, 10, seed=0).collect()]
    b = [r["doc_id"] for r in dsir_select(raw, target, 10, seed=0).collect()]
    c = {r["doc_id"] for r in dsir_select(raw, target, 10, seed=7).collect()}
    assert a == b  # pure function of (corpus, target, seed)
    assert set(a) != c  # noise actually depends on the seed


def test_per_group_ols_ignores_null_pairs(spark):
    """regr_slope parity: NULL (x or y) pairs are IGNORED — one NULL x
    in a group used to NaN the whole group's fit (NaN mean sails past
    the zero-variance guard) while DuckDB returned the valid-pair fit
    (review catch)."""
    from quackml_spark.ml.pergroup import fit_ols_per_group

    rows = [("g1", float(i), 2.0 * i + 1.0) for i in range(10)]
    rows.append(("g1", None, 5.0))    # NULL x
    rows.append(("g1", 3.0, None))    # NULL y
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = fit_ols_per_group(df, "g", "x", "y").collect()[0]
    assert out["slope"] is not None
    assert abs(out["slope"] - 2.0) < 1e-9
    assert abs(out["intercept"] - 1.0) < 1e-9
