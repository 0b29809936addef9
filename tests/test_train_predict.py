"""Lifecycle e2e tests — the reference's commented pg_tests made real
(SURVEY.md §5: api.rs:2939-3057 shapes)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from quackml_spark.catalog import Catalog
from quackml_spark.ml import (
    decompose,
    deploy,
    load_dataset,
    predict,
    predict_joint,
    predict_proba,
    register_udfs,
    train,
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


def test_train_regression_diabetes(spark, catalog):
    df = load_dataset(spark, "diabetes")
    res = train(
        spark, "Test project", task="regression", df=df, y_column_name="target",
        catalog=catalog, test_sampling="random",
    )
    assert res.deployed
    m = res.metrics
    assert {"r2", "mae", "mse", "fit_time", "score_time"} <= set(m)
    assert m["r2"] > 0.3, m
    out = predict(df, "Test project", catalog=catalog)
    preds = out.select("prediction").limit(5).collect()
    assert all(isinstance(r["prediction"], float) for r in preds)
    # catalog rows exist
    assert len(catalog.find("models", status="successful")) == 1
    assert len(catalog.read("deployments")) == 1


def test_train_classification_iris(spark, catalog):
    df = load_dataset(spark, "iris")
    res = train(
        spark, "iris clf", task="classification", df=df, y_column_name="target",
        algorithm="random_forest", catalog=catalog,
    )
    m = res.metrics
    assert m["f1"] > 0.8, m
    assert {"accuracy", "f1_micro", "precision", "recall", "mcc"} <= set(m)
    out = predict_proba(df, "iris clf", catalog=catalog)
    row = out.select("prediction", "probability_arr", "prediction_label").first()
    assert len(row["probability_arr"]) == 3
    assert abs(sum(row["probability_arr"]) - 1.0) < 1e-6
    assert row["prediction_label"] is not None


def test_train_binary_with_materialized_snapshot(spark, catalog):
    # real breast_cancer data is imbalanced (357/212): the reference's
    # stratified tail-split then yields a single-class test set (parity
    # behavior, sampling.rs:54-68), so sample randomly for binary metrics
    df = load_dataset(spark, "breast_cancer")
    res = train(
        spark, "bc", task="classification", df=df, y_column_name="malignant",
        algorithm="linear", catalog=catalog, materialize_snapshot=True,
        test_sampling="random",
    )
    m = res.metrics
    assert {"roc_auc", "log_loss"} <= set(m), m
    assert m["f1"] > 0.7
    snap_row = catalog.get("snapshots", res.snapshot_id)
    assert snap_row["materialized_path"]


def test_train_multiclass_array_features_digits(spark, catalog):
    df = load_dataset(spark, "digits", limit=500)
    res = train(
        spark, "digits", task="classification", df=df, y_column_name="target",
        algorithm="random_forest", catalog=catalog,
    )
    assert res.metrics["f1"] > 0.5, res.metrics
    mrow = catalog.get("models", res.model_id)
    assert mrow["num_features"] == 64  # 8x8 flattened


def test_clustering_and_decomposition(spark, catalog):
    df = load_dataset(spark, "iris").drop("target")
    res = train(spark, "clu", task="clustering", df=df, catalog=catalog,
                hyperparams={"k": 3})
    assert "silhouette" in res.metrics
    out = predict(df, "clu", catalog=catalog)
    assert out.select(F.count_distinct("prediction")).collect()[0][0] == 3

    res2 = train(spark, "dec", task="decomposition", df=df, catalog=catalog,
                 hyperparams={"n_components": 2})
    assert res2.metrics["cumulative_explained_variance"] > 0.5
    out2 = decompose(df, "dec", catalog=catalog)
    assert len(out2.select("decomposition").first()["decomposition"]) == 2


def test_joint_regression_linnerud(spark, catalog):
    df = load_dataset(spark, "linnerud")
    res = train(
        spark, "joint", task="regression", df=df,
        y_column_name=["weight", "waist", "pulse"],
        catalog=catalog, test_sampling="random", test_size=0.2,
    )
    out = predict_joint(df, "joint", catalog=catalog)
    row = out.select("predictions").first()
    assert len(row["predictions"]) == 3


def test_search_grid_cv(spark, catalog):
    df = load_dataset(spark, "diabetes")
    res = train(
        spark, "searchy", task="regression", df=df, y_column_name="target",
        algorithm="ridge", search="grid",
        search_params={"alpha": [0.01, 1.0]}, search_args={"cv": 2},
        catalog=catalog, test_sampling="random",
    )
    sr = res.metrics["search_results"]
    assert len(sr["params"]) == 2
    assert len(sr["split0_test_score"]) == 2
    assert sr["rank_test_score"][sr["best_index"]] == 1
    mrow = catalog.get("models", res.model_id)
    assert json.loads(mrow["hyperparams"])["alpha"] in (0.01, 1.0)


def test_deploy_strategies(spark, catalog):
    df = load_dataset(spark, "diabetes")
    r1 = train(spark, "dep", task="regression", df=df, y_column_name="target",
               catalog=catalog, test_sampling="random")
    r2 = train(spark, "dep", task="regression", df=df, y_column_name="target",
               algorithm="random_forest", catalog=catalog, test_sampling="random")
    best = deploy("dep", "best_score", catalog=catalog)
    m1 = json.loads(catalog.get("models", r1.model_id)["metrics"])["r2"]
    m2 = json.loads(catalog.get("models", r2.model_id)["metrics"])["r2"]
    assert best == (r1.model_id if m1 >= m2 else r2.model_id)
    recent = deploy("dep", "most_recent", catalog=catalog)
    assert recent == r2.model_id
    rolled = deploy("dep", "rollback", catalog=catalog)
    assert rolled != recent
    specific = deploy("dep", "specific", model_id=r1.model_id, catalog=catalog)
    assert specific == r1.model_id


def test_task_mismatch_raises(spark, catalog):
    df = load_dataset(spark, "diabetes")
    train(spark, "t1", task="regression", df=df, y_column_name="target",
          catalog=catalog, test_sampling="random")
    with pytest.raises(ValueError, match="already exists"):
        train(spark, "t1", task="classification", df=df, y_column_name="target",
              catalog=catalog)


def test_sql_udf_predict(spark, catalog):
    df = load_dataset(spark, "diabetes")
    train(spark, "udfp", task="regression", df=df, y_column_name="target",
          catalog=catalog, test_sampling="random")
    register_udfs(spark, catalog)
    feats = [c for c in df.columns if c != "target"]
    df.select(
        F.array(*[F.col(c).cast("double") for c in feats]).alias("features")
    ).createOrReplaceTempView("udfp_input")
    rows = spark.sql(
        "SELECT quackml_predict('udfp', features) AS p FROM udfp_input LIMIT 5"
    ).collect()
    assert all(isinstance(r["p"], float) for r in rows)


# ---------------------------------------------------------------------------
# sklearn long-tail backend (import-gated; plumbing testable without sklearn)
# ---------------------------------------------------------------------------


def test_sklearn_map_covers_survey_long_tail():
    from quackml_spark.catalog import Algorithm, Task
    from quackml_spark.ml.sklearn_backend import SKLEARN_MAP

    long_tail = [
        Algorithm.least_angle, Algorithm.lasso_least_angle,
        Algorithm.orthogonal_matching_pursuit, Algorithm.bayesian_ridge,
        Algorithm.automatic_relevance_determination, Algorithm.passive_aggressive,
        Algorithm.ransac, Algorithm.theil_sen, Algorithm.quantile,
        Algorithm.kernel_ridge, Algorithm.gaussian_process, Algorithm.nu_svm,
        Algorithm.ada_boost, Algorithm.bagging,
    ]
    for a in long_tail:
        assert (Task.regression, a) in SKLEARN_MAP or (
            Task.classification, a) in SKLEARN_MAP, a
    for spec in SKLEARN_MAP.values():
        module, name = spec.split(":")
        assert module and name


def test_unavailable_backend_raises_actionable(spark):
    import pytest as _pytest

    from quackml_spark.catalog import Algorithm, Task
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.sklearn_backend import available

    # theil_sen used to be the sklearn-gated example; it now resolves
    # through the numpy backend even without sklearn — as does every
    # reachable (task, algorithm) pair in the reference's dispatch
    res = resolve(Task.regression, Algorithm.theil_sen, {}, 42)
    if not available(Task.regression, Algorithm.theil_sen):
        assert res.backend.startswith("numpy")
    # dbscan (unreachable in the reference's own dispatch,
    # model.rs:435-441 todo!) now resolves through the exact numpy
    # implementation rather than raising
    res = resolve(Task.clustering, Algorithm.dbscan, {}, 42)
    assert res.backend.startswith("numpy")
    # transformers remains the honestly env-gated example: it needs the
    # actual transformers library, which is absent in this container
    with _pytest.raises(NotImplementedError, match="optional backend"):
        resolve(Task.regression, Algorithm.transformers, {}, 42)


def test_sklearn_model_serving_plumbing(spark):
    """The pandas-UDF serving path works with any predict()-shaped model
    — validated with a stub so it runs without sklearn installed."""
    import numpy as np

    from quackml_spark.catalog import Task
    from quackml_spark.ml.sklearn_backend import SklearnModel

    class StubModel:
        def predict(self, X):
            return X.sum(axis=1)

        def predict_proba(self, X):
            n = len(X)
            return np.tile([0.25, 0.75], (n, 1))

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "features array<double>"
    )
    out = SklearnModel(Task.classification, StubModel()).transform(df).collect()
    assert [r["prediction"] for r in out] == [3.0, 7.0]
    assert out[0]["probability_arr"] == [0.25, 0.75]


def test_sklearn_pickle_roundtrip(tmp_path):
    from quackml_spark.catalog import Task
    from quackml_spark.ml.sklearn_backend import SklearnModel

    class StubModel:
        coef_ = [1.0, 2.0]

        def predict(self, X):
            return X[:, 0]

    p = str(tmp_path / "m.pkl")
    SklearnModel(Task.regression, StubModel()).save_pickle(p)
    # stub classes defined in a test can't unpickle in another module's
    # namespace; here the module is the same, so the roundtrip is real
    back = SklearnModel.load_pickle(p)
    assert back.task == Task.regression
    assert back.model.coef_ == [1.0, 2.0]


def test_random_search_subsampling_deterministic():
    from quackml_spark.catalog import Search
    from quackml_spark.ml.search import build_combinations

    params = {"a": [1, 2, 3, 4], "b": [0.1, 0.2, 0.3]}
    c1 = build_combinations(Search.random, params, {}, {"n_iter": 5}, seed=42)
    c2 = build_combinations(Search.random, params, {}, {"n_iter": 5}, seed=42)
    c3 = build_combinations(Search.random, params, {}, {"n_iter": 5}, seed=7)
    assert len(c1) == 5 and c1 == c2  # seeded determinism
    assert c1 != c3  # seed actually varies the sample
    full = build_combinations(Search.grid, params, {}, None, seed=42)
    assert len(full) == 12  # cartesian product


def test_hyperparam_aliases_map_to_mllib(spark):
    """sklearn/xgboost spellings must reach the MLlib estimator params
    (xgboost.rs:59-style alias table)."""
    from quackml_spark.catalog import Algorithm, Task
    from quackml_spark.ml.algorithms import resolve

    r = resolve(
        Task.regression,
        Algorithm.random_forest,
        {"n_estimators": 7, "max_depth": 3, "seed": 1},
        42,
    )
    est = r.estimator
    assert est.getOrDefault("numTrees") == 7
    assert est.getOrDefault("maxDepth") == 3

    r2 = resolve(
        Task.regression, Algorithm.linear, {"max_iter": 11, "alpha": 0.5}, 42
    )
    assert r2.estimator.getOrDefault("maxIter") == 11


def test_search_grid_cv1_still_scores(spark, catalog):
    """ADVICE r01: search with cv<=1 used to silently return combos[0]
    with empty search_results; it must still score every combo (single
    25% holdout) and pick a winner."""
    df = load_dataset(spark, "diabetes")
    res = train(
        spark, "searchy1", task="regression", df=df, y_column_name="target",
        algorithm="ridge", search="grid",
        search_params={"alpha": [0.01, 1.0]}, search_args={"cv": 1},
        catalog=catalog, test_sampling="random",
    )
    sr = res.metrics["search_results"]
    assert len(sr["params"]) == 2
    assert len(sr["mean_test_score"]) == 2
    assert sr["rank_test_score"][sr["best_index"]] == 1


def test_builtin_datasets_canonical_values(spark):
    """Built-ins must load the REAL public sklearn data (the CSVs the
    reference compiles in, dataset.rs:203-217) — spot-check canonical
    first-row cells, not just shapes."""
    d = load_dataset(spark, "diabetes").orderBy(F.desc("target")).limit(1)
    first = load_dataset(spark, "diabetes").limit(1).collect()[0]
    assert first["age"] == pytest.approx(59.0) and first["target"] == pytest.approx(151.0)
    iris = load_dataset(spark, "iris").limit(1).collect()[0]
    assert iris["sepal_length"] == pytest.approx(5.1) and iris["target"] == 0
    wine = load_dataset(spark, "wine").limit(1).collect()[0]
    assert wine["alcohol"] == pytest.approx(14.23)
    assert "od280/od315_of_diluted_wines" in load_dataset(spark, "wine").columns
    digits = load_dataset(spark, "digits").limit(1).collect()[0]
    assert digits["image"][0][2] == 5 and len(digits["image"]) == 8
    bc = load_dataset(spark, "breast_cancer").limit(1).collect()[0]
    assert bc["mean radius"] == pytest.approx(17.99) and bc["malignant"] is True


def test_hf_load_dataset_dtype_map(spark, monkeypatch):
    """HF ingestion applies the reference's dtype map
    (transformers/mod.rs:577-589): ints/floats sized exactly,
    dict/list serialized to JSON strings, unknown dtypes rejected."""
    import sys
    import types as _types

    import pandas as _pd

    from quackml_spark.ml.datasets import _coerce_hf_dataframe

    class _Value:
        def __init__(self, dtype):
            self.dtype = dtype

    class _Sequence:
        pass

    class _FakeSplit:
        features = {
            "text": _Value("string"),
            "label": _Value("int64"),
            "score": _Value("float32"),
            "meta": _Sequence(),
        }

        def to_pandas(self):
            return _pd.DataFrame(
                {
                    "text": ["a", "b"],
                    "label": [1, 2],
                    "score": [0.5, 1.5],
                    "meta": [[1, 2], [3]],
                }
            )

    fake = _types.ModuleType("datasets")
    fake.load_dataset = lambda *a, **k: {"train": _FakeSplit()}
    monkeypatch.setitem(sys.modules, "datasets", fake)

    from quackml_spark.ml import load_dataset

    df = load_dataset(spark, "some/hub-dataset")
    schema = dict(df.dtypes)
    assert schema == {
        "text": "string", "label": "bigint", "score": "float", "meta": "string",
    }
    row = df.orderBy("label").first()
    assert row["meta"] == "[1, 2]"

    with pytest.raises(ValueError, match="unhandled dataset feature"):
        _coerce_hf_dataframe(_pd.DataFrame({"x": [1]}), {"x": "timestamp64"})


def test_clustering_purity_is_interpretable(spark, sf_dir):
    """ml_clustering_embeddings' oracle pins the exact 5-group k-means
    partition — deterministic per seed, but an MLlib init/version bump
    could land a merged/split partition and the graded query would fail
    with nothing but a hash diff. This asserts cluster PURITY directly
    (per predicted cluster, min == max of the true group key) so that
    failure mode surfaces as a named assertion (round-3 advice)."""
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()

    rows = REGISTRY["ml_clustering_embeddings"].builder(spark, sf_dir).collect()
    assert len(rows) == 5, f"expected 5 clusters, got {len(rows)}: k-means merged/split groups"
    for r in rows:
        assert r["grp_lo"] == r["grp_hi"], (
            f"cluster mixing groups {r['grp_lo']}..{r['grp_hi']} — "
            "MLlib k-means no longer converges to the true partition; "
            "re-derive the oracle or reseed"
        )


def test_feature_drift_psi_detects_shift(spark):
    """PSI ≈ 0 when both windows share a distribution; large when the
    current window shifts."""
    from quackml_spark.ml.monitor import feature_drift_psi

    same = spark.range(4000).selectExpr(
        "cast(id % 100 as double) as x", "id % 2 = 1 as is_cur"
    )
    psi_same = feature_drift_psi(same, ["x"], F.col("is_cur")).first()["psi"]
    assert abs(psi_same) < 0.01, psi_same

    shifted = spark.range(4000).selectExpr(
        "cast(id % 100 as double) + case when id % 2 = 1 then 50 else 0 end as x",
        "id % 2 = 1 as is_cur",
    )
    psi_shift = feature_drift_psi(shifted, ["x"], F.col("is_cur")).first()["psi"]
    assert psi_shift > 0.25, psi_shift


def test_classification_report_matches_sklearn_shape(spark):
    from quackml_spark.ml.metrics import classification_report, confusion_matrix_df

    rows = [(0.0, 0.0)] * 40 + [(0.0, 1.0)] * 10 + [(1.0, 1.0)] * 30 + [(1.0, 0.0)] * 20
    pred = spark.createDataFrame(rows, "label double, prediction double")
    cm = {(r["label"], r["prediction"]): r["n"] for r in confusion_matrix_df(pred).collect()}
    assert cm == {(0.0, 0.0): 40, (0.0, 1.0): 10, (1.0, 1.0): 30, (1.0, 0.0): 20}
    rep = {r["cls"]: r for r in classification_report(pred).collect()}
    assert abs(rep[0.0]["precision"] - 40 / 60) < 1e-12
    assert abs(rep[0.0]["recall"] - 40 / 50) < 1e-12
    assert abs(rep[1.0]["precision"] - 30 / 40) < 1e-12
    assert abs(rep[1.0]["recall"] - 30 / 50) < 1e-12
    assert rep[0.0]["support"] == 50 and rep[1.0]["support"] == 50


def test_feature_drift_ks_detects_shift(spark):
    from quackml_spark.ml.monitor import feature_drift_ks

    same = spark.range(4000).selectExpr(
        "cast(id % 100 as double) as x", "id % 2 = 1 as is_cur"
    )
    # even ids land in ref, odd in cur → supports interleave, so the
    # CDFs differ by at most one value-step (1/50 = 0.02) when the
    # distributions match
    ks_same = feature_drift_ks(same, "x", F.col("is_cur")).first()["ks"]
    assert ks_same <= 0.02, ks_same
    shifted = spark.range(4000).selectExpr(
        "cast(id % 100 as double) + case when id % 2 = 1 then 50 else 0 end as x",
        "id % 2 = 1 as is_cur",
    )
    ks_shift = feature_drift_ks(shifted, "x", F.col("is_cur")).first()["ks"]
    assert ks_shift > 0.4, ks_shift


def test_feature_drift_psi_multi_feature_single_pass(spark):
    """One call covers k features (stacked single pass): a stable and a
    shifted feature computed together report per-feature PSI."""
    from quackml_spark.ml.monitor import feature_drift_psi

    df = spark.range(4000).selectExpr(
        "cast(id % 100 as double) as stable",
        "cast(id % 100 as double) + case when id % 2 = 1 then 50 else 0 end"
        " as drifted",
        "id % 2 = 1 as is_cur",
    )
    rows = {
        r["feature"]: r["psi"]
        for r in feature_drift_psi(
            df, ["stable", "drifted"], F.col("is_cur")
        ).collect()
    }
    assert set(rows) == {"stable", "drifted"}
    assert abs(rows["stable"]) < 0.01, rows
    assert rows["drifted"] > 0.25, rows


def test_feature_drift_psi_null_and_empty_inputs(spark):
    """All-null features yield no row (not a TypeError crash); null
    values are excluded from binning rather than forming a hidden bin."""
    from quackml_spark.ml.monitor import feature_drift_psi

    df = spark.range(100).selectExpr(
        "cast(null as double) as all_null",
        "cast(id % 10 as double) as x",
        "id % 2 = 1 as is_cur",
    )
    rows = feature_drift_psi(df, ["all_null", "x"], F.col("is_cur")).collect()
    assert [r["feature"] for r in rows] == ["x"]

    with_nulls = spark.range(1000).selectExpr(
        "case when id % 7 = 0 then null else cast((id div 2) % 10 as double)"
        " end as x",
        "id % 2 = 1 as is_cur",
    )
    psi = feature_drift_psi(with_nulls, ["x"], F.col("is_cur")).first()["psi"]
    assert abs(psi) < 0.05, psi


def test_feature_drift_ks_auto_bins_high_cardinality(spark):
    """Above max_distinct the grouped relation is auto-binned before the
    CDF — the statistic stays within bin resolution of the exact one."""
    from quackml_spark.ml.monitor import feature_drift_ks

    df = spark.range(20_000).selectExpr(
        "cast(id as double) / 20000 + case when id % 2 = 1 then 0.25 else 0 end"
        " as x",
        "id % 2 = 1 as is_cur",
    )
    exact = feature_drift_ks(df, "x", F.col("is_cur")).first()["ks"]
    binned = feature_drift_ks(
        df, "x", F.col("is_cur"), max_distinct=1000, auto_bins=500
    ).first()["ks"]
    assert abs(exact - binned) < 0.01, (exact, binned)
    assert binned > 0.2  # true KS of a 0.25 shift on U[0,1] is 0.25


def test_feature_drift_ks_empty_window_raises(spark):
    """KS against an empty sample is undefined — clear error, not a
    float(None) TypeError."""
    import pytest as _pytest

    from quackml_spark.ml.monitor import feature_drift_ks

    one_sided = spark.range(100).selectExpr(
        "cast(id as double) as x", "false as is_cur"
    )
    with _pytest.raises(ValueError, match="current window"):
        feature_drift_ks(one_sided, "x", F.col("is_cur"))
    empty = spark.range(100).selectExpr(
        "cast(null as double) as x", "id % 2 = 1 as is_cur"
    )
    with _pytest.raises(ValueError, match="no non-null"):
        feature_drift_ks(empty, "x", F.col("is_cur"))


def test_serve_per_group_broadcast_probe(spark, sf_dir):
    """serve_per_group scores row-for-row with slope*x+intercept from
    the group's own model, and the model side is broadcast (no shuffle
    of the fact table)."""
    from pyspark.sql import functions as F

    from quackml_spark.ml.pergroup import fit_ols_per_group, serve_per_group
    from quackml_spark.sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_suppkey") % 5).alias("grp"), "l_quantity", "l_extendedprice"
        )
    )
    models = fit_ols_per_group(li, "grp", "l_quantity", "l_extendedprice")
    scored = serve_per_group(li.limit(50), models, "grp", "l_quantity")
    rows = scored.collect()
    assert len(rows) == 50
    coef = {r["group_id"]: (r["slope"], r["intercept"]) for r in models.collect()}
    for r in rows:
        s, i = coef[r["grp"]]
        assert abs(r["prediction"] - (s * r["l_quantity"] + i)) < 1e-9
    assert "BroadcastHashJoin" in scored._jdf.queryExecution().executedPlan().toString()


def test_per_group_ols_string_and_null_keys(spark):
    """The many-models API must take the group key as-is — string tenant
    ids and NULL keys included (code-review catch: a bigint cast made
    the advertised per-tenant use crash)."""
    from quackml_spark.ml.pergroup import fit_ols_per_group

    rows = [
        ("acme", 1.0, 2.0), ("acme", 2.0, 4.0), ("acme", 3.0, 6.0),
        ("globex", 1.0, 5.0), ("globex", 2.0, 5.0),
        (None, 1.0, 1.0), (None, 2.0, 3.0),
        ("solo", 1.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "tenant string, x double, y double")
    out = {r["group_id"]: r for r in
           fit_ols_per_group(df, "tenant", "x", "y").collect()}
    assert abs(out["acme"]["slope"] - 2.0) < 1e-12
    assert abs(out["acme"]["intercept"]) < 1e-12
    assert abs(out["globex"]["slope"] - 0.0) < 1e-12
    assert abs(out[None]["slope"] - 2.0) < 1e-12
    assert out["solo"]["slope"] is None and out["solo"]["n"] == 1


def test_target_encode_oof_no_leak_and_fallback(spark):
    """Row's own y must not influence its encoding (leave-one-fold-out),
    and a category confined to one fold falls back to that fold's
    leave-out GLOBAL mean instead of NULL."""
    from quackml_spark.ml.target_encode import target_encode_oof

    rows = [
        # cat A in folds 0 and 1
        ("A", 0, 10.0), ("A", 0, 20.0), ("A", 1, 40.0),
        # cat B only in fold 0 -> fallback
        ("B", 0, 100.0),
        # fold 1 filler
        ("C", 1, 7.0),
    ]
    df = spark.createDataFrame(rows, "cat string, fold int, y double")
    out = {(r["cat"], r["fold"], r["y"]): r["te"]
           for r in target_encode_oof(df, "cat", "y", "fold").collect()}
    # A rows in fold 0 see only fold-1 A rows (mean 40); fold-1 A row
    # sees fold-0 As (mean 15)
    assert out[("A", 0, 10.0)] == 40.0
    assert out[("A", 0, 20.0)] == 40.0
    assert out[("A", 1, 40.0)] == 15.0
    # B has no rows outside fold 0 -> global leave-out mean of fold 0:
    # mean of fold-1 ys = (40 + 7) / 2
    assert abs(out[("B", 0, 100.0)] - 23.5) < 1e-12


def test_joint_regression_records_per_target_metrics(spark, tmp_path):
    """Joint (multi-target) regression used to persist NO quality
    metrics, so every joint fit auto-deployed unconditionally (review
    catch). It must now record per-target regression metrics plus their
    mean r2 for the deploy comparison."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train

    cat = Catalog(warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0, -1.0 * i + 3.0) for i in range(40)],
        "x double, y1 double, y2 double",
    )
    res = train(
        spark, "joint demo", task="regression", df=df,
        y_column_name=["y1", "y2"], catalog=cat, test_sampling="random",
    )
    assert "r2" in res.metrics
    assert res.metrics["r2"] > 0.9  # both targets are exact lines
    assert set(res.metrics["per_target"]) == {"y1", "y2"}
    assert res.metrics["per_target"]["y1"]["r2"] > 0.9


def test_deploy_specific_validates_model_id(spark, tmp_path):
    """deploy(strategy='specific') must reject a model id that is not a
    successful model of THE project — it used to insert a deployments
    row pointing at another project's (or a nonexistent) model and only
    fail at serve time, or serve silently wrong outputs (review
    catch)."""
    import pytest as _pytest

    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.ml.predict import deploy

    cat = Catalog(warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(float(i), 2.0 * i) for i in range(30)], "x double, y double"
    )
    res = train(
        spark, "proj a", task="regression", df=df,
        catalog=cat, y_column_name="y", test_sampling="random",
    )
    with _pytest.raises(ValueError, match="not a successful model"):
        deploy("proj a", "specific", model_id=res.model_id + 999, catalog=cat)
    # the happy path still works
    assert deploy("proj a", "specific", model_id=res.model_id, catalog=cat) == res.model_id


def test_train_leaves_cache_empty(spark, tmp_path):
    """The full train() lifecycle must release every cached relation:
    _ordered used to return a DERIVED plan over its cached frame, so
    snap.unpersist() was a plan-mismatch no-op and EVERY train() call
    leaked one cache entry for the session lifetime (review catch —
    found by the create-failure test, present on the success path
    too)."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train

    spark.catalog.clearCache()
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(float(i), 3.0 * i - 2.0) for i in range(30)], "x double, y double"
    )
    train(
        spark, "cache demo", task="regression", df=df,
        catalog=cat, y_column_name="y", test_sampling="random",
    )
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "train() left cached relations behind"
    )


def test_search_failure_releases_cv_cache(spark, tmp_path):
    """A combo whose fit raises must not leak the cached CV split —
    run_search's unpersist was not in a finally block (review catch)."""
    import pytest as _pytest

    from quackml_spark.core.snapshot import ORDER_COL
    from quackml_spark.ml.search import run_search

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i + 1, float(i)) for i in range(20)], f"{ORDER_COL} long, v double"
    )

    def fit_fn(params, cv_train):
        raise RuntimeError("boom: invalid hyperparameter")

    with _pytest.raises(RuntimeError, match="boom"):
        run_search(
            df, [{"a": 1}, {"a": 2}], 2, fit_fn, lambda m, t: 0.0, True, 20
        )
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "run_search leaked its cached CV split"
    )
