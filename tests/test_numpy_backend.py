"""Numpy long-tail backend tests — the algorithms the reference runs
through sklearn-over-PyO3 (src/bindings/sklearn/sklearn.py:37-99),
re-implemented on numpy and pinned against exact mathematical identities:

  * LARS full path == closed-form OLS on a full-rank design;
  * coordinate-descent elastic net at alpha→0 == OLS;
  * OMP selecting all columns == OLS;
  * huber/theil_sen/ransac on clean data == OLS; with planted outliers
    they stay near the true line while OLS is dragged away;
  * perceptron/PA on separable data predict the generating rule exactly;
  * kernel-ridge/GP interpolate training targets at tiny regularization;
  * full train() lifecycle: fit, metrics, persist, reload, SQL-serve.
"""

from __future__ import annotations

import numpy as np
import pytest

from quackml_spark.catalog import Algorithm, Catalog, Task
from quackml_spark.ml import predict, train
from quackml_spark.ml.numpy_backend import (
    NUMPY_MAP,
    _fit_bayesian_ridge,
    _fit_cd,
    _fit_huber,
    _fit_lars,
    _fit_omp,
    _fit_pa_classifier,
    _fit_perceptron,
    _fit_ransac,
    _fit_theil_sen,
    _ols,
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


def _toy(n=200, d=4, seed=7, noise=0.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = np.arange(1, d + 1, dtype="float64")
    y = X @ w + 0.5 + noise * rng.normal(size=n)
    return X, y, w


def test_lars_full_path_equals_ols():
    X, y, _ = _toy(noise=0.1)
    p = _fit_lars(X, y, {}, 0)
    coef, b = _ols(X, y)
    np.testing.assert_allclose(p["coef"], coef, atol=1e-8)
    assert abs(p["intercept"] - b) < 1e-8


def test_cd_alpha_zero_equals_ols():
    X, y, _ = _toy(noise=0.1)
    p = _fit_cd(X, y, alpha=1e-12, l1_ratio=0.5)
    coef, b = _ols(X, y)
    np.testing.assert_allclose(p["coef"], coef, atol=1e-6)
    assert abs(p["intercept"] - b) < 1e-6


def test_cd_lasso_shrinks_to_zero():
    X, y, _ = _toy(noise=0.1)
    p = _fit_cd(X, y, alpha=1e6, l1_ratio=1.0)
    np.testing.assert_allclose(p["coef"], np.zeros(X.shape[1]), atol=1e-12)


def test_omp_all_columns_equals_ols():
    X, y, _ = _toy(noise=0.1)
    p = _fit_omp(X, y, {"n_nonzero_coefs": X.shape[1]}, 0)
    coef, b = _ols(X, y)
    np.testing.assert_allclose(p["coef"], coef, atol=1e-8)
    assert abs(p["intercept"] - b) < 1e-8


def test_omp_recovers_sparse_support():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(300, 10))
    y = 3.0 * X[:, 2] - 2.0 * X[:, 7]
    p = _fit_omp(X, y, {"n_nonzero_coefs": 2}, 0)
    nz = set(np.nonzero(np.abs(p["coef"]) > 1e-9)[0].tolist())
    assert nz == {2, 7}


def test_omp_constant_target_intercept_only():
    """Zero-variance target: the first iteration finds no correlated
    column and breaks before any least-squares solve — must return the
    intercept-only fit, not raise NameError."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 4))
    y = np.full(50, 3.25)
    p = _fit_omp(X, y, {"n_nonzero_coefs": 2}, 0)
    np.testing.assert_allclose(p["coef"], np.zeros(4))
    assert abs(p["intercept"] - 3.25) < 1e-12


def test_bayesian_ridge_close_to_ols_on_clean_data():
    X, y, w = _toy(noise=0.01)
    p = _fit_bayesian_ridge(X, y, {}, 0)
    np.testing.assert_allclose(p["coef"], w, atol=0.05)


def test_huber_equals_ols_on_clean_and_resists_outliers():
    X, y, w = _toy(noise=0.0)
    p = _fit_huber(X, y, {}, 0)
    coef, b = _ols(X, y)
    np.testing.assert_allclose(p["coef"], coef, atol=1e-8)
    # plant gross outliers: OLS moves, huber stays near the true line
    y2 = y.copy()
    y2[:10] += 500.0
    p2 = _fit_huber(X, y2, {}, 0)
    c_ols, _ = _ols(X, y2)
    assert np.abs(p2["coef"] - w).max() < 0.1
    assert np.abs(c_ols - w).max() > 0.5


def test_ransac_and_theil_sen_resist_outliers():
    X, y, w = _toy(n=300, noise=0.0, seed=11)
    y2 = y.copy()
    y2[:30] += 300.0
    for fit in (_fit_ransac, _fit_theil_sen):
        p = fit(X, y2, {}, seed=42)
        assert np.abs(np.asarray(p["coef"]) - w).max() < 0.2, fit.__name__


def test_perceptron_separable_exact():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(400, 3))
    y = (X @ np.array([1.0, -2.0, 0.5]) > 0.3).astype("float64")
    p = _fit_perceptron(X, y, {}, 0)
    W, B, classes = p["coef"], p["intercept"], p["classes"]
    pred = classes[(X @ W.T + B).argmax(axis=1)]
    assert (pred == y).all()


def test_pa_classifier_separable():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(400, 3))
    y = (X @ np.array([2.0, 1.0, -1.0]) > 0).astype("float64")
    p = _fit_pa_classifier(X, y, {}, 0)
    W, B, classes = p["coef"], p["intercept"], p["classes"]
    pred = classes[(X @ W.T + B).argmax(axis=1)]
    assert (pred == y).mean() > 0.97


@pytest.mark.parametrize("algorithm", ["kernel_ridge", "gaussian_process"])
def test_kernel_models_interpolate(spark, catalog, algorithm):
    # tiny regularization → near-interpolation of the training targets
    rng = np.random.default_rng(9)
    X = rng.normal(size=(80, 2))
    y = np.sin(X[:, 0]) + X[:, 1] ** 2
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, target double")
    res = train(
        spark, f"np-{algorithm}", task="regression", df=df,
        y_column_name="target", algorithm=algorithm,
        hyperparams={"alpha": 1e-8}, test_size=0.1, test_sampling="random",
        catalog=catalog,
    )
    assert res.metrics["backend"].startswith("numpy")
    assert res.metrics["r2"] > 0.9, res.metrics


def test_train_lifecycle_all_numpy_regressors(spark, catalog):
    """Every numpy-mapped regression algorithm trains end-to-end on an
    exact linear relation and serves distributed with high r2."""
    rng = np.random.default_rng(13)
    X = rng.normal(size=(300, 3))
    y = X @ np.array([2.0, -1.0, 0.5]) + 1.0
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, target double")
    algos = sorted(
        a.value for (t, a) in NUMPY_MAP if t == Task.regression
        # kernel/tree/local-averaging models approximate rather than
        # recover a linear rule exactly; they have their own dedicated tests
        and a not in (
            Algorithm.kernel_ridge, Algorithm.gaussian_process,
            Algorithm.ada_boost, Algorithm.bagging,
            Algorithm.extra_trees, Algorithm.hist_gradient_boosting,
            Algorithm.knn,
        )
    )
    for algo in algos:
        # tiny alpha: shrinkage algorithms (lasso-lars CD) shouldn't bias
        # away from the exact generating line in this identity check;
        # OMP needs all 3 columns (its sklearn-faithful default is 10%)
        res = train(
            spark, f"np-{algo}", task="regression", df=df,
            y_column_name="target", algorithm=algo,
            hyperparams={"alpha": 1e-8, "n_nonzero_coefs": 3},
            test_sampling="random", catalog=catalog,
        )
        assert res.metrics["backend"].startswith("numpy"), algo
        assert res.metrics["r2"] > 0.95, (algo, res.metrics)


def test_numpy_model_persist_reload_and_sql_serve(spark, catalog):
    """Persist → reload round-trip, then serve through the registered
    SQL UDF via the portable parameter dump."""
    rng = np.random.default_rng(17)
    X = rng.normal(size=(200, 2))
    y = (X @ np.array([1.0, 1.0]) > 0).astype("float64")
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, target double")
    res = train(
        spark, "np-perceptron", task="classification", df=df,
        y_column_name="target", algorithm="perceptron",
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["accuracy"] > 0.97, res.metrics
    # reload from the warehouse and predict (exercises save_json/load_json)
    out = predict(df, "np-perceptron", catalog=catalog)
    agree = out.withColumn(
        "ok", (out["prediction"] == out["target"]).cast("int")
    ).groupBy().avg("ok").collect()[0][0]
    assert agree > 0.97


def test_affinity_propagation_recovers_blobs():
    from quackml_spark.ml.numpy_backend import _fit_affinity_propagation

    rng = np.random.default_rng(21)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 8.0]])
    X = np.vstack([c + 0.3 * rng.normal(size=(40, 2)) for c in centers])
    p = _fit_affinity_propagation(X, None, {}, 0)
    C = np.asarray(p["centers"])
    assert len(C) == 3
    # every true center has an exemplar within the blob radius
    for c in centers:
        assert np.sqrt(((C - c) ** 2).sum(axis=1)).min() < 1.5


def test_mean_shift_recovers_blobs():
    from quackml_spark.ml.numpy_backend import _fit_mean_shift

    rng = np.random.default_rng(22)
    centers = np.array([[0.0, 0.0], [12.0, 12.0]])
    X = np.vstack([c + 0.4 * rng.normal(size=(60, 2)) for c in centers])
    p = _fit_mean_shift(X, None, {}, 0)
    C = np.asarray(p["centers"])
    assert len(C) == 2
    for c in centers:
        assert np.sqrt(((C - c) ** 2).sum(axis=1)).min() < 1.0


@pytest.mark.parametrize("algo", ["affinity_propagation", "mean_shift"])
def test_train_lifecycle_numpy_clustering(spark, catalog, algo):
    rng = np.random.default_rng(23)
    blobs = np.vstack([
        np.array([0.0, 0.0]) + 0.3 * rng.normal(size=(50, 2)),
        np.array([8.0, 8.0]) + 0.3 * rng.normal(size=(50, 2)),
    ])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in blobs], "x1 double, x2 double"
    )
    res = train(
        spark, f"np-clu-{algo}", task="clustering", df=df, algorithm=algo,
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["silhouette"] > 0.8, res.metrics


def test_cart_fits_step_function_exactly():
    from quackml_spark.ml.numpy_backend import _cart_fit, _cart_predict

    rng = np.random.default_rng(31)
    X = rng.uniform(-1, 1, size=(500, 2))
    y = np.where(X[:, 0] > 0.2, 5.0, -3.0)
    tree = _cart_fit(X, y, np.full(500, 1 / 500), max_depth=2)
    np.testing.assert_allclose(_cart_predict(tree, X), y)


def test_ada_boost_classifier_or_rule():
    from quackml_spark.ml.numpy_backend import (
        _ensemble_predict_fn,
        _fit_ada_boost_clf,
    )

    rng = np.random.default_rng(32)
    X = rng.uniform(-1, 1, size=(600, 2))
    y = ((X[:, 0] > 0.3) | (X[:, 1] > 0.7)).astype("float64")
    p = _fit_ada_boost_clf(X, y, {}, 0)
    pred = _ensemble_predict_fn(p)(X)
    assert (pred == y).mean() > 0.98


def test_ada_boost_regressor_piecewise():
    from quackml_spark.ml.numpy_backend import (
        _ensemble_predict_fn,
        _fit_ada_boost_reg,
    )

    rng = np.random.default_rng(33)
    X = rng.uniform(-1, 1, size=(600, 2))
    y = np.where(X[:, 0] > 0, 4.0, -4.0) + np.where(X[:, 1] > 0.5, 2.0, 0.0)
    p = _fit_ada_boost_reg(X, y, {}, 0)
    pred = _ensemble_predict_fn(p)(X)
    ss = ((pred - y) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert 1 - ss > 0.95, 1 - ss


def test_bagging_classifier_and_regressor_lifecycle(spark, catalog):
    rng = np.random.default_rng(34)
    X = rng.uniform(-1, 1, size=(400, 2))
    yc = ((X[:, 0] + X[:, 1]) > 0).astype("float64")
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, yc)],
        "x1 double, x2 double, target double",
    )
    res = train(
        spark, "np-bag-clf", task="classification", df=df,
        y_column_name="target", algorithm="bagging",
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["accuracy"] > 0.9, res.metrics

    yr = 3.0 * X[:, 0] ** 2 + X[:, 1]
    dfr = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, yr)],
        "x1 double, x2 double, target double",
    )
    resr = train(
        spark, "np-bag-reg", task="regression", df=dfr,
        y_column_name="target", algorithm="bagging",
        test_sampling="random", catalog=catalog,
    )
    assert resr.metrics["backend"] == "numpy"
    assert resr.metrics["r2"] > 0.8, resr.metrics


def test_ada_boost_persist_reload(spark, catalog):
    """Ensemble params survive the JSON round trip (nested tree dicts)."""
    rng = np.random.default_rng(35)
    X = rng.uniform(-1, 1, size=(300, 2))
    y = (X[:, 0] > 0.1).astype("float64")
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "x1 double, x2 double, target double",
    )
    train(
        spark, "np-ada", task="classification", df=df, y_column_name="target",
        algorithm="ada_boost", test_sampling="random", catalog=catalog,
    )
    out = predict(df, "np-ada", catalog=catalog)
    agree = out.withColumn(
        "ok", (out["prediction"] == out["target"]).cast("int")
    ).groupBy().avg("ok").collect()[0][0]
    assert agree > 0.97, agree


def test_svc_nonlinear_circle():
    """RBF SMO-SVC separates a circle-in-ring dataset a linear model
    cannot — the exact capability the old linear_svc stand-in lacked."""
    from quackml_spark.ml.numpy_backend import _fit_svc

    rng = np.random.default_rng(41)
    r = np.concatenate([0.5 * np.sqrt(rng.uniform(size=150)),
                        1.5 + 0.5 * rng.uniform(size=150)])
    th = rng.uniform(0, 2 * np.pi, size=300)
    X = np.column_stack([r * np.cos(th), r * np.sin(th)])
    y = (r > 1.0).astype("float64")
    p = _fit_svc(X, y, {"C": 5.0}, 0)
    from quackml_spark.ml.numpy_backend import NumpyModel

    fn = NumpyModel(Task.classification, p)._predict_fn()
    assert (fn(X) == y).mean() > 0.97


def test_svc_multiclass_blobs(spark, catalog):
    rng = np.random.default_rng(42)
    centers = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 5.0]])
    X = np.vstack([c + 0.5 * rng.normal(size=(60, 2)) for c in centers])
    y = np.repeat([0.0, 1.0, 2.0], 60)
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "x1 double, x2 double, target double",
    )
    res = train(
        spark, "np-svc", task="classification", df=df, y_column_name="target",
        algorithm="svm", test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["accuracy"] > 0.95, res.metrics
    out = predict(df, "np-svc", catalog=catalog)  # exercises sv persistence
    agree = out.withColumn(
        "ok", (out["prediction"] == out["target"]).cast("int")
    ).groupBy().avg("ok").collect()[0][0]
    assert agree > 0.95


def test_linear_svr_matches_ols_on_clean_data():
    from quackml_spark.ml.numpy_backend import _fit_linear_svr

    X, y, w = _toy(noise=0.0)
    p = _fit_linear_svr(X, y, {"epsilon": 0.0}, 0)
    # warm-started at OLS and the OLS point is a minimizer on clean data
    np.testing.assert_allclose(p["coef"], w, atol=0.05)


def test_kernel_logistic_gp_classifier_circle():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_kernel_logistic

    rng = np.random.default_rng(43)
    r = np.concatenate([0.5 * np.sqrt(rng.uniform(size=150)),
                        1.5 + 0.5 * rng.uniform(size=150)])
    th = rng.uniform(0, 2 * np.pi, size=300)
    X = np.column_stack([r * np.cos(th), r * np.sin(th)])
    y = (r > 1.0).astype("float64")
    p = _fit_kernel_logistic(X, y, {}, 0)
    fn = NumpyModel(Task.classification, p)._predict_fn()
    assert (fn(X) == y).mean() > 0.95


def test_grid_search_over_numpy_backend(spark, catalog):
    """Hyperparameter search composes with driver-fit numpy estimators:
    grid over lasso-CD alpha, k-fold CV, search_results recorded."""
    rng = np.random.default_rng(51)
    X = rng.normal(size=(240, 3))
    y = X @ np.array([2.0, -1.0, 0.5]) + 1.0 + 0.01 * rng.normal(size=240)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)],
        "x1 double, x2 double, x3 double, target double",
    )
    res = train(
        spark, "np-search", task="regression", df=df, y_column_name="target",
        algorithm="lasso_least_angle", search="grid",
        search_params={"alpha": [1e-6, 1.0]}, search_args={"cv": 3},
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"].startswith("numpy")
    sr = res.metrics["search_results"]
    assert len(sr["params"]) == 2
    # tiny alpha wins on near-noiseless linear data
    assert res.metrics["r2"] > 0.99, res.metrics


def test_extra_trees_step_function_exact():
    """ERT regression (random-threshold splits, no bootstrap) fits a
    pure partition target exactly: every leaf ends pure, so the
    tree-average reproduces the step function on the training set."""
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_extra_trees

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, size=(400, 3))
    y = np.where(X[:, 0] <= 0.2, 1.5, -2.0)
    p = _fit_extra_trees(X, y, {"n_estimators": 30}, 0)
    assert p["mode"] == "extra_trees_reg"
    pred = NumpyModel(Task.regression, p)._predict_fn()(X)
    np.testing.assert_allclose(pred, y)


def test_extra_trees_classifier_blobs_exact():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_extra_trees

    rng = np.random.default_rng(1)
    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 5.0]])
    X = np.vstack([rng.normal(c, 0.4, size=(60, 2)) for c in centers])
    y = np.repeat([0.0, 1.0, 2.0], 60)
    p = _fit_extra_trees(X, y, {"n_estimators": 30}, 0, classification=True)
    pred = NumpyModel(Task.classification, p)._predict_fn()(X)
    assert (pred == y).mean() == 1.0


def test_hist_gb_regressor_converges():
    """Histogram-GBDT drives the L2 training residual near zero on a
    smooth target (fixed seed, deterministic bins and splits)."""
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_hist_gb_reg

    rng = np.random.default_rng(2)
    X = rng.uniform(0, 1, size=(500, 2))
    y = 3 * X[:, 0] - 2 * X[:, 1] ** 2
    p = _fit_hist_gb_reg(X, y, {"min_samples_leaf": 5}, 0)
    pred = NumpyModel(Task.regression, p)._predict_fn()(X)
    rmse = float(np.sqrt(((pred - y) ** 2).mean()))
    assert rmse < 0.05, rmse


def test_hist_gb_classifier_binary_and_multiclass():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_hist_gb_clf

    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, size=(500, 2))
    yb = (X[:, 0] + X[:, 1] > 1.0).astype("float64")
    pb = _fit_hist_gb_clf(X, yb, {"min_samples_leaf": 5}, 0)
    assert pb["mode"] == "binary"
    assert (NumpyModel(Task.classification, pb)._predict_fn()(X) == yb).mean() == 1.0

    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 5.0]])
    Xm = np.vstack([rng.normal(c, 0.4, size=(60, 2)) for c in centers])
    ym = np.repeat([0.0, 1.0, 2.0], 60)
    pm = _fit_hist_gb_clf(Xm, ym, {"min_samples_leaf": 5, "n_estimators": 30}, 0)
    assert pm["mode"] == "ova"
    assert (NumpyModel(Task.classification, pm)._predict_fn()(Xm) == ym).mean() == 1.0


def test_extra_trees_and_hist_gb_resolve_to_numpy_exact():
    """r6 verdict ask: these four (task, algorithm) pairs must resolve
    to the exact numpy backend, not an mllib-approx stand-in."""
    from quackml_spark.ml.algorithms import resolve

    for t, a in [
        (Task.regression, Algorithm.extra_trees),
        (Task.classification, Algorithm.extra_trees),
        (Task.regression, Algorithm.hist_gradient_boosting),
        (Task.classification, Algorithm.hist_gradient_boosting),
    ]:
        assert resolve(t, a, {}, 42).backend == "numpy", (t, a)


def test_hist_gb_and_extra_trees_persist_reload(tmp_path):
    """JSON round-trip preserves gbdt and ERT predictions bit-exactly."""
    from quackml_spark.ml.numpy_backend import (
        NumpyModel,
        _fit_extra_trees,
        _fit_hist_gb_clf,
    )

    rng = np.random.default_rng(4)
    X = rng.uniform(0, 1, size=(300, 2))
    y = (X[:, 0] > 0.5).astype("float64")
    for p in (
        _fit_hist_gb_clf(X, y, {"min_samples_leaf": 5, "n_estimators": 20}, 0),
        _fit_extra_trees(X, y, {"n_estimators": 10}, 0, classification=True),
    ):
        m = NumpyModel(Task.classification, p)
        path = str(tmp_path / f"{p['mode']}.json")
        m.save_json(path)
        m2 = NumpyModel.load_json(path)
        np.testing.assert_array_equal(
            m._predict_fn()(X), m2._predict_fn()(X)
        )


def test_train_lifecycle_extra_trees_and_hist_gb(spark, catalog):
    """Full train() surface over the new exact tree backends: fit,
    metrics tagged backend=numpy, distributed serving."""
    rng = np.random.default_rng(23)
    X = rng.uniform(-1, 1, size=(400, 3))
    y = np.where(X[:, 0] + 0.3 * X[:, 1] > 0.1, 1.0, 0.0)
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, target double")
    for algo in ("extra_trees", "hist_gradient_boosting"):
        res = train(
            spark, f"np-{algo}-clf", task="classification", df=df,
            y_column_name="target", algorithm=algo,
            hyperparams={"min_samples_leaf": 2},
            test_sampling="random", catalog=catalog,
        )
        assert res.metrics["backend"] == "numpy", (algo, res.metrics)
        assert res.metrics["accuracy"] > 0.9, (algo, res.metrics)


# ---------------------------------------------------------------------------
# The reference-unreachable seven (model.rs:435-441 todo!): executable
# here — beyond-parity coverage with value-checked semantics.
# ---------------------------------------------------------------------------


def test_knn_classifier_and_regressor():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_knn

    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 8.0]])
    X = np.vstack([rng.normal(c, 0.5, size=(50, 2)) for c in centers])
    y = np.repeat([0.0, 1.0, 2.0], 50)
    p = _fit_knn(X, y, {"n_neighbors": 5}, 0, classification=True)
    assert (NumpyModel(Task.classification, p)._predict_fn()(X) == y).mean() == 1.0
    # regression: k=1 interpolates the training targets exactly
    t = X[:, 0] * 2.0 + 1.0
    pr = _fit_knn(X, t, {"n_neighbors": 1}, 0)
    np.testing.assert_allclose(NumpyModel(Task.regression, pr)._predict_fn()(X), t)


def test_dbscan_blobs_and_noise():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_dbscan

    rng = np.random.default_rng(1)
    centers = np.array([[0.0, 0.0], [8.0, 8.0]])
    X = np.vstack(
        [rng.normal(c, 0.4, size=(40, 2)) for c in centers]
        + [np.array([[100.0, 100.0]])]  # isolated noise point
    )
    p = _fit_dbscan(X, None, {"eps": 1.5, "min_samples": 4}, 0)
    lab = NumpyModel(Task.clustering, p)._predict_fn()(X)
    assert sorted(set(lab[:80].tolist())) == [0.0, 1.0]
    assert len(set(lab[:40].tolist())) == 1  # blob 1 is one cluster
    assert len(set(lab[40:80].tolist())) == 1
    assert lab[80] == -1.0  # the isolated point is noise


def test_optics_flat_extraction_matches_dbscan():
    """With the flat-eps extraction, OPTICS cluster membership equals
    DBSCAN at the same eps (label ids may permute with ordering)."""
    from quackml_spark.ml.numpy_backend import (
        NumpyModel,
        _fit_dbscan,
        _fit_optics,
    )

    rng = np.random.default_rng(2)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 8.0]])
    X = np.vstack([rng.normal(c, 0.5, size=(40, 2)) for c in centers])
    hp = {"eps": 1.5, "min_samples": 4}
    a = NumpyModel(Task.clustering, _fit_dbscan(X, None, hp, 0))._predict_fn()(X)
    b = NumpyModel(Task.clustering, _fit_optics(X, None, hp, 0))._predict_fn()(X)
    # same partition: every dbscan cluster maps to exactly one optics label
    for c in set(a.tolist()):
        assert len(set(b[a == c].tolist())) == 1, (c, set(b[a == c].tolist()))


def test_spectral_clustering_recovers_blobs():
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_spectral

    rng = np.random.default_rng(3)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 8.0]])
    X = np.vstack([rng.normal(c, 0.5, size=(50, 2)) for c in centers])
    y = np.repeat([0, 1, 2], 50)
    lab = NumpyModel(
        Task.clustering, _fit_spectral(X, None, {"n_clusters": 3, "gamma": 0.5}, 0)
    )._predict_fn()(X)
    # per-class purity 1.0 under some label permutation
    for c in range(3):
        assert len(set(lab[y == c].tolist())) == 1
    assert len(set(lab.tolist())) == 3


def test_spectral_co_and_bi_recover_block_structure():
    from quackml_spark.ml.numpy_backend import (
        NumpyModel,
        _fit_spectral_bi,
        _fit_spectral_co,
    )

    rng = np.random.default_rng(4)
    B = np.zeros((60, 8))
    B[:30, :4] = 5 + rng.normal(0, 0.2, (30, 4))
    B[30:, 4:] = 5 + rng.normal(0, 0.2, (30, 4))
    y = np.repeat([0.0, 1.0], 30)
    for fit in (_fit_spectral_co, _fit_spectral_bi):
        lab = NumpyModel(
            Task.clustering, fit(B, None, {"n_clusters": 2}, 0)
        )._predict_fn()(B)
        assert max((lab == y).mean(), (lab == 1 - y).mean()) == 1.0, fit.__name__


def test_ward_agglomerate_exact_small_case():
    """Three well-separated pairs: Ward at k=3 must merge exactly the
    pairs (verifiable by hand — within-pair distance 0.1, cross ≥ 10)."""
    from quackml_spark.ml.numpy_backend import _ward_agglomerate

    P = np.array(
        [[0.0], [0.1], [10.0], [10.1], [20.0], [20.1]]
    )
    lab = _ward_agglomerate(P, 3)
    assert lab[0] == lab[1] and lab[2] == lab[3] and lab[4] == lab[5]
    assert len(set(lab.tolist())) == 3


def test_feature_agglomeration_pools_correlated_features(spark, catalog):
    """Near-duplicate feature pairs cluster together; the decomposition
    transform pools each cluster by mean (served through the full
    train()/decompose() surface)."""
    from quackml_spark.ml.predict import decompose

    rng = np.random.default_rng(5)
    n = 200
    f0, f2 = rng.normal(size=n), rng.normal(size=n)
    rows = [
        (float(a), float(a + 0.01 * e1), float(b), float(b + 0.01 * e2))
        for a, b, e1, e2 in zip(f0, f2, rng.normal(size=n), rng.normal(size=n))
    ]
    df = spark.createDataFrame(rows, "a double, a2 double, b double, b2 double")
    res = train(
        spark, "np-featagg", task="decomposition", df=df,
        algorithm="feature_agglomeration", hyperparams={"n_clusters": 2},
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["n_feature_clusters"] == 2
    out = decompose(df, "np-featagg", catalog=catalog)
    row = out.select("decomposition").first()[0]
    assert len(row) == 2


def test_unreachable_seven_resolve_and_lifecycle(spark, catalog):
    """All 8 (task, algorithm) pairs for the reference-unreachable
    seven resolve to the numpy backend; knn and dbscan run the full
    train() lifecycle."""
    from quackml_spark.ml.algorithms import resolve

    pairs = [
        (Task.classification, Algorithm.knn),
        (Task.regression, Algorithm.knn),
        (Task.clustering, Algorithm.dbscan),
        (Task.clustering, Algorithm.optics),
        (Task.clustering, Algorithm.spectral),
        (Task.clustering, Algorithm.spectral_bi),
        (Task.clustering, Algorithm.spectral_co),
        (Task.decomposition, Algorithm.feature_agglomeration),
    ]
    for t, a in pairs:
        assert resolve(t, a, {}, 42).backend.startswith("numpy"), (t, a)

    rng = np.random.default_rng(6)
    centers = np.array([[0.0, 0.0], [8.0, 8.0]])
    X = np.vstack([rng.normal(c, 0.5, size=(60, 2)) for c in centers])
    y = np.repeat([0.0, 1.0], 60)
    rows = [(float(a), float(b), float(t_)) for (a, b), t_ in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, target double")
    res = train(
        spark, "np-knn", task="classification", df=df,
        y_column_name="target", algorithm="knn",
        test_sampling="random", catalog=catalog,
    )
    assert res.metrics["backend"] == "numpy"
    assert res.metrics["accuracy"] > 0.95, res.metrics
    res2 = train(
        spark, "np-dbscan", task="clustering", df=df.drop("target"),
        algorithm="dbscan", hyperparams={"eps": 1.5, "min_samples": 4},
        catalog=catalog,
    )
    assert res2.metrics["backend"] == "numpy"


def _blob_fixture(seed=9, k=3, per=50, spread=0.4, gap=10.0):
    rng = np.random.default_rng(seed)
    centers = np.array([[i * gap, (i % 2) * gap] for i in range(k)], dtype=float)
    X = np.vstack([rng.normal(c, spread, size=(per, 2)) for c in centers])
    truth = np.repeat(np.arange(k), per)
    return X, truth


def _partition_equal(a, b):
    """Same partition up to label renaming."""
    m: dict = {}
    for x, y in zip(a, b):
        if x in m and m[x] != y:
            return False
        m[x] = y
    return len(set(m.values())) == len(m)


def test_mini_batch_kmeans_exact_algorithm():
    """Sculley mini-batch k-means recovers well-separated blobs, uses
    per-center count learning rates (centers land on blob means), and
    resolves as exact numpy, not an mllib stand-in."""
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_mini_batch_kmeans

    assert resolve(Task.clustering, Algorithm.mini_batch_kmeans, {}, 42).backend == "numpy"
    X, truth = _blob_fixture()
    p = _fit_mini_batch_kmeans(X, None, {"n_clusters": 3, "batch_size": 32}, 0)
    labels = NumpyModel(Task.clustering, p)._predict_fn()(X)
    assert _partition_equal(labels.tolist(), truth.tolist())
    # centers converge near the blob means
    C = np.sort(np.asarray(p["centers"]), axis=0)
    means = np.sort(np.array([X[truth == i].mean(axis=0) for i in range(3)]), axis=0)
    assert np.abs(C - means).max() < 0.5


def test_agglomerative_ward_recovers_blobs():
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_agglomerative

    assert resolve(Task.clustering, Algorithm.agglomerative, {}, 42).backend == "numpy"
    X, truth = _blob_fixture(seed=11)
    p = _fit_agglomerative(X, None, {"n_clusters": 3}, 0)
    labels = NumpyModel(Task.clustering, p)._predict_fn()(X)
    assert _partition_equal(labels.tolist(), truth.tolist())
    # serving extends to unseen points by nearest training point
    probe = np.array([[0.1, 0.2], [10.1, 9.8]])
    pl = NumpyModel(Task.clustering, p)._predict_fn()(probe)
    assert pl[0] == labels[0] and pl[1] != pl[0]


def test_birch_cf_threshold_rule():
    """The CF radius rule decides subcluster granularity: a tight blob
    under a generous threshold collapses to ONE subcluster; with a tiny
    threshold every point opens its own. Global phase recovers planted
    blobs; train() lifecycle serves distributed with backend=numpy."""
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import NumpyModel, _fit_birch

    assert resolve(Task.clustering, Algorithm.birch, {}, 42).backend == "numpy"
    rng = np.random.default_rng(3)
    tight = rng.normal(0.0, 0.01, size=(40, 2))
    p1 = _fit_birch(tight, None, {"threshold": 0.5, "n_clusters": 1}, 0)
    assert len(p1["X_train"]) == 1
    p2 = _fit_birch(tight, None, {"threshold": 1e-9, "n_clusters": 1}, 0)
    assert len(p2["X_train"]) == len(tight)

    X, truth = _blob_fixture(seed=21)
    p = _fit_birch(X, None, {"threshold": 1.5, "n_clusters": 3}, 0)
    labels = NumpyModel(Task.clustering, p)._predict_fn()(X)
    assert _partition_equal(labels.tolist(), truth.tolist())


def test_clustering_trio_train_lifecycle(spark, catalog):
    """mini_batch_kmeans / agglomerative / birch run the full train()
    lifecycle end-to-end with backend recorded as exact numpy."""
    X, truth = _blob_fixture(seed=5, k=2, per=40)
    rows = [(float(a), float(b)) for a, b in X]
    df = spark.createDataFrame(rows, "x1 double, x2 double")
    for algo, hp in (
        ("mini_batch_kmeans", {"n_clusters": 2, "batch_size": 16}),
        ("agglomerative", {"n_clusters": 2}),
        ("birch", {"threshold": 1.5, "n_clusters": 2}),
    ):
        res = train(
            spark, f"np-{algo}", task="clustering", df=df,
            algorithm=algo, hyperparams=hp, catalog=catalog,
        )
        assert res.metrics["backend"] == "numpy", (algo, res.metrics)


def test_sgd_regressor_and_classifier_exact_objectives():
    """SGD resolves to the numpy exact objectives: the regressor
    (squared+l2, invscaling eta) recovers a linear rule; the classifier
    (hinge+l2 one-vs-rest) separates blobs including a 3-class case,
    with sklearn's class-sorted coefficient layout."""
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import (
        NumpyModel,
        _fit_sgd_classifier,
        _fit_sgd_regressor,
    )

    assert resolve(Task.regression, Algorithm.stochastic_gradient_descent, {}, 42).backend == "numpy"
    assert resolve(Task.classification, Algorithm.stochastic_gradient_descent, {}, 42).backend == "numpy"

    rng = np.random.default_rng(17)
    X = rng.normal(size=(400, 3))
    y = X @ np.array([1.5, -2.0, 0.5]) + 0.7
    p = _fit_sgd_regressor(X, y, {"alpha": 1e-6}, 0)
    pred = NumpyModel(Task.regression, p)._predict_fn()(X)
    ss = ((pred - y) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert 1 - ss > 0.99, 1 - ss

    Xc, truth = _blob_fixture(seed=23, k=3, per=60, spread=0.6)
    pc = _fit_sgd_classifier(Xc, truth.astype(float), {"alpha": 1e-4}, 0)
    labels = NumpyModel(Task.classification, pc)._predict_fn()(Xc)
    assert (labels == truth).mean() > 0.98
    assert list(pc["classes"]) == [0.0, 1.0, 2.0]


def test_lasso_lars_path_equals_cd_objective():
    """The true LARS-lasso path (Efron §3.1 drop rule + alpha stop) and
    coordinate descent optimize the same convex objective — solutions
    must agree across alphas on a correlated design that provokes
    variable drops along the path."""
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import _fit_cd, _fit_lasso_lars

    assert resolve(Task.regression, Algorithm.lasso_least_angle, {}, 42).backend == "numpy"
    rng = np.random.default_rng(4)
    n, d = 120, 6
    X = rng.normal(size=(n, d))
    X[:, 3] = 0.7 * X[:, 0] + 0.3 * rng.normal(size=n)
    y = X @ np.array([2.0, 0.0, -1.0, 0.5, 0.0, 1.5]) + 0.1 * rng.normal(size=n)
    for alpha in (0.5, 0.1, 0.02, 0.001):
        a = np.asarray(_fit_lasso_lars(X, y, {"alpha": alpha}, 0)["coef"])
        b = np.asarray(_fit_cd(X, y, alpha, 1.0)["coef"])
        assert np.abs(a - b).max() < 5e-5, alpha
    # shrinkage direction: larger alpha, sparser/smaller coefficients
    big = np.abs(_fit_lasso_lars(X, y, {"alpha": 1.0}, 0)["coef"]).sum()
    small = np.abs(_fit_lasso_lars(X, y, {"alpha": 0.001}, 0)["coef"]).sum()
    assert big < small


def test_svr_kkt_exactness():
    """epsilon-SVR must satisfy the libsvm KKT system exactly: free
    vectors sit ON the eps-tube boundary, zero-dual points inside,
    C-bound points outside, duals sum to zero — and on noise-free
    linear data the fit lands on the flat tube (max residual == eps)."""
    from quackml_spark.ml.algorithms import resolve
    from quackml_spark.ml.numpy_backend import _fit_svr, _rbf

    assert resolve(Task.regression, Algorithm.svm, {}, 42).backend == "numpy"

    def kkt_bad(X, y, p, C, eps):
        K = _rbf(X, X, p["gamma"]) if p["kernel"] == "rbf" else X @ X.T
        b = np.asarray(p["dual"])
        r = y - (K @ b + p["y_offset"])
        bad = 0
        for i in range(len(X)):
            if abs(b[i]) < 1e-6:
                ok = abs(r[i]) <= eps + 1e-3
            elif abs(b[i]) > C - 1e-6:
                ok = abs(r[i]) >= eps - 1e-3 and np.sign(r[i]) == np.sign(b[i])
            else:
                ok = abs(abs(r[i]) - eps) <= 1e-3 and np.sign(r[i]) == np.sign(b[i])
            bad += not ok
        return bad

    rng = np.random.default_rng(8)
    X = rng.normal(size=(80, 2))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1]
    p = _fit_svr(X, y, {"C": 2.0, "epsilon": 0.1, "kernel": "rbf"}, 0)
    assert kkt_bad(X, y, p, 2.0, 0.1) == 0
    assert abs(np.asarray(p["dual"]).sum()) < 1e-9

    X2 = rng.normal(size=(100, 3))
    y2 = X2 @ np.array([1.0, -2.0, 0.5]) + 3.0
    p2 = _fit_svr(X2, y2, {"C": 10.0, "epsilon": 0.05, "kernel": "linear"}, 0)
    assert kkt_bad(X2, y2, p2, 10.0, 0.05) == 0
    pred = (X2 @ X2.T) @ np.asarray(p2["dual"]) + p2["y_offset"]
    assert np.abs(pred - y2).max() <= 0.05 + 1e-3


def test_bagging_multiclass_never_predicts_absent_class():
    """Regression CARTs on raw ordinal labels averaged a {0, 2} leaf to
    1.0 and predicted class 1 — a class present in neither branch
    (review catch). With per-class indicator trees the prediction is
    always a class the region actually contains, and a separable
    3-class problem classifies correctly."""
    from quackml_spark.ml.numpy_backend import (
        _ensemble_predict_fn,
        _fit_bagging,
    )

    rng = np.random.default_rng(7)
    # classes 0 and 2 are NOT separable in X (same distribution);
    # class 1 lives far away
    X02 = rng.uniform(0.0, 1.0, size=(200, 1))
    y02 = np.array([0.0, 2.0] * 100)
    X1 = rng.uniform(100.0, 101.0, size=(100, 1))
    X = np.vstack([X02, X1])
    y = np.concatenate([y02, np.ones(100)])
    p = _fit_bagging(X, y, {"max_depth": 4}, 0, classification=True)
    fn = _ensemble_predict_fn(p)
    pred02 = fn(X02)
    # the unseparable region must answer with a class that EXISTS there
    assert set(np.unique(pred02)) <= {0.0, 2.0}, np.unique(pred02)
    # and the far class-1 region classifies exactly
    assert (fn(X1) == 1.0).all()

    # separable 3-class sanity: near-perfect accuracy
    Xs = np.concatenate([
        rng.uniform(0, 1, 150), rng.uniform(2, 3, 150), rng.uniform(4, 5, 150)
    ]).reshape(-1, 1)
    ys = np.repeat([0.0, 1.0, 2.0], 150)
    ps = _fit_bagging(Xs, ys, {"max_depth": 4}, 0, classification=True)
    acc = (_ensemble_predict_fn(ps)(Xs) == ys).mean()
    assert acc > 0.98, acc


def test_lars_early_stop_at_the_knot():
    """Lars(n_nonzero_coefs=1) must stop at the path knot where the
    SECOND variable would enter (equal residual correlations), not jump
    to the single-feature OLS fit (review catch). At the knot,
    |corr(x1, r)| == |corr(x2, r)|; the OLS jump zeroes corr(x1, r)."""
    from quackml_spark.ml.numpy_backend import _fit_lars

    rng = np.random.default_rng(11)
    x1 = rng.normal(size=400)
    x2 = 0.7 * x1 + 0.7141 * rng.normal(size=400)  # correlated pair
    X = np.column_stack([x1, x2])
    y = 3.0 * x1 + 1.0 * x2 + 0.01 * rng.normal(size=400)
    p = _fit_lars(X, y, {"n_nonzero_coefs": 1}, 0)
    coef = np.asarray(p["coef"])
    assert coef[1] == 0.0  # only one active variable
    # knot property: residual correlations tie (within numeric noise)
    Xc = X - X.mean(axis=0)
    r = (y - y.mean()) - Xc @ coef
    c = np.abs(Xc.T @ r)
    assert abs(c[0] - c[1]) < 1e-8 * max(c[0], 1.0), c
    # and the coefficient is SHRUNK vs the single-feature OLS fit
    ols1 = float((Xc[:, 0] @ (y - y.mean())) / (Xc[:, 0] @ Xc[:, 0]))
    assert 0.0 < coef[0] < ols1
