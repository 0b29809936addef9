"""train() — the engine's flagship entry point.

Parity with the reference's ``SELECT * FROM train(...)`` lifecycle
(api.rs:180-693, traced in SURVEY.md §3.1): project resolve/create →
snapshot (split + stats + preprocess fit) → model row (in_progress) →
fit (+ optional grid/random search with k-fold CV) → test metrics with
fit_time/score_time recorded → persist artifact → deploy decision
against the currently deployed model on the task's default metric.

Spark-first: the training DataFrame never leaves the cluster; MLlib
estimators fit distributed. fit_time/score_time land in
quackml.models.metrics exactly like model.rs:660-669.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.catalog import Algorithm, Catalog, Search, Status, Strategy, Task
from quackml_spark.core.snapshot import Snapshot
from quackml_spark.ml.algorithms import resolve
from quackml_spark.ml.metrics import (
    binary_extra_metrics,
    classification_metrics,
    clustering_metrics,
    regression_metrics,
)
from quackml_spark.ml.model import TrainedModel
from quackml_spark.ml.search import build_combinations, run_search


@dataclass
class TrainResult:
    project: str
    task: str
    algorithm: str
    model_id: int
    snapshot_id: int
    metrics: dict
    deployed: bool


def _with_features_vec(df: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("features_vec", array_to_vector("features"))


def _fit_one(task, algorithm, params, seed, train_vec, num_classes):
    res = resolve(task, algorithm, params, seed)
    est = res.estimator
    if (
        task == Task.classification
        and num_classes
        and num_classes > 2
        and type(est).__name__ == "GBTClassifier"
    ):
        from pyspark.ml.classification import OneVsRest

        est = OneVsRest(
            classifier=est, featuresCol="features_vec", labelCol="label"
        )
    t0 = time.perf_counter()
    model = est.fit(train_vec)
    fit_time = time.perf_counter() - t0
    return res, model, fit_time


def _score(
    task,
    trained: TrainedModel,
    test_vec: DataFrame,
    num_classes: int | None = None,
    y_columns: list[str] | None = None,
) -> dict:
    if task == Task.regression:
        if trained.is_joint:
            # per-target regression metrics + their mean r2, so the
            # deploy decision compares joint models on real quality —
            # the empty dict this used to return made every joint fit
            # unconditionally replace the incumbent (review catch)
            pred = trained.transform(test_vec)
            names = y_columns or [
                f"target_{i}" for i in range(len(trained.spark_model))
            ]
            per, r2s = {}, []
            for i, name in enumerate(names):
                sub = pred.select(
                    F.col("predictions")[i].alias("prediction"),
                    F.col("labels")[i].alias("label"),
                )
                m_i = regression_metrics(sub)
                per[name] = m_i
                if m_i.get("r2") is not None:
                    r2s.append(float(m_i["r2"]))
            out: dict = {"per_target": per}
            if r2s:
                out["r2"] = sum(r2s) / len(r2s)
            return out
        pred = trained.transform(test_vec)
        return regression_metrics(pred)
    if task == Task.classification:
        pred = trained.transform(test_vec)
        m = classification_metrics(pred)
        # binary means the MODEL is binary (num_classes from the fitted
        # label map), not "the test split happens to hold two classes":
        # a 3-class model whose test split contains {0, 2} would score
        # P(class 1) as the positive probability and persist garbage
        # roc_auc/log_loss (review catch). Fall back to the split count
        # only when the class count is genuinely unknown.
        if num_classes is not None:
            is_binary = num_classes == 2
        else:
            is_binary = (
                pred.select(F.count_distinct("label")).collect()[0][0] == 2
            )
        if is_binary:
            m.update(binary_extra_metrics(pred))
        return m
    if task == Task.clustering:
        pred = trained.transform(test_vec)
        return clustering_metrics(pred)
    if task == Task.decomposition:
        if hasattr(trained.spark_model, "explainedVariance"):
            ev = trained.spark_model.explainedVariance.toArray().tolist()
            return {"cumulative_explained_variance": float(sum(ev))}
        # non-PCA decomposition (feature_agglomeration): report the
        # reduced dimensionality instead of a variance ratio
        params = getattr(trained.spark_model, "params", {})
        if params.get("kind") == "feature_map":
            return {"n_feature_clusters": int(params["k"])}
        return {}
    return {}


def train(
    spark: SparkSession,
    project_name: str,
    task: str | Task | None = None,
    relation_name: str | None = None,
    df: DataFrame | None = None,
    y_column_name: str | list[str] | None = None,
    algorithm: str | Algorithm = Algorithm.linear,
    hyperparams: dict | None = None,
    search: str | Search | None = None,
    search_params: dict | None = None,
    search_args: dict | None = None,
    test_size: float = 0.25,
    test_sampling: str = "stratified",
    preprocess: dict | None = None,
    materialize_snapshot: bool = False,
    automatic_deploy: bool = True,
    catalog: Catalog | None = None,
    seed: int = 42,
) -> TrainResult:
    catalog = catalog or Catalog()
    algorithm = Algorithm(algorithm)
    search = Search(search) if search else None

    # --- project resolve/create (project.rs:125-160; api.rs:526-531) ---
    existing = catalog.find("projects", name=project_name)
    if len(existing):
        project_id = int(existing.iloc[0]["id"])
        existing_task = Task(existing.iloc[0]["task"])
        if task is not None and Task(task) != existing_task:
            raise ValueError(
                f"project {project_name!r} already exists with task "
                f"{existing_task.value!r}; got {Task(task).value!r}"
            )
        task = existing_task
    else:
        if task is None:
            raise ValueError("task is required for a new project")
        task = Task(task)
        project_id = catalog.insert(
            "projects", {"name": project_name, "task": task.value}
        )

    # default algorithm switching (api.rs:576-582)
    if algorithm == Algorithm.linear:
        if task == Task.clustering:
            algorithm = Algorithm.kmeans
        elif task == Task.decomposition:
            algorithm = Algorithm.pca

    # unsupervised tasks use all columns; stratified sampling needs a label
    if task in (Task.clustering, Task.decomposition):
        y_column_name = None
        if test_sampling == "stratified":
            test_sampling = "random"

    source = df if df is not None else relation_name
    if source is None:
        raise ValueError("provide relation_name or df")

    snap, train_df, test_df = Snapshot.create(
        spark,
        catalog,
        source,
        y_column_name,
        test_size=test_size,
        test_sampling=test_sampling,
        preprocess=preprocess,
        materialize=materialize_snapshot,
        seed=seed,
        classification_label=(task == Task.classification),
    )
    if isinstance(source, str):
        catalog.update("snapshots", snap.id, {"relation_name": source})

    # the unpersist guard starts HERE: a failure between these cache()
    # calls and the old try block (the models-row insert, e.g. a catalog
    # conflict) used to leak both cached splits (review catch)
    train_vec = _with_features_vec(snap.transform(train_df)).cache()
    test_vec = _with_features_vec(snap.transform(test_df)).cache()
    try:
        num_classes = len(snap.label_map) if snap.label_map else None
        if task == Task.classification and num_classes is None:
            num_classes = train_vec.select(F.count_distinct("label")).collect()[0][0]

        model_id = catalog.insert(
            "models",
            {
                "project_id": project_id,
                "snapshot_id": snap.id,
                "num_features": len(snap.feature_names),
                "algorithm": algorithm.value,
                "hyperparams": __import__("json").dumps(hyperparams or {}),
                "status": Status.in_progress.value,
                "search": search.value if search else None,
                "search_params": __import__("json").dumps(search_params or {}),
                "search_args": __import__("json").dumps(search_args or {}),
            },
        )
    except BaseException:
        train_vec.unpersist()
        test_vec.unpersist()
        snap.unpersist()
        raise

    try:
        # --- search (optional) ---
        combos = build_combinations(search, search_params, hyperparams, search_args, seed)
        search_results: dict = {}
        best_params = combos[0]
        if len(combos) > 1 or (search and int((search_args or {}).get("cv", 5)) > 1):
            cv = int((search_args or {}).get("cv", 5 if search else 1))
            metric_key = task.default_target_metric

            def fit_fn(params, cv_train):
                _, m, _ = _fit_one(task, algorithm, params, seed, cv_train, num_classes)
                return m

            def score_fn(model, cv_test):
                tm = TrainedModel(task, algorithm.value, "cv", model)
                vals = _score(task, tm, cv_test, num_classes=num_classes)
                return float(vals.get(metric_key, 0.0))

            best_params, search_results = run_search(
                train_vec,
                combos,
                cv,
                fit_fn,
                score_fn,
                task.value_is_better_when_higher,
                snap.num_train_rows,
            )

        # --- final fit on the full train block ---
        if task == Task.regression and snap.y_columns and len(snap.y_columns) > 1:
            # joint (multi-target) regression: one submodel per target
            subs = []
            t0 = time.perf_counter()
            for i in range(len(snap.y_columns)):
                sub_df = train_vec.withColumn("label", F.col("labels")[i])
                res_i, m_i, _ = _fit_one(task, algorithm, best_params, seed, sub_df, None)
                subs.append(m_i)
            fit_time = time.perf_counter() - t0
            trained = TrainedModel(task, algorithm.value, res_i.backend, subs)
        else:
            res, fitted, fit_time = _fit_one(
                task, algorithm, best_params, seed, train_vec, num_classes
            )
            trained = TrainedModel(task, algorithm.value, res.backend, fitted)
            from quackml_spark.ml.model import _extract_portable

            trained.portable = _extract_portable(fitted)

        t0 = time.perf_counter()
        metrics = _score(
            task, trained, test_vec,
            num_classes=num_classes, y_columns=snap.y_columns,
        )
        score_time = time.perf_counter() - t0
        metrics["fit_time"] = fit_time
        metrics["score_time"] = score_time
        metrics["backend"] = trained.backend
        if search_results:
            metrics["search_results"] = search_results

        # --- persist (files-table parity: pointer row + artifact dir) ---
        path = catalog.model_dir(model_id)
        trained.meta["snapshot_id"] = snap.id
        trained.save(path)
        catalog.insert("files", {"model_id": model_id, "path": path, "part": 0})
        catalog.update(
            "models",
            model_id,
            {
                "status": Status.successful.value,
                "metrics": metrics,
                "hyperparams": best_params,
            },
        )
    except Exception:
        catalog.update("models", model_id, {"status": Status.failed.value})
        raise
    finally:
        train_vec.unpersist()
        test_vec.unpersist()
        snap.unpersist()

    # --- deploy decision (api.rs:626-679) ---
    deployed = False
    if automatic_deploy:
        metric_key = task.default_target_metric
        new_val = metrics.get(metric_key)
        current = catalog.deployed_models()
        current = (
            current[current["project_id"] == project_id] if len(current) else current
        )
        do_deploy = True
        if len(current):
            import json as _json

            cur_metrics = _json.loads(current.iloc[0]["metrics"] or "{}")
            cur_val = cur_metrics.get(metric_key)
            if new_val is not None and cur_val is not None:
                if task.value_is_better_when_higher:
                    do_deploy = new_val >= cur_val
                else:
                    do_deploy = new_val <= cur_val
        if do_deploy:
            catalog.insert(
                "deployments",
                {
                    "project_id": project_id,
                    "model_id": model_id,
                    "strategy": Strategy.new_score.value,
                },
            )
            deployed = True
            from quackml_spark.ml.predict import invalidate_cache

            invalidate_cache(catalog, project_name)

    return TrainResult(
        project=project_name,
        task=task.value,
        algorithm=algorithm.value,
        model_id=model_id,
        snapshot_id=snap.id,
        metrics=metrics,
        deployed=deployed,
    )
