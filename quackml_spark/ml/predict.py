"""predict family + deployment strategies + SQL-callable UDFs.

Parity with api.rs predict surface (predict / predict_proba /
predict_joint / decompose, §2.1-2.2) and the cached project → deployed
model resolution (project.rs:19-98, model.rs:31-33, 356-368; 1024-entry
cap like the reference's flush-on-full caches).

Two serving paths:
  * ``predict(df, project)`` — DataFrame-native: replay the snapshot's
    frozen preprocessing, then MLlib transform. Fully distributed, no
    Python on the data path.
  * ``register_udfs(spark)`` — SQL parity: ``quackml_predict(project,
    features)`` evaluates the **portable** parameter dump (linear /
    logistic / kmeans / pca families) inside an Arrow-batched pandas
    UDF on executors. Tree ensembles serve via the DataFrame path (the
    UDF raises an informative error), because MLlib tree models cannot
    be evaluated outside the JVM.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.catalog import Catalog, Strategy, Task
from quackml_spark.core.snapshot import Snapshot
from quackml_spark.ml.model import TrainedModel

_CACHE_CAP = 1024
_RESOLVED: dict[tuple[str, str], tuple[int, TrainedModel, Snapshot]] = {}


def invalidate_cache(catalog: Catalog, project_name: str | None = None) -> None:
    if project_name is None:
        _RESOLVED.clear()
    else:
        _RESOLVED.pop((catalog.warehouse, project_name), None)


def resolve_deployed(
    spark: SparkSession, catalog: Catalog, project_name: str
) -> tuple[int, TrainedModel, Snapshot]:
    key = (catalog.warehouse, project_name)
    if key in _RESOLVED:
        return _RESOLVED[key]
    projects = catalog.find("projects", name=project_name)
    if not len(projects):
        raise KeyError(f"project {project_name!r} not found")
    project_id = int(projects.iloc[0]["id"])
    dm = catalog.deployed_models()
    dm = dm[dm["project_id"] == project_id] if len(dm) else dm
    if not len(dm):
        raise KeyError(f"project {project_name!r} has no deployed model")
    model_id = int(dm.iloc[0]["model_id"])
    files = catalog.find("files", model_id=model_id)
    if not len(files):
        raise KeyError(f"model {model_id} has no persisted artifact")
    trained = TrainedModel.load(spark, files.iloc[0]["path"])
    snap = Snapshot.load(catalog, int(trained.meta["snapshot_id"]))
    if len(_RESOLVED) >= _CACHE_CAP:  # flush-on-full (project.rs:70-74)
        _RESOLVED.clear()
    _RESOLVED[key] = (model_id, trained, snap)
    return _RESOLVED[key]


def _vec(df: DataFrame, col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("features_vec", array_to_vector(col))


def predict(
    df: DataFrame,
    project_name: str,
    catalog: Catalog | None = None,
    features_col: str | None = None,
) -> DataFrame:
    """Add ``prediction`` (+ ``prediction_label`` for classification with
    a label map; + ``probability_arr`` when available) to df.

    If ``features_col`` names a ready array<numeric> column, snapshot
    preprocessing is skipped (predict(project, features) parity);
    otherwise the raw relation columns are preprocessed exactly as at
    train time (predict_row parity, api.rs:1017-1058)."""
    spark = df.sparkSession
    catalog = catalog or Catalog()
    _, trained, snap = resolve_deployed(spark, catalog, project_name)
    if features_col is not None:
        prepped = df.withColumn(
            "features", F.col(features_col).cast("array<double>")
        )
    else:
        prepped = snap.transform(df, with_label=False)
    out = trained.transform(_vec(prepped))
    if trained.task == Task.classification and snap.label_map:
        out = snap.inverse_label(out)
    return out


def predict_proba(
    df: DataFrame, project_name: str, catalog: Catalog | None = None, **kw
) -> DataFrame:
    """Full probability vector (fixes the reference's truncation to the
    first class, api.rs:894-898)."""
    out = predict(df, project_name, catalog, **kw)
    if "probability_arr" not in out.columns:
        raise ValueError(
            f"deployed model for {project_name!r} does not produce probabilities"
        )
    return out


def predict_joint(
    df: DataFrame, project_name: str, catalog: Catalog | None = None, **kw
) -> DataFrame:
    """Multi-target regression: adds ``predictions`` array<double>."""
    out = predict(df, project_name, catalog, **kw)
    if "predictions" not in out.columns:
        raise ValueError(f"deployed model for {project_name!r} is not joint")
    return out


def decompose(
    df: DataFrame, project_name: str, catalog: Catalog | None = None, **kw
) -> DataFrame:
    """PCA transform via the deployed decomposition model."""
    out = predict(df, project_name, catalog, **kw)
    if "decomposition" not in out.columns:
        raise ValueError(
            f"deployed model for {project_name!r} is not a decomposition model"
        )
    return out


# ---------------------------------------------------------------------------
# deployment strategies (api.rs:695-799)
# ---------------------------------------------------------------------------


def deploy(
    project_name: str,
    strategy: str | Strategy = Strategy.best_score,
    model_id: int | None = None,
    algorithm: str | None = None,
    catalog: Catalog | None = None,
) -> int:
    """Deploy a model by strategy; returns the deployed model id."""
    catalog = catalog or Catalog()
    strategy = Strategy(strategy)
    projects = catalog.find("projects", name=project_name)
    if not len(projects):
        raise KeyError(f"project {project_name!r} not found")
    project_id = int(projects.iloc[0]["id"])
    task = Task(projects.iloc[0]["task"])
    models = catalog.find("models", project_id=project_id, status="successful")
    if algorithm:
        models = models[models["algorithm"] == algorithm]
    if not len(models):
        raise KeyError(f"no successful models for project {project_name!r}")

    if strategy == Strategy.specific:
        if model_id is None:
            raise ValueError("strategy='specific' requires model_id")
        # validate against the project's successful models: an id from
        # another project (or a failed/nonexistent fit) would insert a
        # deployments row that silently serves a wrong-task model — or
        # only fails at serve time with a missing artifact (review
        # catch). Fail here, at deploy time.
        valid_ids = {int(i) for i in models["id"]}
        if int(model_id) not in valid_ids:
            raise ValueError(
                f"model_id {model_id} is not a successful model of "
                f"project {project_name!r} (valid: {sorted(valid_ids)})"
            )
        chosen = int(model_id)
    elif strategy == Strategy.most_recent:
        chosen = int(models.sort_values(["created_at", "id"]).iloc[-1]["id"])
    elif strategy == Strategy.rollback:
        deps = catalog.find("deployments", project_id=project_id).sort_values(
            ["created_at", "id"]
        )
        if len(deps) < 2:
            raise ValueError("nothing to roll back to")
        current = int(deps.iloc[-1]["model_id"])
        previous = deps[deps["model_id"] != current]
        if not len(previous):
            raise ValueError("nothing to roll back to")
        chosen = int(previous.iloc[-1]["model_id"])
    else:  # best_score (metric-ordered, task.rs:116-126)
        metric = task.default_target_metric
        best_val, chosen = None, None
        for _, row in models.iterrows():
            val = json.loads(row["metrics"] or "{}").get(metric)
            if val is None:
                continue
            better = (
                best_val is None
                or (task.value_is_better_when_higher and val > best_val)
                or (not task.value_is_better_when_higher and val < best_val)
            )
            if better:
                best_val, chosen = val, int(row["id"])
        if chosen is None:
            raise ValueError(f"no models with metric {metric!r}")

    catalog.insert(
        "deployments",
        {"project_id": project_id, "model_id": chosen, "strategy": strategy.value},
    )
    invalidate_cache(catalog, project_name)
    return chosen


# ---------------------------------------------------------------------------
# SQL-callable UDFs (§2.13: registered scalars — SELECT quackml_predict(...))
# ---------------------------------------------------------------------------


def _portable_predict_fn(portable: dict):
    import numpy as np

    kind = portable["kind"]
    if kind in ("linear_regression", "linear_svc"):
        coef = np.asarray(portable["coef"], dtype="float64")
        intercept = float(portable["intercept"])

        def fn(mat):
            raw = mat @ coef + intercept
            if kind == "linear_svc":
                return (raw > 0).astype("float64")
            return raw

        return fn
    if kind == "logistic_regression":
        coef = np.asarray(portable["coef"], dtype="float64")
        intercept = np.asarray(portable["intercept"], dtype="float64")

        def fn(mat):
            z = mat @ coef.T + intercept
            if z.shape[1] == 1:
                p1 = 1.0 / (1.0 + np.exp(-z[:, 0]))
                return (p1 > 0.5).astype("float64")
            return z.argmax(axis=1).astype("float64")

        return fn
    if kind == "kmeans":
        centers = np.asarray(portable["centers"], dtype="float64")

        def fn(mat):
            d = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            return d.argmin(axis=1).astype("float64")

        return fn
    raise NotImplementedError(
        f"portable serving not available for {kind!r}; use "
        f"quackml_spark.ml.predict.predict(df, project) (DataFrame path) "
        f"for tree-ensemble models"
    )


def register_udfs(spark: SparkSession, catalog: Catalog | None = None) -> None:
    """Register ``quackml_predict(project, features)`` for Spark SQL.

    The portable parameter dump per project is resolved on the driver at
    registration time and shipped in the UDF closure (broadcast by
    Spark); executors evaluate pure numpy per Arrow batch — the analog
    of the reference's vectorized scalar over 2048-row DataChunks."""
    catalog = catalog or Catalog()
    warehouse = catalog.warehouse

    from pyspark.sql.functions import pandas_udf

    # Resolve all deployed portables eagerly (driver-side, small).
    portables: dict[str, dict] = {}
    dm = catalog.deployed_models()
    for _, row in dm.iterrows():
        files = catalog.find("files", model_id=int(row["model_id"]))
        if not len(files):
            continue
        try:
            with open(files.iloc[0]["path"] + "/meta.json") as f:
                meta = json.load(f)
            if meta.get("portable"):
                portables[row["project_name"]] = meta["portable"]
        except OSError:
            continue

    @pandas_udf("double")
    def quackml_predict(project: pd.Series, features: pd.Series) -> pd.Series:
        import numpy as np

        out = pd.Series([float("nan")] * len(project))
        if not len(project):
            return out
        for name in project.unique():
            p = portables.get(name)
            if p is None:
                raise KeyError(
                    f"quackml_predict: no portable model for project {name!r} "
                    f"(warehouse {warehouse}); tree models serve via the "
                    f"DataFrame predict() API"
                )
            mask = project == name
            mat = np.vstack(features[mask].map(lambda a: np.asarray(a, dtype="float64")))
            out[mask] = _portable_predict_fn(p)(mat)
        return out

    spark.udf.register("quackml_predict", quackml_predict)
