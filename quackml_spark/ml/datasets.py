"""load_dataset — built-in demo datasets (api.rs:1082-1191, dataset.rs:203-660).

The reference compiles the six scikit-learn CSVs into its binary. This
container has no sklearn and no network, so the built-ins are
deterministic synthetic twins with the exact reference schemas (column
names, dtypes, row counts — FIXTURES.md §1), generated from seeded
numpy with class-dependent structure so models actually learn. When
sklearn IS importable, the canonical datasets are used instead.

HF dataset import (`load_dataset(source=...)` for arbitrary hubs) is
import-gated on ``datasets`` and follows the same path: pandas →
spark.createDataFrame → saveAsTable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_SEED = 42


def _sk():
    try:
        import sklearn.datasets as skd

        return skd
    except ImportError:
        return None


def _clustered(n, d, k, seed, spread=1.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, size=(k, d))
    y = rng.integers(0, k, size=n)
    x = centers[y] + rng.normal(0, spread, size=(n, d))
    return x.astype("float32"), y


def load_diabetes() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_diabetes()
        df = pd.DataFrame(b.data, columns=b.feature_names)
        df["target"] = b.target
        return df.astype("float32")
    rng = np.random.default_rng(_SEED)
    cols = ["age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6"]
    x = rng.normal(0, 0.05, size=(442, 10))
    beta = rng.uniform(-300, 300, size=10)
    y = 150 + x @ beta + rng.normal(0, 20, size=442)
    df = pd.DataFrame(x, columns=cols)
    df["target"] = y
    return df.astype("float32")


def load_iris() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_iris()
        df = pd.DataFrame(
            b.data,
            columns=["sepal_length", "sepal_width", "petal_length", "petal_width"],
        ).astype("float32")
        df["target"] = b.target.astype("int32")
        return df
    x, y = _clustered(150, 4, 3, _SEED, spread=0.6)
    df = pd.DataFrame(
        x, columns=["sepal_length", "sepal_width", "petal_length", "petal_width"]
    )
    df["target"] = y.astype("int32")
    return df


def load_breast_cancer() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_breast_cancer()
        df = pd.DataFrame(b.data, columns=list(b.feature_names)).astype("float32")
        df["malignant"] = (b.target == 0)
        return df
    x, y = _clustered(569, 30, 2, _SEED + 1, spread=2.0)
    names = [
        f"{stat} {feat}"
        for stat in ("mean", "worst", "error")
        for feat in (
            "radius", "texture", "perimeter", "area", "smoothness",
            "compactness", "concavity", "concave points", "symmetry",
            "fractal dimension",
        )
    ]
    df = pd.DataFrame(x, columns=names)
    df["malignant"] = y.astype(bool)
    return df


def load_digits() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_digits()
        imgs = b.images.astype("int32")
        return pd.DataFrame(
            {
                "image": [img.tolist() for img in imgs],
                "target": b.target.astype("int32"),
            }
        )
    x, y = _clustered(1797, 64, 10, _SEED + 2, spread=2.5)
    imgs = np.clip((x * 2 + 8), 0, 16).astype("int32").reshape(-1, 8, 8)
    return pd.DataFrame(
        {"image": [img.tolist() for img in imgs], "target": y.astype("int32")}
    )


def load_wine() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_wine()
        names = [n.replace("od280/od315_of_diluted_wines", "od280/od315_of_diluted_wines") for n in b.feature_names]
        df = pd.DataFrame(b.data, columns=names).astype("float32")
        df["target"] = b.target.astype("int32")
        return df
    x, y = _clustered(178, 13, 3, _SEED + 3, spread=1.2)
    names = [
        "alcohol", "malic_acid", "ash", "alcalinity_of_ash", "magnesium",
        "total_phenols", "flavanoids", "nonflavanoid_phenols",
        "proanthocyanins", "color_intensity", "hue",
        "od280/od315_of_diluted_wines", "proline",
    ]
    df = pd.DataFrame(x, columns=names)
    df["target"] = y.astype("int32")
    return df


def load_linnerud() -> pd.DataFrame:
    skd = _sk()
    if skd:
        b = skd.load_linnerud()
        df = pd.DataFrame(b.data, columns=["chins", "situps", "jumps"]).astype("float32")
        for i, c in enumerate(["weight", "waist", "pulse"]):
            df[c] = b.target[:, i].astype("float32")
        return df
    rng = np.random.default_rng(_SEED + 4)
    x = rng.uniform(1, 20, size=(20, 3)).astype("float32")
    df = pd.DataFrame(x, columns=["chins", "situps", "jumps"])
    df["weight"] = (150 + x @ np.array([2.0, -0.5, 0.3]) + rng.normal(0, 5, 20)).astype(
        "float32"
    )
    df["waist"] = (35 + x @ np.array([-0.2, 0.1, 0.05]) + rng.normal(0, 1, 20)).astype(
        "float32"
    )
    df["pulse"] = (55 + x @ np.array([0.1, 0.2, -0.3]) + rng.normal(0, 3, 20)).astype(
        "float32"
    )
    return df


_BUILTINS = {
    "diabetes": load_diabetes,
    "iris": load_iris,
    "breast_cancer": load_breast_cancer,
    "digits": load_digits,
    "wine": load_wine,
    "linnerud": load_linnerud,
}


def load_dataset(
    spark: SparkSession,
    source: str,
    subset: str | None = None,
    limit: int | None = None,
    kwargs: dict | None = None,
    register_as: str | None = None,
) -> DataFrame:
    """Load a built-in (or HF hub) dataset as a DataFrame and register a
    temp view ``quackml_<source>`` (saveAsTable parity)."""
    if source in _BUILTINS:
        pdf = _BUILTINS[source]()
    else:
        try:
            import datasets as hf_datasets
        except ImportError as e:
            raise NotImplementedError(
                f"dataset {source!r} is not built-in and the HuggingFace "
                f"'datasets' package is not installed"
            ) from e
        ds = hf_datasets.load_dataset(source, subset, **(kwargs or {}))
        split = next(iter(ds.values())) if hasattr(ds, "values") else ds
        pdf = split.to_pandas()
    if limit:
        pdf = pdf.head(limit)
    df = spark.createDataFrame(pdf)
    view = register_as or f"quackml_{source.replace('/', '_').replace('-', '_')}"
    df.createOrReplaceTempView(view)
    return df
