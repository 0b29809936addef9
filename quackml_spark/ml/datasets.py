"""load_dataset — built-in demo datasets (api.rs:1082-1191, dataset.rs:203-660).

The reference compiles the six canonical scikit-learn CSVs into its
binary (dataset.rs:203-217) and keeps plain copies at the repo root.
The same public CSVs ship here under ``quackml_spark/ml/data/`` so the
built-ins load the REAL values with no sklearn dependency — column
names, dtypes, and every cell match the reference tables:

  * diabetes — raw (un-standardized) 442x10 FLOAT + float target;
  * iris — 4 FLOAT features + INTEGER target;
  * breast_cancer — 30 space-named FLOAT features + BOOLEAN
    ``malignant`` (= target == 0, dataset.rs:288,328);
  * digits — 8x8 INTEGER image matrix + SMALLINT target;
  * wine — 13 FLOAT features (incl. "od280/od315_of_diluted_wines")
    + INTEGER target;
  * linnerud — 3 exercise FLOATs + 3 physiological FLOAT targets.

HF dataset import (`load_dataset(source=...)` for arbitrary hubs) is
import-gated on ``datasets`` and follows the same path: pandas →
spark.createDataFrame → temp view.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_DATA_DIR = Path(__file__).resolve().parent / "data"


def _csv(name: str) -> pd.DataFrame:
    return pd.read_csv(_DATA_DIR / f"{name}.csv")


def load_diabetes() -> pd.DataFrame:
    return _csv("diabetes").astype("float32")


def load_iris() -> pd.DataFrame:
    df = _csv("iris")
    feats = ["sepal_length", "sepal_width", "petal_length", "petal_width"]
    df[feats] = df[feats].astype("float32")
    df["target"] = df["target"].astype("int32")
    return df


def load_breast_cancer() -> pd.DataFrame:
    # CSV headers are underscore-separated; the reference table uses
    # space-separated sklearn feature names and a boolean `malignant`
    # column derived from target == 0 (dataset.rs:288,328).
    df = _csv("breast_cancer")
    df["malignant"] = df.pop("target") == 0
    renames = {c: c.replace("_", " ") for c in df.columns if c != "malignant"}
    df = df.rename(columns=renames)
    feat_cols = [c for c in df.columns if c != "malignant"]
    df[feat_cols] = df[feat_cols].astype("float32")
    return df


def load_digits() -> pd.DataFrame:
    # image cells are postgres-style array literals {{0,0,5,..},{..}}
    df = _csv("digits")
    df["image"] = [
        json.loads(s.replace("{", "[").replace("}", "]")) for s in df["image"]
    ]
    df["target"] = df["target"].astype("int32")
    return df


def load_wine() -> pd.DataFrame:
    df = _csv("wine").rename(
        columns={"od280_od315_of_diluted_wines": "od280/od315_of_diluted_wines"}
    )
    feats = [c for c in df.columns if c != "target"]
    df[feats] = df[feats].astype("float32")
    df["target"] = df["target"].astype("int32")
    return df


def load_linnerud() -> pd.DataFrame:
    return _csv("linnerud").astype("float32")


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
