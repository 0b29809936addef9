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

# HF dataset dtype -> Spark SQL type, mirroring the reference's
# dtype->postgres map (transformers/mod.rs:577-589). dict/list map to a
# JSON string column (the JSONB analog).
HF_DTYPE_TO_SPARK = {
    "string": "string",
    "large_string": "string",
    "dict": "string",
    "list": "string",
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "int8": "smallint",
    "float64": "double",
    "float32": "float",
    "float16": "float",
    "bool": "boolean",
}


def _coerce_hf_dataframe(pdf: pd.DataFrame, dtypes: dict[str, str]) -> tuple[pd.DataFrame, str]:
    """Apply the reference's dtype map: returns (coerced pandas frame,
    spark DDL schema). Unknown dtypes raise, like mod.rs:588 bails."""
    ddl_parts = []
    pdf = pdf.copy()
    for col, dt in dtypes.items():
        if dt not in HF_DTYPE_TO_SPARK:
            raise ValueError(
                f"unhandled dataset feature dtype {dt!r} for column {col!r} "
                "(transformers/mod.rs:588 parity)"
            )
        spark_t = HF_DTYPE_TO_SPARK[dt]
        if dt in ("dict", "list"):
            pdf[col] = pdf[col].map(
                lambda v: json.dumps(v, default=str) if v is not None else None
            )
        ddl_parts.append(f"`{col}` {spark_t}")
    return pdf, ", ".join(ddl_parts)


def _hf_feature_dtype(feature) -> str:
    """Best-effort dtype name for an HF feature (Value.dtype, else
    dict/list for nested features)."""
    dtype = getattr(feature, "dtype", None)
    if isinstance(dtype, str):
        return dtype
    name = type(feature).__name__.lower()
    if "sequence" in name or "list" in name:
        return "list"
    return "dict"


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
        dtypes = {
            name: _hf_feature_dtype(feat)
            for name, feat in getattr(split, "features", {}).items()
        }
        if dtypes:
            pdf, ddl = _coerce_hf_dataframe(pdf, dtypes)
            if limit:
                pdf = pdf.head(limit)
            df = spark.createDataFrame(pdf, schema=ddl)
            view = register_as or f"quackml_{source.replace('/', '_').replace('-', '_')}"
            df.createOrReplaceTempView(view)
            return df
    if limit:
        pdf = pdf.head(limit)
    df = spark.createDataFrame(pdf)
    view = register_as or f"quackml_{source.replace('/', '_').replace('-', '_')}"
    df.createOrReplaceTempView(view)
    return df
