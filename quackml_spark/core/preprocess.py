"""Per-column preprocessing: encode / impute / scale (+ statistics).

Semantics-parity with the reference's Column::preprocess and friends
(/root/reference/src/orm/snapshot.rs:93-132, 180-276, 1288-1331):

  * encode: native (ordinal by first occurrence in the sampled train
    order), ordinal (explicit value list), one_hot (k-1 indicator
    columns), target (category -> mean label over the train split).
  * NULL category key is the sentinel ``__NULL__`` and always encodes to
    0.0 (snapshot.rs:28, :1311); unseen-at-serve categories encode to NaN
    (snapshot.rs:180-185).
  * impute: panic (error when missing and selected), mean, median, mode,
    min, max, zero — applied after encoding, so imputation also repairs
    unseen-category NaNs, like predict_row (api.rs:1041-1058).
  * scale: preserve, standard, min_max, max_abs, robust
    ((x - median) / (q75 - q25), from the ventile table).

Everything is pure Spark Column arithmetic + one broadcast join per
encoded column — no Python UDFs, so the whole pipeline stays inside
whole-stage codegen and scales to any input size. Fitted parameters are
plain JSON, so serve-time replay (the predict path) reconstructs the
exact train-time transform from the catalog alone.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from quackml_spark.session import local_rows

NULL_CATEGORY = "__NULL__"

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double", "boolean"}
_VALID_ENCODE = {"native", "target", "one_hot"}  # + {"ordinal": [...]}
_VALID_IMPUTE = {"panic", "mean", "median", "mode", "min", "max", "zero"}
_VALID_SCALE = {"preserve", "standard", "min_max", "max_abs", "robust"}


@dataclass
class ColumnSpec:
    name: str
    dtype: str
    nullable: bool
    position: int
    is_label: bool = False
    size: int = 1  # array width after flattening
    encode: Any = None  # None | "native" | "target" | "one_hot" | {"ordinal": [...]}
    impute: str = "panic"
    scale: str = "preserve"

    @property
    def is_array(self) -> bool:
        return self.dtype.startswith("array")

    @property
    def is_numeric(self) -> bool:
        base = self.dtype.split("<")[-1].rstrip(">") if self.is_array else self.dtype
        return base in _NUMERIC_TYPES or base.startswith("decimal")

    @property
    def is_categorical(self) -> bool:
        return (not self.is_numeric) or (self.encode is not None)


@dataclass
class FittedColumn:
    spec: ColumnSpec
    statistics: dict = field(default_factory=dict)
    encode_map: dict[str, float] | None = None  # category -> encoded value
    impute_value: float | None = None
    scale_params: dict | None = None  # {"center": c, "divisor": d}

    def to_json(self) -> dict:
        return {
            "name": self.spec.name,
            "dtype": self.spec.dtype,
            "nullable": self.spec.nullable,
            "position": self.spec.position,
            "label": self.spec.is_label,
            "size": self.spec.size,
            "preprocessor": {
                "encode": self.spec.encode,
                "impute": self.spec.impute,
                "scale": self.spec.scale,
            },
            "statistics": self.statistics,
            "encode_map": self.encode_map,
            "impute_value": self.impute_value,
            "scale_params": self.scale_params,
        }

    @classmethod
    def from_json(cls, d: dict) -> "FittedColumn":
        spec = ColumnSpec(
            name=d["name"],
            dtype=d["dtype"],
            nullable=d["nullable"],
            position=d["position"],
            is_label=d["label"],
            size=d.get("size", 1),
            encode=(d.get("preprocessor") or {}).get("encode"),
            impute=(d.get("preprocessor") or {}).get("impute", "panic"),
            scale=(d.get("preprocessor") or {}).get("scale", "preserve"),
        )
        return cls(
            spec=spec,
            statistics=d.get("statistics") or {},
            encode_map=d.get("encode_map"),
            impute_value=d.get("impute_value"),
            scale_params=d.get("scale_params"),
        )


def parse_preprocess_spec(spec: dict | None, columns: list[ColumnSpec]) -> None:
    """Apply a user preprocess dict onto ColumnSpecs, with the reference's
    validation rules (snapshot.rs:543-556)."""
    spec = spec or {}
    by_name = {c.name: c for c in columns}
    for col_name, ops in spec.items():
        if col_name not in by_name:
            raise ValueError(f"preprocess: unknown column {col_name!r}")
        c = by_name[col_name]
        ops = ops or {}
        enc = ops.get("encode")
        if enc is not None:
            if not (
                (isinstance(enc, str) and enc in _VALID_ENCODE)
                or (isinstance(enc, dict) and list(enc.keys()) == ["ordinal"])
            ):
                raise ValueError(f"preprocess: invalid encode {enc!r} for {col_name}")
            c.encode = enc
        imp = ops.get("impute", c.impute)
        if imp not in _VALID_IMPUTE:
            raise ValueError(f"preprocess: invalid impute {imp!r} for {col_name}")
        c.impute = imp
        sc = ops.get("scale", c.scale)
        if sc not in _VALID_SCALE:
            raise ValueError(f"preprocess: invalid scale {sc!r} for {col_name}")
        c.scale = sc
        # Validation: mean/median imputation is undefined for categoricals
        # unless they become numeric via target encoding.
        if (not c.is_numeric) and c.impute in ("mean", "median") and c.encode != "target":
            raise ValueError(
                f"preprocess: impute {c.impute!r} invalid for categorical "
                f"{col_name!r} unless encode='target' (snapshot.rs:543-556)"
            )


# ---------------------------------------------------------------------------
# Fitting (train-split-only statistics — snapshot.rs:1153-1199)
# ---------------------------------------------------------------------------


def _cat_key(col: str) -> F.Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_CATEGORY))


def fit_categorical(
    train: DataFrame,
    spec: ColumnSpec,
    label_col: str | None,
    order_col: str,
    label_expr: F.Column | None = None,
) -> FittedColumn:
    """Build the category -> value map from the train split only.

    native: first-occurrence order in the sampled train ordering
    (deterministic because the split ordering is seeded); __NULL__ -> 0.
    ordinal: explicit list, 1-based; target: mean label per category
    (NULL category -> overall mean, snapshot.rs:271-274).

    ``label_expr`` is the NUMERIC label expression target encoding
    averages — callers with string class labels pass the label-map
    lookup (a bare cast of 'yes'/'no' to double yields NULL for every
    row and the map build crashed on float(None) — review catch).
    """
    enc = spec.encode or "native"
    key = _cat_key(spec.name)
    if isinstance(enc, dict):  # {"ordinal": [...]}
        values = enc["ordinal"]
        encode_map = {NULL_CATEGORY: 0.0}
        for i, v in enumerate(values):
            encode_map[str(v)] = float(i + 1)
    elif enc == "target":
        if label_expr is None and not label_col:
            raise ValueError(f"target encoding for {spec.name} requires a label")
        y = label_expr if label_expr is not None else F.col(label_col).cast("double")
        rows = (
            train.groupBy(key.alias("k"))
            .agg(F.avg(y).alias("v"))
            .collect()
        )
        overall = train.agg(F.avg(y)).collect()[0][0]
        encode_map = {
            r["k"]: float(r["v"]) if r["v"] is not None else 0.0 for r in rows
        }
        encode_map[NULL_CATEGORY] = float(overall if overall is not None else 0.0)
    else:  # native / one_hot share the first-seen ordinal map
        rows = (
            train.groupBy(key.alias("k"))
            .agg(F.min(F.col(order_col)).alias("first_seen"))
            .orderBy("first_seen")
            .collect()
        )
        encode_map = {NULL_CATEGORY: 0.0}
        nxt = 1.0
        for r in rows:
            if r["k"] not in encode_map:
                encode_map[r["k"]] = nxt
                nxt += 1.0
    return FittedColumn(spec=spec, encode_map=encode_map)


def numeric_stats_exprs(col: str) -> list[F.Column]:
    """Single-pass aggregate expressions for one numeric column.

    NaN values are treated as MISSING throughout (masked to NULL so
    every aggregate ignores them, exactly as it ignores NULLs): a NaN
    entry would otherwise propagate into mean/std, persist
    center=NaN, and turn the whole scaled feature column NaN at
    transform time (review catch); the missing counter counts both
    NULL and NaN, and imputation repairs both at transform."""
    raw = F.col(col).cast("double")
    c = F.when(F.isnan(raw), F.lit(None)).otherwise(raw)
    return [
        F.min(c).alias(f"{col}__min"),
        F.max(c).alias(f"{col}__max"),
        F.max(F.abs(c)).alias(f"{col}__max_abs"),
        F.avg(c).alias(f"{col}__mean"),
        F.variance(c).alias(f"{col}__variance"),
        F.stddev(c).alias(f"{col}__std_dev"),
        F.sum(F.when(raw.isNull() | F.isnan(raw), 1).otherwise(0)).alias(f"{col}__missing"),
        # approx variants: exact count_distinct/percentile need a full
        # shuffle / per-group value materialization — unusable at 100 TB.
        # HLL + QuantileSummaries keep this a single map-side-combined pass.
        F.approx_count_distinct(c).alias(f"{col}__distinct"),
        # accuracy 2000 => ventile rank error <= 1/2000 of the rows —
        # far below what median-impute / metadata consumers can observe,
        # and ~35% cheaper per stats pass than the 10000 it replaced
        # (the sketch update cost scales with the summary size).
        F.percentile_approx(
            c, F.array(*[F.lit((i + 1) / 20.0) for i in range(19)]), 2000
        ).alias(f"{col}__ventiles"),
    ]


def finish_numeric_fit(
    fitted: FittedColumn, stats_row: dict, mode_value: float | None
) -> None:
    col = fitted.spec.name
    g = lambda k: stats_row.get(f"{col}__{k}")
    ventiles = list(g("ventiles") or [])
    stats = {
        "min": g("min"),
        "max": g("max"),
        "max_abs": g("max_abs"),
        "mean": g("mean"),
        "median": ventiles[9] if len(ventiles) == 19 else None,
        "mode": mode_value,
        "variance": g("variance"),
        "std_dev": g("std_dev"),
        "missing": g("missing"),
        "distinct": g("distinct"),
        "ventiles": ventiles,
    }
    fitted.statistics.update(stats)
    spec = fitted.spec
    if spec.impute != "panic":
        fitted.impute_value = {
            "mean": stats["mean"],
            "median": stats["median"],
            "mode": stats["mode"],
            "min": stats["min"],
            "max": stats["max"],
            "zero": 0.0,
        }[spec.impute]
    if spec.scale != "preserve":
        if spec.scale == "standard":
            center, div = stats["mean"], stats["std_dev"]
        elif spec.scale == "min_max":
            center, div = stats["min"], (stats["max"] or 0) - (stats["min"] or 0)
        elif spec.scale == "max_abs":
            center, div = 0.0, stats["max_abs"]
        else:  # robust: (x - median) / (q75 - q25)
            if len(ventiles) == 19:
                center, div = stats["median"], ventiles[14] - ventiles[4]
            else:
                center, div = stats["median"], None
        if not div:  # 0, None or NaN divisor -> no-op divide
            div = 1.0
        if isinstance(div, float) and math.isnan(div):
            div = 1.0
        center = float(center or 0.0)
        if math.isnan(center):  # belt: NaN is truthy, `or` can't catch it
            center = 0.0
        fitted.scale_params = {"center": center, "divisor": float(div)}


# ---------------------------------------------------------------------------
# Transform (expression assembly — serve == train by construction)
# ---------------------------------------------------------------------------


def _apply_impute_scale(c: F.Column, fitted: FittedColumn) -> F.Column:
    if fitted.impute_value is not None:
        iv = F.lit(float(fitted.impute_value))
        c = F.when(c.isNull() | F.isnan(c), iv).otherwise(c)
    if fitted.scale_params is not None:
        c = (c - F.lit(fitted.scale_params["center"])) / F.lit(
            fitted.scale_params["divisor"]
        )
    return c


def transform_columns(df: DataFrame, fitted: FittedColumn) -> tuple[DataFrame, list[str]]:
    """Apply one fitted column transform; returns (df, output feature names).

    Encoded columns join against a broadcast map DataFrame (scales to
    arbitrarily many rows; the map itself is bounded by category count).
    """
    spec = fitted.spec
    name = spec.name
    out_names: list[str] = []

    if spec.is_array:
        width = spec.size
        for i in range(width):
            feat = f"{name}_{i}"
            c = F.flatten(F.col(name))[i] if spec.dtype.count("array") > 1 else F.col(name)[i]
            df = df.withColumn(feat, _apply_impute_scale(c.cast("double"), fitted))
            out_names.append(feat)
        return df, out_names

    if fitted.encode_map is not None and spec.encode != "one_hot":
        spark = df.sparkSession
        map_df = F.broadcast(
            local_rows(
                spark,
                [(k, float(v)) for k, v in fitted.encode_map.items()],
                f"`__qml_k_{name}` string, `__qml_v_{name}` double",
            )
        )
        df = df.join(
            map_df, _cat_key(name) == F.col(f"__qml_k_{name}"), "left"
        ).drop(f"__qml_k_{name}")
        # unseen category -> NaN (snapshot.rs:180-185), then impute/scale
        enc = F.coalesce(F.col(f"__qml_v_{name}"), F.lit(float("nan")))
        df = df.withColumn(name + "__enc", _apply_impute_scale(enc, fitted)).drop(
            f"__qml_v_{name}"
        )
        out_names.append(name + "__enc")
        return df, out_names

    if spec.encode == "one_hot":
        # Reference indicator layout (snapshot.rs:220-245): the category
        # list starts with the __NULL__ slot, then first-seen categories,
        # and emits len(categories)-1 indicators by dropping only the
        # FINAL category — so index 0 is always the "was NULL" indicator
        # and snapshots stay feature-compatible with the reference.
        cats = [NULL_CATEGORY] + sorted(
            (k for k in fitted.encode_map if k != NULL_CATEGORY),
            key=lambda k: fitted.encode_map[k],
        )
        # cats[:-1] UNCONDITIONALLY: an all-null training column has the
        # single category __NULL__ and must emit 0 indicators, matching
        # the reference's encoded_width = len - 1 (snapshot.rs:222).
        for cat in cats[:-1]:
            feat = f"{name}_{cat}"
            c = F.when(_cat_key(name) == F.lit(cat), 1.0).otherwise(0.0)
            df = df.withColumn(feat, _apply_impute_scale(c, fitted))
            out_names.append(feat)
        return df, out_names

    # plain numeric (booleans cast to 0/1)
    feat = f"{name}__f"
    df = df.withColumn(feat, _apply_impute_scale(F.col(name).cast("double"), fitted))
    out_names.append(feat)
    return df, out_names
