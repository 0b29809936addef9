"""Snapshots: frozen training data + schema + statistics + preprocessing.

Parity with /root/reference/src/orm/snapshot.rs:

  * create: capture column schema, parse/validate preprocess spec, apply
    the sampling strategy, cut train/test deterministically (head=train,
    tail=test after the sampled ordering — snapshot.rs:1272-1286), compute
    per-column statistics on the TRAIN split only (snapshot.rs:1153-1199),
    fit encode/impute/scale parameters, persist everything as JSON in the
    catalog (snapshot.rs:590-653).
  * The reference materializes the whole relation into driver memory as a
    row-major f32 matrix (snapshot.rs:1254-1473). We keep the data
    distributed: ``transform()`` rebuilds the feature columns lazily on
    any DataFrame — train, test, or serve-time input — from the frozen
    JSON parameters, so serve-time preprocessing replays train-time
    preprocessing exactly (predict_row parity, api.rs:1017-1058).

Scale notes: the sampled ordering reproduces the reference's exact
head/tail cut semantics WITHOUT a single-partition global sort. We
range-partition on the sampling key, sort within partitions, and
reconstruct the exact global rank as partition-offset + local position
(decomposed from monotonically_increasing_id); offsets come from one
tiny per-partition count aggregate. Every stage is distributed — the
same pattern holds on a 1000-executor cluster, where a
``Window.orderBy`` global row_number would funnel all rows through one
task.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.catalog import Catalog, Sampling
from quackml_spark.session import local_rows
from quackml_spark.core.preprocess import (
    ColumnSpec,
    FittedColumn,
    fit_categorical,
    finish_numeric_fit,
    numeric_stats_exprs,
    parse_preprocess_spec,
    transform_columns,
)

ORDER_COL = "__qml_ord"


def _column_specs(df: DataFrame, y_columns: list[str]) -> list[ColumnSpec]:
    specs = []
    for i, f_ in enumerate(df.schema.fields):
        specs.append(
            ColumnSpec(
                name=f_.name,
                dtype=f_.dataType.simpleString(),
                nullable=f_.nullable,
                position=i + 1,
                is_label=f_.name in y_columns,
            )
        )
    known = {s.name for s in specs}
    missing = [y for y in y_columns if y not in known]
    if missing:
        raise ValueError(f"y_column_name {missing} not in relation columns {sorted(known)}")
    return specs


_KEY = "__qml_key"
_MID = "__qml_mid"
_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: pid<<33 | row-in-partition


def _ordered(
    df: DataFrame, sampling: Sampling, y_columns: list[str], seed: int
) -> tuple[DataFrame, int, DataFrame]:
    """Attach the reference's sampled ordering as an exact global rank.

    Two-phase distributed ranking: range-partition on the sampling key,
    sort within partitions, then global rank = partition offset + local
    position (decomposed from monotonically_increasing_id). Returns the
    ranked, CACHED DataFrame and the total row count (free from the
    offset aggregate). No single-partition window anywhere.
    """
    if sampling == Sampling.random:
        # ORDER BY RANDOM() (sampling.rs:48-50), seeded for determinism.
        df = df.withColumn(_KEY, F.rand(seed))
    elif sampling == Sampling.last:
        # plain SELECT * — natural order (sampling.rs:51-53); the natural
        # order IS monotonically_increasing_id order, so no shuffle at all.
        df = df.withColumn(_KEY, F.monotonically_increasing_id())
    else:
        # stratified round-robin (sampling.rs:54-68): rn is the per-class
        # round index; rand(seed+1) in [0,1) tie-breaks between classes,
        # so rn + rand sorts exactly like ORDER BY (rn, RANDOM()).
        w = Window.partitionBy(*[F.col(c) for c in y_columns]).orderBy(F.rand(seed))
        df = df.withColumn("__qml_rn", F.row_number().over(w))
        df = df.withColumn(_KEY, F.col("__qml_rn") + F.rand(seed + 1)).drop("__qml_rn")
    if sampling != Sampling.last:
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        df = df.repartitionByRange(n_part, F.col(_KEY)).sortWithinPartitions(_KEY)
    # `cached` is the handle callers must unpersist: the returned frame
    # is a DERIVED plan over it, and unpersist() on a derived plan is a
    # silent no-op (Spark uncaches only the exact cached plan) — before
    # this, EVERY Snapshot.create leaked one cached relation per call,
    # success or failure (caught by the create-failure cache test)
    cached = df.withColumn(_MID, F.monotonically_increasing_id()).cache()
    df = cached

    # one tiny aggregate: rows per physical partition → cumulative
    # offsets; label NULL counts piggyback on the same pass (the
    # reference errors on NULL labels during analyze, snapshot.rs:297-299)
    pid = F.shiftright(_MID, 33)
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col(y).isNull(), 1).otherwise(0)).alias(f"__nl_{i}")
        for i, y in enumerate(y_columns)
    ]
    rows = df.groupBy(pid.alias("p")).agg(*aggs).collect()
    for i, y in enumerate(y_columns):
        if sum(int(r[f"__nl_{i}"] or 0) for r in rows):
            raise ValueError(
                f"label column {y!r} contains NULL values; filter them "
                f"first, e.g. WHERE {y} IS NOT NULL"
            )
    counts = sorted((r["p"], r["n"]) for r in rows)
    offsets, acc = {}, 0
    for p, n in counts:
        offsets[p] = acc
        acc += n
    off_expr = F.create_map(
        *[F.lit(x) for p_off in offsets.items() for x in p_off]
    )[pid] if offsets else F.lit(0)
    df = df.withColumn(
        ORDER_COL, off_expr + F.col(_MID).bitwiseAND(F.lit(_MID_MASK)) + 1
    ).drop(_KEY, _MID)
    return df, acc, cached


def _cat_impute_value(train: DataFrame, fc, s) -> float:
    """Impute value for an ENCODED categorical column, computed over the
    encoded train values — before this, fit_categorical never set
    impute_value, so a requested impute on an encoded column was a
    silent no-op and unseen-at-serve categories stayed NaN instead of
    being repaired, contradicting the module contract (review catch).
    Runs only when the user opted into an impute strategy."""
    from quackml_spark.core.preprocess import transform_columns

    if s.impute == "zero":
        return 0.0
    enc_df, enc_names = transform_columns(train.select(s.name), fc)
    c = F.col(enc_names[0])
    valid = enc_df.where(c.isNotNull() & ~F.isnan(c))
    if s.impute == "mode":
        row = (
            valid.groupBy(c.alias("v"))
            .count()
            .orderBy(F.desc("count"), F.asc("v"))
            .first()
        )
        return float(row["v"]) if row else 0.0
    if s.impute == "median":
        row = valid.agg(F.percentile_approx(c, 0.5, 2000).alias("v")).first()
    else:
        agg = {"mean": F.avg, "min": F.min, "max": F.max}[s.impute]
        row = valid.agg(agg(c).alias("v")).first()
    return float(row["v"]) if row and row["v"] is not None else 0.0


@dataclass
class Snapshot:
    id: int
    catalog: Catalog
    fitted: list[FittedColumn]
    y_columns: list[str]
    label_map: dict[str, float] | None  # raw label value (as str) -> 0-based index
    num_rows: int
    num_train_rows: int
    num_test_rows: int

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        catalog: Catalog,
        relation: str | DataFrame,
        y_column_name: str | list[str] | None,
        test_size: float = 0.25,
        test_sampling: str | Sampling = Sampling.stratified,
        preprocess: dict | None = None,
        materialize: bool = False,
        seed: int = 42,
        classification_label: bool = False,
    ) -> tuple["Snapshot", DataFrame, DataFrame]:
        """Create a snapshot; returns (snapshot, train_df, test_df)."""
        if isinstance(relation, str):
            df = spark.table(relation)
            relation_name = relation
        else:
            df = relation
            relation_name = "<dataframe>"
        y_columns = (
            [y_column_name]
            if isinstance(y_column_name, str)
            else list(y_column_name or [])
        )
        sampling = Sampling(test_sampling)
        specs = _column_specs(df, y_columns)
        parse_preprocess_spec(preprocess, specs)

        # label-NULL validation happens inside _ordered's counts pass
        ordered, num_rows, split_cache = _ordered(df, sampling, y_columns, seed)
        # every error path below must release the split cache _ordered
        # just pinned — before this guard a failed fit (panic impute,
        # width mismatch, catalog conflict) leaked one full-relation
        # cache entry per attempt for the session lifetime (review catch)
        try:
            num_test = int(test_size) if test_size > 1.0 else round(num_rows * test_size)
            num_train = num_rows - num_test
            if num_train <= 0:
                raise ValueError(
                    f"test_size {test_size} leaves no training rows (n={num_rows})"
                )
            train = ordered.where(F.col(ORDER_COL) <= num_train)
            test = ordered.where(F.col(ORDER_COL) > num_train)

            # --- fit feature columns (train split only) ---
            fitted: list[FittedColumn] = []
            label_col = y_columns[0] if y_columns else None

            # array width discovery (size fixed by first row, snapshot.rs:1497-1507)
            for s in specs:
                if s.is_array and not s.is_label:
                    flat = (
                        F.size(F.flatten(F.col(s.name)))
                        if s.dtype.count("array") > 1
                        else F.size(F.col(s.name))
                    )
                    first = train.where(F.col(s.name).isNotNull()).select(
                        flat.alias("w")
                    ).first()
                    if first is None:
                        raise ValueError(f"array column {s.name} is all NULL")
                    s.size = int(first["w"])
                    bad = train.where(F.col(s.name).isNotNull() & (flat != s.size)).count()
                    if bad:
                        raise ValueError(
                            f"array column {s.name}: {bad} rows deviate from the "
                            f"first-row width {s.size} (snapshot.rs:1497-1507 semantics)"
                        )

            numeric_feats = [
                s for s in specs if (not s.is_label) and s.is_numeric and s.encode is None and not s.is_array
            ]
            cat_feats = [
                s for s in specs if (not s.is_label) and (s.is_categorical) and not s.is_array
            ]
            array_feats = [s for s in specs if (not s.is_label) and s.is_array]

            stats_row: dict = {}
            if numeric_feats:
                exprs = []
                for s in numeric_feats:
                    exprs.extend(numeric_stats_exprs(s.name))
                stats_row = train.agg(*exprs).collect()[0].asDict()

            for s in numeric_feats:
                fc = FittedColumn(spec=s)
                mode_value = None
                if s.impute == "mode":
                    mv = F.col(s.name).cast("double")
                    mode_row = (
                        # NaN is missing (like NULL): it must never win
                        # the mode and become the imputed value
                        train.where(mv.isNotNull() & ~F.isnan(mv))
                        .groupBy(mv.alias("v"))
                        .count()
                        .orderBy(F.desc("count"), F.asc("v"))
                        .first()
                    )
                    mode_value = mode_row["v"] if mode_row else None
                finish_numeric_fit(fc, stats_row, mode_value)
                if fc.statistics.get("missing") and s.impute == "panic":
                    raise ValueError(
                        f"column {s.name!r} has {fc.statistics['missing']} missing "
                        f"values and impute='panic'; set a preprocess impute "
                        f"strategy or filter NULLs"
                    )
                fitted.append(fc)

            # --- label handling (BEFORE categorical fitting: target
            # encoding with a string class label needs the label-map
            # lookup, not a cast that nulls every row) ---
            label_map = None
            if label_col is not None:
                lspec = next(sp for sp in specs if sp.name == label_col)
                if classification_label or not lspec.is_numeric:
                    # distinct over the FULL relation, not the train
                    # split: a rare class whose rows all land in the
                    # test split would otherwise map to NULL label and
                    # crash metric computation with an unsortable None
                    # (review catch; same map when both splits share
                    # the class set, so existing fits are unchanged)
                    vals = [
                        r["v"]
                        for r in ordered.select(
                            F.col(label_col).cast("string").alias("v")
                        )
                        .distinct()
                        .orderBy("v")
                        .collect()
                    ]
                    label_map = {v: float(i) for i, v in enumerate(vals)}

            label_expr = None
            if label_col is not None:
                if label_map:
                    label_expr = F.create_map(
                        *[F.lit(x) for kv in label_map.items() for x in kv]
                    )[F.col(label_col).cast("string")]
                else:
                    label_expr = F.col(label_col).cast("double")

            for s in cat_feats:
                fc = fit_categorical(
                    train, s, label_col, ORDER_COL, label_expr=label_expr
                )
                if s.impute != "panic" and s.encode != "one_hot":
                    fc.impute_value = _cat_impute_value(train, fc, s)
                fitted.append(fc)

            for s in array_feats:
                fc = FittedColumn(spec=s)
                fitted.append(fc)

            # --- persist ---
            columns_json = [fc.to_json() for fc in fitted]
            analysis = {
                "num_rows": num_rows,
                "num_train_rows": num_train,
                "num_test_rows": num_test,
                "label_map": label_map,
                "y_columns": y_columns,
                "seed": seed,
            }
            snap_id = catalog.insert(
                "snapshots",
                {
                    "relation_name": relation_name,
                    "y_column_name": json.dumps(y_columns),
                    "test_size": float(test_size),
                    "test_sampling": sampling.value,
                    "status": "successful",
                    "columns": json.dumps(columns_json),
                    "analysis": json.dumps(analysis),
                    "materialized_path": None,
                },
            )
            snap = cls(
                id=snap_id,
                catalog=catalog,
                fitted=fitted,
                y_columns=y_columns,
                label_map=label_map,
                num_rows=num_rows,
                num_train_rows=num_train,
                num_test_rows=num_test,
            )
            snap._cached = split_cache  # unpersist() releases the split cache
            if materialize:
                path = catalog.snapshot_dir(snap_id)
                train.write.mode("overwrite").parquet(path + "/train")
                test.write.mode("overwrite").parquet(path + "/test")
                catalog.update("snapshots", snap_id, {"materialized_path": path})
                train = spark.read.parquet(path + "/train")
                test = spark.read.parquet(path + "/test")
            return snap, train, test
        except BaseException:
            split_cache.unpersist()
            raise

    def unpersist(self) -> None:
        """Release the cached split (call when training is done)."""
        cached = getattr(self, "_cached", None)
        if cached is not None:
            cached.unpersist()
            self._cached = None

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, catalog: Catalog, snapshot_id: int) -> "Snapshot":
        row = catalog.get("snapshots", snapshot_id)
        if row is None:
            raise KeyError(f"snapshot {snapshot_id} not found")
        fitted = [FittedColumn.from_json(d) for d in json.loads(row["columns"])]
        analysis = json.loads(row["analysis"])
        return cls(
            id=snapshot_id,
            catalog=catalog,
            fitted=fitted,
            y_columns=analysis["y_columns"],
            label_map=analysis.get("label_map"),
            num_rows=analysis["num_rows"],
            num_train_rows=analysis["num_train_rows"],
            num_test_rows=analysis["num_test_rows"],
        )

    # ------------------------------------------------------------------
    @property
    def feature_names(self) -> list[str]:
        names = []
        for fc in self.fitted:
            s = fc.spec
            if s.is_array:
                names.extend(f"{s.name}_{i}" for i in range(s.size))
            elif s.encode == "one_hot":
                # EXACTLY transform_columns' indicator layout: the
                # __NULL__ slot leads and only the FINAL category is
                # dropped. The earlier k-1 non-null list under-counted
                # by one per one_hot column (num_features metadata too
                # small, name/feature zips shifted — review catch).
                cats = ["__NULL__"] + sorted(
                    (k for k in fc.encode_map if k != "__NULL__"),
                    key=lambda k: fc.encode_map[k],
                )
                names.extend(f"{s.name}_{c}" for c in cats[:-1])
            elif fc.encode_map is not None:
                names.append(f"{s.name}__enc")
            else:
                names.append(f"{s.name}__f")
        return names

    def transform(self, df: DataFrame, with_label: bool = True) -> DataFrame:
        """Apply the frozen preprocessing; adds ``features`` array<double>
        (+ ``label`` double when requested and present)."""
        out_names: list[str] = []
        for fc in self.fitted:
            df, names = transform_columns(df, fc)
            out_names.extend(names)
        df = df.withColumn("features", F.array(*[F.col(n) for n in out_names]))
        if with_label and self.y_columns:
            y = self.y_columns[0]
            if y in df.columns:
                if self.label_map:
                    spark = df.sparkSession
                    map_df = F.broadcast(
                        local_rows(
                            spark,
                            [(k, v) for k, v in self.label_map.items()],
                            "__qml_lk string, __qml_lv double",
                        )
                    )
                    df = (
                        df.join(
                            map_df,
                            F.col(y).cast("string") == F.col("__qml_lk"),
                            "left",
                        )
                        .withColumn("label", F.col("__qml_lv"))
                        .drop("__qml_lk", "__qml_lv")
                    )
                else:
                    df = df.withColumn("label", F.col(y).cast("double"))
            if len(self.y_columns) > 1:
                df = df.withColumn(
                    "labels",
                    F.array(*[F.col(c).cast("double") for c in self.y_columns]),
                )
        return df

    def inverse_label(self, df: DataFrame, pred_col: str = "prediction") -> DataFrame:
        """Map 0-based class indices back to original label values."""
        if not self.label_map:
            return df
        spark = df.sparkSession
        inv = F.broadcast(
            local_rows(
                spark,
                [(v, k) for k, v in self.label_map.items()],
                "__qml_iv double, __qml_ik string",
            )
        )
        return (
            df.join(inv, F.col(pred_col) == F.col("__qml_iv"), "left")
            .withColumn(pred_col + "_label", F.col("__qml_ik"))
            .drop("__qml_iv", "__qml_ik")
        )
