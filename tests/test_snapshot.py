from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quackml_spark.catalog import Catalog
from quackml_spark.core.snapshot import Snapshot


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def mixed_df(spark):
    # categorical_mixed fixture (FIXTURES.md §1.7)
    rows = []
    colors = ["red", "green", "blue", None]
    for i in range(200):
        rows.append(
            (
                i,
                colors[i % 4],
                ["S", "M", "L"][i % 3],
                float(i % 10) if i % 7 else None,
                float(i),
                bool(i % 2),
                float(i % 5),
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, color string, size_ord string, num_missing double, "
        "scaled double, flag boolean, label double",
    )


def test_split_counts(spark, catalog, mixed_df):
    snap, train, test = Snapshot.create(
        spark, catalog, mixed_df.drop("num_missing"), "label", test_size=0.25,
        test_sampling="random",
    )
    assert snap.num_rows == 200
    assert snap.num_train_rows == 150 and snap.num_test_rows == 50
    assert train.count() == 150 and test.count() == 50


def test_stratified_split_balances_classes(spark, catalog, mixed_df):
    snap, train, test = Snapshot.create(
        spark, catalog, mixed_df.drop("num_missing"), "label",
        test_size=0.25, test_sampling="stratified",
    )
    per_class = {r["label"]: r["count"] for r in train.groupBy("label").count().collect()}
    assert all(abs(v - 30) <= 1 for v in per_class.values()), per_class


def test_encode_impute_scale(spark, catalog, mixed_df):
    snap, train, test = Snapshot.create(
        spark,
        catalog,
        mixed_df,
        "label",
        test_size=0.25,
        preprocess={
            "color": {"encode": "native"},
            "size_ord": {"encode": {"ordinal": ["S", "M", "L"]}},
            "num_missing": {"impute": "mean"},
            "scaled": {"scale": "standard"},
        },
    )
    by_name = {fc.spec.name: fc for fc in snap.fitted}
    assert by_name["color"].encode_map["__NULL__"] == 0.0
    assert set(by_name["color"].encode_map.values()) == {0.0, 1.0, 2.0, 3.0}
    assert by_name["size_ord"].encode_map == {
        "__NULL__": 0.0, "S": 1.0, "M": 2.0, "L": 3.0,
    }
    assert by_name["num_missing"].impute_value is not None
    assert by_name["scaled"].scale_params is not None

    out = snap.transform(train)
    feats = out.select("features").first()["features"]
    assert len(feats) == len(snap.feature_names)
    assert not any(v is None for v in feats)
    # imputation removed the NaNs from num_missing
    n_nan = out.where(F.isnan(F.col("num_missing__f"))).count()
    assert n_nan == 0


def test_unseen_category_is_nan(spark, catalog, mixed_df):
    snap, train, test = Snapshot.create(
        spark, catalog, mixed_df.drop("num_missing"), "label",
        preprocess={"color": {"encode": "native"}},
    )
    serve = spark.createDataFrame(
        [(1, "chartreuse", "S", 0.0, True, 1.0)],
        "id long, color string, size_ord string, scaled double, flag boolean, label double",
    )
    out = snap.transform(serve).select("color__enc").first()
    assert math.isnan(out["color__enc"])


def test_target_encoding_uses_train_means(spark, catalog, mixed_df):
    snap, train, test = Snapshot.create(
        spark, catalog, mixed_df.drop("num_missing"), "label",
        preprocess={"color": {"encode": "target"}},
    )
    fc = next(f for f in snap.fitted if f.spec.name == "color")
    assert "__NULL__" in fc.encode_map
    assert all(0 <= v <= 4 for v in fc.encode_map.values())


def test_panic_impute_raises(spark, catalog, mixed_df):
    with pytest.raises(ValueError, match="missing"):
        Snapshot.create(spark, catalog, mixed_df, "label")


def test_label_null_raises(spark, catalog):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 1.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="NULL"):
        Snapshot.create(spark, catalog, df, "y")


def test_array_flattening_and_width_check(spark, catalog):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], 0.0), ([4.0, 5.0, 6.0], 1.0)] * 10,
        "image array<double>, target double",
    )
    snap, train, test = Snapshot.create(spark, catalog, df, "target", test_size=0.2)
    assert snap.feature_names == ["image_0", "image_1", "image_2"]
    bad = spark.createDataFrame(
        [([1.0], 0.0), ([1.0, 2.0], 1.0)] * 10, "image array<double>, target double"
    )
    with pytest.raises(ValueError, match="width"):
        Snapshot.create(spark, catalog, bad, "target", test_size=0.2)


def test_string_label_map_roundtrip(spark, catalog):
    df = spark.createDataFrame(
        [(float(i), ["cat", "dog"][i % 2]) for i in range(40)], "x double, y string"
    )
    snap, train, test = Snapshot.create(spark, catalog, df, "y", test_size=0.25)
    assert snap.label_map == {"cat": 0.0, "dog": 1.0}
    out = snap.transform(train)
    assert set(r["label"] for r in out.select("label").distinct().collect()) == {0.0, 1.0}
    preds = out.withColumn("prediction", F.col("label"))
    back = snap.inverse_label(preds)
    assert set(
        r["prediction_label"] for r in back.select("prediction_label").distinct().collect()
    ) == {"cat", "dog"}


def test_snapshot_persist_and_load(spark, catalog, mixed_df):
    snap, _, _ = Snapshot.create(
        spark, catalog, mixed_df.drop("num_missing"), "label",
        preprocess={"color": {"encode": "native"}, "scaled": {"scale": "min_max"}},
    )
    loaded = Snapshot.load(catalog, snap.id)
    assert loaded.feature_names == snap.feature_names
    assert loaded.num_train_rows == snap.num_train_rows
    fc = next(f for f in loaded.fitted if f.spec.name == "color")
    assert fc.encode_map["__NULL__"] == 0.0


def test_last_sampling_split_has_no_shuffle(spark, catalog):
    """SCALE.md rule 1: the 'last' split ranks in natural order —
    no range repartition, no exchange on the data path."""
    import pandas as pd

    from quackml_spark.core.snapshot import Snapshot

    df = spark.createDataFrame(
        pd.DataFrame({"x": range(100), "y": [float(i) for i in range(100)]})
    )
    snap, train_df, _ = Snapshot.create(
        spark, catalog, df, "y", test_size=0.2, test_sampling="last"
    )
    train_df.count()
    plan = train_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    snap.unpersist()


def test_one_hot_all_null_column_emits_zero_indicators(spark, catalog):
    """ADVICE r02: a one_hot column whose training values are ALL NULL
    has the single category __NULL__ and must emit 0 indicator features
    (reference encoded_width = len(categories) - 1, snapshot.rs:222),
    not 1 — feature width must match the reference exactly."""
    import pandas as pd

    from quackml_spark.core.snapshot import Snapshot

    pdf = pd.DataFrame(
        {
            "num": [float(i) for i in range(8)],
            "cat": [None] * 8,
            "y": [float(2 * i) for i in range(8)],
        }
    )
    df = spark.createDataFrame(pdf)
    snap, train_df, _ = Snapshot.create(
        spark,
        catalog,
        df,
        "y",
        test_size=0.25,
        test_sampling="last",
        preprocess={"cat": {"encode": "one_hot"}},
    )
    assert snap.feature_names == ["num__f"], snap.feature_names
    out = snap.transform(train_df)
    assert [c for c in out.columns if c.startswith("cat_")] == []
