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


def test_categorical_impute_repairs_unseen_categories(spark, tmp_path):
    """A requested impute on an encoded column must actually fit an
    impute_value (it was silently None — fit_categorical never set it)
    so unseen-at-serve categories encode to the imputed value instead
    of NaN, per the module contract (review catch)."""
    import math

    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    df = spark.createDataFrame(
        [("red", 1.0), ("blue", 2.0), ("red", 3.0), ("green", 4.0)] * 5,
        "color string, y double",
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    snap, _, _ = Snapshot.create(
        spark, cat, df, "y", test_size=0.25, test_sampling="random",
        preprocess={"color": {"encode": "native", "impute": "zero"}},
    )
    try:
        fc = next(f for f in snap.fitted if f.spec.name == "color")
        assert fc.impute_value == 0.0
        serve = spark.createDataFrame([("ultraviolet",)], "color string")
        feats = snap.transform(serve, with_label=False).select(
            "features"
        ).collect()[0]["features"]
        assert not math.isnan(feats[0])
        assert feats[0] == 0.0
    finally:
        snap.unpersist()


def test_one_hot_feature_names_match_transform_width(spark, tmp_path):
    """feature_names must mirror transform_columns' indicator layout
    exactly (__NULL__ slot leads, final category dropped) — it used to
    report one name fewer per one_hot column, so num_features metadata
    and any name/feature zip were off by one (review catch)."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0), ("a", 4.0)] * 5,
        "k string, y double",
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    snap, train_df, _ = Snapshot.create(
        spark, cat, df, "y", test_sampling="random",
        preprocess={"k": {"encode": "one_hot"}},
    )
    try:
        out = snap.transform(train_df)
        width = len(out.select("features").first()["features"])
        assert len(snap.feature_names) == width
        assert snap.feature_names[0] == "k___NULL__"
    finally:
        snap.unpersist()


def test_target_encoding_with_string_labels(spark, tmp_path):
    """Target encoding on a classification project with STRING labels
    must average the label-map indices — the bare double cast nulled
    every label and crashed on float(None) (review catch)."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    df = spark.createDataFrame(
        [("paris", "yes"), ("paris", "no"), ("lyon", "yes"), ("lyon", "yes")] * 5,
        "city string, outcome string",
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    snap, _, _ = Snapshot.create(
        spark, cat, df, "outcome", test_sampling="random",
        preprocess={"city": {"encode": "target"}},
        classification_label=True,
    )
    try:
        fc = next(f for f in snap.fitted if f.spec.name == "city")
        # label_map: no -> 0, yes -> 1; means are train-split 'yes'
        # rates — lyon is all-yes, paris is mixed, both must be real
        # numbers in [0, 1] (the old cast nulled every label)
        assert fc.encode_map["lyon"] == 1.0
        assert 0.0 < fc.encode_map["paris"] < 1.0
    finally:
        snap.unpersist()


def test_label_map_covers_test_only_classes(spark, tmp_path):
    """A class whose rows all land in the test split must still be in
    the label_map — it mapped to NULL label and crashed metric
    computation with an unsortable None (review catch)."""
    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    rows = [(float(i), "common") for i in range(30)]
    rows += [(100.0 + i, "rare") for i in range(3)]  # tail -> test under 'last'
    df = spark.createDataFrame(rows, "x double, cls string")
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    snap, _, test_df = Snapshot.create(
        spark, cat, df, "cls", test_size=4, test_sampling="last",
        classification_label=True,
    )
    try:
        assert set(snap.label_map) == {"common", "rare"}
        labels = [
            r["label"] for r in snap.transform(test_df).select("label").collect()
        ]
        assert None not in labels
    finally:
        snap.unpersist()


def test_snapshot_create_failure_releases_cache(spark, tmp_path):
    """Every error path in Snapshot.create must release the split cache
    — a failed fit (here: panic impute on a NULL column) used to leak
    one full-relation cache entry per attempt (review catch)."""
    import pytest as _pytest

    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(1.0, 1.0), (None, 2.0), (3.0, 3.0)] * 5, "x double, y double"
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    with _pytest.raises(ValueError, match="panic"):
        Snapshot.create(spark, cat, df, "y", test_sampling="random")
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "failed Snapshot.create leaked its split cache"
    )


def test_nan_values_treated_as_missing_in_fit(spark, tmp_path):
    """NaN entries must not poison the fitted statistics: with the old
    aggregates avg() propagated NaN into center=NaN and every scaled
    value became NaN silently (review catch). NaN counts as missing,
    imputation repairs it, scaling stats come from the real values."""
    import math

    from quackml_spark.catalog import Catalog
    from quackml_spark.core.snapshot import Snapshot

    df = spark.createDataFrame(
        [(1.0, 1.0), (float("nan"), 2.0), (3.0, 3.0), (2.0, 4.0)] * 5,
        "x double, y double",
    )
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    snap, train_df, _ = Snapshot.create(
        spark, cat, df, "y", test_sampling="random",
        preprocess={"x": {"impute": "mean", "scale": "standard"}},
    )
    try:
        fc = next(f for f in snap.fitted if f.spec.name == "x")
        assert fc.impute_value is not None and math.isfinite(fc.impute_value)
        assert math.isfinite(fc.scale_params["center"])
        assert fc.statistics["missing"] > 0
        feats = [
            r["features"][0]
            for r in snap.transform(train_df).select("features").collect()
        ]
        assert all(math.isfinite(v) for v in feats)
    finally:
        snap.unpersist()
