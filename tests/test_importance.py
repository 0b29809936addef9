"""Permutation feature importance: exact-permutation semantics +
signal/noise separation through the deployed-model serve path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_permuted_column_is_exact_permutation(spark):
    from quackml_spark.ml.importance import permuted_column

    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(500)], "id long, v double"
    )
    p = permuted_column(df, "v", "id", seed=1)
    vals = sorted(r["v"] for r in p.collect())
    assert vals == sorted(float(i * 10) for i in range(500))
    moved = p.where(F.col("v") != F.col("id") * 10.0).count()
    assert moved > 400  # a real shuffle, not near-identity


def test_permuted_column_partitioning_independent(spark):
    from quackml_spark.ml.importance import permuted_column

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(300)], "id long, v double"
    )
    a = {
        r["id"]: r["v"]
        for r in permuted_column(df.repartition(3), "v", "id").collect()
    }
    b = {
        r["id"]: r["v"]
        for r in permuted_column(df.repartition(17), "v", "id").collect()
    }
    assert a == b


def test_permutation_importance_separates_signal_from_noise(spark, sf_dir, tmp_path):
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train
    from quackml_spark.ml.importance import permutation_importance
    from quackml_spark.sources import load_table

    catalog = Catalog(warehouse=str(tmp_path / "wh"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_tax").cast("double").alias("noise"),
        (F.col("l_quantity").cast("double") * 2 + 3).alias("y"),
    )
    train(
        spark,
        "pi project",
        task="regression",
        df=li,
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
    )
    imp = {
        r["feature"]: r["importance"]
        for r in permutation_importance(
            li, "pi project", "y", ["q", "noise"], catalog=catalog, metric="rmse"
        ).collect()
    }
    assert imp["q"] > 1.0  # permuting the only real feature wrecks rmse
    assert abs(imp["noise"]) < 1e-6  # zero-coefficient feature is inert


def test_donor_mapping_rejects_duplicate_ids(spark):
    """Round-7 advice: duplicate ids would collide on the md5 priority
    and silently fan out through the shuffle_pos/donor joins, biasing
    both metrics — the documented uniqueness contract must fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from quackml_spark.ml.importance import permuted_column

    df = spark.range(0, 10).select(
        (F.col("id") % 5).alias("rid"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="UNIQUE"):
        permuted_column(df, "v", id_col="rid")


def test_psi_raises_on_empty_window_instead_of_fake_drift(spark):
    """A feature with ZERO rows in one window must raise — 0/0 is NULL,
    greatest() skips NULLs, and every bin rate floored to eps, so PSI
    read ~13.8 (fake extreme drift that would fire auto-rollback on
    every batch — review catch). The KS twin already raises."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from quackml_spark.ml.monitor import feature_drift_psi

    rows = [(float(i % 7), True) for i in range(50)]  # current only
    rows += [(None, False)] * 20                      # reference all-NULL
    df = spark.createDataFrame(rows, "x double, win boolean")
    with _pytest.raises(Exception, match="zero rows in one window"):
        feature_drift_psi(df, ["x"], F.col("win")).collect()
