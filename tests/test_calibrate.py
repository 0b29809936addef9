"""Probability calibration: isotonic/Platt fits, expression-vs-Python
serving parity, monotonicity, and Brier improvement on a known
miscalibration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackml_spark.ml.calibrate import (
    brier_score,
    calibrate_expr,
    calibrate_py,
    fit_isotonic,
    fit_platt,
)


@pytest.fixture(scope="module")
def miscalibrated(spark):
    """Scores p in (0,1) whose TRUE event rate is p^2 — systematically
    overconfident at the top, underconfident nowhere; deterministic
    labels via an md5 draw so the fit is reproducible."""
    n = 4000
    df = spark.range(n).select(
        (F.col("id") % 100 / 100.0 + 0.005).alias("probability"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 1000000
            / 1000000.0
        ).alias("__u"),
    )
    return df.withColumn(
        "label",
        (F.col("__u") < F.col("probability") * F.col("probability")).cast("double"),
    ).drop("__u")


def test_isotonic_improves_brier_and_is_monotone(spark, miscalibrated):
    calib = fit_isotonic(miscalibrated)
    before = brier_score(miscalibrated)
    after = brier_score(
        miscalibrated.withColumn("probability", calibrate_expr(calib))
    )
    assert after < before, (after, before)
    ys = calib["predictions"]
    assert all(a <= b + 1e-12 for a, b in zip(ys, ys[1:]))  # monotone
    # calibrated top-of-range lands near the true p^2 rate, not near p
    assert abs(calibrate_py(calib, 0.9) - 0.81) < 0.12


def test_platt_improves_brier(spark, miscalibrated):
    calib = fit_platt(miscalibrated)
    before = brier_score(miscalibrated)
    after = brier_score(
        miscalibrated.withColumn("probability", calibrate_expr(calib))
    )
    assert after < before


def test_expr_matches_python_twin(spark, miscalibrated):
    for calib in (fit_isotonic(miscalibrated), fit_platt(miscalibrated)):
        rows = (
            miscalibrated.select(
                "probability", calibrate_expr(calib).alias("c")
            )
            .limit(500)
            .collect()
        )
        for r in rows:
            assert abs(r["c"] - calibrate_py(calib, r["probability"])) < 1e-9


def test_calibrate_expr_is_streaming_legal(spark, miscalibrated, tmp_path):
    """Pure-literal expression: applies to a file stream with no model
    object (the portability contract)."""
    from quackml_spark.streaming.events import run_to_completion

    calib = fit_isotonic(miscalibrated)
    src = tmp_path / "src"
    miscalibrated.limit(50).write.parquet(str(src))
    stream = spark.readStream.schema("probability double, label double").parquet(
        str(src)
    )
    out = run_to_completion(
        stream.withColumn("calibrated", calibrate_expr(calib)),
        "qml_calib_stream",
        output_mode="append",
    )
    got = {r["probability"]: r["calibrated"] for r in out.collect()}
    for p, c in got.items():
        assert abs(c - calibrate_py(calib, p)) < 1e-9
