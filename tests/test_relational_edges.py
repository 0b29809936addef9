"""Magnitude edge cases for the exact-decimal relational queries.

q28's z-score filter has two distinct hazards at high value magnitude:
true-zero-variance windows passing a float `var > 0` check on
cancellation noise (fixed round 8 with the exact integer identity),
and the CONVERSE — true-positive-variance windows whose FLOAT
`sq - s*s/n` cancels to <= 0, sending sqrt to NaN / z to ±Inf (review
catch). Both engines compute bit-identical doubles, so the float-sign
guard is itself portable; these tests plant both regimes and assert
finite output plus full DuckDB parity.
"""

from __future__ import annotations

import math

from quackml_spark.plans import REGISTRY, _load_all
from quackml_spark.testing import compare, duckdb_connection

_load_all()


def _plant_events(spark, tmp_path, rows):
    d = str(tmp_path / "sf_edge")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def test_q28_high_magnitude_tiny_variance_emits_no_nan_inf(spark, tmp_path):
    """User 1: 30 values of 1e6 + i*1e-6 (true variance > 0 — the exact
    identity passes on all 25 eligible windows — but float sq - s*s/n
    cancels to exactly 0 on 11 of them and NEGATIVE on 6: simulated
    with exact rational arithmetic; only 8 stay float-positive).
    User 2: a normal-magnitude window (must survive untouched).
    The guard must drop the cancellation rows, keep the healthy ones,
    emit only finite z, and stay hash-identical to the DuckDB oracle."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(30):
        rows.append(
            (eid, t0 + datetime.timedelta(minutes=i), 1, "a",
             1e6 + i * 1e-6, "{}")
        )
        eid += 1
    for i in range(30):
        rows.append(
            (eid, t0 + datetime.timedelta(minutes=i), 2, "a",
             float((i * 37) % 11), "{}")
        )
        eid += 1
    d = _plant_events(spark, tmp_path, rows)

    qd = REGISTRY["q28_events_zscore_anomaly"]
    out = qd.builder(spark, d)
    got = out.collect()
    # every emitted z is finite
    for r in got:
        assert r["z"] is not None
        assert math.isfinite(r["z"]), r
    # the healthy user still produces anomaly rows
    users_emitted = {r["event_id"] // 30 for r in got}
    assert 1 in users_emitted  # user 2's event_ids are 30..59 -> //30 == 1
    # user 1 keeps EXACTLY the 8 float-positive windows (the simulated
    # count above): 17 cancellation windows dropped, none NaN/Inf
    assert sum(1 for r in got if r["event_id"] < 30) == 8
    # and the whole result matches the oracle bit-for-bit
    con = duckdb_connection(d)
    ok, msg = compare(out, con, qd.oracle)
    assert ok, msg


def test_q28_zero_variance_window_still_excluded(spark, tmp_path):
    """All-equal windows (true variance exactly zero) stay excluded by
    the exact integer identity regardless of magnitude."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 7, "a", 123456789.5, "{}")
        for i in range(25)
    ]
    d = _plant_events(spark, tmp_path, rows)
    qd = REGISTRY["q28_events_zscore_anomaly"]
    assert qd.builder(spark, d).count() == 0
    con = duckdb_connection(d)
    ok, msg = compare(qd.builder(spark, d), con, qd.oracle)
    assert ok, msg


def test_q18_session_gap_compares_microseconds(spark, tmp_path):
    """A gap of 1800.5 s (floor-second diff exactly 1800) must start a
    NEW session: the oracle compares the exact interval, and the old
    floor-second gap kept the session going — session numbering
    diverged per engine on microsecond-timestamped data (review
    catch). Full DuckDB parity on the planted table."""
    rows = [
        (0, "2024-01-01 10:00:00.100000", 1, "a", 1.0, "{}"),
        (1, "2024-01-01 10:30:00.600000", 1, "a", 1.0, "{}"),  # 1800.5s
        (2, "2024-01-01 10:40:00.000000", 1, "a", 1.0, "{}"),
    ]
    d = _plant_events(spark, tmp_path, [
        (e, __import__("datetime").datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f"),
         u, t, v, pr)
        for e, ts, u, t, v, pr in rows
    ])
    qd = REGISTRY["q18_sessionize_batch"]
    got = qd.builder(spark, d).collect()
    assert len(got) == 2  # the 1800.5s gap split the sessions
    con = duckdb_connection(d)
    ok, msg = compare(qd.builder(spark, d), con, qd.oracle)
    assert ok, msg
