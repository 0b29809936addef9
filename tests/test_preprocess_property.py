"""Property-based preprocessor parity (SURVEY.md §5 item 5).

Hypothesis generates small frames (nulls, repeated categories, constant
columns, ...) and a random encode x impute x scale combination; the
Spark pipeline (Snapshot.create + transform) must match an independent
numpy re-implementation of the reference semantics
(snapshot.rs:93-132, 180-276, 1288-1331):

  * native/ordinal/one_hot maps, __NULL__ -> 0, unseen -> NaN
  * target encode: mean label per category, NULL -> overall mean
  * impute after encode; scale only for plain numeric columns
  * sampling='last' -> train = first num_train rows in natural order

Kept exactly mirrorable: impute median/mode and scale robust use
rank-based statistics whose approx implementations are not bit-stable
to re-derive, so the property covers mean/min/max/zero + preserve/
standard/min_max/max_abs (median/mode/robust are covered by the
example-based tests in test_snapshot.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quackml_spark.core.snapshot import ORDER_COL, Snapshot

@pytest.fixture(scope="module")
def catalog():
    import tempfile

    from quackml_spark.catalog import Catalog

    return Catalog(warehouse=tempfile.mkdtemp(prefix="qml_prop_"))


NUM_IMPUTES = ["zero", "mean", "min", "max"]
SCALES = ["preserve", "standard", "min_max", "max_abs"]
ENCODES = ["native", "target", "one_hot", {"ordinal": ["a", "b", "c", "d"]}]


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=8, max_value=24))
    num = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
            min_size=n,
            max_size=n,
        )
    )
    cat = draw(
        st.lists(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"])),
            min_size=n,
            max_size=n,
        )
    )
    y = draw(st.lists(st.integers(min_value=0, max_value=9), min_size=n, max_size=n))
    impute = draw(st.sampled_from(NUM_IMPUTES))
    scale = draw(st.sampled_from(SCALES))
    encode = draw(st.sampled_from(ENCODES))
    return num, cat, y, impute, scale, encode


def _np_numeric(train_vals, all_vals, impute, scale):
    """Reference semantics for a plain numeric column, in numpy."""
    tr = np.array([float(v) if v is not None else np.nan for v in train_vals])
    x = np.array([float(v) if v is not None else np.nan for v in all_vals])
    nn = tr[~np.isnan(tr)]
    stats = {
        "mean": float(nn.mean()) if len(nn) else None,
        "min": float(nn.min()) if len(nn) else None,
        "max": float(nn.max()) if len(nn) else None,
        "max_abs": float(np.abs(nn).max()) if len(nn) else None,
        "std": float(nn.std(ddof=1)) if len(nn) > 1 else None,
    }
    iv = {"zero": 0.0, "mean": stats["mean"], "min": stats["min"], "max": stats["max"]}[
        impute
    ]
    if iv is not None:
        x = np.where(np.isnan(x), iv, x)
    if scale != "preserve":
        if scale == "standard":
            center, div = stats["mean"], stats["std"]
        elif scale == "min_max":
            center, div = stats["min"], (stats["max"] or 0) - (stats["min"] or 0)
        else:  # max_abs
            center, div = 0.0, stats["max_abs"]
        if not div or (isinstance(div, float) and math.isnan(div)):
            div = 1.0
        x = (x - (center or 0.0)) / div
    return x


def _np_categorical(train_cats, all_cats, train_y, encode):
    """Reference semantics for the categorical column, in numpy.

    Returns a 2-D array (n, n_features)."""
    keys = ["__NULL__" if c is None else c for c in all_cats]
    tkeys = ["__NULL__" if c is None else c for c in train_cats]
    if isinstance(encode, dict):
        emap = {"__NULL__": 0.0}
        for i, v in enumerate(encode["ordinal"]):
            emap[v] = float(i + 1)
        return np.array([[emap.get(k, np.nan)] for k in keys])
    if encode == "target":
        y = np.array(train_y, dtype=float)
        emap = {}
        for k in set(tkeys):
            emap[k] = float(y[[i for i, t in enumerate(tkeys) if t == k]].mean())
        emap["__NULL__"] = float(y.mean())
        return np.array([[emap.get(k, np.nan)] for k in keys])
    # native / one_hot: first-seen order over the train split
    emap = {"__NULL__": 0.0}
    nxt = 1.0
    for k in tkeys:
        if k not in emap:
            emap[k] = nxt
            nxt += 1.0
    if encode == "native":
        return np.array([[emap.get(k, np.nan)] for k in keys])
    # reference layout: __NULL__ slot first, drop only the final category
    cats = ["__NULL__"] + sorted(
        (k for k in emap if k != "__NULL__"), key=lambda k: emap[k]
    )
    # unconditional drop: an all-null column ([__NULL__] only) emits 0
    # indicators, matching reference encoded_width = len - 1
    kept = cats[:-1]
    return np.array([[1.0 if k == c else 0.0 for c in kept] for k in keys])


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(frames())
def test_preprocess_matches_numpy(spark, catalog, data):
    num, cat, y, impute, scale, encode = data
    n = len(num)
    pdf = pd.DataFrame(
        {
            "num": pd.array(num, dtype="Int64"),
            "cat": cat,
            "y": y,
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
        preprocess={
            "num": {"impute": impute, "scale": scale},
            "cat": {"encode": encode},
        },
    )
    num_train = snap.num_train_rows
    out = (
        snap.transform(train_df)
        .select(ORDER_COL, "features")
        .orderBy(ORDER_COL)
        .collect()
    )
    got = np.array([r["features"] for r in out], dtype=float)

    exp_num = _np_numeric(num[:num_train], num[:num_train], impute, scale)
    exp_cat = _np_categorical(cat[:num_train], cat[:num_train], y[:num_train], encode)
    exp = np.column_stack([exp_num.reshape(-1, 1), exp_cat])

    assert got.shape == exp.shape, (got.shape, exp.shape)
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)
    snap.unpersist()


# ---------------------------------------------------------------------------
# dedup property: identical documents ALWAYS collide in every MinHash band
# ---------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "omega"]),
            min_size=4,
            max_size=12,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_identical_docs_always_minhash_candidates(spark, word_lists):
    """An exact duplicate shares every shingle, hence every MinHash
    signature and every band — LSH must always emit the pair."""
    import tempfile

    from quackml_spark.operators.dedup import dedup_minhash_lsh

    texts = [" ".join(ws) for ws in word_lists]
    dup_id = len(texts)  # duplicate of doc 0 appended last
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    rows.append((dup_id, texts[0], "en", "test", len(texts[0])))
    d = tempfile.mkdtemp(prefix="qml_mh_prop_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"], r["shared_bands"])
        for r in dedup_minhash_lsh(spark, d).collect()
    }
    assert (0, dup_id, 4) in pairs, pairs  # all 4 bands collide
