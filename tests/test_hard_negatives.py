"""Behavior tests for the contrastive-training data-prep operators:
hard-negative mining and embedding-space decontamination (the oracle
rows in test_oracle_parity check values; these pin the SEMANTICS on
planted geometry where the right answer is known by construction)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _vec(*xs):
    return [float(x) for x in xs]


def test_hard_negatives_are_nearest_wrong_label(spark):
    """Planted 2-D geometry: query (1,0) label 0. Same-label vectors —
    however close — must never appear; the negatives must come back
    cosine-descending and be exactly the wrong-label set ranked by
    angle."""
    from quackml_spark.operators.similarity import hard_negatives

    rows = [
        (0, _vec(1.0, 0.0), 0),    # query
        (1, _vec(0.99, 0.14), 0),  # nearest of all — but same label
        (2, _vec(0.9, 0.44), 1),   # hard negative (closest wrong label)
        (3, _vec(0.0, 1.0), 1),    # orthogonal
        (4, _vec(-1.0, 0.0), 2),   # antipodal
        (5, _vec(0.7, 0.71), 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(emb, emb.where("vec_id = 0"), k=3).collect()
    assert [r["neg_id"] for r in out] == [2, 5, 3]
    assert [r["rnk"] for r in out] == [1, 2, 3]
    cosines = [r["cosine"] for r in out]
    assert cosines == sorted(cosines, reverse=True)
    # the same-label near-duplicate (vec 1) is excluded despite being
    # the globally nearest vector
    assert 1 not in {r["neg_id"] for r in out}


def test_hard_negatives_k_bounds_output_per_query(spark):
    from quackml_spark.operators.similarity import hard_negatives

    rows = [(i, _vec(1.0, i * 0.1), i % 2) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(emb, emb.where("vec_id < 4"), k=5)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_q == {0: 5, 1: 5, 2: 5, 3: 5}


def test_semantic_decontaminate_flags_planted_leaks_only(spark):
    """A paraphrase-style leak (cosine ~0.9996 to a benchmark vector,
    sharing no token with it) must be flagged at threshold 0.99; a
    benign orthogonal vector must not, and its max_benchmark_cosine
    must still report the near-miss honestly."""
    from quackml_spark.operators.similarity import semantic_decontaminate

    bench = spark.createDataFrame(
        [(100, _vec(1.0, 0.0, 0.0)), (101, _vec(0.0, 1.0, 0.0))],
        "vec_id long, embedding array<float>",
    )
    train = spark.createDataFrame(
        [
            (1, _vec(0.999, 0.02, 0.0)),   # near-copy of bench 100
            (2, _vec(0.0, 0.0, 1.0)),      # orthogonal to both
            (3, _vec(0.5, 0.5, 0.7071)),   # mid-similarity
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_decontaminate(train, bench, threshold=0.99).collect()
    }
    assert set(out) == {1, 2, 3}  # full decision relation, no silent drops
    assert out[1]["contaminated"] is True
    assert out[2]["contaminated"] is False
    assert out[3]["contaminated"] is False
    assert out[1]["max_benchmark_cosine"] > 0.999
    assert abs(out[2]["max_benchmark_cosine"]) < 1e-9
    assert 0.4 < out[3]["max_benchmark_cosine"] < 0.8
