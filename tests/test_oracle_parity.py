"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's t2 correctness gate (sf0.01); tests run at
sf0.001 for speed — the queries are scale-independent by construction
(exact decimal aggregation, deterministic orderings).
"""

from __future__ import annotations

import pytest

from quackml_spark.plans import REGISTRY, _load_all
from quackml_spark.testing import compare

_load_all()
CASES = [name for name, qd in sorted(REGISTRY.items()) if qd.oracle is not None]


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(name, spark, sf_dir, duck):
    qd = REGISTRY[name]
    df = qd.builder(spark, sf_dir)
    ok, msg = compare(df, duck, qd.oracle)
    assert ok, f"{name}: {msg}"


def test_queries_without_oracle_still_run(spark, sf_dir):
    for name, qd in sorted(REGISTRY.items()):
        if qd.oracle is None:
            df = qd.builder(spark, sf_dir)
            assert df.count() >= 0, name


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "text_bm25_topk",
        "embedding_pq_topk",
        # round-8 session: DSIR's decimal log-weight combine + Gumbel
        # top-k, and the two rank-statistic profiles (row_number over
        # per-source sorts must not depend on shuffle width)
        "text_dsir_select",
        "text_corpus_profile",
        "sketch_length_histogram",
        "text_ccnet_buckets",
    ],
)
def test_results_partitioning_independent(spark, sf_dir, name):
    """The DECIMAL aggregation discipline must make results identical
    under different shuffle widths (the property that lets a 1-partition
    DuckDB oracle check a 32-partition Spark run). Covers the classic
    decimal-money aggregate plus the two newest decimal-sum scorers
    (BM25 term sums, PQ ADC sums)."""
    qd = REGISTRY[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in qd.builder(spark, sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = [tuple(r) for r in qd.builder(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
