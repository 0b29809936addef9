"""Auto-promote probe for the import-gated backends (r2-r5 verdict ask).

Every gated path (sklearn long tail, HF embed/transform/generate/rank,
HF finetune) has mocked tests elsewhere; THESE tests run the real
library the moment the environment gains it — no code change needed, a
`pytest tests/test_live_backends.py` in a torch-equipped CI lane
promotes the stubs to live-verified automatically. In this container
they all SKIP (and test_environment_ceiling documents that fact so a
silently-changed container shows up as a test diff, not a guess).
"""

from __future__ import annotations

import importlib

import pytest

from quackml_spark.env import OPTIONAL_DEPS, validate_dependencies


def _have(mod: str) -> bool:
    try:
        importlib.import_module(mod)
        return True
    except ImportError:
        return False


def test_environment_ceiling(spark):
    """Records the probe result as an assertion: driver and executor
    environments agree (the classic cluster deploy bug), and every
    absent backend is really absent on BOTH sides."""
    report = validate_dependencies(spark)
    assert report["mismatch"] == [], report
    assert set(report["driver"]) == set(OPTIONAL_DEPS)


@pytest.mark.skipif(not _have("sklearn"), reason="sklearn not installed")
def test_live_sklearn_long_tail(spark, tmp_path):
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml import train

    df = spark.range(200).selectExpr(
        "cast(id % 17 as double) as x", "cast(id % 17 as double) * 3 + 1 as target"
    )
    res = train(
        spark, "live sk", task="regression", df=df, y_column_name="target",
        algorithm="bayesian_ridge", test_sampling="random",
        catalog=Catalog(warehouse=str(tmp_path / "wh")),
    )
    assert res.metrics["backend"] == "sklearn"
    assert res.metrics["r2"] > 0.99


@pytest.mark.skipif(
    not _have("sentence_transformers"), reason="sentence-transformers not installed"
)
def test_live_sentence_transformer_embed(spark, sf_dir):
    from quackml_spark.functions import embed
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(8)
    out = embed(docs, "all-MiniLM-L6-v2", "text", {})
    row = out.select("embedding").first()
    assert len(row["embedding"]) == 384


@pytest.mark.skipif(not _have("transformers"), reason="transformers not installed")
def test_live_hf_transform(spark, sf_dir):
    from quackml_spark.functions import make_transform_udf  # noqa: F401
    from quackml_spark.functions.transform import transform
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(4)
    out = transform(docs, "text-classification", "text", {})
    assert out.select("transform_result").first() is not None


@pytest.mark.skipif(not _have("transformers"), reason="transformers not installed")
def test_live_hf_generate(spark):
    from pyspark.sql import functions as F

    from quackml_spark.functions.generate import make_generate_udf

    df = spark.createDataFrame([("hello",)], "prompt string")
    out = df.withColumn(
        "generated",
        make_generate_udf("sshleifer/tiny-gpt2", {"max_new_tokens": 4})(
            F.col("prompt")
        ),
    )
    assert out.select("generated").first() is not None


@pytest.mark.skipif(
    not (_have("transformers") and _have("torch") and _have("datasets")),
    reason="HF trainer stack not installed",
)
def test_live_hf_finetune(spark, sf_dir, tmp_path):
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml.finetune import finetune
    from quackml_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(64)
        .selectExpr("text", "lang AS label")
    )
    res = finetune(
        spark, "live ft", task="text_classification", df=docs,
        y_column_name="label", model_name="prajjwal1/bert-tiny",
        catalog=Catalog(warehouse=str(tmp_path / "wh")),
    )
    assert res is not None
