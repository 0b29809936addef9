"""generate() — text generation from a project's finetuned model
(api.rs:1588-1662, transformers/mod.rs:430-485).

The reference lazily loads the project's finetuned checkpoint from
quackml.files into each connection and batches model.generate(). Here:
the checkpoint directory is resolved from the catalog on the driver; per
-worker lazy load happens inside the pandas UDF. Without the
transformers package the stub produces deterministic, seed-stable
continuations (marked in-band) so the catalog resolution, lazy-load
path, and batch plumbing stay real.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from quackml_spark.catalog import Catalog
from quackml_spark.functions._cache import get_or_create


def _have_transformers() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_checkpoint(catalog: Catalog, project_name: str) -> str | None:
    projects = catalog.find("projects", name=project_name)
    if not len(projects):
        raise KeyError(f"project {project_name!r} not found")
    dm = catalog.deployed_models()
    dm = dm[dm["project_name"] == project_name] if len(dm) else dm
    if not len(dm):
        return None
    files = catalog.find("files", model_id=int(dm.iloc[0]["model_id"]))
    return files.iloc[0]["path"] if len(files) else None


def make_generate_udf(checkpoint: str | None, config: dict | None = None):
    config = dict(config or {})
    use_hf = _have_transformers() and checkpoint is not None
    max_new = int(config.get("max_new_tokens", config.get("max_length", 16)))

    @F.pandas_udf(StringType())
    def generate_udf(inputs: pd.Series) -> pd.Series:
        if use_hf:
            def load():
                from transformers import AutoModelForCausalLM, AutoTokenizer

                tok = AutoTokenizer.from_pretrained(checkpoint)
                model = AutoModelForCausalLM.from_pretrained(checkpoint)
                return tok, model

            tok, model = get_or_create("generators", checkpoint, load)
            enc = tok(list(inputs.fillna("")), return_tensors="pt", padding=True)
            out = model.generate(**enc, **config)
            return pd.Series(tok.batch_decode(out, skip_special_tokens=True))
        results = []
        for text in inputs:
            # a NULL/NaN prompt must not render as the literal 'None'/
            # 'nan' in the output (review catch) — treat it as empty
            if text is None or (isinstance(text, float) and text != text):
                text = ""
            seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "big")
            cont = " ".join(f"tok{(seed + i) % 997}" for i in range(min(max_new, 16)))
            results.append(f"{text} {cont}".strip())
        return pd.Series(results)

    return generate_udf


def generate(
    df: DataFrame,
    project_name: str,
    input_col: str,
    config: dict | None = None,
    catalog: Catalog | None = None,
    output_col: str = "generated",
) -> DataFrame:
    catalog = catalog or Catalog()
    checkpoint = _resolve_checkpoint(catalog, project_name)
    return df.withColumn(
        output_col, make_generate_udf(checkpoint, config)(F.col(input_col))
    )
