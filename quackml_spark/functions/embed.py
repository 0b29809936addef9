"""embed() — text embeddings as an Arrow-batched pandas UDF.

Parity with the reference's SentenceTransformer-backed scalar
(api.rs:1193-1261 -> transformers.py:552-579): per-worker model cache
keyed by transformer name, instructor-style ``prompt`` kwarg honored.
Backends:

  * sentence-transformers, when importable (not in this container) —
    requesting a named model WITHOUT the package raises an actionable
    ImportError rather than silently substituting the hash backend;
  * ``hash`` — a deterministic feature-hashing embedding (md5 token
    buckets, +/- sign bit, L2-normalized). Clearly a stand-in for a
    neural encoder, but distribution-friendly, reproducible across
    drivers/executors (md5, not PYTHONHASHSEED-dependent), and good
    enough to exercise every downstream consumer (ANN, dedup, rank).

Scale: one UDF evaluation per Arrow batch (maxRecordsPerBatch=10k);
no shuffle; the model loads once per worker process, not per row.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from quackml_spark.functions._cache import get_or_create

DEFAULT_DIM = 384


def _have_sentence_transformers() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def hash_embed_batch(texts: pd.Series, dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Deterministic feature-hashing embedding (the fallback backend)."""
    out = []
    for t in texts:
        vec = np.zeros(dim, dtype="float32")
        if t:
            for tok in str(t).lower().split():
                h = hashlib.md5(tok.encode("utf-8")).digest()
                bucket = int.from_bytes(h[:4], "big") % dim
                sign = 1.0 if h[4] & 1 else -1.0
                vec[bucket] += sign
        n = float(np.linalg.norm(vec))
        if n > 0:
            vec /= n
        out.append(vec.tolist())
    return out


def make_embed_udf(transformer: str = "hash", kwargs: dict | None = None):
    kwargs = dict(kwargs or {})
    dim = int(kwargs.pop("dimensions", DEFAULT_DIM))
    prompt = kwargs.pop("prompt", None)
    use_st = transformer != "hash"
    if use_st and not _have_sentence_transformers():
        # Never silently claim a backend that didn't run: asking for a
        # named neural model must not hand back feature-hash vectors.
        raise ImportError(
            f"embed(transformer={transformer!r}) needs the "
            "sentence-transformers package, which is not importable in "
            "this environment. Install sentence-transformers (and torch) "
            "for neural embeddings, or request transformer='hash' "
            "explicitly for the deterministic feature-hashing backend."
        )
    kw_json = json.dumps(kwargs, sort_keys=True)

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        if use_st:
            def load():
                from sentence_transformers import SentenceTransformer

                return SentenceTransformer(transformer, **json.loads(kw_json))

            # cache key includes the constructor kwargs: keyed on the
            # model name alone, two embed UDFs with the same model but
            # different device/revision/trust_remote_code silently
            # shared whichever instance loaded first on a reused worker
            # (review catch; transform.py already keys by full task JSON)
            model = get_or_create(
                "sentence_transformers", f"{transformer}|{kw_json}", load
            )
            inputs = texts.fillna("")
            if prompt:  # instructor-model prompt prefix (transformers.py:544-547)
                inputs = prompt + inputs
            vecs = model.encode(list(inputs))
            return pd.Series([list(map(float, v)) for v in vecs])
        return pd.Series(hash_embed_batch(texts, dim))

    return embed_udf


def embed(
    df: DataFrame,
    transformer: str,
    text_col: str,
    kwargs: dict | None = None,
    output_col: str = "embedding",
) -> DataFrame:
    """Add an ``array<float>`` embedding column for ``text_col``."""
    return df.withColumn(output_col, make_embed_udf(transformer, kwargs)(F.col(text_col)))
