"""rank() — cross-encoder reranking (api.rs:1276-1286, transformers.py:509-533).

Backends: sentence-transformers CrossEncoder when importable (per-worker
cache keyed by model name), else a deterministic lexical reranker
(word-set Jaccard between query and document) — a real, if shallow,
relevance signal that exercises the full contract: per-row (query,
documents[]) -> array<struct<corpus_id, score, text?>> sorted by score.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from quackml_spark.functions._cache import get_or_create

RANK_RESULT_TYPE = ArrayType(
    StructType(
        [
            StructField("corpus_id", LongType()),
            StructField("score", DoubleType()),
            StructField("text", StringType()),
        ]
    )
)


def _have_cross_encoder() -> bool:
    try:
        from sentence_transformers import CrossEncoder  # noqa: F401

        return True
    except ImportError:
        return False


def _jaccard(a: str, b: str) -> float:
    sa = set((a or "").lower().split())
    sb = set((b or "").lower().split())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def make_rank_udf(transformer: str, kwargs: dict | None = None):
    kwargs = dict(kwargs or {})
    return_documents = bool(kwargs.pop("return_documents", True))
    use_ce = transformer != "jaccard"
    if use_ce and not _have_cross_encoder():
        # Same policy as embed(): a named CrossEncoder must never be
        # silently served by the lexical fallback.
        raise ImportError(
            f"rank(transformer={transformer!r}) needs the "
            "sentence-transformers package (CrossEncoder), which is not "
            "importable in this environment. Install it for neural "
            "reranking, or request transformer='jaccard' explicitly for "
            "the deterministic lexical backend."
        )

    @F.pandas_udf(RANK_RESULT_TYPE)
    def rank_udf(queries: pd.Series, documents: pd.Series) -> pd.Series:
        out = []
        model = None
        if use_ce:
            def load():
                from sentence_transformers import CrossEncoder

                return CrossEncoder(transformer)

            model = get_or_create("cross_encoders", transformer, load)
        for q, docs in zip(queries, documents):
            docs = [] if docs is None else list(docs)
            if model is not None:
                ranked = model.rank(q, docs, return_documents=True)
                rows = [
                    (int(r["corpus_id"]), float(r["score"]),
                     r.get("text") if return_documents else None)
                    for r in ranked
                ]
            else:
                scored = [
                    (i, _jaccard(q, d), d if return_documents else None)
                    for i, d in enumerate(docs)
                ]
                rows = sorted(scored, key=lambda t: (-t[1], t[0]))
            out.append(rows)
        return pd.Series(out)

    return rank_udf


def rank(
    df: DataFrame,
    transformer: str,
    query_col: str,
    documents_col: str,
    kwargs: dict | None = None,
    output_col: str = "rank_result",
) -> DataFrame:
    """Rerank ``documents_col`` (array<string>) against ``query_col``."""
    return df.withColumn(
        output_col,
        make_rank_udf(transformer, kwargs)(F.col(query_col), F.col(documents_col)),
    )
