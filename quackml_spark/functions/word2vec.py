"""In-engine embedding training — MLlib Word2Vec over the documents
table.

The reference's embed() only APPLIES pretrained encoders
(/root/reference/src/bindings/transformers/transformers.py:279-420);
training embeddings is beyond its surface but squarely in scope for a
training-data engine: corpus-specific vectors feed the same ANN /
dedup / centroid operators as pretrained ones.

Scale shape: Word2Vec is MLlib's distributed skip-gram (hierarchical
softmax) — training parallelizes over partitions with per-iteration
weight averaging (Spark's standard trade for embarrassingly parallel
SGD); the learned vocabulary matrix is vocab x dim floats on the
driver, bounded by vocab size (cap with minCount/maxVocabSize at web
scale, exactly like any word-embedding trainer). Document vectors are
the token-vector mean, computed distributed by model.transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _w2v_tokens(text_col: str):
    """Shared tokenizer for train + serve: NULL text becomes an empty
    token list (F.split of NULL is a NULL array, which MLlib Word2Vec
    rejects with an opaque NullPointerException deep in fit/transform —
    review catch), and empty-string tokens from leading/duplicate
    whitespace are dropped so they never enter the vocabulary."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )


def train_word2vec(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 32,
    min_count: int = 2,
    seed: int = 42,
    num_partitions: int = 1,
):
    """Fit MLlib Word2Vec on whitespace-lowered tokens. Returns the
    fitted model (``.getVectors()`` is the word table;
    ``doc_vectors(model, docs)`` embeds documents).

    ``num_partitions=1`` keeps training deterministic for a given seed
    (MLlib averages partition-local updates, so more partitions trade
    determinism for speed — the caller's knob, stated not hidden)."""
    from pyspark.ml.feature import Word2Vec

    toks = docs.withColumn("__tokens", _w2v_tokens(text_col))
    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        numPartitions=num_partitions,
        inputCol="__tokens",
        outputCol="__docvec",
    )
    return w2v.fit(toks)


def doc_vectors(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document embeddings = mean of token vectors (Word2VecModel
    .transform semantics), as array<float> ready for the ANN/dedup
    operators."""
    from pyspark.ml.functions import vector_to_array

    toks = docs.withColumn("__tokens", _w2v_tokens(text_col))
    out = model.transform(toks)
    return out.withColumn(
        "embedding", vector_to_array("__docvec", "float32")
    ).drop("__tokens", "__docvec")
