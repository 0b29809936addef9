from quackml_spark.functions.chunk import chunk, split_text
from quackml_spark.functions.embed import embed, hash_embed_batch, make_embed_udf
from quackml_spark.functions.generate import generate
from quackml_spark.functions.rank import rank
from quackml_spark.functions.transform import (
    extract_text_from_json,
    get_model_from,
    make_transform_udf,
    transform,
)

__all__ = [
    "embed",
    "make_embed_udf",
    "hash_embed_batch",
    "chunk",
    "split_text",
    "transform",
    "make_transform_udf",
    "extract_text_from_json",
    "get_model_from",
    "rank",
    "generate",
]
