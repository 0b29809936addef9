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
    "register_sql_functions",
]


def register_sql_functions(spark) -> None:
    """SQL parity for the LLM scalar surface (§2.13): registers
    quackml_embed / quackml_transform / quackml_chunk /
    quackml_generate so `SELECT quackml_embed(text) FROM docs` works —
    the analog of the reference's DuckDB scalar registrations
    (lib.rs:40-54). quackml_predict registers via
    quackml_spark.ml.register_udfs (it needs a catalog)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from quackml_spark.functions.chunk import split_text
    from quackml_spark.functions.embed import make_embed_udf
    from quackml_spark.functions.generate import make_generate_udf
    from quackml_spark.functions.transform import make_transform_udf

    spark.udf.register("quackml_embed", make_embed_udf("hash"))
    spark.udf.register(
        "quackml_transform", make_transform_udf("text-classification")
    )
    spark.udf.register("quackml_generate", make_generate_udf(None))

    import pandas as _pd

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(texts: _pd.Series) -> _pd.Series:
        return _pd.Series(
            [split_text("recursive_character", t or "", {"chunk_size": 200}) for t in texts]
        )

    spark.udf.register("quackml_chunk", _chunk)
