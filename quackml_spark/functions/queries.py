"""LLM-operator queries for the driver's correctness gate.

llm_chunk_fixed is fully SQL-expressible (fixed-width character windows)
and oracle-checked; the neural-backed ops register rows-only (their
fallback backends are deterministic, but not ANSI-SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.tmpdirs import ephemeral_dir
from quackml_spark.sources import load_table


@register(
    "llm_chunk_fixed",
    doc="chunk(character, 200/0) == fixed substring windows; exact parity "
    "with a pure-SQL oracle (api.rs:1309-1322 output shape).",
    oracle="""
SELECT doc_id, i AS chunk_index, substr(text, CAST(1 + 200*i AS INT), 200) AS chunk
FROM (
  SELECT doc_id, text,
         unnest(range(0, greatest(CAST(ceil(length(text)/200.0) AS BIGINT), 1))) AS i
  FROM documents
)
WHERE length(text) > 0
ORDER BY doc_id, chunk_index
""",
    tags=("llm",),
)
def llm_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import chunk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk(
        docs,
        "character",
        "text",
        {"chunk_size": 200, "chunk_overlap": 0, "separator": ""},
    )
    return out.select(
        "doc_id", F.col("chunk_index").cast("bigint").alias("chunk_index"), "chunk"
    ).orderBy("doc_id", "chunk_index")


@register(
    "llm_embed_documents",
    extra=True,
    doc="embed() over documents — deterministic hashing backend; 64-dim. "
    "Oracle: dim is fixed and the vector is unit-norm exactly when the "
    "doc has at least one token (values themselves are value-checked "
    "by llm_embed_parity).",
    oracle=r"""
SELECT doc_id, CAST(64 AS INT) AS dim,
       len(regexp_extract_all(lower(text), '\S+')) > 0 AS unit_norm
FROM documents ORDER BY doc_id
""",
    tags=("llm", "bench"),
)
def llm_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import embed

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed(docs, "hash", "text", kwargs={"dimensions": 64})
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        (F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0.99).alias(
            "unit_norm"
        ),
    ).orderBy("doc_id")


@register(
    "llm_transform_sentiment",
    extra=True,
    doc="transform(text-classification) JSON-out contract over documents "
    "— label re-derived in SQL from the deterministic backend's word "
    "lists (the full-table twin is llm_transform_parity).",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         trim(unnest(regexp_extract_all(lower(text), '\\S+')), '.,!?') AS w
  FROM documents WHERE doc_id < 100
), counts AS (
  SELECT doc_id,
    COUNT(*) FILTER (WHERE w IN ('good','great','excellent','love','happy',
      'rallied','up','gain','best','fast','win','positive','strong')) AS pos,
    COUNT(*) FILTER (WHERE w IN ('bad','terrible','hate','sad','down','loss',
      'worst','slow','fail','negative','weak','error')) AS neg
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN pos >= neg THEN 'POSITIVE' ELSE 'NEGATIVE' END AS label,
       true AS has_score
FROM counts
ORDER BY doc_id
""",
    tags=("llm",),
)
def llm_transform_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import transform

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 100)
    )
    out = transform(docs, "text-classification", "text")
    return out.select(
        "doc_id",
        F.get_json_object("transform_result", "$.result[0].label").alias("label"),
        F.get_json_object("transform_result", "$.result[0].score")
        .cast("double")
        .isNotNull()
        .alias("has_score"),
    ).orderBy("doc_id")


@register(
    "llm_rank_documents",
    extra=True,
    doc="rank() batch contract: several query rows reranked against one "
    "shared 20-doc corpus inside a single Arrow batch (the multi-row "
    "path llm_rank_parity's 1-row shape doesn't cover). Jaccard scores "
    "and (score desc, corpus_id) order re-derived in SQL; each score is "
    "one int/int division, bit-identical.",
    oracle="""
WITH docs AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS corpus_id, text
  FROM documents WHERE doc_id < 20
), queries AS (
  SELECT doc_id AS query_id, text FROM documents WHERE doc_id < 5
), qw AS (
  SELECT DISTINCT query_id, w FROM (
    SELECT query_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS w
    FROM queries)
), dw AS (
  SELECT DISTINCT corpus_id, w FROM (
    SELECT corpus_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS w
    FROM docs)
), qsize AS (SELECT query_id, COUNT(*) AS nq FROM qw GROUP BY query_id),
dsize AS (SELECT corpus_id, COUNT(*) AS nd FROM dw GROUP BY corpus_id),
inter AS (
  SELECT qw.query_id, dw.corpus_id, COUNT(*) AS ni
  FROM qw JOIN dw USING (w) GROUP BY qw.query_id, dw.corpus_id
), scored AS (
  -- drive from docs, not dsize: a token-less document has no dw rows,
  -- so dsize omits it while the engine scores it 0 — row counts and
  -- every later rank_pos would diverge (review catch)
  SELECT q.query_id, d.corpus_id,
         CASE WHEN COALESCE(qs.nq, 0) = 0 OR COALESCE(ds.nd, 0) = 0 THEN 0.0
              ELSE COALESCE(i.ni, 0)::DOUBLE
                   / (ds.nd + qs.nq - COALESCE(i.ni, 0))
         END AS score
  FROM queries q
  CROSS JOIN docs d
  LEFT JOIN dsize ds ON ds.corpus_id = d.corpus_id
  LEFT JOIN qsize qs ON qs.query_id = q.query_id
  LEFT JOIN inter i ON i.query_id = q.query_id AND i.corpus_id = d.corpus_id
)
SELECT query_id,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score DESC, corpus_id) - 1 AS rank_pos,
       corpus_id, score
FROM scored
ORDER BY query_id, rank_pos
""",
    tags=("llm",),
)
def llm_rank_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import rank

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    corpus = (
        docs.select(F.struct("doc_id", "text").alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(F.transform("ss", lambda s: s.getField("text")).alias("docs"))
    )
    queries = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    )
    # one corpus row broadcast against a handful of query rows
    out = rank(queries.crossJoin(F.broadcast(corpus)), "jaccard", "query", "docs")
    return (
        out.select(
            "query_id", F.posexplode("rank_result").alias("rank_pos", "r")
        )
        .select(
            "query_id",
            F.col("rank_pos").cast("bigint"),
            F.col("r.corpus_id").cast("bigint").alias("corpus_id"),
            F.col("r.score").alias("score"),
        )
        .orderBy("query_id", "rank_pos")
    )


@register(
    "llm_finetune_langid",
    doc="finetune(text_classification) lifecycle on documents(text->lang) "
    "+ predict_text serving (api.rs:1723-2279). Every served row must "
    "classify and the model must auto-deploy — deterministic, so the "
    "oracle derives the expected ledger from the documents table.",
    oracle="""
SELECT doc_id, true AS classified, true AS model_deployed
FROM documents WHERE doc_id < 50 ORDER BY doc_id
""",
    tags=("llm",),
)
def llm_finetune_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.catalog import Catalog
    from quackml_spark.ml.finetune import finetune, predict_text

    catalog = Catalog(warehouse=ephemeral_dir("qml_ft_"))
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("text"), F.col("lang").alias("class")
    )
    res = finetune(spark, "langid", "text_classification", df=docs, catalog=catalog)
    serve = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    out = predict_text(serve, "langid", "text", catalog=catalog)
    return out.select(
        "doc_id",
        F.col("predicted_class").isNotNull().alias("classified"),
        F.lit(bool(res.deployed)).alias("model_deployed"),
    ).orderBy("doc_id")


@register(
    "llm_generate",
    extra=True,
    doc="generate() batch contract with deterministic fallback "
    "(api.rs:1588-1662): every generation continues its prompt, which "
    "the oracle derives per served doc.",
    oracle="""
SELECT doc_id, true AS continues_prompt
FROM documents WHERE doc_id < 20 ORDER BY doc_id
""",
    tags=("llm",),
)
def llm_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.catalog import Catalog
    from quackml_spark.functions import generate

    catalog = Catalog(warehouse=ephemeral_dir("qml_gen_"))
    catalog.insert("projects", {"name": "gen", "task": "text_generation"})
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 20)
    )
    prompts = docs.withColumn("prompt", F.substring("text", 1, 40))
    out = generate(prompts, "gen", "prompt", config={"max_new_tokens": 8}, catalog=catalog)
    return out.select(
        "doc_id", F.startswith(F.col("generated"), F.col("prompt")).alias("continues_prompt")
    ).orderBy("doc_id")


_PARITY_QUERY = "the model data pipeline is good and fast"


@register(
    "llm_transform_parity",
    doc="Value-checks the transform() UDF path end-to-end: the "
    "deterministic sentiment backend's label is re-derived in pure SQL "
    "from the same word lists and compared against the JSON the UDF "
    "emits (full pipeline: batching, cache, JSON shape).",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         trim(unnest(regexp_extract_all(lower(text), '\\S+')), '.,!?') AS w
  FROM documents
), counts AS (
  SELECT doc_id,
    COUNT(*) FILTER (WHERE w IN ('good','great','excellent','love','happy',
      'rallied','up','gain','best','fast','win','positive','strong')) AS pos,
    COUNT(*) FILTER (WHERE w IN ('bad','terrible','hate','sad','down','loss',
      'worst','slow','fail','negative','weak','error')) AS neg
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN pos >= neg THEN 'POSITIVE' ELSE 'NEGATIVE' END AS label
FROM counts
ORDER BY doc_id
""",
    tags=("llm",),
)
def llm_transform_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import make_transform_udf, transform as _  # noqa: F401

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = docs.withColumn(
        "res", make_transform_udf("text-classification")(F.col("text"))
    )
    return out.select(
        "doc_id",
        F.get_json_object("res", "$.result[0].label").alias("label"),
    ).orderBy("doc_id")


@register(
    "llm_rank_parity",
    doc="Value-checks rank()'s deterministic backend end-to-end: Jaccard "
    "scores and the (score desc, corpus_id) ordering re-derived in pure "
    "SQL; float score is a single int/int division, bit-identical.",
    oracle=f"""
WITH docs AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS corpus_id, text
  FROM documents WHERE doc_id < 40
), q AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower('{_PARITY_QUERY}'), '\\S+')) AS w
), dt AS (
  SELECT corpus_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS w
  FROM docs
), dtd AS (SELECT DISTINCT corpus_id, w FROM dt),
sizes AS (
  SELECT corpus_id, COUNT(*) AS nd,
         COUNT(*) FILTER (WHERE w IN (SELECT w FROM q)) AS inter
  FROM dtd GROUP BY corpus_id
), scored AS (
  -- drive from docs: a token-less document has no dtd rows, so sizes
  -- omits it while the engine scores it 0 (review catch)
  SELECT d.corpus_id,
         CASE WHEN COALESCE(s.nd, 0) = 0 THEN 0.0
              ELSE s.inter::DOUBLE
                   / (s.nd + (SELECT COUNT(*) FROM q) - s.inter)
         END AS score
  FROM docs d LEFT JOIN sizes s USING (corpus_id)
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, corpus_id) - 1 AS rank_pos,
       corpus_id, score
FROM scored
ORDER BY rank_pos
""",
    tags=("llm",),
)
def llm_rank_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions import rank

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    arr = (
        docs.select(F.struct("doc_id", "text").alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            F.transform("ss", lambda s: s.getField("text")).alias("documents")
        )
        .withColumn("query", F.lit(_PARITY_QUERY))
    )
    out = rank(arr, "jaccard", "query", "documents")
    return (
        out.select(F.posexplode("rank_result").alias("rank_pos", "r"))
        .select(
            F.col("rank_pos").cast("bigint"),
            F.col("r.corpus_id").cast("bigint").alias("corpus_id"),
            F.col("r.score").alias("score"),
        )
        .orderBy("rank_pos")
    )


@register(
    "llm_generate_parity",
    extra=True,  # r9 curation: near-twin demoted for a stronger family rep
    doc="Value-checks the generate() UDF batch path: the deterministic "
    "fallback's md5-seeded token continuation is re-derived in pure SQL "
    "and string-compared.",
    oracle="""
WITH seeds AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(text), 1, 8))::BIGINT AS seed
  FROM documents
), toks AS (
  SELECT doc_id, i, 'tok' || ((seed + i) % 997) AS tok
  FROM seeds, unnest(range(0, 8)) AS t(i)
)
SELECT s.doc_id,
       trim(s.text || ' ' ||
            (SELECT string_agg(tok, ' ' ORDER BY i) FROM toks k
             WHERE k.doc_id = s.doc_id)) AS generated
FROM seeds s
ORDER BY s.doc_id
""",
    tags=("llm",),
)
def llm_generate_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions.generate import make_generate_udf

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    udf = make_generate_udf(None, {"max_new_tokens": 8})
    return docs.select("doc_id", udf(F.col("text")).alias("generated")).orderBy(
        "doc_id"
    )


@register(
    "llm_train_word2vec",
    extra=True,
    doc="In-engine embedding TRAINING (beyond the reference's "
    "apply-pretrained-only embed()): MLlib distributed skip-gram over "
    "the documents corpus; output is per-doc summary stats of the "
    "learned 16-dim document vectors plus vocab size. Rows-only check "
    "(SGD training is not ANSI-SQL-expressible); determinism and "
    "downstream-ANN compatibility are pytest-pinned.",
    tags=("llm",),
)
def llm_train_word2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.functions.word2vec import doc_vectors, train_word2vec
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_word2vec(docs, dim=16, min_count=2)
    vecs = doc_vectors(model, docs)
    n_vocab = model.getVectors().count()
    return (
        vecs.select(
            "doc_id",
            F.lit(n_vocab).alias("n_vocab"),
            F.size("embedding").alias("dim"),
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + x * x
                ),
                4,
            ).alias("sq_norm"),
        )
        .orderBy("doc_id")
    )
