"""LLM operator surface tests (embed/chunk/transform/rank/generate/finetune).

Golden-shape tests, not golden-value: the reference's exact-JSON goldens
are model-version-fragile (SURVEY.md §5); we assert structure, keys, and
deterministic fields, with deterministic fallback backends.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from quackml_spark.catalog import Catalog
from quackml_spark.functions import (
    chunk,
    embed,
    extract_text_from_json,
    generate,
    rank,
    transform,
)
from quackml_spark.ml.finetune import finetune, predict_text


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def docs(spark, sf_dir):
    from quackml_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").limit(50)


def test_embed_shape_and_determinism(spark, docs):
    out = embed(docs, "hash", "text").select("doc_id", "embedding")
    rows = out.orderBy("doc_id").limit(3).collect()
    assert all(len(r["embedding"]) == 384 for r in rows)
    rows2 = embed(docs, "hash", "text").orderBy("doc_id").limit(3).collect()
    assert rows[0]["embedding"] == rows2[0]["embedding"]  # deterministic
    norm = sum(v * v for v in rows[0]["embedding"])
    assert abs(norm - 1.0) < 1e-5  # L2 normalized


def test_embed_custom_dim(spark, docs):
    out = embed(docs, "hash", "text", kwargs={"dimensions": 64})
    assert len(out.select("embedding").first()["embedding"]) == 64


def test_chunk_character(spark, docs):
    out = chunk(docs, "character", "text", {"chunk_size": 100, "chunk_overlap": 0, "separator": ""})
    rows = out.where(F.col("doc_id") == 0).orderBy("chunk_index").collect()
    assert rows[0]["chunk_index"] == 0
    assert all(len(r["chunk"]) <= 100 for r in rows)
    original = docs.where(F.col("doc_id") == 0).first()["text"]
    assert "".join(r["chunk"] for r in rows) == original


def test_chunk_recursive(spark):
    df = spark.createDataFrame(
        [(1, "para one word soup.\n\npara two is here.\n\n" + "x" * 300)],
        "id long, body string",
    )
    out = chunk(df, "recursive_character", "body", {"chunk_size": 120, "chunk_overlap": 0})
    chunks = [r["chunk"] for r in out.orderBy("chunk_index").collect()]
    assert len(chunks) >= 3
    assert all(len(c) <= 120 for c in chunks)


def test_transform_sentiment_and_extract(spark):
    df = spark.createDataFrame(
        [(1, "stocks rallied and the best gain was great"),
         (2, "terrible loss and the worst error")],
        "id long, text string",
    )
    out = transform(df, "text-classification", "text").orderBy("id").collect()
    r1 = json.loads(out[0]["transform_result"])
    r2 = json.loads(out[1]["transform_result"])
    assert r1["result"][0]["label"] == "POSITIVE"
    assert r2["result"][0]["label"] == "NEGATIVE"
    assert 0.5 <= r1["result"][0]["score"] <= 1.0


def test_transform_summarization_extract_text(spark):
    df = spark.createDataFrame([(1, "one two three four five six")], "id long, text string")
    out = transform(df, "summarization", "text", args={"max_length": 3}).first()
    texts = extract_text_from_json(out["transform_result"])
    assert texts == ["one two three"]


def test_transform_zero_shot(spark):
    df = spark.createDataFrame([(1, "the game was won")], "id long, text string")
    out = transform(
        df, "zero-shot-classification", "text",
        args={"candidate_labels": ["sports", "politics"]},
    ).first()
    data = json.loads(out["transform_result"])["result"]
    assert set(data["labels"]) == {"sports", "politics"}
    assert len(data["scores"]) == 2


def test_rank_jaccard(spark):
    df = spark.createDataFrame(
        [("fast query engine", ["slow dog", "fast query engine rocks", "nothing"])],
        "query string, docs array<string>",
    )
    out = rank(df, "jaccard", "query", "docs").first()["rank_result"]
    assert out[0]["corpus_id"] == 1  # most overlapping doc first
    assert out[0]["score"] > out[1]["score"]
    assert out[0]["text"] == "fast query engine rocks"


def test_generate_stub(spark, catalog):
    catalog.insert("projects", {"name": "gen", "task": "text_generation"})
    df = spark.createDataFrame([(1, "hello world")], "id long, prompt string")
    out = generate(df, "gen", "prompt", config={"max_new_tokens": 4}, catalog=catalog).first()
    assert out["generated"].startswith("hello world")
    out2 = generate(df, "gen", "prompt", config={"max_new_tokens": 4}, catalog=catalog).first()
    assert out["generated"] == out2["generated"]  # deterministic


def test_finetune_text_classification(spark, catalog):
    rows = [("the market rallied strongly", "finance")] * 20 + [
        ("the team won the game", "sports")
    ] * 20
    df = spark.createDataFrame(rows, "text string, class string")
    res = finetune(spark, "clf-ft", "text_classification", df=df, catalog=catalog)
    assert res.metrics["f1"] > 0.9, res.metrics
    assert res.metrics["accuracy"] > 0.9
    logs = catalog.read("logs")
    assert len(logs) == 2  # one per epoch
    serve = spark.createDataFrame(
        [(1, "market rallied again"), (2, "the game was won")], "id long, t string"
    )
    out = predict_text(serve, "clf-ft", "t", catalog=catalog).orderBy("id").collect()
    assert out[0]["predicted_class"] == "finance"
    assert out[1]["predicted_class"] == "sports"


def test_finetune_summarization(spark, catalog):
    df = spark.createDataFrame(
        [("alpha beta gamma delta " * 10, "alpha beta gamma")] * 10,
        "text string, summary string",
    )
    res = finetune(spark, "sum-ft", "summarization", df=df, catalog=catalog)
    assert res.metrics["rouge_ngram_f1"] > 0.0


def test_finetune_missing_columns_raises(spark, catalog):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError, match="missing"):
        finetune(spark, "bad-ft", "text_classification", df=df, catalog=catalog)


def test_sql_registered_llm_functions(spark, docs):
    from quackml_spark.functions import register_sql_functions

    register_sql_functions(spark)
    docs.createOrReplaceTempView("__qml_docs_sql")
    row = spark.sql(
        """
        SELECT size(quackml_embed(text)) AS dim,
               get_json_object(quackml_transform(text), '$.result[0].label') AS label,
               size(quackml_chunk(text)) AS n_chunks,
               length(quackml_generate(text)) > length(text) AS generated
        FROM __qml_docs_sql LIMIT 1
        """
    ).collect()[0]
    assert row["dim"] == 384
    assert row["label"] in ("POSITIVE", "NEGATIVE")
    assert row["n_chunks"] >= 1
    assert row["generated"]


def test_finetune_text_pair_classification(spark, catalog):
    from quackml_spark.ml.finetune import finetune

    rows = [
        ("the cat sat", "a cat was sitting", "same"),
        ("stocks fell", "market dropped", "same"),
        ("the cat sat", "stocks fell", "different"),
        ("blue sky today", "market dropped", "different"),
    ] * 6
    df = spark.createDataFrame(rows, "text1 string, text2 string, class string")
    res = finetune(
        spark, "pair clf", task="text_pair_classification", df=df, catalog=catalog
    )
    assert res.deployed
    assert "accuracy" in res.metrics and "fit_time" in res.metrics


def test_finetune_conversation(spark, catalog):
    from quackml_spark.ml.finetune import finetune

    rows = [("be helpful", "hi", "hello!"), ("be brief", "sum this", "ok")] * 4
    df = spark.createDataFrame(rows, "system string, user string, assistant string")
    res = finetune(spark, "conv", task="conversation", df=df, catalog=catalog)
    assert res.deployed
    assert res.metrics["backend"] == "deterministic-fallback"
    logs = catalog.read("logs")
    assert len(logs[logs["model_id"] == res.model_id]) >= 1  # QuackMLCallback parity


def test_embed_named_model_without_backend_raises():
    """VERDICT r01: embed('all-MiniLM-L6-v2') must not silently return
    feature-hash vectors when sentence-transformers is absent."""
    from quackml_spark.functions.embed import (
        _have_sentence_transformers,
        make_embed_udf,
    )

    if _have_sentence_transformers():
        pytest.skip("neural backend present; silent-substitution moot")
    with pytest.raises(ImportError, match="sentence-transformers"):
        make_embed_udf("all-MiniLM-L6-v2")


def test_rank_named_model_without_backend_raises():
    from quackml_spark.functions.rank import _have_cross_encoder, make_rank_udf

    if _have_cross_encoder():
        pytest.skip("neural backend present; silent-substitution moot")
    with pytest.raises(ImportError, match="CrossEncoder"):
        make_rank_udf("cross-encoder/ms-marco-MiniLM-L-6-v2")


def test_merge_sentences_langchain_semantics():
    """nltk/spacy splitters merge sentences into <=chunk_size chunks
    joined by blank lines (NLTKTextSplitter/SpacyTextSplitter shape)."""
    from quackml_spark.functions.chunk import _merge_sentences

    sents = ["one two.", "three four.", "five six seven eight nine ten."]
    out = _merge_sentences(sents, size=25)
    assert out == ["one two.\n\nthree four.", "five six seven eight nine ten."]
    # one giant sentence still emits (never splits mid-sentence)
    assert _merge_sentences(["x" * 100], size=10) == ["x" * 100]
    assert _merge_sentences([], size=10) == []


def test_sentence_splitters_gated(monkeypatch):
    """Without nltk/spacy the sentence splitters raise the actionable
    gate error; with a (mocked) tokenizer they split+merge."""
    import sys
    import types

    from quackml_spark.functions.chunk import split_text

    for pkg, splitter in (("nltk", "nltk"), ("spacy", "spacy")):
        if pkg not in sys.modules:
            try:
                __import__(pkg)
            except ImportError:
                with pytest.raises(NotImplementedError, match=pkg):
                    split_text(splitter, "a b. c d.", {"chunk_size": 10})

    fake_nltk = types.ModuleType("nltk")
    fake_nltk.sent_tokenize = lambda t: [s + "." for s in t.split(". ") if s]
    monkeypatch.setitem(sys.modules, "nltk", fake_nltk)
    out = split_text("nltk", "one two. three four", {"chunk_size": 100})
    assert out == ["one two.\n\nthree four."]
    out = split_text("nltk", "one two. three four", {"chunk_size": 10})
    assert out == ["one two.", "three four."]


def test_chunk_sentence_regex_splitter():
    """Dependency-free sentence splitter: abbreviation-safe breaks,
    greedy merge up to chunk_size — executable without nltk/spacy."""
    from quackml_spark.functions.chunk import split_text

    t = (
        'Dr. Smith went home. He was tired! "Really?" she asked. '
        "The answer, i.e. the truth, was no. Mr. J. Jones left at 5. Done."
    )
    out = split_text("sentence", t, {"chunk_size": 60})
    assert all(len(c) <= 60 for c in out)
    # no abbreviation was split mid-"sentence"
    joined = " ".join(out)
    assert "Dr. Smith went home." in joined and "i.e. the truth" in joined
    # chunk_size larger than the text -> one chunk
    assert len(split_text("sentence", t, {"chunk_size": 10000})) == 1


def test_chunk_sentence_on_documents(spark, docs):
    from quackml_spark.functions.chunk import chunk

    out = chunk(docs.limit(20), "sentence", "text", {"chunk_size": 80})
    rows = out.select("doc_id", "chunk_index", "chunk").collect()
    assert rows
    # oversize chunks are allowed only when they are a single
    # unsplittable sentence (LangChain merge semantics) — i.e. they
    # contain no internal sentence boundary
    import re

    for r in rows:
        if len(r["chunk"]) > 80:
            assert not re.search(r"[.!?]\s+\S", r["chunk"]), r["chunk"][:120]


def test_sentence_splitter_preserves_closing_quotes():
    """The separator consumes only whitespace — closing quotes/brackets
    after terminal punctuation stay in the text (the old regex deleted
    them from chunk output)."""
    from quackml_spark.functions.chunk import _split_sentences_regex

    out = _split_sentences_regex('He said "Stop." Then he left.', 10)
    assert out == ['He said "Stop."', "Then he left."]
    assert "".join(out).count('"') == 2


def test_sentence_splitter_abbreviation_guards():
    """Abbreviation guards include the trailing period (a lookbehind at
    the post-punctuation position without the dot can never match)."""
    from quackml_spark.functions.chunk import _split_sentences_regex

    text = "Dr. Smith arrived. See e.g. the appendix. J. Smith concurs."
    out = _split_sentences_regex(text, 20)
    assert out == [
        "Dr. Smith arrived.",
        "See e.g. the appendix.",
        "J. Smith concurs.",
    ]


def test_sentence_split_multiple_closers():
    """Terminal punctuation followed by SEVERAL closing quotes/brackets
    still splits, with the closers kept in the chunk (code-review catch:
    the single-closer lookbehind missed 'said "(Stop.)" Then')."""
    from quackml_spark.functions.chunk import _split_sentences_regex

    assert _split_sentences_regex('He said "(Stop.)" Then he left.', 10) == [
        'He said "(Stop.)"',
        "Then he left.",
    ]
    assert _split_sentences_regex("(['Sure.']) Next.", 10) == [
        "(['Sure.'])",
        "Next.",
    ]


def test_word2vec_learns_planted_synonyms(spark):
    """CAPABILITY pin, not bitwise (SGD has no value oracle — the one
    registry family without one): two tokens planted in IDENTICAL
    contexts must embed far closer than unrelated tokens. Deterministic
    under the fixed seed + numPartitions=1, so the margins are stable
    run to run (measured 0.99 vs -0.68 at these settings)."""
    import math

    from quackml_spark.functions.word2vec import train_word2vec

    rows, i = [], 0
    ctxs = [
        "the {} sat on the warm mat today",
        "a {} chased the small mouse quickly",
        "my {} slept near the open window",
        "that {} drank milk from the bowl",
    ]
    for _rep in range(30):
        for w in ("cat", "feline"):
            for c in ctxs:
                rows.append((i, c.format(w)))
                i += 1
        rows.append((i, "blue truck drives down the gravel road"))
        i += 1
        rows.append((i, "stock market prices fell sharply overnight"))
        i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_word2vec(docs, dim=16, min_count=2)
    vecs = {
        r["word"]: list(r["vector"].toArray())
        for r in model.getVectors().collect()
    }

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    syn = cos(vecs["cat"], vecs["feline"])
    assert syn > 0.8
    for other in ("truck", "market"):
        assert syn > cos(vecs["cat"], vecs[other]) + 0.5


def test_word2vec_deterministic_and_ann_compatible(spark, sf_dir):
    """Same seed + numPartitions=1 -> identical vectors across two fits;
    trained doc vectors slot straight into the cosine ANN operator
    shape (array<float> 'embedding' column)."""
    from pyspark.sql import functions as F

    from quackml_spark.functions.word2vec import doc_vectors, train_word2vec
    from quackml_spark.operators.similarity import cosine_expr
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    m1 = train_word2vec(docs, dim=8)
    m2 = train_word2vec(docs, dim=8)
    v1 = {r["word"]: tuple(r["vector"].toArray()) for r in m1.getVectors().collect()}
    v2 = {r["word"]: tuple(r["vector"].toArray()) for r in m2.getVectors().collect()}
    assert v1 == v2
    assert len(v1) > 10

    vecs = doc_vectors(m1, docs)
    assert dict(vecs.dtypes)["embedding"] == "array<float>"
    # self-similarity through the shared cosine machinery == 1
    row = (
        vecs.where(F.size("embedding") > 0)
        .select(cosine_expr(F.col("embedding"), F.col("embedding")).alias("c"))
        .first()
    )
    assert abs(row["c"] - 1.0) < 1e-6


def test_chunk_keeps_structural_separators(spark):
    """Separator-boundary chunks must keep their structural tokens: the
    old merge dropped the separator, so a python chunk began 'Bar:'
    with 'class ' gone and a markdown chunk lost its '## ' header
    (review catch). Joining the chunks also reproduces the input."""
    from quackml_spark.functions.chunk import split_text

    body_a = "def a():\n    return 1\n" + "# pad\n" * 10
    body_b = "def b():\n    return 2\n" + "# pad\n" * 10
    src = "class Foo:\n" + body_a + "\nclass Bar:\n" + body_b
    chunks = split_text("python", src, {"chunk_size": 120, "chunk_overlap": 0})
    assert len(chunks) >= 2
    assert any(c.lstrip().startswith("class Bar") for c in chunks), chunks
    assert "".join(chunks) == src

    md = "intro text\n## Section One\n" + "alpha " * 40 + "\n## Section Two\nbeta"
    mchunks = split_text("markdown", md, {"chunk_size": 100, "chunk_overlap": 0})
    # the header token must SURVIVE (the old merge deleted it); it may
    # legitimately merge with preceding content when it fits
    assert any("\n## Section Two" in c for c in mchunks), mchunks
    assert "".join(mchunks) == md


def test_chunk_character_honors_chunk_size(spark):
    """The character splitter must merge/re-split to chunk_size even
    when the separator occurs in the text — it used to return the raw
    split parts at unbounded length (review catch)."""
    from quackml_spark.functions.chunk import split_text

    text = "intro\n\n" + "x" * 1000 + "\n\nshort tail"
    chunks = split_text(
        "character", text, {"chunk_size": 200, "chunk_overlap": 0}
    )
    assert all(len(c) <= 200 for c in chunks)
    assert "".join(chunks) == text


def test_chunk_overlap_is_honored_on_merge_path(spark):
    """chunk_overlap must produce shared content between consecutive
    merged chunks, not only in the fixed-width fallback (review
    catch)."""
    from quackml_spark.functions.chunk import split_text

    paras = [f"paragraph {i} with some words here." for i in range(20)]
    text = "\n\n".join(paras)
    chunks = split_text(
        "recursive_character", text, {"chunk_size": 150, "chunk_overlap": 60}
    )
    assert len(chunks) >= 3
    overlapped = sum(
        1
        for a, b in zip(chunks, chunks[1:])
        if a[-30:].strip() and a[-30:].strip() in b
    )
    assert overlapped >= 1, chunks[:3]


def test_generate_null_prompt_has_no_literal_none(spark):
    """A NULL prompt must not surface as the literal string 'None' in
    the deterministic fallback's output (review catch)."""
    import pyspark.sql.functions as F

    from quackml_spark.functions.generate import make_generate_udf

    df = spark.createDataFrame([(1, None), (2, "hello")], "id long, txt string")
    udf = make_generate_udf(None, {"max_new_tokens": 4})
    out = {
        r["id"]: r["g"]
        for r in df.select("id", udf(F.col("txt")).alias("g")).collect()
    }
    assert not out[1].startswith("None")
    assert out[2].startswith("hello")


def test_word2vec_survives_null_text(spark):
    """A NULL text row must not crash MLlib Word2Vec with an opaque
    NullPointerException (review catch): it contributes no tokens."""
    from quackml_spark.functions.word2vec import doc_vectors, train_word2vec

    df = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta"), (1, None), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    model = train_word2vec(df, dim=4, min_count=1)
    vecs = doc_vectors(model, df)
    assert vecs.count() == 3
    assert "" not in {r["word"] for r in model.getVectors().collect()}


def test_finetune_failure_marks_model_failed(spark, tmp_path, monkeypatch):
    """An exception after the models row is inserted must flip it to
    'failed' (train() parity) — it stayed in_progress forever, so
    catalog views and deploy saw an eternally-running model (review
    catch)."""
    import pytest as _pytest

    import quackml_spark.ml.finetune as ft
    from quackml_spark.catalog import Catalog

    def boom(*a, **k):
        raise RuntimeError("fit exploded")

    monkeypatch.setattr(ft.NaiveBayesTextModel, "fit", boom)
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("hello world", "en"), ("bonjour monde", "fr")] * 5,
        "text string, class string",
    )
    with _pytest.raises(RuntimeError, match="fit exploded"):
        ft.finetune(spark, "ft fail", "text_classification", df=df, catalog=cat)
    models = cat.read("models")
    assert len(models) == 1
    assert models.iloc[0]["status"] == "failed"


def test_naive_bayes_unseen_default_is_per_class(spark):
    """The unseen-token default must be the per-class Laplace value
    log(1/(class_total+V)): the old constant log(1/V) made a token seen
    once in a LARGE class score below a class with no evidence at all,
    voting against the class it appeared in (review catch)."""
    from quackml_spark.ml.finetune import NaiveBayesTextModel

    # class 'big' has lots of tokens; 'rare-token' appears ONLY in big
    texts = [("filler" + str(i % 97)) * 1 for i in range(300)]
    big_texts = [" ".join(texts[i : i + 50]) for i in range(0, 250, 50)]
    big_texts[0] += " rare-token"
    small_texts = ["tiny doc here", "another tiny doc"]
    model = NaiveBayesTextModel.fit(
        big_texts + small_texts, ["big"] * len(big_texts) + ["small"] * 2
    )
    # a doc that is ONLY the rare token must classify as the class that
    # actually saw it
    assert model.predict("rare-token") == "big"
    # round-trip keeps the per-class defaults
    clone = NaiveBayesTextModel.from_json(model.to_json())
    assert clone.class_default == model.class_default


def test_predict_text_accepts_hf_artifacts(spark, tmp_path):
    """An HF-trained classifier artifact (trained_with=hf-trainer,
    classes, no 'model' key) must build a serving plan instead of
    raising 'not a text classifier' (review catch); without
    transformers on the worker, EXECUTING it raises the documented
    ImportError, never the misleading ValueError."""
    import json as _json
    import os

    import pytest as _pytest

    from quackml_spark.catalog import Catalog
    from quackml_spark.ml.finetune import predict_text

    cat = Catalog(warehouse=str(tmp_path / "wh"))
    pid = cat.insert("projects", {"name": "hf proj", "task": "text_classification"})
    mid = cat.insert(
        "models",
        {"project_id": pid, "snapshot_id": 1, "algorithm": "transformers",
         "status": "successful", "metrics": "{}"},
    )
    path = cat.model_dir(mid)
    os.makedirs(path, exist_ok=True)
    with open(path + "/checkpoint.json", "w") as f:
        _json.dump(
            {"task": "text_classification", "classes": ["a", "b"],
             "label2id": {"a": 0, "b": 1}, "trained_with": "hf-trainer"},
            f,
        )
    cat.insert("files", {"model_id": mid, "path": path, "part": 0})
    cat.insert(
        "deployments",
        {"project_id": pid, "model_id": mid, "strategy": "new_score"},
    )
    df = spark.createDataFrame([(1, "some text")], "id long, text string")
    out = predict_text(df, "hf proj", "text", catalog=cat)  # plan builds
    assert "predicted_class" in out.columns
    try:
        import transformers  # noqa: F401

        has_tf = True
    except ImportError:
        has_tf = False
    if not has_tf:
        with _pytest.raises(Exception, match="requires transformers"):
            out.collect()
