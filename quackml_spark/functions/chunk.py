"""chunk() — text splitters (api.rs:1309-1322, bindings/langchain).

The reference delegates to LangChain's splitters; the splitter *names*
and output shape ((chunk_index, chunk) rows) are the public contract.
Implemented natively (no langchain dependency): character and
recursive_character (with the per-language separator stacks LangChain
publishes for markdown/latex/python), honoring chunk_size and
chunk_overlap kwargs. nltk/spacy sentence splitters are import-gated.

Chunking runs as a pandas UDF returning array<string> followed by
posexplode — distributed, no driver collect.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SEPARATORS = {
    "recursive_character": ["\n\n", "\n", " ", ""],
    "markdown": ["\n## ", "\n### ", "\n\n", "\n", " ", ""],
    "latex": ["\\chapter{", "\\section{", "\\subsection{", "\n\n", "\n", " ", ""],
    "python": ["\nclass ", "\ndef ", "\n\tdef ", "\n\n", "\n", " ", ""],
}


def _split_fixed(text: str, size: int, overlap: int) -> list[str]:
    if not text:
        return []
    step = max(1, size - overlap)
    return [text[i : i + size] for i in range(0, len(text), step) if text[i : i + size]]


def _keep_sep_parts(text: str, sep: str) -> list[str]:
    """Split on ``sep`` keeping the separator at the START of each
    following part (LangChain keep_separator semantics): an earlier
    version dropped the separator, so chunks beginning at a split
    boundary lost their structural tokens — a markdown chunk started
    without its '## ', a python chunk without 'class ' (review
    catch). Concatenating the parts reproduces the input exactly."""
    raw = text.split(sep)
    return [p for p in ([raw[0]] + [sep + r for r in raw[1:]]) if p]


def _merge_parts(parts: list[str], size: int, overlap: int) -> list[str]:
    """Greedy merge of separator-carrying parts into chunks of at most
    ``size`` characters, retaining a tail of whole parts totalling at
    most ``chunk_overlap`` characters into the next chunk (the
    LangChain _merge_splits contract — overlap used to be honored only
    by the fixed-width fallback; review catch)."""
    chunks: list[str] = []
    buf: list[str] = []
    blen = 0
    fresh = False  # buf holds content not yet emitted
    for p in parts:
        if buf and blen + len(p) > size:
            chunks.append("".join(buf))
            keep: list[str] = []
            klen = 0
            for q in reversed(buf):
                if klen + len(q) > overlap:
                    break
                keep.insert(0, q)
                klen += len(q)
            buf, blen = keep, klen
            if blen + len(p) > size:  # tail + next part would overflow
                buf, blen = [], 0
            fresh = False
        buf.append(p)
        blen += len(p)
        fresh = True
    if buf and fresh:
        chunks.append("".join(buf))
    return [c for c in chunks if c]


def _split_recursive(text: str, separators: list[str], size: int, overlap: int) -> list[str]:
    if len(text) <= size:
        return [text] if text else []
    for i, sep in enumerate(separators):
        if sep == "":
            return _split_fixed(text, size, overlap)
        if sep in text:
            expanded: list[str] = []
            for part in _keep_sep_parts(text, sep):
                if len(part) > size:
                    expanded.extend(
                        _split_recursive(part, separators[i + 1 :], size, overlap)
                    )
                else:
                    expanded.append(part)
            return _merge_parts(expanded, size, overlap)
    return _split_fixed(text, size, overlap)


def _merge_sentences(sentences: list[str], size: int, sep: str = "\n\n") -> list[str]:
    """LangChain sentence-splitter semantics: sentence-tokenize, then
    greedily merge sentences into chunks of at most ``size`` characters
    joined by ``sep`` (NLTKTextSplitter / SpacyTextSplitter both do
    this merge after their tokenizers)."""
    chunks: list[str] = []
    buf: list[str] = []
    buf_len = 0
    for s in sentences:
        extra = len(s) + (len(sep) if buf else 0)
        if buf and buf_len + extra > size:
            chunks.append(sep.join(buf))
            buf, buf_len = [], 0
            extra = len(s)
        buf.append(s)
        buf_len += extra
    if buf:
        chunks.append(sep.join(buf))
    return [c for c in chunks if c]


def _split_sentences_nltk(text: str, size: int) -> list[str]:
    try:
        import nltk
    except ImportError as e:
        raise NotImplementedError(
            "chunk(splitter='nltk') requires the nltk package "
            "(langchain.py NLTKTextSplitter parity)"
        ) from e
    return _merge_sentences(nltk.sent_tokenize(text), size)


def _split_sentences_spacy(text: str, size: int, pipeline: str) -> list[str]:
    try:
        import spacy
    except ImportError as e:
        raise NotImplementedError(
            "chunk(splitter='spacy') requires the spacy package "
            "(langchain.py SpacyTextSplitter parity)"
        ) from e
    from quackml_spark.functions._cache import get_or_create

    nlp = get_or_create("spacy_pipelines", pipeline, lambda: spacy.load(pipeline))
    return _merge_sentences([s.text for s in nlp(text).sents], size)


_SENT_RE = None


def _split_sentences_regex(text: str, size: int) -> list[str]:
    """Dependency-free sentence splitter: break after [.!?]+ followed by
    whitespace and an upper-case/digit/quote sentence opener, protecting
    common abbreviations. Always executable — the fallback the nltk/
    spacy splitters gate down to in a bare container."""
    import re

    global _SENT_RE
    if _SENT_RE is None:
        # Split on whitespace ONLY (zero-width assertions around it), so
        # closing quotes/brackets after terminal punctuation stay in the
        # chunk text. Each abbreviation guard includes the trailing
        # period — the lookbehind position is AFTER the punctuation, so
        # a guard without the dot can never match.
        _SENT_RE = re.compile(
            r"(?<!\b[A-Z]\.)"            # not single-initial "J. Smith"
            r"(?<!\bDr\.)(?<!\bMr\.)(?<!\bMs\.)(?<!\bMrs\.)(?<!\bSt\.)"
            r"(?<!\be\.g\.)(?<!\bi\.e\.)(?<!\betc\.)(?<!\bvs\.)"
            # up to THREE closing quotes/brackets after the terminal
            # punctuation (Python lookbehind is fixed-width, so each
            # count is its own alternative; 'said "(Stop.)" Then' has 2)
            r"(?:(?<=[.!?])|(?<=[.!?][\"')\]])"
            r"|(?<=[.!?][\"')\]]{2})|(?<=[.!?][\"')\]]{3}))"
            r"\s+(?=[\"'(\[]?[A-Z0-9])"
        )
    sentences = [s for s in _SENT_RE.split(text) if s.strip()]
    return _merge_sentences(sentences, size, sep=" ")


def split_text(splitter: str, text: str, kwargs: dict) -> list[str]:
    size = int(kwargs.get("chunk_size", 4000))
    overlap = int(kwargs.get("chunk_overlap", 200))
    if splitter == "character":
        sep = kwargs.get("separator", "\n\n")
        if sep and sep in (text or ""):
            # split parts still merge back to chunk_size (LangChain's
            # CharacterTextSplitter contract) — returning the raw split
            # ignored chunk_size entirely for any text containing the
            # separator (review catch)
            expanded: list[str] = []
            for part in _keep_sep_parts(text or "", sep):
                if len(part) > size:
                    expanded.extend(_split_fixed(part, size, overlap))
                else:
                    expanded.append(part)
            return _merge_parts(expanded, size, overlap)
        return _split_fixed(text or "", size, overlap)
    if splitter in _SEPARATORS:
        return _split_recursive(text or "", _SEPARATORS[splitter], size, overlap)
    if splitter == "sentence":
        return _split_sentences_regex(text or "", size)
    if splitter == "nltk":
        return _split_sentences_nltk(text or "", size)
    if splitter == "spacy":
        return _split_sentences_spacy(
            text or "", size, kwargs.get("pipeline", "en_core_web_sm")
        )
    raise ValueError(
        f"unknown splitter {splitter!r}; supported: character, "
        f"recursive_character, markdown, latex, python, sentence, nltk, spacy"
    )


def make_chunk_udf(splitter: str, kwargs: dict | None = None):
    kw = dict(kwargs or {})

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_text(splitter, t, kw))

    return chunk_udf


def chunk(
    df: DataFrame,
    splitter: str,
    text_col: str,
    kwargs: dict | None = None,
) -> DataFrame:
    """Explode ``text_col`` into (chunk_index, chunk) rows, keeping the
    source row's other columns (table-function parity, api.rs:1309-1322)."""
    with_chunks = df.withColumn(
        "__qml_chunks", make_chunk_udf(splitter, kwargs)(F.col(text_col))
    )
    return with_chunks.select(
        *[c for c in df.columns],
        F.posexplode("__qml_chunks").alias("chunk_index", "chunk"),
    )
