"""Property tests for the round-10 set-similarity / triangle / CDC
operators: Spark results vs PURE-PYTHON references on
hypothesis-generated inputs — arbitrary token sets (including
separator-hostile tokens), arbitrary graphs, arbitrary strings. The
DuckDB oracles replay the same algorithms; these tests replay the
DEFINITIONS."""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_jaccard_pairs(doc_tokens: dict[int, set[str]], t_ppm: int):
    """Definition-level brute force in exact integer arithmetic."""
    out = {}
    for a, b in combinations(sorted(doc_tokens), 2):
        sa, sb = doc_tokens[a], doc_tokens[b]
        if not sa or not sb:
            continue
        c = len(sa & sb)
        if c * 1_000_000 >= t_ppm * (len(sa) + len(sb) - c):
            out[(a, b)] = c
    return set(out)


_token = st.text(
    alphabet=st.sampled_from(list("ab\x1f:")), min_size=1, max_size=3
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.dictionaries(
        st.integers(0, 15),
        st.frozensets(_token, min_size=1, max_size=8),
        min_size=2,
        max_size=8,
    ),
    t_ppm=st.sampled_from([100_000, 500_000, 900_000, 1_000_000]),
    collapse=st.booleans(),
)
def test_ppjoin_matches_python_brute_force(spark, docs, t_ppm, collapse):
    """Both collapse modes return exactly the definition's pair set —
    on token alphabets chosen to stress the separator-ambiguity class
    ('\\x1f' and ':' ARE tokens here)."""
    from quackml_spark.operators.dedup import set_similarity_join

    rows = [(d, t) for d, toks in docs.items() for t in toks]
    tokens = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in set_similarity_join(
            tokens, t_ppm, collapse_exact=collapse
        ).collect()
    }
    assert got == _py_jaccard_pairs(docs, t_ppm)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=25
    )
)
def test_triangle_stats_matches_python_brute_force(spark, edges):
    from quackml_spark.operators.graph import triangle_stats

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in simple for n in e}
    tri = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {(a, b), (a, c), (b, c)} <= simple
    )
    deg = {n: sum(1 for e in simple if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    df = spark.createDataFrame(
        list(edges) or [(None, None)], "src long, dst long"
    )
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == tri
    assert row["n_edges"] == len(simple)
    assert row["n_nodes"] == len(nodes)
    assert row["n_wedges"] == wedges


def _py_cdc_chunks(text: str, window: int = 16, mask: int = 64):
    """Independent pure-Python replay of the Buzhash windowed CDC rule:
    window hash = XOR of 16-bit gear codes rotated by their distance
    from the window end; boundary iff hash % mask == 0."""
    from quackml_spark.operators.dedup import _GEAR

    def rotl16(x, r):
        return ((x << r) & 0xFFFF) | (x >> (16 - r)) if r else x

    n = len(text)
    cuts = [1]
    if n >= window + 1:
        codes = [_GEAR[ord(c) % 256] for c in text]
        for i in range(2, n - window + 2):
            gh = 0
            for k in range(window):
                gh ^= rotl16(codes[i - 1 + k], (window - 1 - k) % 16)
            if gh % mask == 0:
                cuts.append(i)
    cuts.append(n + 1)
    return [text[cuts[k] - 1 : cuts[k + 1] - 1] for k in range(len(cuts) - 1)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    text=st.text(
        # includes astral-plane chars (emoji, musical symbol): Spark's
        # ascii()/split('')/length() and Python's ord()/iteration must
        # agree at CODEPOINT granularity for the gear lookup to match —
        # a UTF-16-code-unit regression in any of them breaks here
        # (advice r11: the ASCII corpus was masking this contract)
        alphabet=st.sampled_from(list("abc XY.") + ["😀", "𝄞", "中"]),
        max_size=300,
    )
)
def test_cdc_chunks_match_python_reference(spark, text):
    """Chunk boundaries and contents replay the 1-based-substr
    definition exactly, arbitrary input — including texts shorter than
    the window, the empty string, and non-BMP codepoints."""
    from quackml_spark.operators.dedup import cdc_chunks

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["chunk_idx"], r["chunk_hash"], r["chunk_chars"])
        for r in sorted(
            cdc_chunks(docs).collect(), key=lambda r: r["chunk_idx"]
        )
    ]
    want = [
        (i, hashlib.md5(c.encode()).hexdigest(), len(c))
        for i, c in enumerate(_py_cdc_chunks(text))
    ]
    assert got == want


def test_cdc_oracle_parity_non_bmp(spark):
    """Engine vs DuckDB CDC replay on text containing astral-plane
    codepoints: Spark F.ascii and DuckDB ord must agree mod 256 for
    every char class or boundary positions silently diverge (advice
    r11 — the registered oracle only ever sees the ASCII corpus, so
    this pins the cross-engine codepoint contract directly)."""
    import duckdb

    from quackml_spark.operators.dedup import _CDC_ORACLE, cdc_dedup_stats

    base = "the quick brown fox 😀 jumps 𝄞 over the lazy dog 中文 " * 8
    rows = [(1, base), (2, base + " tail"), (3, "😀" * 40), (4, "short")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = cdc_dedup_stats(docs).collect()[0].asDict()
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    cols, vals = None, None
    cur = con.execute(_CDC_ORACLE)
    cols = [d[0] for d in cur.description]
    vals = cur.fetchone()
    want = dict(zip(cols, vals))
    assert got == want


def _py_shingles(text: str) -> set[str]:
    toks = text.lower().split()
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    } if len(toks) >= 3 else set()


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.dictionaries(st.integers(0, 11), _text, min_size=2, max_size=10),
    t_ppm=st.sampled_from([300_000, 500_000, 900_000]),
)
def test_setsim_index_check_matches_python_brute_force(spark, docs, t_ppm):
    """build(even ids) + check(odd ids) returns exactly the bipartite
    pairs of the word-3-gram Jaccard definition at the probed
    threshold — arbitrary tiny corpora, thresholds, sub-shingle docs."""
    import tempfile

    from quackml_spark.operators.dedup import (
        setsim_index_build,
        setsim_index_check,
    )

    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )
    path = tempfile.mkdtemp(prefix="ss_prop_") + "/idx"
    setsim_index_build(df.where("doc_id % 2 = 0"), path, threshold_ppm=t_ppm)
    got = {
        (r["new_doc_id"], r["index_doc_id"])
        for r in setsim_index_check(df.where("doc_id % 2 = 1"), path).collect()
    }
    want = set()
    for q, qtext in docs.items():
        if q % 2 == 0:
            continue
        sq = _py_shingles(qtext)
        if not sq:
            continue
        for i, itext in docs.items():
            if i % 2 == 1:
                continue
            si = _py_shingles(itext)
            if not si:
                continue
            c = len(sq & si)
            if c * 1_000_000 >= t_ppm * (len(sq) + len(si) - c):
                want.add((q, i))
    assert got == want


def test_ppjoin_oracle_separator_ambiguity_guard(spark):
    """The oracle's exact-collapse signature md5s tokens to FIXED WIDTH
    before the sorted concat — a raw-text join with a separator char is
    ambiguous when a TOKEN contains the separator (\\x01 is \\S, so it
    survives tokenization into shingles), which would merge different
    token sets into one signature and emit wrong pairs. Engine and
    oracle must agree on a \\x01-laden corpus (r12 self-review catch:
    the first oracle collapse used string_agg(tok, chr(1)))."""
    import duckdb
    import pandas as pd

    from quackml_spark.operators.dedup import (
        _ppjoin_oracle_sql,
        _shingles_sql,
        set_similarity_join,
        word_shingles,
    )

    texts = [
        (1, "a b c\x01d e f g"),
        (2, "a b c d\x01e f g"),
        (3, "a b c d e f g"),
        (4, "a b c d e f g"),  # exact dup of 3
        (5, "x\x01y a b x\x01y a b"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    eng = sorted(
        map(tuple, set_similarity_join(word_shingles(docs), 500_000).collect())
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(texts, columns=["doc_id", "text"]))
    ora = sorted(
        map(
            tuple,
            con.execute(_ppjoin_oracle_sql(_shingles_sql(), 500_000)).fetchall(),
        )
    )
    assert eng == ora
    assert (3, 4, 1.0) in eng  # the exact dup survives the collapse
