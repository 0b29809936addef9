"""Fixture parity for the text-generation metric families (§2.10 tail).

The reference scores summarization/translation finetunes with sacrebleu
corpus BLEU + the `rouge` package (transformers.py:650-770), QA with
SQuAD-style EM/F1 helpers (transformers.py:791-810), and text
generation with exp(mean NLL) perplexity (transformers.py:836-880).
Expected values below are hand-computed from those published
definitions, NOT from re-running this module's own code.
"""

from __future__ import annotations

import math

import pytest

from quackml_spark.ml.metrics import (
    bleu_corpus,
    bleu_sufficient_stats,
    generation_metrics_df,
    generation_text_metrics,
    normalize_text,
    perplexity_from_logprobs,
    qa_exact_match,
    qa_f1,
    question_answering_metrics,
    _rouge_pair,
)


def test_bleu_identical_is_100():
    assert bleu_corpus(["the cat sat on the mat"], ["the cat sat on the mat"]) == pytest.approx(100.0)


def test_bleu_hand_computed():
    # pred 5 tokens vs ref 6: clipped precisions 5/5, 3/4, 2/3, 1/2;
    # BP = exp(1 - 6/5). Hand value: 57.89300674674101.
    got = bleu_corpus(["the cat sat on mat"], ["the cat sat on the mat"])
    assert got == pytest.approx(57.89300674674101, abs=1e-9)


def test_bleu_sufficient_stats_shape():
    st = bleu_sufficient_stats("the cat sat on mat", "the cat sat on the mat")
    assert st == [5, 3, 2, 1, 5, 4, 3, 2, 5, 6]


def test_bleu_13a_punctuation_split():
    # 13a tokenizes punctuation: "cat." == "cat ." as 2 tokens
    st = bleu_sufficient_stats("cat.", "cat .")
    assert st[8] == 2 and st[9] == 2 and st[0] == 2


def test_bleu_corpus_pools_counts():
    # corpus BLEU pools counts across pairs; one perfect + one empty
    # pred still scores below 100 but above the empty-only corpus
    mixed = bleu_corpus(["a b c d", ""], ["a b c d", "a b c d"])
    assert 0.0 < mixed < 100.0


def test_rouge_hand_computed():
    rp = _rouge_pair("the cat sat", "the cat slept")
    eps = 1e-8
    p = r = 2 / 3
    assert rp["rouge-1"]["p"] == pytest.approx(p)
    assert rp["rouge-1"]["f"] == pytest.approx(2 * p * r / (p + r + eps))
    assert rp["rouge-2"]["p"] == pytest.approx(0.5)
    assert rp["rouge-l"]["r"] == pytest.approx(2 / 3)


def test_generation_text_metrics_keys_match_reference():
    out = generation_text_metrics(["a b"], ["a b"])
    # exact key set the reference returns (transformers.py:673-682),
    # plus the rouge_lcs_* extension
    for k in (
        "bleu",
        "rouge_ngram_f1", "rouge_ngram_precision", "rouge_ngram_recall",
        "rouge_bigram_f1", "rouge_bigram_precision", "rouge_bigram_recall",
    ):
        assert k in out
    assert out["rouge_ngram_f1"] == pytest.approx(1.0, abs=1e-7)


def test_normalize_text_squad():
    assert normalize_text("The  Cat, sat!") == "cat sat"
    assert normalize_text("An apple a day") == "apple day"


def test_qa_em_f1_hand_computed():
    assert qa_exact_match("The Cat.", "the cat") == 1
    assert qa_f1("The cat sat", "a cat sat on mat") == pytest.approx(2 * 1.0 * 0.5 / 1.5)
    # empty-vs-empty agreement = 1; empty-vs-nonempty = 0
    assert qa_f1("", "") == 1.0
    assert qa_f1("", "cat") == 0.0
    m = question_answering_metrics(["the cat", "dog"], ["cat", "bird"])
    assert m["exact_match"] == pytest.approx(0.5)


def test_perplexity_from_logprobs():
    assert perplexity_from_logprobs([-math.log(2)] * 8) == pytest.approx(2.0)
    assert perplexity_from_logprobs([0.0, 0.0]) == pytest.approx(1.0)


def test_generation_metrics_df_matches_pure(spark):
    preds = ["the cat sat on mat", "a quick brown fox jumps", "hello world . ."]
    refs = ["the cat sat on the mat", "the quick brown fox jumped", "hello there world"]
    df = spark.createDataFrame(list(zip(preds, refs)), "pred string, ref string")
    got = generation_metrics_df(df, "pred", "ref")
    want = generation_text_metrics(preds, refs)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_sequence_pack_result_invariant_to_sharding(spark):
    """The packed output is a pure function of the token stream — the
    prefix-sum shard count must not change it (sequence_pack now
    delegates to the shared prefix_sum_by; the round-7 driver-collected
    shard offsets are gone)."""
    from quackml_spark.operators.text import sequence_pack

    docs = spark.range(200).selectExpr(
        "id as doc_id",
        "repeat('tok ', cast(id % 17 + 1 as int)) as text",
    )
    a = sequence_pack(docs, seq_len=32).orderBy("doc_id").collect()
    b = sequence_pack(docs, seq_len=32, n_shards=5).orderBy("doc_id").collect()
    assert a == b
    # spot-check the stream is contiguous: start of doc i == cumsum
    cum = 0
    for r in a:
        assert r["start_tok"] == cum
        cum += r["n_tokens"]


def test_bpe_train_sennrich_example(spark):
    """Hand-checked BPE merges on the classic low/lower/newest/widest
    corpus (Sennrich et al. 2016 §3.2 shape): 5x low, 2x lower,
    6x newest, 3x widest. Ties break by pair string ascending."""
    from quackml_spark.operators.text import bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    merges = bpe_train(docs, n_merges=8)
    got = [(m[1], m[2], m[3], m[4]) for m in merges]
    assert got == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("est", "</w>", "est</w>", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
        ("e", "w", "ew", 6),
        ("ew", "est</w>", "ewest</w>", 6),
        ("n", "ewest</w>", "newest</w>", 6),
    ]


def test_bpe_train_stops_when_no_pairs_left(spark):
    """A corpus of single-char words exhausts after merging each char
    with </w>: bpe_train returns fewer merges than asked instead of
    failing on an empty argmax."""
    from quackml_spark.operators.text import bpe_train

    docs = spark.createDataFrame([(0, "a b a b a")], "doc_id int, text string")
    merges = bpe_train(docs, n_merges=8)
    assert [(m[1], m[2], m[4]) for m in merges] == [("a", "</w>", 3), ("b", "</w>", 2)]


def test_bpe_encode_roundtrip_with_learned_merges(spark):
    """Encoding the training corpus with its own learned merges yields
    exactly the symbols the trainer's final vocab state implies: 'low'
    -> [low, </w>]... and concatenating tokens (minus </w>) restores
    each word."""
    import pyspark.sql.functions as F
    from quackml_spark.operators.text import bpe_train, bpe_encode_expr

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    merges = bpe_train(docs, n_merges=8)
    probe = spark.createDataFrame(
        [(0, "low lower newest widest lowest")], "doc_id int, text string"
    )
    toks = probe.select(
        bpe_encode_expr(F.col("text"), merges).alias("toks")
    ).first()["toks"]
    assert toks == [
        "low", "</w>",                  # low: merged fully, marker unattached
        "low", "e", "r", "</w>",        # lower
        "newest</w>",                   # newest: fully merged incl. marker
        "w", "i", "d", "est</w>",       # widest
        "low", "est</w>",               # lowest: unseen word, known subwords
    ]
    # lossless: stripping markers and joining restores the words
    joined = "".join(t.replace("</w>", " ") for t in toks).split()
    assert joined == ["low", "lower", "newest", "widest", "lowest"]


def test_html_extract_roundtrip_recovers_text(spark, sf_dir):
    """The wrap -> extract roundtrip must recover every document's text
    exactly (whitespace-normalized): one kept prose line per doc, equal
    to the original text, with all nav/title/script/footer boilerplate
    gone."""
    import re

    from quackml_spark.plans import REGISTRY, _load_all
    from quackml_spark.sources import load_table

    _load_all()
    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_html_extract"].builder(spark, sf_dir).collect()
    }
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        norm = re.sub(r"[ \t\r]+", " ", r["text"]).strip()
        g = got[r["doc_id"]]
        assert g["n_kept_lines"] == 1, r["doc_id"]
        assert g["content"] == norm, r["doc_id"]


def test_html_extract_handles_entities_and_boilerplate(spark):
    """Direct operator checks: entities decode, short/boilerplate lines
    drop, block tags split lines, script bodies never leak."""
    from quackml_spark.operators.text import html_extract

    page = (
        "<html><head><style>b{}</style></head><body>"
        "<nav>Home About Contact</nav>"
        "<p>The quick brown fox jumps over the lazy dog &amp; friends</p>"
        "<script>leaked secret token here none shall pass</script>"
        "<div>Tom &quot;Big&quot; Smith said it&#39;s less than &lt;great&gt; honestly</div>"
        "<footer>Copyright</footer></body></html>"
    )
    df = spark.createDataFrame([(1, page)], "id int, html string")
    row = html_extract(df, "html").collect()[0]
    lines = row["content"].split("\n")
    assert row["n_kept_lines"] == 2
    assert lines[0] == "The quick brown fox jumps over the lazy dog & friends"
    assert lines[1] == 'Tom "Big" Smith said it\'s less than <great> honestly'
    assert "secret" not in row["content"]


def test_bpe_adjacent_repeats_merge_fully(spark):
    """The banana case (code-review catch): a single padded string
    replace consumes the shared separator and merges only alternating
    occurrences of a pair in a run. Both training and encoding must
    merge ALL non-overlapping occurrences, like the standard symbol-
    sequence pass: banana + (a,n) -> b an an a </w>."""
    import pyspark.sql.functions as F
    from quackml_spark.operators.text import bpe_encode_expr, bpe_train

    probe = spark.createDataFrame([(0, "banana")], "doc_id int, text string")
    toks = probe.select(
        bpe_encode_expr(F.col("text"), [(1, "a", "n", "an", 0)]).alias("t")
    ).first()["t"]
    assert toks == ["b", "an", "an", "a", "</w>"]

    # training on pure banana: merge 1 is (a,n) x6; merges 2-5 then walk
    # the fully-merged vocab 'b an an a </w>' up to 'banana</w>' —
    # the sequence is hand-derivable ONLY if pass 1 merged both 'an's
    docs = spark.createDataFrame(
        [(i, "banana") for i in range(3)], "doc_id int, text string"
    )
    merges = bpe_train(docs, n_merges=5)
    assert [(m[1], m[2], m[4]) for m in merges] == [
        ("a", "n", 6),
        ("a", "</w>", 3),
        ("an", "a</w>", 3),
        ("an", "ana</w>", 3),
        ("b", "anana</w>", 3),
    ]


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_hand_computed(spark):
    """Corpus 'a b', 'a b', 'a c': c12(a,b)=2 c12(a,c)=1, c1(a)=3,
    n1(a)=2, r2(b)=1 r2(c)=1, T=2 types. KN with D=0.75:
    P(b|a) = (2-.75)/3 + .75*2/3*(1/2) = 0.41666... + 0.25 = 0.6666...
    P(c|a) = (1-.75)/3 + .25 = 0.33333..."""
    import math

    from quackml_spark.operators.text import bigram_lm, doc_bigrams

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    lm = bigram_lm(doc_bigrams(docs))
    got = {(r["w1"], r["w2"]): r["logp"] for r in lm["model"].collect()}
    assert math.isclose(got[("a", "b")], math.log(2.0 / 3.0), rel_tol=1e-12)
    assert math.isclose(got[("a", "c")], math.log(1.0 / 3.0), rel_tol=1e-12)


def test_bigram_score_backoff_paths(spark):
    """Scoring docs with unseen bigrams exercises every backoff branch
    and never yields NULL/NaN: seen pair, unseen pair w/ seen context,
    unseen context w/ seen continuation, both-unseen."""
    import math

    from quackml_spark.operators.text import (
        bigram_lm,
        bigram_score,
        doc_bigrams,
    )

    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    lm = bigram_lm(doc_bigrams(train))
    new = spark.createDataFrame(
        [
            (10, "a b"),  # seen bigram
            (11, "a z"),  # seen context, unseen continuation
            (12, "z b"),  # unseen context, seen continuation
            (13, "z q"),  # both unseen
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in bigram_score(doc_bigrams(new), lm).collect()
    }
    assert set(rows) == {10, 11, 12, 13}
    for r in rows.values():
        assert r["mean_logp"] is not None and not math.isnan(r["mean_logp"])
        assert r["ppl"] > 0
    # seen pair scores exactly P(b|a)=2/3
    assert math.isclose(rows[10]["mean_logp"], round(math.log(2 / 3), 6))
    # unseen pair with seen context: D*n1/c1 * 0.5/T = .75*2/3*.25
    assert math.isclose(rows[11]["mean_logp"], round(math.log(0.75 * 2 / 3 * 0.25), 6))
    # unseen context, seen continuation: r2/T = 1/2
    assert math.isclose(rows[12]["mean_logp"], round(math.log(0.5), 6))
    # both unseen: 0.5/T = 0.25
    assert math.isclose(rows[13]["mean_logp"], round(math.log(0.25), 6))
    # better-modeled text has lower perplexity
    assert rows[10]["ppl"] < rows[11]["ppl"]


def test_line_dedup_removes_frequent_lines_preserves_order(spark):
    from quackml_spark.operators.text import line_dedup

    boiler = "accept cookies"
    rows = [
        (i, f"unique head {i}\n{boiler}\nunique tail {i}") for i in range(10)
    ] + [(99, boiler)]  # all-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, max_freq=5).collect()}
    assert len(out) == 11
    for i in range(10):
        assert out[i]["clean_text"] == f"unique head {i}\nunique tail {i}"
        assert out[i]["n_kept"] == 2 and out[i]["n_dropped"] == 1
    assert out[99]["n_kept"] == 0 and out[99]["clean_text"] == ""


def test_line_dedup_keeps_lines_at_threshold(spark):
    from quackml_spark.operators.text import line_dedup

    # a line shared by exactly max_freq docs is KEPT (<=, not <)
    rows = [(i, f"shared line\nown {i}") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup(docs, max_freq=3).collect()
    assert all(r["n_dropped"] == 0 for r in out)


def test_bigram_score_uses_trained_discount(spark):
    """Backoff branches must use the SAME discount the model was
    trained with (code-review catch: a hardcoded 0.75 would silently
    mix two probability models)."""
    import math

    from quackml_spark.operators.text import (
        bigram_lm,
        bigram_score,
        doc_bigrams,
    )

    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    lm = bigram_lm(doc_bigrams(train), discount=0.5)
    new = spark.createDataFrame([(11, "a z")], "doc_id long, text string")
    row = bigram_score(doc_bigrams(new), lm).collect()[0]
    # seen context, unseen continuation: D*n1/c1 * 0.5/T with D=0.5
    assert math.isclose(row["mean_logp"], round(math.log(0.5 * 2 / 3 * 0.25), 6))


def test_line_dedup_literal_separator_with_regex_metachar(spark):
    """sep is a LITERAL: '|' must not become regex alternation
    (code-review catch — it would split every character)."""
    from quackml_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [(1, "keep me|boiler"), (2, "also keep|boiler")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, sep="|", max_freq=1).collect()}
    assert out[1]["clean_text"] == "keep me"
    assert out[2]["clean_text"] == "also keep"
    assert out[1]["n_dropped"] == 1


def test_line_dedup_roundtrip_property(spark):
    """With an unreachable frequency threshold line_dedup must be the
    identity: split + count + join + ordered reassembly reconstructs
    every document byte-exactly (empty lines, repeated lines,
    leading/trailing separators included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from quackml_spark.operators.text import line_dedup

    lines = st.text(
        alphabet=st.characters(blacklist_characters="\n", codec="utf-8"),
        max_size=12,
    )
    docs_strategy = st.lists(
        st.lists(lines, min_size=1, max_size=6).map("\n".join),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=15, deadline=None)
    @given(docs_strategy)
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["clean_text"]
            for r in line_dedup(df, max_freq=10**9).collect()
        }
        assert out == dict(enumerate(texts))

    check()


def test_skipgram_pairs_window_semantics(spark):
    """Window clipping at both edges, pair counts, and in-document
    negatives — the invariants embedding-training data prep relies on."""
    from quackml_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    rows = skipgram_pairs(df, window=2).collect()
    toks = ["a", "b", "c", "d", "e"]
    # pair count: sum over positions of clipped window sizes
    assert len(rows) == 2 + 3 + 4 + 3 + 2
    for r in rows:
        assert r["center"] == toks[r["pos"]]
        assert r["context"] == toks[r["pos"] + r["off"]]
        assert 1 <= abs(r["off"]) <= 2
        assert r["negative"] in toks  # in-document draw
    # determinism across partitioning
    a = sorted(map(tuple, rows))
    b = sorted(
        map(tuple, skipgram_pairs(df.repartition(7), window=2).collect())
    )
    assert a == b


def test_trigram_lm_hand_computed(spark):
    """Corpus 'a b c' + 'a b d': by symmetry the full KN ladder gives
    P(c|ab) = P(d|ab) = 0.5 exactly — (1-.75)/2 + .75*(2/2)*[
    (1-.75)/2 + .75*(2/2)*(1/2) ]."""
    import math

    from quackml_spark.operators.text import doc_trigrams, trigram_lm

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"], r["w3"]): r["logp"]
        for r in trigram_lm(doc_trigrams(docs)).collect()
    }
    assert math.isclose(got[("a", "b", "c")], math.log(0.5), rel_tol=1e-12)
    assert math.isclose(got[("a", "b", "d")], math.log(0.5), rel_tol=1e-12)


def test_trigram_lm_observed_mass_bounded(spark, sf_dir):
    """Interpolated KN is a proper conditional distribution: the
    probability mass over OBSERVED continuations of any (w1, w2)
    context never exceeds 1 (the remainder is reserved for unseen
    continuations)."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.text import doc_trigrams, trigram_lm
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    model = trigram_lm(doc_trigrams(docs))
    worst = (
        model.groupBy("w1", "w2")
        .agg(F.sum(F.exp("logp")).alias("mass"))
        .agg(F.max("mass"))
        .collect()[0][0]
    )
    assert worst <= 1.0 + 1e-9, worst


def test_ranked_by_matches_global_row_number(spark):
    """The two-phase natural-order rank must equal a ROW_NUMBER over
    the same ordering — including duplicate sort keys straddling range
    partition boundaries, and at different shard counts."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.text import ranked_by

    rows = [(i, i % 7) for i in range(500)]  # heavy ties on the key
    df = spark.createDataFrame(rows, "id long, k long")
    expected = {
        r["id"]: r["rn"]
        for r in spark.createDataFrame(rows, "id long, k long")
        .selectExpr("id", "k")
        .selectExpr(
            "id", "row_number() over (order by k desc, id) as rn"
        )
        .collect()
    }
    for shards in (3, 17):
        got = {
            r["id"]: r["rank"]
            for r in ranked_by(
                df, [F.desc("k"), F.asc("id")], n_shards=shards
            ).collect()
        }
        assert got == expected


def test_bpe_train_leaves_cache_empty(spark, sf_dir):
    """bpe_train cached its word-frequency vocab and then rebound the
    handle inside the merge loop, so the finally-block unpersist was a
    plan-mismatch no-op — the ranked_by leak class the r7 verdict
    flagged (review catch). After a full run the session cache must be
    EMPTY."""
    from quackml_spark.operators.text import bpe_train
    from quackml_spark.sources import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe_train(docs, n_merges=3)
    assert merges  # the run actually merged something
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "bpe_train leaked its cached vocab relation"
    )


def test_fingerprint_short_docs_match_oracle(spark, tmp_path):
    """Docs with < 3 tokens must emit (fingerprint NULL, n_shingles 0)
    — the partial-shingle rendering diverged from the oracle's NULL
    concat and the index read was out of bounds under ANSI (review
    catch)."""
    from quackml_spark.plans import REGISTRY
    from quackml_spark.testing import compare, duckdb_connection

    rows = [
        (0, "solo"),
        (1, "two tokens"),
        (2, "three tokens here"),
        (3, ""),
        (4, "a much longer document with plenty of words inside"),
    ]
    d = str(tmp_path / "sf_fp")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d + "/documents.parquet")
    qd = REGISTRY["text_fingerprint"]
    out = {r["doc_id"]: r.asDict() for r in qd.builder(spark, d).collect()}
    assert set(out) == {0, 1, 2, 3, 4}  # every doc keeps its row
    for short in (0, 1, 3):
        assert out[short]["fingerprint"] is None
        assert out[short]["n_shingles"] == 0
    assert out[2]["fingerprint"] is not None and out[2]["n_shingles"] == 1
    ok, msg = compare(qd.builder(spark, d), duckdb_connection(d), qd.oracle)
    assert ok, msg


def test_countmin_estimate_unseen_item_reads_zero(spark):
    """A count-min readout must treat an empty cell as 0: the
    inner-join version computed the min over only the cells other
    grams happened to touch (overcount) and dropped fully-unseen items
    from the output entirely (review catch)."""
    from quackml_spark.operators.text import countmin_build, countmin_estimate

    items = spark.createDataFrame(
        [("apple",)] * 5 + [("banana",)] * 2, "gram string"
    )
    sketch = countmin_build(items, "gram")
    queries = spark.createDataFrame(
        [("apple",), ("never-inserted-gram",)], "gram string"
    )
    est = {
        r["gram"]: r["cm_estimate"]
        for r in countmin_estimate(queries, sketch).collect()
    }
    assert set(est) == {"apple", "never-inserted-gram"}
    assert est["apple"] >= 5  # overcount-only guarantee intact
    assert est["never-inserted-gram"] == 0


def test_pii_scan_catches_uppercase_emails(spark):
    """The email pattern must be case-insensitive by character class:
    the scan runs over UN-lowered text, and the lowercase-only pattern
    silently skipped 'John.Doe@Example.com' — a false-negative leak
    from the redaction component (review catch)."""
    from quackml_spark.operators.text import pii_scan

    df = spark.createDataFrame(
        [(1, "Contact John.Doe@Example.COM for details")],
        "id long, text string",
    )
    row = pii_scan(df, "text").collect()[0]
    assert row["n_email"] == 1
    assert row["has_pii"] is True
    assert "Example" not in row["redacted_tail"]
    assert "<EMAIL>" in row["redacted_tail"]


def test_html_entity_decode_does_not_double_decode(spark):
    """&amp; must decode LAST: a page displaying the literal text
    '&lt;b&gt;' is encoded '&amp;lt;b&amp;gt;', and decoding &amp;
    first fabricated live '<b>' markup from escaped source text
    (review catch)."""
    from quackml_spark.operators.text import html_extract_expr

    html = (
        "<html><body><p>the snippet &amp;lt;b&amp;gt; shows raw markup "
        "escaping in seven plus words</p></body></html>"
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(html,)], "page string")
    out = df.select(
        html_extract_expr(F.col("page"))["content"].alias("content")
    ).collect()[0]["content"]
    assert "&lt;b&gt;" in out
    assert "<b>" not in out


def test_mean_token_len_ignores_all_whitespace(spark, tmp_path):
    """Tabs/newlines must not count as token characters: tokens split
    on \\S+ but the old numerator stripped only ASCII spaces (review
    catch). 'a<TAB>b<NL>c' = 3 one-char tokens -> mean 1.0, and the
    planted table still hash-matches the oracle."""
    from quackml_spark.plans import REGISTRY
    from quackml_spark.testing import compare, duckdb_connection

    d = str(tmp_path / "sf_ws")
    spark.createDataFrame(
        [(0, "a\tb\nc"), (1, "plain words here")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    qd = REGISTRY["text_token_stats"]
    out = {r["doc_id"]: r.asDict() for r in qd.builder(spark, d).collect()}
    assert out[0]["n_tokens"] == 3
    assert out[0]["mean_token_len"] == 1.0
    ok, msg = compare(qd.builder(spark, d), duckdb_connection(d), qd.oracle)
    assert ok, msg


def test_gopher_rules_boundaries(spark):
    """Each Gopher rule at its exact integer boundary: the
    cross-multiplied arithmetic must flip precisely at the published
    thresholds."""
    from quackml_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            # 50 words x 5 chars, 2 required stops -> passes everything
            (1, "the be " + " ".join(["abcde"] * 48)),
            # 49 words -> fails word count only
            (2, "the be " + " ".join(["abcde"] * 47)),
            # mean word length exactly 10 passes; 10.02 fails:
            # 50 words x 10 chars
            (3, "the be" + " " + " ".join(["abcdefghij"] * 48)),
            # symbol ratio: 5 hashes in 50 words = exactly 0.1 -> passes;
            # 6 -> fails
            (4, "the be " + " ".join(["abcde"] * 43) + " # # # # #"),
            (5, "the be " + " ".join(["abcde"] * 42) + " # # # # # #"),
            # alpha fraction exactly 0.8: 40 alpha / 50 words passes
            (6, "the be " + " ".join(["abcde"] * 38) + " " + " ".join(["123"] * 10)),
            # 39 alpha / 50 -> fails
            (7, "the be " + " ".join(["abcde"] * 37) + " " + " ".join(["123"] * 11)),
            # only one required stop word -> fails rule_stops
            (8, "the xx " + " ".join(["abcde"] * 48)),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[1]["gopher_keep"] is True
    assert got[2]["rule_word_count"] is False and got[2]["rule_word_len"] is True
    assert got[3]["rule_word_len"] is True  # mean exactly 10.0 via "the be"
    assert got[4]["rule_symbol"] is True and got[4]["n_words"] == 50
    assert got[5]["rule_symbol"] is False
    assert got[6]["rule_alpha"] is True and got[6]["alpha_words"] == 40
    assert got[7]["rule_alpha"] is False
    assert got[8]["rule_stops"] is False and got[8]["n_req_stops"] == 1
