"""Sequence packing + epoch expansion: value and plan checks beyond
the DuckDB oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prefix_sum_matches_local(spark):
    from quackml_spark.operators.packing import prefix_sum_by

    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: r["prefix_sum"]
        for r in prefix_sum_by(
            df, "w", ["id"], bucket_min=0, bucket_max=500
        ).collect()
    }
    acc = 0
    for i, w in rows:
        acc += w
        assert got[i] == acc, (i, got[i], acc)


def test_prefix_sum_correct_without_exchange_reuse(spark):
    """The static-bucket pid needs NO exchange reuse: the prefix must
    stay correct even with spark.sql.exchange.reuse=false — the regime
    where the old physical-partition-id formulation silently corrupted
    offsets when Catalyst's column pruning made the two branches'
    sampled range boundaries diverge (found live at sf0.1)."""
    from quackml_spark.operators.packing import prefix_sum_by

    rows = [(i, (i * 37) % 11 + 1, f"x{i}") for i in range(500)]
    # an extra column the offsets branch prunes away — the exact
    # profile that defeated exchange reuse in the old formulation
    df = spark.createDataFrame(rows, "id long, w long, extra string")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = {
            r["id"]: r["prefix_sum"]
            for r in prefix_sum_by(
                df, "w", ["id"], bucket_min=0, bucket_max=500
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    acc = 0
    for i, w, _ in rows:
        acc += w
        assert got[i] == acc, (i, got[i], acc)


def test_prefix_sum_extra_columns_do_not_corrupt(spark, sf_dir):
    """Regression for the live sf0.1 corruption: a caller frame with
    columns the offsets branch doesn't need must produce the same
    (correct) prefix sums as the minimal frame — repeatedly, since the
    old failure was nondeterministic across executions."""
    from quackml_spark.operators.packing import prefix_sum_by
    from quackml_spark.operators.text import md5_int32, tokens_expr
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
        "source",
        "text",
    )
    sized = (
        docs.where(F.col("n_tokens") > 0)
        .withColumn(
            "__prio",
            md5_int32(
                F.concat_ws("|", F.lit("0"), F.col("doc_id").cast("string"))
            ),
        )
        .withColumn("__one", F.lit(1))
    )
    expect = None
    for _ in range(3):
        idx = prefix_sum_by(sized, "__one", ["__prio", "doc_id"])
        rows = idx.select("__prio", "doc_id", "prefix_sum").collect()
        rows.sort(key=lambda r: (r["__prio"], r["doc_id"]))
        for i, r in enumerate(rows):
            assert r["prefix_sum"] == i + 1, (i, r)
        got = [r["doc_id"] for r in rows]
        if expect is None:
            expect = got
        assert got == expect


def test_pack_sequences_invariants(spark, sf_dir):
    """The packed layout must tile the stream exactly: consecutive docs
    (in the shuffled order) abut, segment spans match the div/mod
    arithmetic, and zero-token docs are absent."""
    from quackml_spark.operators.packing import _PACK_SEQ_LEN
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["text_pack_sequences"].builder(spark, sf_dir).collect()
    assert rows
    by_start = sorted(rows, key=lambda r: r["start_token"])
    pos = 0
    for r in by_start:
        assert r["n_tokens"] > 0
        assert r["start_token"] == pos  # no gaps, no overlaps
        pos += r["n_tokens"]
        assert r["first_seq"] == r["start_token"] // _PACK_SEQ_LEN
        assert r["last_seq"] == (r["start_token"] + r["n_tokens"] - 1) // _PACK_SEQ_LEN
        assert r["n_segments"] == r["last_seq"] - r["first_seq"] + 1
    # at least one doc must straddle a sequence boundary for the test
    # to mean anything (512-token sequences vs ~100-token docs)
    assert any(r["n_segments"] > 1 for r in rows)


def test_pack_sequences_rejects_bad_seq_len(spark):
    from quackml_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)


def test_epoch_expand_copy_semantics(spark):
    """floor(e) copies always; the fractional extra is the md5 ppm coin;
    a source missing from the epochs table defaults to one epoch; zero
    epochs drops the source entirely."""
    from quackml_spark.operators.packing import epoch_expand
    from quackml_spark.operators.sampling import PPM

    docs = spark.createDataFrame(
        [(i, "a" if i < 40 else ("b" if i < 80 else "c")) for i in range(120)],
        "doc_id long, source string",
    )
    eps = spark.createDataFrame(
        [("a", 2 * PPM + PPM // 2), ("b", 0)],  # a: 2.5 epochs, b: 0, c: absent
        "source string, epochs_ppm long",
    )
    out = epoch_expand(docs, eps).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # b-source docs vanish
    assert all(not (40 <= d < 80) for d in by_doc)
    # c-source docs default to exactly one copy
    for d in range(80, 120):
        assert [r["copy_idx"] for r in by_doc[d]] == [0]
    # a-source docs get 2 or 3 copies; the fraction is ~0.5
    counts = [len(by_doc[d]) for d in range(40)]
    assert set(counts) <= {2, 3} and 2 in counts and 3 in counts
    # copy_idx is dense 0..n-1 and n_copies consistent
    for d, rs in by_doc.items():
        idx = sorted(r["copy_idx"] for r in rs)
        assert idx == list(range(len(rs)))
        assert all(r["n_copies"] == len(rs) for r in rs)


def test_pack_plan_has_no_global_window(spark, sf_dir):
    """The packing plan must not contain a single-partition
    data-sized window: the only windows allowed are the config-bounded
    offsets cumulation and the per-partition-id running sum."""
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    df = REGISTRY["text_pack_sequences"].builder(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the data shuffles on the STATIC bucket pid (hash exchange — no
    # sampled range boundaries, no exchange-reuse dependence; the old
    # physical-pid formulation silently corrupted offsets when column
    # pruning defeated reuse)
    assert "hashpartitioning(__pid" in plan, plan[:2000]
    # the only range partitioning left is the registered query's final
    # orderBy(doc_id) output sort — the prefix sum itself samples no
    # range boundaries (its order key never range-partitions)
    assert "rangepartitioning(__prio" not in plan, plan[:2000]
    # the data-sized windows are the per-bucket running sum and the
    # config-bounded offsets cumulation — never a single-partition
    # window over the corpus relation. The SinglePartition exchange in
    # the plan must feed from the post-aggregate count rows
    # (HashAggregate), not directly from the arranged data.
    import re

    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n(.*?\n)", plan):
        nxt = m.group(1)
        assert "HashAggregate" in nxt or "Sort" in nxt, plan[:2000]


def test_fan_out_is_identity_on_shuffled_frames(spark):
    """fan_out must return already-shuffled frames UNTOUCHED: under AQE
    Dataset.rdd would execute the upstream shuffle stages just to read
    a partition count, and the real action would run them again
    (review catch — curate() takes arbitrary caller frames)."""
    from quackml_spark.operators.text import fan_out

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    agg = docs.groupBy("text").count()
    assert fan_out(agg) is agg
    joined = docs.join(docs.select("doc_id"), "doc_id")
    assert fan_out(joined) is joined
    # scan/local frames still fan out
    assert fan_out(docs).rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )


def test_fan_out_not_fooled_by_operator_names_in_literals(spark):
    """Shuffle detection anchors on plan-line operator names: a filter
    literal containing 'Join'/'Window' must not silently disable the
    fan-out (review catch)."""
    from quackml_spark.operators.text import fan_out

    import tempfile

    d = tempfile.mkdtemp() + "/docs"
    spark.createDataFrame(
        [(i, f"text Window Join {i}") for i in range(10)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d)
    # single-file scan (1 partition) + a filter whose LITERAL contains
    # operator names — the fan-out must still engage
    docs = spark.read.parquet(d).where("text like '%Join%'")
    assert docs.rdd.getNumPartitions() == 1
    out = fan_out(docs)
    assert out is not docs
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )


def test_bpe_token_counts_match_encode(spark):
    """The distinct-word LUT path must count exactly what encoding
    every occurrence would: sum over words of len(bpe_encode(word))."""
    from quackml_spark.operators.packing import bpe_token_counts
    from quackml_spark.operators.text import bpe_encode_expr, bpe_train

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the the the banana"),
            (3, "012 !!!"),  # no [a-z]+ words -> no row
            (4, "cat"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=4)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(bpe_encode_expr(F.col("text"), merges)).alias("n"),
        ).collect()
        if r["n"] > 0
    }
    assert got == want and 3 not in got
    # merges actually compress: fewer tokens than raw chars+markers
    raw = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(bpe_encode_expr(F.col("text"), [])).alias("n"),
        ).collect()
    }
    assert got[1] < raw[1]


def test_bpe_pack_differs_from_whitespace_pack(spark, sf_dir):
    """Tokenizer-true packing is not the whitespace proxy relabeled:
    at least one document's token count must differ, and the stream
    layout must stay internally consistent (contiguous, gap-free)."""
    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    bpe = {
        r["doc_id"]: r
        for r in REGISTRY["text_pack_sequences_bpe"]
        .builder(spark, sf_dir)
        .collect()
    }
    ws = {
        r["doc_id"]: r
        for r in REGISTRY["text_pack_sequences"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert any(
        bpe[d]["n_tokens"] != ws[d]["n_tokens"] for d in bpe if d in ws
    )
    # the BPE stream is gap-free: offsets sorted by start are contiguous
    rows = sorted(bpe.values(), key=lambda r: r["start_token"])
    pos = 0
    for r in rows:
        assert r["start_token"] == pos
        pos += r["n_tokens"]


def test_sequence_manifest_tiles_exactly(spark, sf_dir):
    """The manifest's segments must tile every sequence exactly — no
    gaps, no overlaps, full sequences sum to seq_len — and reassemble
    every document contiguously from doc_offset 0 to n_tokens."""
    from collections import defaultdict

    from quackml_spark.plans import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["text_sequence_manifest"].builder(spark, sf_dir).collect()
    by_seq = defaultdict(list)
    by_doc = defaultdict(list)
    for r in rows:
        by_seq[r["seq_id"]].append(r)
        by_doc[r["doc_id"]].append(r)
        assert r["shard_id"] == r["seq_id"] // 64
        assert r["seg_len"] > 0
    last_seq = max(by_seq)
    total = sum(r["seg_len"] for r in rows)
    for sid, segs in by_seq.items():
        segs.sort(key=lambda r: r["seg_start"])
        pos = 0
        for s in segs:  # contiguous tiling, no overlap
            assert s["seg_start"] == pos, (sid, s)
            pos += s["seg_len"]
        assert pos == (512 if sid < last_seq else total - last_seq * 512)
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_offset"])
        pos = 0
        for s in segs:  # the doc reassembles contiguously
            assert s["doc_offset"] == pos, (d, s)
            pos += s["seg_len"]


def test_prefix_sum_keeps_null_bucket_keys(spark):
    """A NULL leading-order key must stay in the stream (bucketed
    first, matching asc nulls-first), not vanish at the pid equi-join
    (review catch: NULL never equals NULL)."""
    from quackml_spark.operators.packing import prefix_sum_by

    df = spark.createDataFrame(
        [(None, 5), (10, 2), (20, 3)], "id long, w long"
    )
    rows = {
        r["id"]: r["prefix_sum"]
        for r in prefix_sum_by(
            df, "w", ["id"], bucket_min=0, bucket_max=100
        ).collect()
    }
    assert rows == {None: 5, 10: 7, 20: 10}
