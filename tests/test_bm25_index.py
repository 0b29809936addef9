"""Persisted BM25 inverted-index lifecycle: build/search/append/compact.

The exactness keystone is ADDITIVITY — df, n_docs and sum_dl are sums
over disjoint doc batches, so search(build(A) + append(B)) must be
bit-identical to search(build(A u B)) and to the corpus-rescanning
bm25_topk. Crash-replayed appends dedupe probe-bounded at search time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackml_spark.operators.text import (
    _bm25_std_queries,
    bm25_index_append,
    bm25_index_build,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_search,
    bm25_topk,
)
from quackml_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_bm25_index_matches_per_call_bm25(spark, sf_dir, tmp_path):
    """One-shot index search == the corpus-rescanning bm25_topk,
    bit-identical (same _bm25_rank tail, same exact-DECIMAL sums)."""
    docs = _docs(spark, sf_dir)
    q = _bm25_std_queries(docs)
    path = str(tmp_path / "bm25")
    bm25_index_build(docs, path)
    got = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    want = sorted(map(tuple, bm25_topk(docs, q).collect()))
    assert got == want and got


def test_bm25_append_equals_rebuild_and_replay_safe(spark, sf_dir, tmp_path):
    """build(head)+append(tail) == build(all); a crash-REPLAYED append
    (same run_key+batch_id written twice) changes nothing — duplicated
    postings/df/stats rows carry the attempt identity and dedupe
    probe-bounded at search."""
    docs = _docs(spark, sf_dir)
    q = _bm25_std_queries(docs)
    head, tail = docs.where("doc_id < 300"), docs.where("doc_id >= 300")

    full = str(tmp_path / "full")
    bm25_index_build(docs, full)
    want = sorted(map(tuple, bm25_index_search(spark, full, q).collect()))

    inc = str(tmp_path / "inc")
    bm25_index_build(head, inc)
    bm25_index_append(tail, inc, batch_id=1, run_key="runA")
    assert sorted(map(tuple, bm25_index_search(spark, inc, q).collect())) == want

    dup = str(tmp_path / "dup")
    bm25_index_build(head, dup)
    for _ in range(2):  # the replayed attempt writes twice
        bm25_index_append(tail, dup, batch_id=1, run_key="runA")
    assert sorted(map(tuple, bm25_index_search(spark, dup, q).collect())) == want


def test_bm25_search_reads_only_index_and_pushes_term_filter(
    spark, sf_dir, tmp_path
):
    """The search plan scans index files ONLY (no documents parquet),
    and the query-term probe reaches the postings scan as a pushed
    filter over the tok-sorted files."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "bm25")
    bm25_index_build(docs, path)
    # a LITERAL query frame (the std query set would legitimately read
    # documents.parquet to derive its terms — that's the query
    # definition, not a corpus rescan)
    terms = (
        _bm25_std_queries(docs).select("tok").distinct().limit(3).collect()
    )
    q = spark.createDataFrame(
        [(1, r["tok"]) for r in terms], "query_id bigint, tok string"
    )
    out = bm25_index_search(spark, path, q)
    assert out.count() > 0
    files = out.inputFiles()
    assert files and all("documents" not in f for f in files), files[:3]
    jvm = spark.sparkContext._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the probe must reach the postings scan as a PARTITION filter over
    # the terms' tok_bucket dirs (planning-time pruning — an IN list
    # past the parquet pushdown threshold degrades to a useless min/max
    # range filter, which is why the layout buckets instead of sorting
    # globally; SCALE.md §39)
    seg = [s for s in plan.split("Location")
           if "postings" in s[:400] and "PartitionFilters" in s]
    assert seg and "tok_bucket" in seg[0].split("PartitionFilters", 1)[1][:400], (
        plan[:3000]
    )


def test_bm25_index_compact_preserves_results(spark, sf_dir, tmp_path):
    """Compaction rewrites the small-file append debt without changing
    any search result; the file count strictly drops."""
    import glob

    docs = _docs(spark, sf_dir)
    q = _bm25_std_queries(docs)
    path = str(tmp_path / "bm25")
    bm25_index_build(docs.where("doc_id < 200"), path)
    for i, lo in enumerate(range(200, 500, 100), start=1):
        bm25_index_append(
            docs.where(f"doc_id >= {lo} AND doc_id < {lo + 100}"),
            path,
            batch_id=i,
        )
    before = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    n_before = len(glob.glob(f"{path}/postings/tok_bucket=*/*.parquet"))
    stats = bm25_index_compact(spark, path)
    n_after = len(glob.glob(f"{path}/postings/tok_bucket=*/*.parquet"))
    assert n_after < n_before, (n_before, n_after, stats)
    after = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    assert after == before


def test_bm25_index_guards(spark, sf_dir, tmp_path):
    """Missing manifest fails loudly (half-built index); an empty query
    set returns an empty, correctly-typed frame."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "bm25")
    bm25_index_build(docs, path)
    empty = spark.createDataFrame([], "query_id bigint, tok string")
    out = bm25_index_search(spark, path, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "doc_id", "bm25", "rnk",
    ]

    import shutil

    shutil.rmtree(f"{path}/manifest.parquet")
    with pytest.raises(ValueError, match="manifest"):
        bm25_index_search(spark, path, _bm25_std_queries(docs))


def test_bm25_search_joined_degrade_path_bit_identical(spark, sf_dir, tmp_path):
    """broadcast_terms=False (the corpus-sized-probe degrade: probe by
    distributed equi-join, no driver vocabulary collect, no static
    pruning) must return exactly the default path's rows — including
    through deletes and re-appends (the tombstone mask is shared)."""
    docs = _docs(spark, sf_dir)
    q = _bm25_std_queries(docs)
    path = str(tmp_path / "bm25")
    bm25_index_build(docs.where("doc_id < 400"), path)
    bm25_index_delete(
        docs.where("doc_id < 400 AND doc_id % 10 = 2"), path, batch_id=1
    )
    bm25_index_append(docs.where("doc_id >= 400"), path, batch_id=2)
    want = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    got = sorted(
        map(
            tuple,
            bm25_index_search(
                spark, path, q, broadcast_terms=False
            ).collect(),
        )
    )
    assert got == want and got


def test_bm25_delete_recrawl_equals_fresh_build(spark, sf_dir, tmp_path):
    """The recrawl contract: build(v1) + delete(removed+changed, fed
    v1's INDEXED rows) + append(added+changed from v2) is bit-identical
    to build(v2) — deletes are negative additive deltas plus a
    tombstone horizon; a crash-REPLAYED delete changes nothing."""
    docs = _docs(spark, sf_dir)
    q = _bm25_std_queries(docs)
    # v1: docs %7==3 missing, %5==0 stale text, plus retired extras
    v1 = (
        docs.where("doc_id % 7 != 3")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.lit("stale "), "text")
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where("doc_id % 19 = 0").select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.lit("retired "), "text").alias("text"),
            )
        )
    )
    # removed = the shifted retired extras; changed = every v1 doc
    # carrying stale text (v1 already excludes the %7==3 added docs)
    retire = v1.where("doc_id >= 2000000 OR doc_id % 5 = 0")
    ingest = docs.where("doc_id % 7 = 3 OR doc_id % 5 = 0")

    fresh = str(tmp_path / "fresh")
    bm25_index_build(docs, fresh)
    want = sorted(map(tuple, bm25_index_search(spark, fresh, q).collect()))

    inc = str(tmp_path / "inc")
    bm25_index_build(v1, inc)
    for _ in range(2):  # the delete attempt crash-replays
        bm25_index_delete(retire, inc, batch_id=1, run_key="del1")
    bm25_index_append(ingest, inc, batch_id=2)
    got = sorted(map(tuple, bm25_index_search(spark, inc, q).collect()))
    assert got == want and got


def test_bm25_delete_then_compact_drops_dead_rows(spark, sf_dir, tmp_path):
    """Compaction applies the tombstone horizon physically: the dead
    docs' postings rows disappear from disk, every search result is
    unchanged, and a changed doc re-appended at a later batch SURVIVES
    its own tombstone through the rewrite."""
    docs = _docs(spark, sf_dir).where("doc_id < 400")
    path = str(tmp_path / "bm25")
    bm25_index_build(docs, path)
    gone = docs.where("doc_id % 10 = 1")          # plain removals
    changed = docs.where("doc_id % 10 = 2")       # delete + re-append
    bm25_index_delete(gone.unionByName(changed), path, batch_id=1)
    bm25_index_append(
        changed.select(
            "doc_id", F.concat(F.lit("v2 "), "text").alias("text")
        ),
        path,
        batch_id=2,
    )
    q = spark.createDataFrame([(1, "v2"), (2, "the")], "query_id long, tok string")
    before = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    dead_ids = {r["doc_id"] for r in gone.select("doc_id").collect()}
    assert not any(r[1] in dead_ids for r in before)
    # the re-appended changed docs are retrievable by their new token
    v2_hits = {t[1] for t in before if t[0] == 1}
    assert v2_hits and all(d % 10 == 2 for d in v2_hits)

    rows_before = spark.read.parquet(f"{path}/postings").count()
    bm25_index_compact(spark, path)
    rows_after = spark.read.parquet(f"{path}/postings").count()
    assert rows_after < rows_before
    # exactly the retired generation disappeared: gone docs' rows + the
    # changed docs' PRE-delete rows; the batch-2 re-appends survive
    live = spark.read.parquet(f"{path}/postings")
    assert live.where(F.col("doc_id").isin(list(dead_ids))).count() == 0
    assert live.where("batch_id = 2").count() > 0
    assert live.where(
        (F.col("doc_id") % 10 == 2) & (F.col("batch_id") < 1)
    ).count() == 0
    after = sorted(map(tuple, bm25_index_search(spark, path, q).collect()))
    assert after == before


def test_streaming_bm25_ingest_multibatch_equals_oneshot(spark, tmp_path):
    """Per-micro-batch appends over ANY drain shape produce an index
    bit-identical to one-shot indexing (additivity), including across
    a STOP/RESTART with a shared checkpoint: the restarted stream
    indexes only the new files, and a search still equals the one-shot
    result."""
    from quackml_spark.streaming.events import streaming_bm25_ingest

    rows = {
        0: [(10, "alpha beta gamma delta"), (11, "beta beta epsilon")],
        1: [(20, "alpha zeta eta theta"), (21, "iota kappa beta")],
        2: [(30, "gamma gamma gamma mu"), (31, "nu xi alpha beta")],
    }
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for bid in (0, 1):
        spark.createDataFrame(rows[bid], "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(in_dir / f"b{bid}"))
    seed = spark.createDataFrame(
        [(1, "alpha seed doc beta")], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    bm25_index_build(seed, idx)
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )
        q = streaming_bm25_ingest(
            stream, idx, query_name="qml_bm25_mb", checkpoint_location=ckpt
        )
        q.awaitTermination()

    drain()  # batches 0 and 1, one file per trigger
    # new data arrives; the RESTARTED stream must index only it
    spark.createDataFrame(rows[2], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(in_dir / "b2"))
    drain()

    oneshot = str(tmp_path / "oneshot")
    bm25_index_build(
        seed.unionByName(
            spark.createDataFrame(
                [r for b in rows.values() for r in b],
                "doc_id long, text string",
            )
        ),
        oneshot,
    )
    q = spark.createDataFrame(
        [(1, "alpha"), (1, "beta"), (2, "gamma"), (2, "mu"), (3, "kappa")],
        "query_id long, tok string",
    )
    got = sorted(map(tuple, bm25_index_search(spark, idx, q).collect()))
    want = sorted(map(tuple, bm25_index_search(spark, oneshot, q).collect()))
    assert got == want and got
