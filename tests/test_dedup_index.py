"""Incremental dedup index: build-once / check-many (the no-reshingle
ingest path), mirroring test_ivf_index's persistence + manifest
coverage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quackml_spark.operators.dedup import (
    dedup_index_build,
    dedup_index_check,
    doc_band_keys,
)
from quackml_spark.sources import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_idx") / "idx")
    dedup_index_build(load_table(spark, sf_dir, "documents"), path)
    return path


def test_check_flags_planted_duplicates(spark, sf_dir, index_path):
    """A new batch containing verbatim copies of indexed docs (new ids)
    plus one genuinely fresh doc: every copy is flagged against its
    source with all 4 bands shared; the fresh doc is not flagged."""
    docs = load_table(spark, sf_dir, "documents")
    copies = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    fresh = spark.createDataFrame(
        [(999999, "zq xv jk qp wy zzyzx unseen gibberish shingle salad entirely")],
        "doc_id long, text string",
    )
    out = dedup_index_check(copies.union(fresh), index_path).collect()
    hits = {(r["new_doc_id"], r["index_doc_id"]): r["shared_bands"] for r in out}
    for i in range(5):
        assert hits.get((900000 + i, i)) == 4, f"copy of doc {i} not fully flagged"
    assert not any(n == 999999 for (n, _) in hits), "fresh doc falsely flagged"


def test_check_reads_index_not_rebuild(spark, sf_dir, index_path):
    """The check scans the persisted bands parquet — the index side of
    the join must come from files under the index path."""
    docs = load_table(spark, sf_dir, "documents").limit(1)
    df = dedup_index_check(docs, index_path)
    assert any("bands" in f for f in df.inputFiles()), df.inputFiles()[:3]


def test_check_equals_selfjoin_of_band_keys(spark, sf_dir, index_path):
    """Checking the corpus against its own index reproduces exactly the
    dedup_minhash_lsh pair relation (restricted to cross-id pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    via_index = {
        (r["new_doc_id"], r["index_doc_id"]): r["shared_bands"]
        for r in dedup_index_check(docs, index_path).collect()
        if r["new_doc_id"] < r["index_doc_id"]
    }
    bands = doc_band_keys(docs)
    a = bands.select(F.col("doc_id").alias("x"), "band_id", "band_key")
    b = bands.select(F.col("doc_id").alias("y"), "band_id", "band_key")
    direct = {
        (r["x"], r["y"]): r["n"]
        for r in a.join(b, ["band_id", "band_key"])
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert via_index == direct and len(direct) > 0


def test_manifest_geometry_mismatch_rejected(spark, sf_dir, tmp_path):
    """An index whose manifest records different MinHash geometry must
    fail loudly (silently missing every duplicate is the failure mode
    the manifest exists to prevent)."""
    path = str(tmp_path / "bad_idx")
    docs = load_table(spark, sf_dir, "documents").limit(5)
    dedup_index_build(docs, path)
    spark.createDataFrame(
        [(8, 4, 2, 2147483647, 3, 5)],
        "k int, bands int, rows_per_band int, modulus bigint, "
        "shingle_width int, n_docs bigint",
    ).write.mode("overwrite").parquet(f"{path}/manifest.parquet")
    with pytest.raises(ValueError, match="hash geometry"):
        dedup_index_check(docs, path)


def test_missing_manifest_rejected(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="no manifest"):
        dedup_index_check(
            load_table(spark, sf_dir, "documents").limit(1),
            str(tmp_path / "nonexistent"),
        )


def test_streaming_index_dedup_incremental(spark, sf_dir, tmp_path):
    """Micro-batch 1: a verbatim copy of an indexed doc is flagged
    via the index; a fresh doc passes and its bands are appended.
    Micro-batch 2: a copy of batch-1's FRESH doc is flagged via the
    now-grown index — the incremental append is what catches it.
    Intra-batch: two identical new docs in one batch -> larger id
    flagged 'batch'."""
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_index_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_build(docs.where("doc_id < 100"), index_path)

    base = {r["doc_id"]: r["text"] for r in docs.where("doc_id < 100").collect()}
    fresh1 = "zq glorp wib nux trelm kov yant plib sorn dask emph rolt quen"
    fresh2 = "mandel brot vexi loom charn ostra pelk dwim frag nolt serp haze"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(1000, base[3]), (1001, fresh1), (1002, fresh2), (1003, fresh2)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    spark.createDataFrame(
        [(2000, fresh1), (2001, "totally novel again kwisatz haderach melange")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    sink: list = []
    q = streaming_index_dedup(stream, index_path, sink=sink)
    q.awaitTermination()

    by_doc = {r["doc_id"]: r for r in sink}
    assert set(by_doc) == {1000, 1001, 1002, 1003, 2000, 2001}
    assert by_doc[1000]["is_dup"] and by_doc[1000]["via"] == "index"
    assert not by_doc[1001]["is_dup"]
    assert not by_doc[1002]["is_dup"]
    # intra-batch twin: larger id loses
    assert by_doc[1003]["is_dup"] and by_doc[1003]["via"] == "batch"
    # batch 2: fresh1's copy is caught by the APPENDED index entry
    assert by_doc[2000]["is_dup"] and by_doc[2000]["via"] == "index"
    assert not by_doc[2001]["is_dup"]


def test_streaming_index_dedup_parquet_decision_log(spark, sf_dir, tmp_path):
    """Without a sink list the decisions land in the index's parquet
    decision log (the production path — no driver materialization)."""
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_index_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_build(docs.where("doc_id < 50"), index_path)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base3 = docs.where("doc_id = 3").first()["text"]
    spark.createDataFrame(
        [(9000, base3), (9001, "fresh saga of the wandering xylograph")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b1"))

    q = streaming_index_dedup(
        spark.readStream.schema("doc_id long, text string").parquet(str(in_dir / "*")),
        index_path,
        query_name="qml_index_dedup_log",
    )
    q.awaitTermination()
    log = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{index_path}/decisions").collect()
    }
    assert log[9000]["is_dup"] and log[9000]["via"] == "index"
    assert not log[9001]["is_dup"] and log[9001]["via"] is None


def test_streaming_index_dedup_checkpoint_restart_no_replay(spark, sf_dir, tmp_path):
    """With a checkpointLocation, restarting the drained query replays
    nothing: the decision log gains zero rows and the index gains zero
    band rows on the second run."""
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_index_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_build(docs.where("doc_id < 50"), index_path)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(7000, "a fresh chronicle of the obsidian archipelago")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = streaming_index_dedup(
            spark.readStream.schema("doc_id long, text string").parquet(
                str(in_dir / "*")
            ),
            index_path,
            query_name="qml_idx_ckpt",
            checkpoint_location=ckpt,
        )
        q.awaitTermination()

    run()
    decisions = spark.read.parquet(f"{index_path}/decisions").count()
    bands = spark.read.parquet(f"{index_path}/bands").count()
    run()  # restart over the same source + checkpoint: nothing replays
    assert spark.read.parquet(f"{index_path}/decisions").count() == decisions
    assert spark.read.parquet(f"{index_path}/bands").count() == bands


def test_dedup_index_compact_preserves_content_and_shrinks_files(
    spark, sf_dir, tmp_path
):
    """After several appends the band dirs hold many small files;
    compaction must shrink the file count without changing a single
    row, and the compacted index must answer checks identically."""
    from quackml_spark.operators.dedup import dedup_index_compact
    from quackml_spark.sources import load_table
    from quackml_spark.streaming.events import streaming_index_dedup

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_build(docs.where("doc_id < 100"), index_path)
    # three appends -> three extra files per touched band partition
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        spark.createDataFrame(
            [(5000 + i, f"completely novel saga number {i} of the windlass")],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(in_dir / f"b{i}"))
    q = streaming_index_dedup(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*")),
        index_path,
        sink=[],
        query_name="qml_idx_compact_feed",
    )
    q.awaitTermination()

    before = {
        (r["doc_id"], r["band_id"], r["band_key"])
        for r in spark.read.parquet(f"{index_path}/bands").collect()
    }
    stats = dedup_index_compact(spark, index_path)["bands"]
    after = {
        (r["doc_id"], r["band_id"], r["band_key"])
        for r in spark.read.parquet(f"{index_path}/bands").collect()
    }
    assert after == before
    assert stats["files_after"] < stats["files_before"]

    copy = docs.where("doc_id = 7").select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    hits = dedup_index_check(copy, index_path).collect()
    assert any(r["index_doc_id"] == 7 for r in hits)


def test_dedup_index_compact_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """A crash between the two swap renames leaves bands_old as the
    only copy; the next compact run must roll it back and complete."""
    import os
    import shutil

    from quackml_spark.operators.dedup import dedup_index_compact
    from quackml_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "idx")
    dedup_index_build(docs.where("doc_id < 60"), index_path)
    before = {
        (r["doc_id"], r["band_id"], r["band_key"])
        for r in spark.read.parquet(f"{index_path}/bands").collect()
    }
    # simulate the crash point: bands renamed away, tmp half-written
    os.rename(f"{index_path}/bands", f"{index_path}/bands_old")
    os.makedirs(f"{index_path}/bands_compact_tmp/junk")
    dedup_index_compact(spark, index_path)
    after = {
        (r["doc_id"], r["band_id"], r["band_key"])
        for r in spark.read.parquet(f"{index_path}/bands").collect()
    }
    assert after == before
    assert not os.path.exists(f"{index_path}/bands_old")
    assert not os.path.exists(f"{index_path}/bands_compact_tmp")


# ---------------------------------------------------------------------------
# Exact set-similarity index (setsim_index_build / check / append)
# ---------------------------------------------------------------------------


def _setsim_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")


def test_setsim_check_matches_brute_force(spark, sf_dir):
    """The persisted-prefix probe is LOSSLESS: exactly the pairs a
    brute-force bipartite Jaccard join returns, same values."""
    from quackml_spark.operators.dedup import (
        setsim_index_build,
        setsim_index_check,
        word_shingles,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    path = str(__import__("tempfile").mkdtemp(prefix="ss_brute_")) + "/idx"
    setsim_index_build(even, path)
    got = sorted(map(tuple, setsim_index_check(odd, path).collect()))

    sh = word_shingles(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        distinct=True,
    ).select("doc_id", F.col("shingle").alias("tok"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    q = sh.where("doc_id % 2 = 1").select(
        F.col("doc_id").alias("new_doc_id"), "tok"
    )
    i = sh.where("doc_id % 2 = 0").select(
        F.col("doc_id").alias("index_doc_id"), "tok"
    )
    common = q.join(i, "tok").groupBy("new_doc_id", "index_doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    sq = sizes.select(F.col("doc_id").alias("new_doc_id"), F.col("n").alias("nq"))
    si = sizes.select(
        F.col("doc_id").alias("index_doc_id"), F.col("n").alias("ni")
    )
    jac = F.col("c").cast("decimal(18,6)") / (
        F.col("nq") + F.col("ni") - F.col("c")
    )
    want = sorted(
        map(
            tuple,
            common.join(sq, "new_doc_id")
            .join(si, "index_doc_id")
            .where(
                F.col("c") * 1000000
                >= 500000 * (F.col("nq") + F.col("ni") - F.col("c"))
            )
            .select(
                "new_doc_id",
                "index_doc_id",
                F.round(jac, 6).cast("double").alias("jaccard"),
            )
            .collect(),
        )
    )
    assert got == want
    assert got  # the corpus has cross-parity near-dups to find


def test_setsim_append_equals_rebuild_with_unseen_tokens(spark, sf_dir, tmp_path):
    """check-after-append == from-scratch rebuild, byte-identical —
    the frozen-order contract: appended docs (including tokens the
    build never saw) rank under the stored df with unseen tokens
    last, and exactness is order-independent."""
    from quackml_spark.operators.dedup import (
        setsim_index_append,
        setsim_index_build,
        setsim_index_check,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    novel = spark.createDataFrame(
        [(7000, "zzq xxv wwy uup ttr zzq xxv wwy"),
         (7002, "zzq xxv wwy uup ttr zzq xxv qqk")],
        "doc_id long, text string",
    )
    probe = odd.unionByName(
        spark.createDataFrame(
            [(7001, "zzq xxv wwy uup ttr zzq xxv wwy")],
            "doc_id long, text string",
        )
    )
    inc = str(tmp_path / "inc") + "/idx"
    setsim_index_build(even.where("doc_id < 500"), inc)
    setsim_index_append(even.where("doc_id >= 500"), inc, batch_id=1)
    setsim_index_append(novel, inc, batch_id=2)
    full = str(tmp_path / "full") + "/idx"
    setsim_index_build(even.unionByName(novel), full)
    r_inc = sorted(map(tuple, setsim_index_check(probe, inc).collect()))
    r_full = sorted(map(tuple, setsim_index_check(probe, full).collect()))
    assert r_inc == r_full
    # the planted all-unseen-token doc matches its indexed twin exactly
    assert any(a == 7001 and b == 7000 and j == 1.0 for a, b, j in r_inc)
    # probe docs are never paired with each other (7001 vs odd docs)
    assert all(b % 2 == 0 or b >= 7000 for _a, b, _j in r_inc)


def test_setsim_check_replay_duplicates_harmless(spark, sf_dir, tmp_path):
    """A crash-replayed append (same batch_id + run_key written twice)
    duplicates an indexed doc's rows for every LATER consumer — the
    verify count must stay duplicate-insensitive: check results are
    byte-identical to the single-append index, with no inflated
    jaccard (a doubled COUNT(*) pushed sub-threshold pairs over 0.5
    and emitted jaccard > 1.0 before the countDistinct fix)."""
    from quackml_spark.operators.dedup import (
        setsim_index_append,
        setsim_index_build,
        setsim_index_check,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    clean = str(tmp_path / "clean") + "/idx"
    setsim_index_build(even.where("doc_id < 500"), clean)
    setsim_index_append(
        even.where("doc_id >= 500"), clean, batch_id=3, run_key="runA"
    )
    dup = str(tmp_path / "dup") + "/idx"
    setsim_index_build(even.where("doc_id < 500"), dup)
    for _ in range(2):  # the replayed attempt writes twice
        setsim_index_append(
            even.where("doc_id >= 500"), dup, batch_id=3, run_key="runA"
        )
    r_clean = sorted(map(tuple, setsim_index_check(odd, clean).collect()))
    r_dup = sorted(map(tuple, setsim_index_check(odd, dup).collect()))
    assert r_clean == r_dup
    assert all(j <= 1.0 for _a, _b, j in r_dup)
    # the current attempt itself still excludes its own rows
    own = setsim_index_check(
        even.where("doc_id >= 500"),
        dup,
        exclude_batch=3,
        exclude_run="runA",
    )
    assert all(r["index_doc_id"] < 500 for r in own.collect())


def test_setsim_check_concurrent_twin_reps_exact(spark, sf_dir, tmp_path):
    """Two CONCURRENT appenders (different run_keys) each register a
    rep row for the same never-seen signature — each excludes only its
    own attempt from the known-signature lookup, so neither sees the
    other's rows. Both twin reps survive verification with identical
    jaccard; the check must still emit each (new_doc_id, index_doc_id)
    pair exactly ONCE (advice r11: the expansion distinct was keyed on
    the rep, so twin reps doubled every pair for that signature —
    collapsing to the signature fixed it)."""
    from quackml_spark.operators.dedup import (
        setsim_index_append,
        setsim_index_build,
        setsim_index_check,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    clean = str(tmp_path / "clean") + "/idx"
    setsim_index_build(even.where("doc_id < 500"), clean)
    setsim_index_append(
        even.where("doc_id >= 500"), clean, batch_id=3, run_key="runA"
    )
    twin = str(tmp_path / "twin") + "/idx"
    setsim_index_build(even.where("doc_id < 500"), twin)
    # two writers race the same batch: neither attempt sees the other's
    # reps rows, so every new signature gets TWO rep registrations
    setsim_index_append(
        even.where("doc_id >= 500"), twin, batch_id=3, run_key="runA"
    )
    setsim_index_append(
        even.where("doc_id >= 500"), twin, batch_id=3, run_key="runB"
    )
    r_clean = sorted(map(tuple, setsim_index_check(odd, clean).collect()))
    r_twin = sorted(map(tuple, setsim_index_check(odd, twin).collect()))
    assert r_clean == r_twin
    # no pair appears twice
    keys = [(a, b) for a, b, _j in r_twin]
    assert len(keys) == len(set(keys))


def test_setsim_check_threshold_contract(spark, sf_dir, tmp_path):
    """Probing below the built threshold raises (stored prefixes too
    short); probing at a HIGHER threshold works and returns the
    subset of pairs clearing it."""
    from quackml_spark.operators.dedup import (
        setsim_index_build,
        setsim_index_check,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    path = str(tmp_path / "thr") + "/idx"
    setsim_index_build(even, path, threshold_ppm=500_000)
    with pytest.raises(ValueError, match="too short"):
        setsim_index_check(odd, path, threshold_ppm=400_000)
    base = {
        (r["new_doc_id"], r["index_doc_id"]): r["jaccard"]
        for r in setsim_index_check(odd, path).collect()
    }
    high = {
        (r["new_doc_id"], r["index_doc_id"]): r["jaccard"]
        for r in setsim_index_check(odd, path, threshold_ppm=800_000).collect()
    }
    assert set(high) == {k for k, j in base.items() if j * 1e6 >= 800_000 - 1}
    for k, j in high.items():
        assert j == base[k]


def test_setsim_index_compact_preserves_results(spark, sf_dir, tmp_path):
    """Three appends leave multi-file debt in prefix/toks/sizes; the
    compactor collapses it (shared two-rename swap, flat-dir mode) and
    check results are byte-identical before/after."""
    import os

    from quackml_spark.operators.dedup import (
        setsim_index_append,
        setsim_index_build,
        setsim_index_check,
        setsim_index_compact,
    )

    even, odd = _setsim_docs(spark, sf_dir)
    path = str(tmp_path / "cmp") + "/idx"
    setsim_index_build(even.where("doc_id < 300"), path)
    for b, lo, hi in ((1, 300, 600), (2, 600, 900), (3, 900, 10_000)):
        setsim_index_append(
            even.where(f"doc_id >= {lo} AND doc_id < {hi}"), path, batch_id=b
        )

    def _nfiles(sub):
        return sum(
            1 for f in os.listdir(f"{path}/{sub}") if f.endswith(".parquet")
        )

    before = sorted(map(tuple, setsim_index_check(odd, path).collect()))
    nf_before = _nfiles("prefix")
    assert nf_before >= 4  # build + 3 appends
    stats = setsim_index_compact(spark, path)
    assert stats["prefix"]["files_after"] < nf_before
    after = sorted(map(tuple, setsim_index_check(odd, path).collect()))
    assert before == after


def test_band_index_delete_lifecycle(spark, sf_dir, tmp_path):
    """dedup_index_delete retires docs from the band index: their bands
    stop matching, a crash-replayed delete is a no-op, a changed doc
    re-appended at a later batch matches through its NEW bands only,
    and compact applies the horizon physically with check results
    unchanged."""
    from quackml_spark.operators.dedup import (
        dedup_index_append,
        dedup_index_build,
        dedup_index_check,
        dedup_index_compact,
        dedup_index_delete,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corp = docs.where("doc_id < 400")
    path = str(tmp_path / "bands")
    dedup_index_build(corp, path)

    gone = corp.where("doc_id % 10 = 1")
    changed = corp.where("doc_id % 10 = 2")
    for _ in range(2):  # delete crash-replays
        dedup_index_delete(
            spark, path,
            gone.select("doc_id").unionByName(changed.select("doc_id")),
            batch_id=1, run_key="del1",
        )
    dedup_index_append(
        changed.select("doc_id", F.concat(F.lit("v2 "), "text").alias("text")),
        path, batch_id=2,
    )
    # probe with exact copies of a gone doc and a changed doc
    probe = (
        gone.limit(1).select((F.col("doc_id") + 9000).alias("doc_id"), "text")
        .unionByName(
            changed.limit(1).select(
                (F.col("doc_id") + 9100).alias("doc_id"),
                F.concat(F.lit("v2 "), "text").alias("text"),
            )
        )
    )
    gone_ids = {r["doc_id"] for r in gone.select("doc_id").collect()}
    hits = dedup_index_check(probe, path).collect()
    assert hits, "the changed-copy probe must match its re-appended twin"
    assert not any(r["index_doc_id"] in gone_ids for r in hits)
    assert any(r["index_doc_id"] % 10 == 2 for r in hits)

    before = sorted(map(tuple, hits))
    n_phys = spark.read.parquet(f"{path}/bands").count()
    dedup_index_compact(spark, path)
    n_live = spark.read.parquet(f"{path}/bands").count()
    assert n_live < n_phys
    live = spark.read.parquet(f"{path}/bands")
    assert live.where(F.col("doc_id").isin(list(gone_ids))).count() == 0
    assert sorted(map(tuple, dedup_index_check(probe, path).collect())) == before


def test_setsim_delete_lifecycle_and_orphan_reclaim(spark, sf_dir, tmp_path):
    """setsim_index_delete masks membership: retired docs vanish from
    check output, a changed doc re-appends under its new signature,
    compact drops dead members physically AND reclaims fully-retired
    signatures' probe state (reps/prefix/toks/sizes) keyed by write
    identity — the re-appended doc's NEW rows survive — and a doc with
    a reclaimed token set appended later re-registers and matches."""
    from quackml_spark.operators.dedup import (
        setsim_index_append,
        setsim_index_build,
        setsim_index_check,
        setsim_index_compact,
        setsim_index_delete,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corp = docs.where("doc_id < 300")
    path = str(tmp_path / "ss")
    setsim_index_build(corp, path)
    gone = corp.where("doc_id % 10 = 1")
    changed = corp.where("doc_id % 10 = 2")
    for _ in range(2):
        setsim_index_delete(
            spark, path,
            gone.select("doc_id").unionByName(changed.select("doc_id")),
            batch_id=1, run_key="del1",
        )
    setsim_index_append(
        changed.select("doc_id", F.concat(F.lit("v2 "), "text").alias("text")),
        path, batch_id=2,
    )
    probe = (
        gone.limit(1).select((F.col("doc_id") + 9000).alias("doc_id"), "text")
        .unionByName(
            changed.limit(1).select(
                (F.col("doc_id") + 9100).alias("doc_id"),
                F.concat(F.lit("v2 "), "text").alias("text"),
            )
        )
    )
    gone_ids = {r["doc_id"] for r in gone.select("doc_id").collect()}
    hits = setsim_index_check(probe, path).collect()
    assert hits and not any(r["index_doc_id"] in gone_ids for r in hits)
    assert any(r["index_doc_id"] % 10 == 2 for r in hits)
    before = sorted(map(tuple, hits))

    n_members = spark.read.parquet(f"{path}/members").count()
    n_toks = spark.read.parquet(f"{path}/toks").count()
    setsim_index_compact(spark, path)
    assert spark.read.parquet(f"{path}/members").count() < n_members
    # orphan reclamation: gone docs with UNIQUE token sets had their
    # rep probe rows dropped; the re-appended changed docs kept theirs
    live_toks = spark.read.parquet(f"{path}/toks")
    assert live_toks.count() < n_toks
    assert live_toks.where(
        (F.col("doc_id") % 10 == 2) & (F.col("batch_id") == 2)
    ).count() > 0
    assert sorted(map(tuple, setsim_index_check(probe, path).collect())) == before

    # a doc whose token set equals a RECLAIMED signature re-registers
    resurrect = gone.limit(1).select(
        (F.col("doc_id") + 9500).alias("doc_id"), "text"
    )
    setsim_index_append(resurrect, path, batch_id=3)
    again = setsim_index_check(
        gone.limit(1).select((F.col("doc_id") + 9600).alias("doc_id"), "text"),
        path,
    ).collect()
    assert any(r["index_doc_id"] >= 9500 for r in again)
