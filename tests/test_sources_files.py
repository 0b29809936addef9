"""CSV/JSONL round trips, small-file compaction, sorted-write layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.sources import load_table
from quackml_spark.sources.files import (
    compact_parquet,
    file_key_ranges,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_sorted,
)

DOC_SCHEMA = "doc_id BIGINT, lang STRING, n_chars BIGINT"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def test_csv_round_trip_explicit_schema(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_csv")
    write_csv(docs, out)
    back = read_csv(spark, out, schema=DOC_SCHEMA)
    assert dict(back.dtypes) == dict(docs.dtypes)
    assert back.count() == docs.count()
    assert (
        back.agg(F.sum("n_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )


def test_jsonl_round_trip_explicit_schema(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, schema=DOC_SCHEMA)
    assert dict(back.dtypes) == dict(docs.dtypes)
    assert back.orderBy("doc_id").collect() == docs.orderBy("doc_id").collect()


def test_orc_round_trip(spark, sf_dir, tmp_path):
    from quackml_spark.sources.files import read_orc, write_orc

    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)
    back = read_orc(spark, out)
    assert dict(back.dtypes) == dict(docs.dtypes)
    assert back.orderBy("doc_id").collect() == docs.orderBy("doc_id").collect()
    # columnar contract: a filtered two-column projection pushes down
    jvm = spark.sparkContext._jvm
    q = back.where(F.col("n_chars") > 100).select("doc_id", "n_chars")
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "text" not in plan.split("ReadSchema",1)[1][:200]


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    fragmented = str(tmp_path / "fragmented")
    docs.repartition(16).write.parquet(fragmented)
    compacted = str(tmp_path / "compacted")
    stats = compact_parquet(spark, fragmented, compacted, target_file_mb=512)
    assert stats["files_before"] == 16
    assert stats["files_after"] == 1  # tiny data -> one 512MB-target file
    assert spark.read.parquet(compacted).count() == docs.count()


def test_sorted_write_disjoint_file_ranges(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "sorted")
    write_sorted(docs, out, ["doc_id"], n_files=4)
    ranges = sorted(file_key_ranges(out, "doc_id"))
    assert len(ranges) == 4
    # each file's footer stats cover a disjoint doc_id range -> a
    # doc_id filter can skip whole files
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next
    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Production tables gain columns over time; the engine's readers
    must survive mixed-footer directories: mergeSchema unions the
    fields, old files read NULL for new columns, and column pruning
    still reaches the scan."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(p)
    spark.createDataFrame(
        [(3, "c", 30.0)], "id long, name string, score double"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 30.0
    # pruned single-column read still works over mixed footers
    assert sorted(r["id"] for r in df.select("id").collect()) == [1, 2, 3]


def test_replace_dir_swaps_and_recovers(spark, tmp_path):
    """replace_dir: the live dir is readable before and after the swap
    with either old or new content (never missing for a whole write
    job), and a crash between the two renames rolls back on the next
    call."""
    import os

    from quackml_spark.sources.files import replace_dir

    target = str(tmp_path / "manifest.parquet")
    spark.createDataFrame([(1,)], "v long").write.parquet(target)

    replace_dir(
        lambda t: spark.createDataFrame([(2,)], "v long").write.parquet(t),
        target,
    )
    assert spark.read.parquet(target).first()["v"] == 2
    assert not os.path.exists(target + "_old")
    assert not os.path.exists(target + "_swap_tmp")

    # simulate a crash after rename(target -> _old): next call recovers
    os.rename(target, target + "_old")
    replace_dir(
        lambda t: spark.createDataFrame([(3,)], "v long").write.parquet(t),
        target,
    )
    assert spark.read.parquet(target).first()["v"] == 3


def test_write_zorder_nulls_bucket_low_in_both_branches(spark, tmp_path):
    """NULL key values must land in bucket 0 under BOTH bucketization
    branches (<=64 edges: pure expressions; >64: the pandas UDF) — the
    pandas branch previously sent NaN past every edge into the TOP
    bucket, so the Morton layout for identical data flipped with the
    edge count and NULL-heavy columns piled into one extreme
    hyper-rectangle (review catch)."""
    import pyspark.sql.functions as F

    from quackml_spark.sources.files import write_zorder

    rows = [(i, float(i % 997), float((i * 31) % 991)) for i in range(3000)]
    rows += [(90000 + j, None, 5.0) for j in range(40)]
    df = spark.createDataFrame(rows, "id long, a double, b double")

    for bits, branch in ((6, "expr"), (16, "pandas")):
        out = str(tmp_path / f"z_{branch}")
        write_zorder(df, out, ["a", "b"], n_files=6, bits=bits)
        back = spark.read.parquet(out).withColumn(
            "f", F.input_file_name()
        )
        null_files = {
            r["f"] for r in back.where("a is null").select("f").collect()
        }
        # bucket 0 = the low end: every file holding NULL rows must also
        # hold low-a rows (nulls co-locate with the minimum, not the max)
        for f in null_files:
            stats = back.where(back.f == f).agg(
                F.min("a").alias("lo"), F.max("a").alias("hi")
            ).collect()[0]
            assert stats["lo"] is not None and stats["lo"] <= 5.0, (
                branch,
                f,
                stats,
            )
