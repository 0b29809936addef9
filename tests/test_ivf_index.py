"""Persistent IVF index tests: build-once/search-many round trip,
recall vs brute force, and the partition-pruning contract (a search
must scan ONLY the probed list partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.operators.similarity import (
    ann_cosine_topk,
    ivf_index_build,
    ivf_index_search,
)
from quackml_spark.sources import load_table


def test_ivf_index_round_trip_and_recall(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ivf")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_build(emb, path, n_lists=16)
    queries = emb.where(F.col("vec_id") < 5)
    got = ivf_index_search(spark, path, queries, k=10, nprobe=6)
    assert got.groupBy("query_id").count().count() == 5

    truth = ann_cosine_topk(spark, sf_dir)
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(t & g) / len(t)
    assert recall >= 0.5, recall  # nprobe=6/16 on random vectors


def test_ivf_delete_lifecycle_and_path_independence(spark, sf_dir, tmp_path):
    """Deletes complete the IVF lifecycle: tombstoned vectors vanish
    from every search; a crash-REPLAYED delete is a no-op; a deleted
    vec_id may be re-appended with a NEW embedding (the recrawl
    changed-vector case) while a live duplicate still raises; and the
    final state is PATH-INDEPENDENT — delete(subset)+append(subset)
    equals delete(everything)+append(final corpus) given the same
    frozen centroids."""
    import pytest as _pytest

    from quackml_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_delete,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    neg = F.transform(F.col("embedding"), lambda x: -x)
    v2 = emb.where("vec_id < 300")
    v1 = v2.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 == 0, neg)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    q = emb.where("vec_id < 5")

    a = str(tmp_path / "a")
    ivf_index_build(v1, a, n_lists=8, quantizer="medoid")
    changed = v1.where("vec_id % 5 = 0").select("vec_id")
    for _ in range(2):  # the delete attempt crash-replays
        ivf_index_delete(spark, a, changed)
    ivf_index_append(spark, a, v2.where("vec_id % 5 = 0"))
    got = sorted(map(tuple, ivf_index_search(spark, a, q, k=10, nprobe=3).collect()))

    # path B to the same final state, same frozen centroids
    b = str(tmp_path / "b")
    ivf_index_build(v1, b, n_lists=8, quantizer="medoid")
    ivf_index_delete(spark, b, v1.select("vec_id"))
    ivf_index_append(spark, b, v2)
    want = sorted(map(tuple, ivf_index_search(spark, b, q, k=10, nprobe=3).collect()))
    assert got == want and got

    # live duplicate still raises; deleted-then-reappended did not
    with _pytest.raises(ValueError, match="append-only"):
        ivf_index_append(spark, a, v2.where("vec_id = 1"))


def test_ivf_delete_compact_drops_dead_rows(spark, sf_dir, tmp_path):
    """Compaction applies the tombstone horizon physically: dead
    generations leave the disk, search results are unchanged, and the
    manifest's n_rows recounts to the live total."""
    from quackml_spark.operators._manifest import read_manifest
    from quackml_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_compact,
        ivf_index_delete,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corp = emb.where("vec_id < 300")
    path = str(tmp_path / "ivf")
    ivf_index_build(corp, path, n_lists=8, quantizer="medoid")
    gone = corp.where("vec_id % 10 = 1").select("vec_id")
    changed = corp.where("vec_id % 10 = 2")
    ivf_index_delete(spark, path, gone.unionByName(changed.select("vec_id")))
    ivf_index_append(
        spark,
        path,
        changed.select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        ),
    )
    q = emb.where("vec_id < 5")
    before = sorted(
        map(tuple, ivf_index_search(spark, path, q, k=20, nprobe=8).collect())
    )
    gone_ids = {r["vec_id"] for r in gone.collect()}
    assert not any(t[1] in gone_ids for t in before)

    rows_phys = spark.read.parquet(f"{path}/lists").count()
    ivf_index_compact(spark, path)
    rows_live = spark.read.parquet(f"{path}/lists").count()
    assert rows_live < rows_phys
    live = spark.read.parquet(f"{path}/lists")
    assert live.where(F.col("vec_id").isin(list(gone_ids))).count() == 0
    # re-appended changed vectors survive at their new generation
    assert live.where((F.col("vec_id") % 10 == 2) & (F.col("batch_id") >= 1)).count() > 0
    assert live.where((F.col("vec_id") % 10 == 2) & (F.col("batch_id") < 0)).count() == 0
    after = sorted(
        map(tuple, ivf_index_search(spark, path, q, k=20, nprobe=8).collect())
    )
    assert after == before
    assert int(read_manifest(spark, path)[1]["n_rows"]) == rows_live


def test_ivf_search_prunes_partitions(spark, sf_dir, tmp_path):
    """The probed-lists filter must reach the parquet scan as a
    partition filter: the pruned reader touches strictly fewer files
    than the full index."""
    path = str(tmp_path / "ivf")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_build(emb, path, n_lists=16)
    pruned = spark.read.parquet(f"{path}/lists").where(
        F.col("list_id").isin([0, 1, 2])
    )
    # the list_id filter must appear as a PARTITION filter on the scan
    # (planning-time directory pruning), not just a post-scan Filter
    jvm = spark.sparkContext._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "list_id" in pf[1][:300], plan[:2000]
    # and the pruned read returns exactly the probed lists' rows
    full = spark.read.parquet(f"{path}/lists")
    expect = full.where(F.col("list_id").isin([0, 1, 2])).count()
    assert pruned.count() == expect > 0


def test_ivf_manifest_guard(spark, sf_dir, tmp_path):
    """The search validates the build manifest: dimension mismatch and
    missing manifest both fail loudly instead of returning wrong
    neighbors from a stale/foreign index."""
    import pytest as _pytest

    from quackml_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
    )
    from quackml_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf_guard")
    ivf_index_build(emb, path, n_lists=4)

    # dimension mismatch: queries with a different embedding width
    bad_q = emb.limit(2).select(
        "vec_id", F.slice("embedding", 1, 3).alias("embedding")
    )
    with _pytest.raises(ValueError, match="dimension"):
        ivf_index_search(spark, path, bad_q, k=2, nprobe=2)

    # matching queries still work
    ok = ivf_index_search(spark, path, emb.limit(2), k=2, nprobe=2)
    assert ok.count() > 0

    # missing manifest (pre-manifest or half-built index)
    import shutil

    shutil.rmtree(f"{path}/manifest.parquet")
    with _pytest.raises(ValueError, match="manifest"):
        ivf_index_search(spark, path, emb.limit(2), k=2, nprobe=2)


def test_ivf_index_append_equals_full_build(spark, sf_dir, tmp_path):
    """build(first 400) + append(last 100) must be indistinguishable
    from build(all 500): with the deterministic medoid quantizer both
    paths share identical centroids, so assignments — and search
    results — are exactly equal. Untouched list partitions keep their
    files byte-identical (incremental cost is O(affected lists))."""
    import os

    from quackml_spark.operators.similarity import ivf_index_append

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    head, tail = emb.where(F.col("vec_id") < 400), emb.where(F.col("vec_id") >= 400)

    inc = str(tmp_path / "ivf_inc")
    ivf_index_build(head, inc, n_lists=16, quantizer="medoid")
    n = ivf_index_append(spark, inc, tail)
    assert n == tail.count()

    full = str(tmp_path / "ivf_full")
    ivf_index_build(emb, full, n_lists=16, quantizer="medoid")

    queries = emb.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_index_search(spark, inc, queries, k=10, nprobe=6).collect()))
    b = sorted(map(tuple, ivf_index_search(spark, full, queries, k=10, nprobe=6).collect()))
    assert a == b

    man = spark.read.parquet(f"{inc}/manifest.parquet").first()
    assert man["n_rows"] == emb.count()

    # appending an existing vec_id violates the append-only contract
    import pytest as _pytest

    with _pytest.raises(ValueError, match="append-only"):
        ivf_index_append(spark, inc, emb.where(F.col("vec_id") == 450))


def test_ivf_index_append_uri_path_fails_before_mutation(spark):
    """A URI path (hdfs://, s3a://) must fail at the TOP of the append —
    the manifest swap uses local renames, so failing only there would
    leave the lists already appended (superset + stale manifest) and
    every re-run tripping the append-only duplicate check (advisor
    catch). Nothing may be written before the raise."""
    import pytest as _pytest

    from quackml_spark.operators.similarity import ivf_index_append

    batch = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(NotImplementedError, match="ivf_index_append"):
        ivf_index_append(spark, "s3a://bucket/ivf_idx", batch)


def test_ivf_index_append_leaves_untouched_partitions_alone(spark, sf_dir, tmp_path):
    import os
    import time

    from quackml_spark.operators.similarity import ivf_index_append

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf_mt")
    ivf_index_build(emb.where(F.col("vec_id") < 450), path, n_lists=16,
                    quantizer="medoid")
    mtimes = {}
    for d in os.listdir(f"{path}/lists"):
        if d.startswith("list_id="):
            p = f"{path}/lists/{d}"
            mtimes[d] = max(os.path.getmtime(os.path.join(p, f))
                            for f in os.listdir(p) if f.endswith(".parquet"))
    time.sleep(1.1)
    batch = emb.where(F.col("vec_id") >= 450)
    ivf_index_append(spark, path, batch)
    # recompute the batch's target lists to know which were touched
    from quackml_spark.operators.similarity import _nearest_lists

    centers = sorted(
        (int(r["list_id"]), list(r["centroid"]))
        for r in spark.read.parquet(f"{path}/centroids.parquet").collect()
    )
    touched = {
        f"list_id={r[0]}"
        for r in batch.select(
            _nearest_lists(F.col("embedding"), centers, 1)[0].alias("l")
        ).distinct().collect()
    }
    untouched_checked = 0
    for d, old_mtime in mtimes.items():
        if d in touched:
            continue
        p = f"{path}/lists/{d}"
        new_mtime = max(os.path.getmtime(os.path.join(p, f))
                        for f in os.listdir(p) if f.endswith(".parquet"))
        assert new_mtime == old_mtime, f"{d} was rewritten"
        untouched_checked += 1
    assert untouched_checked > 0, "fixture must leave some lists untouched"


def _planted_cluster_emb(spark, n_clusters=8, per_cluster=40, dim=16, jit=0.3):
    """Deterministic planted-cluster embeddings: md5-derived cluster
    centers in [-1,1]^dim, points = center + md5 jitter (±jit). vec_ids
    are SORTED BY CLUSTER, so the medoid quantizer's first-n_lists
    centers all land in cluster 0 — cluster points then assign by
    jitter-dominated dot products and STRADDLE medoid list boundaries,
    the clustered-data case where the deterministic quantizer is
    recall-weak at low nprobe (r11 verdict item #7). Measured recall
    surface in SCALE.md §38."""
    import hashlib

    def h(s, lo, hi):
        v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
        return lo + v * (hi - lo)

    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [h(f"c|{c}|{d}", -1.0, 1.0) for d in range(dim)]
        for p in range(per_cluster):
            vec = [
                center[d] + h(f"p|{c}|{p}|{d}", -jit, jit)
                for d in range(dim)
            ]
            rows.append((vid, c, vec))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )


def test_ivf_kmeans_quantizer_recall_on_clustered_data(spark, tmp_path):
    """On planted clusters with cluster-sorted ids, the trained KMeans
    quantizer must (a) beat the deterministic medoid quantizer's
    recall at the same nprobe and (b) be near-perfect — medoid centers
    all fall in one cluster, so most true neighbors live in lists the
    probe never opens. Ground truth is the brute-force cosine top-k
    over the fixture. (The medoid mode stays the registered/oracled
    default: its centers are SQL-replayable; the trained mode is the
    non-oracle scale path, recall table in SCALE.md §38.)"""
    emb = _planted_cluster_emb(spark).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % 40 == 7)  # one per cluster

    # brute-force cosine top-5 ground truth (fixture-sized cross join)
    from quackml_spark.operators.similarity import cosine_expr

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    v = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    from pyspark.sql import Window

    scored = (
        q.crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qe"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .where("rnk <= 5")
        .collect()
    }

    recalls = {}
    for quant in ("medoid", "kmeans"):
        path = str(tmp_path / f"ivf_{quant}")
        ivf_index_build(emb, path, n_lists=8, quantizer=quant)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_index_search(
                spark, path, queries, k=5, nprobe=1
            ).collect()
        }
        recalls[quant] = len(truth & got) / len(truth)
    # measured jit=0.3 nprobe=1: medoid 0.875, kmeans 1.0 (§38); at
    # nprobe=2 medoid recovers to 0.975 — the trained quantizer buys
    # the same recall at HALF the probe fan-out
    assert recalls["kmeans"] >= 0.95, recalls
    assert recalls["kmeans"] > recalls["medoid"], recalls


def test_ivf_recall_report_reproduces_quantizer_gap(spark, tmp_path):
    """The §38 medoid-vs-kmeans recall gap, reproduced through the
    PUBLIC harness (ivf_recall_report / the registered ann_recall_eval
    machinery) instead of a one-off fixture measurement: on planted
    clusters with cluster-sorted ids the trained quantizer's recall at
    nprobe=1 must beat the medoid's and be near-perfect, and recall
    must be non-decreasing in nprobe for both."""
    from quackml_spark.operators.similarity import (
        ivf_index_build,
        ivf_recall_report,
    )

    emb = _planted_cluster_emb(spark).select("vec_id", "embedding")
    ppm = {}
    for quant in ("medoid", "kmeans"):
        path = str(tmp_path / f"ivf_{quant}")
        ivf_index_build(emb, path, n_lists=8, quantizer=quant)
        rows = {
            r["nprobe"]: r
            for r in ivf_recall_report(
                spark, path, emb, nprobes=(1, 2), k=5, sample_mod=8
            ).collect()
        }
        assert rows[1]["n_queries"] > 10  # the hash sample is real
        assert rows[1]["recall_ppm"] <= rows[2]["recall_ppm"]
        ppm[quant] = rows[1]["recall_ppm"]
    assert ppm["kmeans"] >= 950_000, ppm
    assert ppm["kmeans"] > ppm["medoid"], ppm


def test_ivf_search_prunes_partitions_both_quantizers(spark, sf_dir, tmp_path):
    """The partition-pruning contract must hold in BOTH quantizer modes
    (r11 verdict item #7): the probed-lists filter reaches the lists
    scan as a PartitionFilter whatever produced the centroids."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    jvm = spark.sparkContext._jvm
    for quant in ("medoid", "kmeans"):
        path = str(tmp_path / f"ivf_{quant}")
        ivf_index_build(emb, path, n_lists=8, quantizer=quant)
        pruned = spark.read.parquet(f"{path}/lists").where(
            F.col("list_id").isin([0, 1])
        )
        plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            pruned._jdf.queryExecution(), "formatted"
        )
        pf = plan.split("PartitionFilters", 1)
        assert len(pf) == 2 and "list_id" in pf[1][:300], (quant, plan[:2000])
