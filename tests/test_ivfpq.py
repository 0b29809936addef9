"""IVF-PQ composite index: build/search, partition pruning, exact
re-rank refinement, manifest guards, and the compression claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackml_spark.operators.ivfpq import (
    ivfpq_index_build,
    ivfpq_index_search,
)
from quackml_spark.sources import load_table


def _exact_l2_topk(emb, queries, k):
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("embedding"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        emb.join(q, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivfpq_index_build(emb, path, n_lists=8, m=8, k_codes=16)
    return path, emb


def test_ivfpq_recall_and_refine(spark, sf_dir, built):
    path, emb = built
    queries = emb.where("vec_id < 5")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in _exact_l2_topk(emb, queries, 10).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_search(spark, path, queries, k=10, nprobe=4).collect()
    }
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_search(
            spark, path, queries, k=10, nprobe=4, refine=emb, shortlist=50
        ).collect()
    }
    recall_adc = len(adc & exact) / len(exact)
    recall_ref = len(refined & exact) / len(exact)
    # measured reality for raw-vector PQ on UNSTRUCTURED 64-dim data:
    # ADC ordering alone is weak (~0.2-0.3); the exact-re-rank stage is
    # what the composite exists for (0.68 @ nprobe=4, 0.86 @ nprobe=8
    # here) — assert the honest floor of each stage
    assert recall_adc >= 0.15, recall_adc
    assert recall_ref >= recall_adc  # exact re-rank can only help
    assert recall_ref >= 0.5, recall_ref
    all_lists = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_search(
            spark, path, queries, k=10, nprobe=8, refine=emb, shortlist=100
        ).collect()
    }
    assert len(all_lists & exact) / len(exact) >= 0.8


def test_ivfpq_refined_distances_are_exact(spark, built):
    path, emb = built
    queries = emb.where("vec_id < 3")
    refined = ivfpq_index_search(
        spark, path, queries, k=5, nprobe=8, refine=emb, shortlist=100
    ).collect()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["d2"]
        for r in _exact_l2_topk(emb, queries, 2000).collect()
    }
    for r in refined:
        assert abs(exact[(r["query_id"], r["neighbor_id"])] - r["d2"]) < 1e-6


def test_ivfpq_partition_pruning(spark, built):
    """The probed-lists filter must reach the lists scan as a
    planning-time PARTITION filter (directory pruning), mirroring the
    ivf_index contract."""
    path, emb = built
    queries = emb.where("vec_id = 0")
    out = ivfpq_index_search(spark, path, queries, k=5, nprobe=2)
    jvm = spark.sparkContext._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "list_id" in pf[1][:300], plan[:2000]


def test_ivfpq_index_is_smaller_than_vectors(spark, built, tmp_path):
    import os

    path, emb = built

    def dir_bytes(p, sub):
        total = 0
        for root, _d, names in os.walk(os.path.join(p, sub)):
            for f in names:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    flat = str(tmp_path / "flat")
    emb.write.parquet(flat)
    flat_bytes = dir_bytes(tmp_path, "flat")
    code_bytes = dir_bytes(path, "lists")
    assert code_bytes < flat_bytes / 3, (code_bytes, flat_bytes)


def test_ivfpq_manifest_guards(spark, sf_dir, built, tmp_path):
    path, emb = built
    with pytest.raises(ValueError, match="manifest"):
        ivfpq_index_search(
            spark, str(tmp_path / "nonexistent"), emb.where("vec_id < 2")
        )
    bad_q = emb.where("vec_id < 2").select(
        "vec_id", F.slice("embedding", 1, 8).alias("embedding")
    )
    with pytest.raises(ValueError, match="dimension"):
        ivfpq_index_search(spark, path, bad_q)


def test_residual_encoding_beats_raw_adc(spark, tmp_path):
    """On CLUSTERED data (the regime IVF exists for) the residual
    variant must beat raw-vector codes on both ADC error and recall —
    the codebook spends its codes on local structure instead of
    re-encoding the coarse position. (On unstructured near-random
    vectors the two are measurably equal — residual ~= raw minus a
    tiny offset — so the property is asserted where it is real.)"""
    import numpy as np

    from quackml_spark.operators.ivfpq import (
        ivfpq_index_build_residual,
        ivfpq_index_search_residual,
    )

    rng = np.random.RandomState(0)
    centers = rng.randn(8, 64) * 10.0
    rows = [
        (i, (centers[i % 8] + rng.randn(64) * 0.5).tolist()) for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    E = {i: np.array(v) for i, v in rows}
    raw_path, res_path = str(tmp_path / "raw"), str(tmp_path / "res")
    ivfpq_index_build(emb, raw_path, n_lists=8, m=8, k_codes=16)
    ivfpq_index_build_residual(emb, res_path, n_lists=8, m=8, k_codes=16)
    queries = emb.where("vec_id < 5")

    def exact_topk(q, k=10):
        d = sorted(
            (float(((E[q] - E[b]) ** 2).sum()), b) for b in E if b != q
        )
        return {b for _, b in d[:k]}

    exact = {q: exact_topk(q) for q in range(5)}

    def run(fn, path):
        out = fn(spark, path, queries, k=10, nprobe=8).collect()
        got: dict = {}
        errs = []
        for r in out:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            errs.append(
                abs(
                    r["d2"]
                    - float(((E[r["query_id"]] - E[r["neighbor_id"]]) ** 2).sum())
                )
            )
        rec = sum(len(got.get(q, set()) & exact[q]) / 10 for q in range(5)) / 5
        return rec, sum(errs) / len(errs)

    rec_raw, err_raw = run(ivfpq_index_search, raw_path)
    rec_res, err_res = run(ivfpq_index_search_residual, res_path)
    assert err_res < err_raw, (err_res, err_raw)
    assert rec_res >= rec_raw, (rec_res, rec_raw)
    assert rec_res >= 0.45, rec_res

    # searcher dispatch guard
    with pytest.raises(ValueError, match="not residual"):
        ivfpq_index_search_residual(spark, raw_path, queries)


def test_ivfpq_append_equals_fresh_union_build(spark, sf_dir, tmp_path):
    """FAISS `add` semantics: build on the first half, append the
    second — searching must return EXACTLY what a fresh build over the
    union returns (the medoid quantizer and first-k codebook derive
    from the same leading vec_ids either way, so any difference is an
    append bug, not quantizer drift). Also: the manifest row count
    advances, and a residual index refuses the raw append path."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.ivfpq import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_build_residual,
        ivfpq_index_search,
    )
    from quackml_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cut = 60
    inc_path = str(tmp_path / "inc")
    ivfpq_index_build(
        emb.where(F.col("vec_id") < cut), inc_path,
        n_lists=8, m=8, k_codes=16, quantizer="medoid",
    )
    n_new = ivfpq_index_append(emb.where(F.col("vec_id") >= cut), inc_path)
    assert n_new == emb.where(F.col("vec_id") >= cut).count()

    full_path = str(tmp_path / "full")
    ivfpq_index_build(
        emb, full_path, n_lists=8, m=8, k_codes=16, quantizer="medoid"
    )
    queries = emb.where(F.col("vec_id") < 5)
    inc = ivfpq_index_search(spark, inc_path, queries, k=10, nprobe=3)
    full = ivfpq_index_search(spark, full_path, queries, k=10, nprobe=3)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))

    man = spark.read.parquet(f"{inc_path}/manifest.parquet").first()
    assert int(man["n_rows"]) == emb.count()
    # appended neighbors actually reachable
    assert inc.where(F.col("neighbor_id") >= cut).count() > 0

    # residual append: clones of existing vectors must encode to
    # IDENTICAL ADC distances (same assignment, residual and codes —
    # any drift in the append path's replay of the build encode shows
    # up as a d2 mismatch between original and clone)
    from quackml_spark.operators.ivfpq import ivfpq_index_search_residual

    res_path = str(tmp_path / "res")
    ivfpq_index_build_residual(emb, res_path, n_lists=8, m=8, k_codes=16)
    clones = emb.where(F.col("vec_id") >= cut).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    assert ivfpq_index_append(clones, res_path) == clones.count()
    queries = emb.where(F.col("vec_id") < 5)
    got = ivfpq_index_search_residual(
        spark, res_path, queries, k=4 * emb.count(), nprobe=8
    ).collect()
    d2 = {(r["query_id"], r["neighbor_id"]): r["d2"] for r in got}
    checked = 0
    for (qid, nid), v in d2.items():
        if nid >= 100000 and (qid, nid - 100000) in d2:
            assert v == d2[(qid, nid - 100000)], (qid, nid)
            checked += 1
    assert checked > 0


def test_ivfpq_compact_content_identical_fewer_files(spark, sf_dir, tmp_path):
    """Compaction after several appends must shrink the file count and
    leave search results byte-identical."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.ivfpq import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_compact,
        ivfpq_index_search,
    )
    from quackml_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "idx")
    ivfpq_index_build(
        emb.where(F.col("vec_id") < 40), path,
        n_lists=8, m=8, k_codes=16, quantizer="medoid",
    )
    for lo in (40, 80, 120):
        ivfpq_index_append(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 40)),
            path,
        )
    queries = emb.where(F.col("vec_id") < 5)
    before = sorted(
        map(tuple, ivfpq_index_search(spark, path, queries, k=10, nprobe=3).collect())
    )
    stats = ivfpq_index_compact(spark, path, target_file_mb=512)["lists"]
    assert stats["files_after"] < stats["files_before"], stats
    after = sorted(
        map(tuple, ivfpq_index_search(spark, path, queries, k=10, nprobe=3).collect())
    )
    assert before == after


def test_ivfpq_delete_lifecycle(spark, sf_dir, tmp_path):
    """IVF-PQ deletes mirror the IVF contract: tombstoned vectors
    vanish from ADC search, a changed vector re-appends with freshly
    encoded codes at a later generation, compact drops the dead code
    rows physically with results unchanged and n_rows recounted."""
    from quackml_spark.operators._manifest import read_manifest
    from quackml_spark.operators.ivfpq import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corp = emb.where("vec_id < 300")
    path = str(tmp_path / "pq")
    ivfpq_index_build(corp, path, n_lists=8, m=8, k_codes=16, quantizer="medoid")
    gone = corp.where("vec_id % 10 = 1").select("vec_id")
    changed = corp.where("vec_id % 10 = 2")
    ivfpq_index_delete(spark, path, gone.unionByName(changed.select("vec_id")))
    ivfpq_index_append(
        changed.select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        ),
        path,
    )
    q = emb.where("vec_id < 5")
    before = sorted(
        map(tuple, ivfpq_index_search(spark, path, q, k=20, nprobe=8).collect())
    )
    gone_ids = {r["vec_id"] for r in gone.collect()}
    assert before and not any(t[1] in gone_ids for t in before)

    n_phys = spark.read.parquet(f"{path}/lists").count()
    ivfpq_index_compact(spark, path)
    n_live = spark.read.parquet(f"{path}/lists").count()
    assert n_live < n_phys
    live = spark.read.parquet(f"{path}/lists")
    assert live.where(F.col("vec_id").isin(list(gone_ids))).count() == 0
    assert live.where((F.col("vec_id") % 10 == 2) & (F.col("batch_id") >= 0)).count() > 0
    after = sorted(
        map(tuple, ivfpq_index_search(spark, path, q, k=20, nprobe=8).collect())
    )
    assert after == before
    assert int(read_manifest(spark, path)[1]["n_rows"]) == n_live
