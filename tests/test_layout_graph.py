"""Z-order layout, PageRank, skew/table profiles, FIM split — operator
semantics beyond the oracle-parity hash checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# z-order
# ---------------------------------------------------------------------------

def _morton2_ref(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    from quackml_spark.operators.layout import zorder_key

    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 40000)]
    df = spark.createDataFrame(vals, "a bigint, b bigint")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton2_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_key_generic_k3_path(spark):
    from quackml_spark.operators.layout import zorder_key

    # 3 columns x 8 bits: bit j of column i lands at position j*3+i
    def ref(a, b, c):
        z = 0
        for j in range(8):
            z |= ((a >> j) & 1) << (3 * j)
            z |= ((b >> j) & 1) << (3 * j + 1)
            z |= ((c >> j) & 1) << (3 * j + 2)
        return z

    vals = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255), (100, 200, 50)]
    df = spark.createDataFrame(vals, "a bigint, b bigint, c bigint")
    got = df.select(
        "a", "b", "c",
        zorder_key([F.col("a"), F.col("b"), F.col("c")], 8).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == ref(r["a"], r["b"], r["c"])


def test_zorder_key_rejects_overflow_and_single_col(spark):
    from quackml_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="exceeds"):
        zorder_key([F.col("a"), F.col("b")], 32)
    with pytest.raises(ValueError, match=">= 2"):
        zorder_key([F.col("a")], 16)


def test_zorder_layout_skips_more_files_than_linear_sort(spark, sf_dir, tmp_path):
    """The point of the layout: a box predicate on BOTH z-ordered
    dimensions touches fewer files than on a one-dimensional (time)
    clustering of the same data into the same file count."""
    from quackml_spark.operators.layout import zorder_by
    from quackml_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("ms"),
        )
    )
    row = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min("ms").alias("tmin"), F.max("ms").alias("tmax"),
    ).first()
    n_files = 16

    zpath, tpath = str(tmp_path / "z"), str(tmp_path / "t")
    zorder_by(ev, ["user_id", "ms"], num_partitions=n_files).write.parquet(zpath)
    # linear contrast: static time-bucket clustering, same file count
    tspan = row["tmax"] - row["tmin"]
    ev.withColumn(
        "tb", F.expr(f"((ms - {row['tmin']}) * {n_files - 1}) div {tspan}")
    ).repartition(n_files, "tb").sortWithinPartitions("ms").drop("tb").write.parquet(
        tpath
    )

    # box selective in both dims: middle eighth of users x middle eighth of time
    uspan = row["umax"] - row["umin"]
    ulo, uhi = row["umin"] + uspan * 7 // 16, row["umin"] + uspan * 9 // 16
    tlo, thi = row["tmin"] + tspan * 7 // 16, row["tmin"] + tspan * 9 // 16
    pred = (
        f"user_id BETWEEN {ulo} AND {uhi} AND ms BETWEEN {tlo} AND {thi}"
    )

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    zf, tf = files_touched(zpath), files_touched(tpath)
    # sanity: the box matches something, and z-order's locality shows
    assert zf > 0
    assert zf <= tf
    assert zf < n_files


def test_zorder_by_caller_ranges_and_constant_column(spark):
    from quackml_spark.operators.layout import zorder_by

    df = spark.createDataFrame(
        [(i, 5) for i in range(100)], "x bigint, y bigint"
    )
    out = zorder_by(df, ["x", "y"], num_partitions=4)
    assert out.count() == 100
    assert "zkey" in out.columns
    # caller-supplied narrower range clamps instead of corrupting bits
    out2 = zorder_by(
        df, ["x", "y"], num_partitions=4, ranges={"x": (10, 20), "y": (0, 10)}
    )
    assert out2.count() == 100
    assert out2.agg(F.min("zkey")).first()[0] >= 0


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def _pagerank_ref(edges, iters=5, d_pct=85, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (100 - d_pct) * scale // (100 * n)
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, t in set(edges):
            inflow[t] += rank[s] // out[s]
        rank = {v: base + d_pct * inflow[v] // 100 for v in nodes}
    return rank


def test_pagerank_matches_pure_python_reference(spark):
    from quackml_spark.operators.graph import pagerank

    # symmetrized 5-node graph with a hub
    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5)]
    edges = raw + [(b, a) for a, b in raw]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    assert got == _pagerank_ref(edges)
    # hub 1 outranks leaf 5
    assert got[1] > got[5]


def test_pagerank_validate_rejects_sinks(spark):
    from quackml_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="no out-edges"):
        pagerank(df, validate=True)


def test_pagerank_partitioning_independent(spark):
    from quackml_spark.operators.graph import pagerank

    raw = [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]
    edges = raw + [(b, a) for a, b in raw]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(tuple(r) for r in pagerank(df, iters=4).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(tuple(r) for r in pagerank(df, iters=4).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b


# ---------------------------------------------------------------------------
# skew / table profiles
# ---------------------------------------------------------------------------

def test_skew_profile_values(spark):
    from quackml_spark.operators.profile import skew_profile

    # key 1 x 6, key 2 x 3, key 3 x 1 → total 10, nkeys 3
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)]
    df = spark.createDataFrame(rows, "k bigint")
    got = {r["key"]: r for r in skew_profile(df, "k", top=3).collect()}
    assert got[1]["share_ppm"] == 600_000
    assert got[1]["skew_x100"] == 180  # 6 / (10/3) = 1.8x mean
    assert got[1]["suggested_salt"] == 2  # ceil(6*3/10)
    assert got[3]["suggested_salt"] == 1


def test_skew_profile_empty_yields_empty(spark):
    from quackml_spark.operators.profile import skew_profile

    df = spark.createDataFrame([], "k bigint")
    assert skew_profile(df, "k").count() == 0


def test_table_profile_nulls_and_approx_path(spark):
    from quackml_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (3, "a")], "x bigint, s string"
    )
    got = {r["col_name"]: r for r in table_profile(df).collect()}
    assert got["x"]["n_rows"] == 4
    assert got["x"]["n_nonnull"] == 4
    assert got["x"]["n_distinct"] == 3
    assert got["s"]["n_nonnull"] == 3
    assert got["s"]["min_val"] == "a" and got["s"]["max_val"] == "c"
    approx = {
        r["col_name"]: r for r in table_profile(df, exact_ndv=False).collect()
    }
    # HLL is exact at this cardinality
    assert approx["x"]["n_distinct"] == 3


# ---------------------------------------------------------------------------
# FIM split
# ---------------------------------------------------------------------------

def test_fim_split_reassembles_original(spark):
    from quackml_spark.operators.packing import fim_split

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text body") for i in range(50)],
        "doc_id bigint, text string",
    )
    out = fim_split(docs, rate_ppm=1_000_000).collect()
    for r in out:
        assert r["fim_applied"]
        t = r["text"]
        assert t.startswith("<PRE>")
        pre, rest = t[len("<PRE>"):].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == f"document number {r['doc_id']} with some text body"


def test_fim_split_rate_and_determinism(spark):
    from quackml_spark.operators.packing import fim_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(400)], "doc_id bigint, text string"
    )
    a = fim_split(docs, rate_ppm=500_000, seed=1).collect()
    b = fim_split(docs, rate_ppm=500_000, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    applied = sum(1 for r in a if r["fim_applied"])
    assert 100 < applied < 300  # ~50% with md5 coin
    zero = fim_split(docs, rate_ppm=0).collect()
    assert all(not r["fim_applied"] for r in zero)
    assert all(r["text"] == f"text {r['doc_id']}" for r in zero)


def test_fim_split_empty_text_and_unicode(spark):
    from quackml_spark.operators.packing import fim_split

    docs = spark.createDataFrame(
        [(1, ""), (2, "héllo wörld ünïcode")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in fim_split(docs, rate_ppm=1_000_000).collect()}
    assert out[1]["text"] == "<PRE><SUF><MID>"
    t = out[2]["text"]
    pre, rest = t[len("<PRE>"):].split("<SUF>", 1)
    suf, mid = rest.split("<MID>", 1)
    assert pre + mid + suf == "héllo wörld ünïcode"


def test_curate_fim_stage_wiring(spark):
    """curate(fim_rate_ppm=...) carves before pack; epoch copies of one
    doc share the same carve (keyed on doc_id only)."""
    from quackml_spark.operators.pipeline import curate

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i}", "s0") for i in range(30)],
        "doc_id bigint, text string, source string",
    )
    eps = spark.createDataFrame([("s0", 2_000_000)], "source string, epochs_ppm bigint")
    out = curate(
        docs,
        clean=False,
        dedup=None,
        fim_rate_ppm=1_000_000,
        epochs_ppm=eps,
        pack_seq_len=16,
        source_col="source",
        report=True,
    )
    stages = [r["stage"] for r in out["report"].collect()]
    assert "fim" in stages and "epochs" in stages and "pack" in stages
    assert stages.index("fim") < stages.index("epochs") < stages.index("pack")
    rows = out["docs"].select("doc_id", "copy_idx", "fim_applied", "text").collect()
    assert all(r["fim_applied"] for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["text"])
    # every copy of a doc carries the identical carve
    assert all(len(texts) == 1 for texts in by_doc.values())
    assert all("<MID>" in next(iter(t)) for t in by_doc.values())


# ---------------------------------------------------------------------------
# source overlap / tokenizer fertility
# ---------------------------------------------------------------------------

def test_source_overlap_identical_and_disjoint(spark):
    from quackml_spark.operators.profile import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a", "alpha beta gamma delta"),
            (2, "b", "alpha beta gamma delta"),   # identical to a
            (3, "c", "one two three four five"),  # disjoint
        ],
        "doc_id bigint, source string, text string",
    )
    got = {(r["source_a"], r["source_b"]): r for r in source_overlap(docs).collect()}
    assert got[("a", "b")]["jaccard_ppm"] == 1_000_000
    assert ("a", "c") not in got  # zero intersection -> no row (inner join)
    assert got[("a", "b")]["grams_a"] == 2  # two word-3-grams in 4 words


def test_bpe_fertility_floor_and_values(spark):
    from quackml_spark.operators.packing import bpe_fertility

    docs = spark.createDataFrame(
        [(1, "s0", "aa bb aa"), (2, "s1", "cc")],
        "doc_id bigint, source string, text string",
    )
    # no merges: every word splits to chars + the '</w>' end marker ->
    # fertility = (chars + 1) / word
    got = {r["source"]: r for r in bpe_fertility(docs, []).collect()}
    assert got["s0"]["n_words"] == 3
    assert got["s0"]["n_tokens"] == 9
    assert got["s0"]["fertility_ppm"] == 3_000_000
    # fertility can never drop below 1 token per word
    assert all(r["fertility_ppm"] >= 1_000_000 for r in got.values())


def test_skew_profile_string_keys(spark):
    from quackml_spark.operators.profile import skew_profile

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "k string")
    got = {r["key"]: r for r in skew_profile(df, "k", top=2).collect()}
    assert got["a"]["cnt"] == 3 and got["a"]["suggested_salt"] == 2


def test_zorder_by_null_values_and_empty_input(spark):
    from quackml_spark.operators.layout import zorder_by

    # NULLs land in bucket 0 (the write_zorder / q33-oracle rule)
    df = spark.createDataFrame(
        [(None, 5), (1, 6), (100, 7)], "x bigint, y bigint"
    )
    out = zorder_by(df, ["x", "y"], num_partitions=2).collect()
    assert len(out) == 3
    nullrow = [r for r in out if r["x"] is None][0]
    minrow = [r for r in out if r["x"] == 1][0]
    # NULL x normalizes to 0, same as the min value's bucket
    assert (nullrow["zkey"] & 0x55555555) == (minrow["zkey"] & 0x55555555)
    # empty/all-null auto-ranging fails loudly
    empty = spark.createDataFrame([], "x bigint, y bigint")
    with pytest.raises(ValueError, match="empty or all-NULL"):
        zorder_by(empty, ["x", "y"])


def test_zorder_by_partitions_are_contiguous_curve_spans(spark):
    """Range repartition: every partition holds one contiguous span of
    the Morton curve (hash bucketing merged far-apart quadtree cells
    into one file — review catch)."""
    from quackml_spark.operators.layout import zorder_by

    df = spark.createDataFrame(
        [(i % 251, (i * 37) % 241) for i in range(2000)], "x bigint, y bigint"
    )
    out = zorder_by(df, ["x", "y"], num_partitions=8)
    spans = (
        out.select(F.spark_partition_id().alias("p"), "zkey")
        .groupBy("p")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] <= b["lo"], "partition key ranges overlap"


def test_pagerank_rejects_bad_checkpoint_interval(spark):
    from quackml_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="checkpoint_interval"):
        pagerank(df, checkpoint_interval=0)


# ---------------------------------------------------------------------------
# hilbert curve
# ---------------------------------------------------------------------------

def _hilbert_ref(x, y, bits=16):
    N = 1 << bits
    d, s = 0, N // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = N - 1 - x, N - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference(spark):
    from quackml_spark.operators.layout import hilbert_index

    import random

    random.seed(11)
    vals = [(0, 0), (65535, 65535), (1, 0), (0, 1), (32768, 32767)] + [
        (random.randrange(65536), random.randrange(65536)) for _ in range(30)
    ]
    df = spark.createDataFrame(vals, "x bigint, y bigint")
    for r in hilbert_index(df, "x", "y", 16).collect():
        assert r["hkey"] == _hilbert_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_hilbert_adjacent_positions_are_adjacent_cells(spark):
    """The curve's defining property (and why it beats Z-order at file
    seams): consecutive d values map to cells at L1 distance exactly 1."""
    from quackml_spark.operators.layout import hilbert_index

    bits = 4  # exhaustive 16x16 grid
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x bigint, y bigint"
    )
    rows = hilbert_index(df, "x", "y", bits).collect()
    by_d = {r["hkey"]: (r["x"], r["y"]) for r in rows}
    assert len(by_d) == 256  # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_by_locality_beats_linear_layout(spark, sf_dir, tmp_path):
    from quackml_spark.operators.layout import hilbert_by, zorder_by
    from quackml_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("ms"),
    )
    row = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min("ms").alias("tmin"), F.max("ms").alias("tmax"),
    ).first()
    n_files = 16
    hpath, zpath = str(tmp_path / "h"), str(tmp_path / "z")
    hilbert_by(ev, ["user_id", "ms"], num_partitions=n_files).write.parquet(hpath)
    zorder_by(ev, ["user_id", "ms"], num_partitions=n_files).write.parquet(zpath)
    uspan, tspan = row["umax"] - row["umin"], row["tmax"] - row["tmin"]
    ulo, uhi = row["umin"] + uspan * 7 // 16, row["umin"] + uspan * 9 // 16
    tlo, thi = row["tmin"] + tspan * 7 // 16, row["tmin"] + tspan * 9 // 16
    pred = f"user_id BETWEEN {ulo} AND {uhi} AND ms BETWEEN {tlo} AND {thi}"

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    hf, zf = files_touched(hpath), files_touched(zpath)
    assert 0 < hf < n_files
    # no-jump curve: never worse than Morton plus one seam's slack
    assert hf <= zf + 1


def test_hilbert_rejects_bad_args(spark):
    from quackml_spark.operators.layout import hilbert_by, hilbert_index

    df = spark.createDataFrame([(1, 2, 3)], "x bigint, y bigint, z bigint")
    with pytest.raises(ValueError, match="bits"):
        hilbert_index(df, "x", "y", 0)
    with pytest.raises(ValueError, match="2-D"):
        hilbert_by(df, ["x", "y", "z"])


def test_triangle_stats_known_graphs(spark):
    """K4 (4 triangles, clustering 1.0), a pendant edge (adds wedges but
    no triangles), plus self-loops and duplicate/reversed edges that
    canonicalization must absorb."""
    from quackml_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (3, 4), (4, 3)]
    out = triangle_stats(
        spark.createDataFrame(noisy, "src long, dst long")
    ).collect()[0]
    assert out["n_nodes"] == 5
    assert out["n_edges"] == 7  # 6 K4 edges + pendant (3,4)
    assert out["n_triangles"] == 4
    # wedges: deg 3,3,3,4,1 -> 3+3+3+6+0 = 15; clustering 12/15 = 0.8
    assert out["n_wedges"] == 15
    assert out["clustering_ppm"] == 800_000


def test_triangle_stats_triangle_free_and_empty(spark):
    from quackml_spark.operators.graph import triangle_stats

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    row = triangle_stats(star).collect()[0]
    assert row["n_triangles"] == 0 and row["clustering_ppm"] == 0
    empty = spark.createDataFrame([], "src long, dst long")
    row = triangle_stats(empty).collect()[0]
    assert row["n_nodes"] == 0 and row["n_triangles"] == 0
    assert row["n_wedges"] == 0  # coalesced, not NULL (review catch)


def test_random_walks_follow_edges_deterministically(spark):
    """Every consecutive (node, next) in a walk is a real edge, walks
    have full length on a symmetrized graph, regeneration is
    bit-identical, and a different seed diverges somewhere."""
    from quackml_spark.operators.graph import random_walks

    base = [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)]
    edges = spark.createDataFrame(
        base + [(b, a) for a, b in base], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    rows = random_walks(edges, seeds, length=5, seed=0).collect()
    eset = {(a, b) for a, b in base} | {(b, a) for a, b in base}
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["pos"]] = r["node"]
    assert set(walks) == {0, 3}
    for wid, path in walks.items():
        assert sorted(path) == list(range(6))  # full length, no gaps
        assert path[0] == wid
        for t in range(5):
            assert (path[t], path[t + 1]) in eset
    again = random_walks(edges, seeds, length=5, seed=0).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    other = random_walks(edges, seeds, length=5, seed=1).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))
    with pytest.raises(ValueError, match="length"):
        random_walks(edges, seeds, length=0)


def test_dupgraph_triangle_blowup_identity(spark, sf_dir):
    """dupgraph_triangle_stats (closed-form blow-up sums over the
    exact-collapsed rep graph) returns EXACTLY triangle_stats over the
    raw uncapped band graph — on the real corpus and on a corpus with
    planted exact-copy groups (the case whose raw graph grows K^2)."""
    from quackml_spark.operators.dedup import near_dup_pairs
    from quackml_spark.operators.graph import (
        dupgraph_triangle_stats,
        triangle_stats,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    raw = tuple(
        triangle_stats(
            near_dup_pairs(docs, max_bucket_size=1 << 31),
            src="doc_a",
            dst="doc_b",
        ).collect()[0]
    )
    blow = tuple(dupgraph_triangle_stats(docs).collect()[0])
    assert raw == blow

    base = docs.limit(2).collect()
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for i, r in enumerate(base):
        # plant a 4-way exact-copy group per base doc (plus the
        # original: 5 copies) and one short unbandable dup pair
        rows += [(9000 + i * 10 + j, r["text"]) for j in range(4)]
    rows += [(9900, "too short"), (9901, "too short")]
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    raw2 = tuple(
        triangle_stats(
            near_dup_pairs(docs2, max_bucket_size=1 << 31),
            src="doc_a",
            dst="doc_b",
        ).collect()[0]
    )
    blow2 = tuple(dupgraph_triangle_stats(docs2).collect()[0])
    assert raw2 == blow2
    assert blow2[3] > blow[3]  # the planted 5-cliques add triangles


def test_iterative_graph_reliable_checkpoint_mode_equal(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable
    checkpoint() (the lossy-cluster option for high iteration counts);
    results are pinned identical to the default localCheckpoint mode —
    the arithmetic is integer-exact, only the recovery story changes."""
    from quackml_spark.operators.graph import label_propagation, pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (4, 1), (1, 4)],
        "src long, dst long",
    )
    local = {(r["node"], r["rank"]) for r in pagerank(
        edges, iters=5, checkpoint_interval=2).collect()}
    reliable = {(r["node"], r["rank"]) for r in pagerank(
        edges, iters=5, checkpoint_interval=2,
        checkpoint_dir=str(tmp_path / "ckpt_pr")).collect()}
    assert local == reliable
    import os

    def _snaps(base):
        (run_dir,) = os.listdir(base)  # one per-call subdir
        return sorted(os.listdir(os.path.join(str(base), run_dir)))

    # superseded rounds are DELETED as the loop advances (the
    # connected_components discipline — bare df.checkpoint leaks every
    # round until session end): only the FINAL ranks snapshot remains
    assert len(_snaps(tmp_path / "ckpt_pr")) == 1

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "doc_a long, doc_b long",
    )
    l_local = {(r["node"], r["label"])
               for r in label_propagation(pairs).collect()}
    l_rel = {(r["node"], r["label"]) for r in label_propagation(
        pairs, checkpoint_dir=str(tmp_path / "ckpt_lpa")).collect()}
    assert l_local == l_rel
    # the pinned edge snapshot (every round re-joins it) is deleted by
    # the truncator's finish() once the final labels snapshot exists
    # (advice r11: an earlier cut leaked it per call) — only the final
    # labels snapshot survives
    assert len(_snaps(tmp_path / "ckpt_lpa")) == 1


def test_lpa_splits_bridged_cliques_where_cc_merges(spark):
    """Two triangles joined by one bridge edge: connected components
    puts all six nodes in one component; LPA keeps the two dense
    cliques as separate communities — the false-positive-bridge case
    the operator exists for. Exact labels pinned (deterministic
    min-label ties)."""
    from quackml_spark.operators.dedup import connected_components
    from quackml_spark.operators.graph import label_propagation

    tri = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    pairs = spark.createDataFrame(tri, "doc_a long, doc_b long")
    lpa = {
        r["node"]: r["label"] for r in label_propagation(pairs).collect()
    }
    # round-by-round deterministic trace: clique A settles on label 1,
    # clique B on 3 (the bridge leaks 3 into B's argmax before A's 1
    # can cross) — TWO communities either way
    assert lpa == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
    cc = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert set(cc.values()) == {1}  # CC merges across the bridge
    with pytest.raises(ValueError, match="iters"):
        label_propagation(pairs, iters=0)
