"""CSV / JSONL sources+sinks, small-file compaction, and sorted writes.

The reference engine reads whatever DuckDB reads (CSV, JSON, parquet —
duckdb's read_csv/read_json surface); this module is the Spark twin,
with three scale rules baked in:

* **Schema is explicit.** At 100 TB, schema inference is a full extra
  pass over the data (CSV) or a sampled guess that can flip types
  between runs (JSON). Readers here take a DDL schema string; inference
  is an opt-in for exploration only.
* **File count is a first-class output.** Thousands of small files
  destroy scan throughput (footer/open overhead, task scheduling) and
  NameNode-style metadata stores. ``compact_parquet`` rewrites a
  directory to size-targeted files; ``write_sorted`` range-partitions +
  sorts so parquet row-group min/max stats actually skip.
* **Sorted layout is a data-skipping index.** ``write_sorted`` gives
  each output file a disjoint key range (repartitionByRange), so a
  point/range filter on the sort key prunes entire files via footer
  stats — the poor man's z-order, free at write time.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source. ``schema`` is a DDL string ("a INT, b STRING");
    omitting it falls back to inference (an extra full pass — fine for
    exploration, wrong for production)."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.options(header=header).mode(mode).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None, **options
) -> DataFrame:
    """JSON-lines source with an explicit DDL schema (sampled inference
    when omitted)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC source (columnar like parquet: predicate pushdown + column
    pruning apply; schema travels in the file footer)."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def _require_local(path: str, op: str) -> None:
    """The os/shutil-based maintenance passes (compaction, two-rename
    swaps, footer scans) only work on a local filesystem; on a URI
    path (hdfs://, s3a://, ...) os.walk silently finds nothing, the
    size math degrades to coalesce(1) over the whole dataset, and the
    final os.rename crashes AFTER the wasted rewrite (review catch).
    Fail fast instead."""
    if "://" in path:
        raise NotImplementedError(
            f"{op} uses local-filesystem rename/stat primitives and got "
            f"the URI path {path!r}; on HDFS/object stores run it "
            f"against a local mount or port it to the Hadoop FileSystem "
            f"API first"
        )


def _dir_bytes_files(path: str, suffix: str = ".parquet") -> tuple[int, int]:
    total, n = 0, 0
    for root, _dirs, names in os.walk(path):
        for f in names:
            if f.endswith(suffix):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
) -> dict:
    """Rewrite a parquet directory to ~``target_file_mb``-sized files.

    File count is computed from the source's on-disk bytes, then the
    data is coalesced — not repartitioned — so compaction is a
    shuffle-free read+write (each output task concatenates whole input
    files). Returns before/after stats so pipelines can assert the
    effect."""
    _require_local(src, "compact_parquet")
    _require_local(dst, "compact_parquet")
    bytes_before, files_before = _dir_bytes_files(src)
    n_out = max(1, math.ceil(bytes_before / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    bytes_after, files_after = _dir_bytes_files(dst)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "target_files": n_out,
    }


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition on ``sort_cols`` into ``n_files`` tasks and sort
    within each, so every output file covers a disjoint sort-key range
    and row-group min/max stats prune files for key filters."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file under ``path`` — the
    footer statistics a reader uses for skipping; lets tests assert the
    sorted layout actually landed disjoint."""
    import pyarrow.parquet as pq

    _require_local(path, "file_key_ranges")
    ranges = []
    for root, _dirs, names in os.walk(path):
        for f in sorted(names):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == column and col.statistics:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                ranges.append((lo, hi))
    return ranges


def zorder_expr(cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` as a pure JVM expression.

    Each column is first rank-normalized by the CALLER (pass integer
    columns already scaled to [0, 2^bits)); the interleave clusters
    rows that are close in EVERY dimension. Delegates to
    operators.layout.zorder_key — ONE Morton kernel in the engine (it
    carries the magic-mask fast path for the common 2x16 shape and the
    oracle-checked bit convention: bit b of column i lands at
    b*n_cols + i). bits*len(cols) must stay <= 63."""
    from pyspark.sql import functions as F

    from quackml_spark.operators.layout import zorder_key

    if bits * len(cols) > 63:
        raise ValueError("zorder_expr: bits * n_cols must be <= 63")
    if not cols:
        return F.lit(0).cast("bigint")
    if len(cols) == 1:
        # degenerate 1-D "interleave" is just the masked key itself
        return F.col(cols[0]).cast("bigint").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
    return zorder_key([F.col(c) for c in cols], bits)


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional data-skipping layout: range-partition + sort by
    the Morton interleave of ``cols`` so every output file covers a
    small hyper-rectangle of the key space — footer min/max stats then
    prune files for predicates on ANY of the interleaved columns, not
    just the leading sort key (write_sorted's limitation).

    Columns are rank-normalized to [0, 2^bits) via ONE multi-column
    approxQuantile pass (bounded driver edges, no single-reducer
    window) followed by a map-only bucket assignment. At 100 TB this
    is the standard layout-maintenance trade: one stats scan + one
    extra shuffle at ingest, file-level pruning forever after."""
    from pyspark.sql import functions as F

    scaled = df
    tmp_cols = []
    # percent_rank over a partition-less window would serialize;
    # approx-quantile bucketing keeps it distributed: bucket edges from
    # ONE approxQuantile pass over all columns together (the list-of-
    # columns form — one scan, not len(cols) scans; code-review catch),
    # then a map-only bucket assignment per column.
    nb = min(bits, 10)
    probs = [i / (1 << nb) for i in range(1, 1 << nb)]
    all_edges = df.stat.approxQuantile(list(cols), probs, 0.001)
    for c, edges in zip(cols, all_edges):
        uniq = sorted(set(edges))
        b = df.sparkSession.sparkContext.broadcast(uniq)

        # Closed-form bucket assignment via SQL: width via conditional
        # sum over the broadcast edge literals would explode the plan at
        # 2^10 edges; a tiny vectorized pandas transform keeps it
        # Arrow-batched. But a pure-expression binary search is
        # available for small `bits`; use expressions up to 6 bits.
        scaled_col = f"__z_{c}"
        tmp_cols.append(scaled_col)
        if len(uniq) <= 64:
            # NULLs land in bucket 0 (when(NULL > edge) -> otherwise
            # branch); the pandas branch below applies the same rule so
            # the Morton layout for identical data cannot flip with the
            # edge count (review catch: np.searchsorted sent NaN to the
            # TOP bucket while this branch sent NULL to the bottom)
            e = F.lit(0)
            for edge in uniq:
                e = e + F.when(F.col(c) > F.lit(edge), 1).otherwise(0)
            scale = (1 << bits) // (len(uniq) + 1)
            scaled = scaled.withColumn(scaled_col, (e * F.lit(max(scale, 1))).cast("bigint"))
        else:
            import pandas as pd

            from pyspark.sql.functions import pandas_udf

            factor = (1 << bits) // (len(uniq) + 1)

            # no parameter annotations: postponed-evaluation strings
            # (`from __future__ import annotations`) break pandas_udf's
            # type-hint inference; the returnType argument carries the
            # schema instead.
            def _bucketize(s):
                import numpy as np

                vals = s.to_numpy()
                arr = np.searchsorted(np.array(b.value), vals, side="left")
                # same NULL rule as the expression branch: bucket 0
                # (searchsorted sends NaN past every edge -> top bucket)
                arr = np.where(pd.isna(s).to_numpy(), 0, arr)
                return pd.Series(arr * max(factor, 1))

            bucketize = pandas_udf(_bucketize, "bigint")

            scaled = scaled.withColumn(scaled_col, bucketize(F.col(c)))
    scaled = scaled.withColumn("__zorder", zorder_expr(tmp_cols, bits))
    (
        scaled.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder", *tmp_cols)
        .write.mode(mode)
        .parquet(path)
    )


def replace_dir(write_fn, target: str) -> None:
    """Replace the parquet directory ``target`` with freshly-written
    content while narrowing the no-readable-target window to two
    rename syscalls (Spark's ``mode("overwrite")`` straight into the
    live path deletes first and leaves the path unreadable for the
    whole write job — the manifest-rewrite race the review caught).

    ``write_fn(tmp_path)`` writes the new content to a sibling temp
    dir; the swap then renames target→_old, tmp→target, and clears
    _old. Crash recovery on entry: target missing with _old present
    rolls back, stale tmp/_old siblings are cleared — re-runnable
    after any crash point. Same documented caveat as
    compact_partitioned_dir: a reader racing the two renames can hit
    a brief path-not-found; callers that must mask it retry once."""
    import shutil

    _require_local(target, "replace_dir")
    tmp = target.rstrip("/") + "_swap_tmp"
    old = target.rstrip("/") + "_old"
    if not os.path.exists(target) and os.path.exists(old):
        os.rename(old, target)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    write_fn(tmp)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old, ignore_errors=True)


def compact_partitioned_dir(
    spark: SparkSession,
    data_dir: str,
    partition_col: str | None,
    range_cols: list[str],
    target_file_mb: int = 512,
    mask=None,
) -> dict:
    """The shared crash-safe compactor behind dedup_index_compact and
    ivfpq_index_compact: rewrite a partitioned parquet directory's
    small-file debt into ~``target_file_mb`` files whose contents cover
    disjoint ``range_cols`` ranges inside each ``partition_col``
    partition (parquet footer min/max then prunes files for point
    probes — plain coalesce-compaction would not give that), then swap
    it in via two renames.

    Crash recovery is built in: a leftover swap state from a prior
    crashed run (data_dir missing but ``<data_dir>_old`` present) rolls
    back on entry, and stale tmp/old siblings are cleared — safely
    re-runnable after any crash point. The swap itself is two renames,
    not one atomic op: a reader RACING the swap can hit a brief
    path-not-found — run compaction in a maintenance window, or on an
    object store compact a copy and flip a manifest pointer. Row
    content is untouched unless the caller passes ``mask`` (a
    DataFrame -> DataFrame filter applied between read and rewrite —
    bm25_index_compact uses it to physically drop tombstoned
    postings). Returns before/after file/byte stats."""
    import math
    import shutil

    _require_local(data_dir, "compact_partitioned_dir")
    tmp = data_dir.rstrip("/") + "_compact_tmp"
    old = data_dir.rstrip("/") + "_old"
    if not os.path.exists(data_dir) and os.path.exists(old):
        os.rename(old, data_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    bytes_before, files_before = _dir_bytes_files(data_dir)
    n_out = max(1, math.ceil(bytes_before / (target_file_mb * 1024 * 1024)))
    # mergeSchema: compacted dirs accrete columns across upgrades
    # (bands gained batch_id in r8, run_key in r9); inferring the
    # schema from ONE file would silently drop the newer columns from
    # every row in the rewrite, destroying the replay-scoping state
    # the appends recorded (advisor-catch class)
    src = spark.read.option("mergeSchema", "true").parquet(data_dir)
    if mask is not None:
        src = mask(src)
    w = (
        src.repartitionByRange(n_out, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode("overwrite")
    )
    # partition_col=None: a FLAT parquet dir (the setsim index tables) —
    # same range layout and swap discipline, no hive partitioning
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    os.rename(data_dir, old)
    os.rename(tmp, data_dir)
    shutil.rmtree(old)
    bytes_after, files_after = _dir_bytes_files(data_dir)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "target_files": n_out,
    }
