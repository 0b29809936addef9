"""Training-sequence preparation: epoch expansion and the packing
family — concat-and-chunk (`pack_sequences`), tokenizer-true BPE
counts (`bpe_token_counts` / text_pack_sequences_bpe), no-split
whole-document packing (`pack_sequences_nosplit`), and the
loader-facing per-sequence manifest (`sequence_spans`). The streaming
twin (continuous packing with a CAS-carried offset) lives in
streaming/events.py; curate() chains these as terminal stages.

Every pretraining pipeline ends with these steps after curation:

* **Sequence packing** (``pack_sequences``): documents are laid out in
  a deterministic (shuffled) order into one token stream and cut into
  fixed-length training sequences — the GPT/LLaMA "concat and chunk"
  recipe. The engine computes each document's global token offset with
  a DISTRIBUTED prefix sum (no global window): the uniform md5 order
  key statically buckets into config-many pid ranges, per-bucket
  totals cumulate by a config-bounded window, and the within-bucket
  running sum is a pid-partitioned window — one hash exchange on the
  deterministic pid, balanced because the key is uniform, with no
  sampled range boundaries and no exchange-reuse dependence.
* **Epoch expansion** (``epoch_expand``): the LLaMA/RedPajama data
  recipe samples high-quality sources for MORE than one epoch (e.g.
  Wikipedia x2.4) and big raw sources for less than one. Fractional
  epochs expand exactly: ``floor(e)`` full copies of every document
  plus one extra copy for a deterministic md5 coin < frac(e) — integer
  ppm arithmetic end to end, so the expansion is a pure function of
  (corpus, epochs table, seed) and replays identically in any engine.

Both are oracle-checked: the packing offsets against DuckDB SUM/ROW_
NUMBER windows, the expansion against generate_series over the same
ppm coin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table


def prefix_sum_by(
    df: DataFrame,
    weight_col: str,
    order_cols: list,
    n_shards: int | None = None,
    bucket_col: str | None = None,
    bucket_max: int = 1 << 32,
    bucket_min: int = 0,
) -> DataFrame:
    """Attach ``prefix_sum`` = running total of ``weight_col`` under the
    total ordering ``order_cols`` (ascending column names, INCLUSIVE of
    the current row), without a global single-partition window.

    Two-phase over a DETERMINISTIC bucketing of the leading order key:
    ``bucket_col`` (default: the first order column) must be an
    integer key roughly uniform over ``[bucket_min, bucket_max)`` and
    MONOTONE in the global order — correctness needs only the
    monotonicity (any linear bucketing of the key preserves it);
    uniformity is what keeps the buckets BALANCED. Most internal
    callers lead with the engine's 32-bit md5 shuffle key, which is
    both by construction; id-ordered callers pass the id's min/max
    bounds. The key range splits statically into ``4 *
    n_shards`` buckets (pid = key // width): per-bucket totals
    cumulate into exclusive offsets by a window over the
    config-bounded count rows and broadcast-join back; the
    within-bucket running sum is a window partitioned by pid. The
    fine-grained 4x bucketing keeps the one hash exchange balanced
    (each task hashes ~4 buckets).

    Why static buckets and not repartitionByRange + the physical
    partition id: the pid must be IDENTICAL in the offsets branch and
    the main branch, and a sampled range exchange only guarantees that
    when Catalyst reuses the exchange across both branches. Column
    pruning can silently make the two subtrees differ — each branch
    then samples its OWN boundaries and the offsets no longer
    correspond (nondeterministically wrong prefix sums, found live at
    sf0.1). A pid computed from the row's own key needs no exchange
    reuse, is reproducible across retries/partitionings, and drops the
    range-sampling pass over the input entirely — one scan fewer."""
    spark = df.sparkSession
    n = n_shards or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    key = bucket_col or order_cols[0]
    width = max(1, (bucket_max - bucket_min) // (4 * n))
    order = [F.asc(c) for c in order_cols]
    # a NULL key sorts first under asc (Spark nulls-first default), so
    # it buckets BEFORE every real pid; mapping it to -1 keeps the row
    # in the stream instead of silently dropping it at the equi-join
    # (NULL never equals NULL — review catch)
    with_pid = df.withColumn(
        "__pid",
        F.when(F.col(key).isNull(), F.lit(-1))
        .otherwise(F.floor((F.col(key) - bucket_min) / width))
        .cast("bigint"),
    )
    cum = Window.partitionBy(F.lit(0)).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.sum(weight_col).alias("__w"))
        .select(
            "__pid",
            F.coalesce(F.sum("__w").over(cum), F.lit(0)).alias("__off"),
        )
    )
    local = Window.partitionBy("__pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "prefix_sum", F.col("__off") + F.sum(weight_col).over(local)
        )
        .drop("__pid", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    order_cols: list | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    carry_cols: tuple = (),
    bucket_col: str | None = None,
    bucket_max: int = 1 << 32,
    bucket_min: int = 0,
) -> DataFrame:
    """Concat-and-chunk packing plan: each document's placement in the
    fixed-``seq_len`` training-sequence stream.

    Documents lay out in ``order_cols`` order (ascending column names
    whose leading column must be a uniform integer key — the default
    builds the engine's deterministic md5 epoch shuffle on the id,
    then the id: the order a training run would actually consume);
    ``start_token`` is the
    document's global offset in the concatenated token stream, and the
    document occupies sequences ``first_seq..last_seq`` (a document
    longer than the remainder of its sequence spills into the next —
    GPT-style splitting, no padding). Zero-token documents are dropped
    (they occupy no stream positions). Output per doc:
    (id, n_tokens, start_token, first_seq, last_seq, n_segments);
    ``carry_cols`` pass through unchanged (e.g. copy_idx/source when
    packing an epoch-expanded stream, where id alone is not a key).
    Custom ``order_cols`` whose leading key is NOT the md5 shuffle
    must pass ``bucket_col``/``bucket_min``/``bucket_max`` through to
    the prefix sum — a small-range leading key under the default
    [0, 2^32) bounds collapses into one bucket, i.e. a data-sized
    single-partition window.

    One static-bucket hash exchange total (the prefix-sum shape) — no
    global window, no sampled range boundaries, no driver collect; at
    100 TB the stream offsets are exact and the layout is a pure
    function of (corpus, seq_len, seed)."""
    from quackml_spark.operators.text import md5_int32

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if order_cols is None:
        prio = md5_int32(
            F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
        docs = docs.withColumn("__prio", prio)
        order_cols = ["__prio", id_col]
    sized = docs.where(F.col(n_tokens_col) > 0)
    summed = prefix_sum_by(
        sized,
        n_tokens_col,
        order_cols,
        bucket_col=bucket_col,
        bucket_max=bucket_max,
        bucket_min=bucket_min,
    )
    start = F.col("prefix_sum") - F.col(n_tokens_col)
    return (
        summed.select(
            id_col,
            *carry_cols,
            F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
            start.cast("bigint").alias("start_token"),
            F.floor(start / seq_len).cast("bigint").alias("first_seq"),
            F.floor((F.col("prefix_sum") - 1) / seq_len)
            .cast("bigint")
            .alias("last_seq"),
        )
        .withColumn(
            "n_segments", (F.col("last_seq") - F.col("first_seq") + 1)
        )
    )


_PACK_SEQ_LEN = 512


@register(
    "text_pack_sequences",
    doc="Training-sequence packing plan (GPT/LLaMA concat-and-chunk): "
    "documents in deterministic md5-shuffled order lay out into one "
    "token stream cut into 512-token sequences; each doc's global "
    "start offset and first/last sequence ids come from a two-phase "
    "distributed prefix sum (static md5-bucket pids + config-bounded "
    "offset window + per-bucket running sum) — no global window. The "
    "oracle replays the same order with DuckDB SUM windows.",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM documents
), sized AS (
  SELECT * FROM t WHERE n_tokens > 0
), summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY prio, doc_id
                             ROWS UNBOUNDED PRECEDING) AS prefix_sum
  FROM sized
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix_sum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((prefix_sum - n_tokens) / {_PACK_SEQ_LEN}) AS BIGINT)
         AS first_seq,
       CAST(FLOOR((prefix_sum - 1) / {_PACK_SEQ_LEN}) AS BIGINT) AS last_seq,
       CAST(FLOOR((prefix_sum - 1) / {_PACK_SEQ_LEN})
            - FLOOR((prefix_sum - n_tokens) / {_PACK_SEQ_LEN}) + 1 AS BIGINT)
         AS n_segments
FROM summed
ORDER BY doc_id
""",
    tags=("textops", "sampling", "bench"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_expr("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(docs, _PACK_SEQ_LEN).orderBy("doc_id")


def pack_sequences_nosplit(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    group_docs: int = 64,
) -> DataFrame:
    """NO-SPLIT sequence packing (the SFT/BERT-style recipe): every
    sequence holds only WHOLE documents — no document is ever cut
    across a sequence boundary, so no attention mask ever spans a
    split. Semantics, fully deterministic:

    * documents lay out in the engine's md5(seed|id) shuffle order;
    * the stream is cut into ``group_docs``-document GROUPS (via the
      distributed prefix sum — the group is a pure function of the
      order, not of partitioning);
    * within each group, documents fill sequences greedily IN ORDER:
      a doc that doesn't fit the current sequence's remainder starts
      the next one (first-fit-in-order — the streaming-friendly
      discipline; docs longer than ``seq_len`` are truncated and
      flagged);
    * group-local sequence ids globalize by a second prefix sum over
      the per-group sequence counts.

    Output per doc: (id, seq_id, offset, n_tokens_packed, truncated).
    Unfilled tails are the loader's padding; bounding the greedy scan
    to ``group_docs`` docs caps the scan state (the group NEVER needs
    to fit in memory as text — only (id, n_tokens) enters the scan)
    while keeping packing efficiency: waste is at most one partial
    sequence per group.

    Scale shape: one static-bucket hash exchange for the order index, one
    group-keyed exchange into bounded applyInPandas groups (pure
    Python over ~64 (id, count) pairs each — never the document
    payloads), one tiny per-group aggregate + prefix sum, one
    group-keyed join back. No global window, no driver collect."""
    from quackml_spark.operators.text import md5_int32

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sized = (
        docs.where(F.col(n_tokens_col) > 0)
        .withColumn(
            "__prio",
            md5_int32(
                F.concat_ws(
                    "|", F.lit(str(seed)), F.col(id_col).cast("string")
                )
            ),
        )
        .withColumn("__one", F.lit(1))
    )
    indexed = prefix_sum_by(
        sized, "__one", ["__prio", id_col]
    ).select(
        F.col(id_col).alias("doc_id"),
        F.least(F.col(n_tokens_col), F.lit(seq_len))
        .cast("bigint")
        .alias("n_eff"),
        (F.col(n_tokens_col) > seq_len).alias("truncated"),
        F.col("__prio"),
        F.col("prefix_sum").alias("__idx"),
        F.floor((F.col("prefix_sum") - 1) / group_docs)
        .cast("bigint")
        .alias("__grp"),
    )

    def _fill(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__idx").reset_index(drop=True)
        local_seq, running = 0, 0
        seqs, offs = [], []
        for n in pdf["n_eff"]:
            if running + n > seq_len:
                local_seq += 1
                running = 0
            offs.append(running)
            seqs.append(local_seq)
            running += n
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "__grp": pdf["__grp"],
                "__minprio": pdf["__prio"].min(),
                "local_seq": seqs,
                "offs": offs,
                "n_eff": pdf["n_eff"],
                "truncated": pdf["truncated"],
            }
        )

    filled = indexed.groupBy("__grp").applyInPandas(
        _fill,
        "doc_id bigint, __grp bigint, __minprio bigint, local_seq bigint, "
        "offs bigint, n_eff bigint, truncated boolean",
    )
    # globalize the group-local sequence ids by a second prefix sum
    # over the per-group counts. Groups are contiguous ranges of the
    # md5-sorted order, so each group's MIN prio is monotone in the
    # group id and uniform over the md5 space — exactly the bucket key
    # prefix_sum_by needs (the group ids themselves are dense ints
    # with data-dependent range, unusable for static bucketing).
    per_grp = filled.groupBy("__grp").agg(
        (F.max("local_seq") + 1).alias("__n_seqs"),
        F.min("__minprio").alias("__minprio"),
    )
    bases = prefix_sum_by(
        per_grp, "__n_seqs", ["__grp"], bucket_col="__minprio"
    ).select(
        "__grp", (F.col("prefix_sum") - F.col("__n_seqs")).alias("__base")
    )
    return filled.join(bases, "__grp").select(
        "doc_id",
        (F.col("__base") + F.col("local_seq")).cast("bigint").alias("seq_id"),
        F.col("offs").cast("bigint").alias("offset"),
        F.col("n_eff").alias("n_tokens_packed"),
        "truncated",
    )


_NOSPLIT_SEQ_LEN = 512
_NOSPLIT_GROUP = 64


@register(
    "text_pack_nosplit",
    extra=True,
    doc="No-split sequence packing (SFT/BERT recipe): whole documents "
    "only — md5-shuffle order, 64-doc groups via the distributed "
    "prefix sum, greedy first-fit-in-order fill within each group "
    "(over-length docs truncate and flag), group-local sequence ids "
    "globalized by a second prefix sum. The oracle replays the "
    "identical greedy scan as a recursive CTE over the same order and "
    "grouping, so every seq assignment and offset is value-checked.",
    oracle=rf"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM documents
), idx AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY prio, doc_id) AS ridx
  FROM t WHERE n_tokens > 0
), g AS (
  SELECT doc_id,
         LEAST(n_tokens, {_NOSPLIT_SEQ_LEN}) AS n_eff,
         n_tokens > {_NOSPLIT_SEQ_LEN} AS truncated,
         CAST(FLOOR((ridx - 1) / {_NOSPLIT_GROUP}) AS BIGINT) AS grp,
         ridx - {_NOSPLIT_GROUP}
           * CAST(FLOOR((ridx - 1) / {_NOSPLIT_GROUP}) AS BIGINT) AS rn
  FROM idx
), fill AS (
  SELECT grp, rn, doc_id, n_eff, truncated,
         CAST(0 AS BIGINT) AS local_seq,
         CAST(0 AS BIGINT) AS "offset",
         n_eff AS running
  FROM g WHERE rn = 1
  UNION ALL
  SELECT g.grp, g.rn, g.doc_id, g.n_eff, g.truncated,
         CASE WHEN f.running + g.n_eff > {_NOSPLIT_SEQ_LEN}
              THEN f.local_seq + 1 ELSE f.local_seq END,
         CASE WHEN f.running + g.n_eff > {_NOSPLIT_SEQ_LEN}
              THEN CAST(0 AS BIGINT) ELSE f.running END,
         CASE WHEN f.running + g.n_eff > {_NOSPLIT_SEQ_LEN}
              THEN g.n_eff ELSE f.running + g.n_eff END
  FROM g JOIN fill f ON g.grp = f.grp AND g.rn = f.rn + 1
), per_grp AS (
  SELECT grp, MAX(local_seq) + 1 AS n_seqs FROM fill GROUP BY grp
), bases AS (
  SELECT grp,
         SUM(n_seqs) OVER (ORDER BY grp ROWS UNBOUNDED PRECEDING)
           - n_seqs AS base
  FROM per_grp
)
SELECT f.doc_id,
       CAST(b.base + f.local_seq AS BIGINT) AS seq_id,
       f."offset" AS "offset",
       f.n_eff AS n_tokens_packed,
       f.truncated
FROM fill f JOIN bases b ON f.grp = b.grp
ORDER BY f.doc_id
""",
    tags=("textops", "sampling"),
)
def text_pack_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_expr("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences_nosplit(
        docs, _NOSPLIT_SEQ_LEN, group_docs=_NOSPLIT_GROUP
    ).orderBy("doc_id")


def sequence_spans(
    packed: DataFrame,
    seq_len: int,
    shard_seqs: int | None = None,
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Explode a ``pack_sequences`` layout into per-SEQUENCE segments —
    the loader-facing manifest: for training sequence ``seq_id``,
    positions ``[seg_start, seg_start + seg_len)`` are filled by this
    document's tokens starting at ``doc_offset`` inside the document.
    This is exactly the table a data loader needs to assemble batches
    and to reset attention/loss masks at document boundaries (the
    concat-and-chunk recipe trains with cross-doc attention masked).

    ``shard_seqs`` additionally assigns each sequence to a fixed-size
    output shard (``shard_id = seq_id // shard_seqs``) — the layout of
    the physical training files a writer would emit.

    Map-only off the packed frame: one explode of each doc's
    ``first_seq..last_seq`` span; output rows total
    sum(n_segments) = O(total_tokens / seq_len + n_docs), so the
    amplification is bounded by the packing itself at any corpus
    size."""
    seq = F.col("seq_id")
    seg_start = F.greatest(
        F.col("start_token") - seq * seq_len, F.lit(0)
    )
    doc_end = F.col("start_token") + F.col("n_tokens")
    seg_end = F.least((seq + 1) * F.lit(seq_len), doc_end) - seq * seq_len
    out = packed.select(
        *id_cols,
        "start_token",
        "n_tokens",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).select(
        "seq_id",
        *id_cols,
        seg_start.cast("bigint").alias("seg_start"),
        (seg_end - seg_start).cast("bigint").alias("seg_len"),
        (seq * seq_len + seg_start - F.col("start_token"))
        .cast("bigint")
        .alias("doc_offset"),
    )
    if shard_seqs is not None:
        out = out.withColumn(
            "shard_id", F.floor(seq / shard_seqs).cast("bigint")
        )
    return out


_MANIFEST_SHARD_SEQS = 64


@register(
    "text_sequence_manifest",
    extra=True,
    doc="Loader-facing packed-sequence manifest: the text_pack_sequences "
    "layout exploded into per-sequence segments — (seq_id, doc_id, "
    "seg_start, seg_len, doc_offset, shard_id): which document tokens "
    "fill which positions of which training sequence, and which "
    "64-sequence output shard the sequence lands in. The table a data "
    "loader assembles batches from and resets attention/loss masks at "
    "doc boundaries with. Map-only explode off the packed layout; the "
    "oracle replays the packing windows plus the same span arithmetic.",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM documents
), sized AS (
  SELECT * FROM t WHERE n_tokens > 0
), summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY prio, doc_id
                             ROWS UNBOUNDED PRECEDING) AS prefix_sum
  FROM sized
), packed AS (
  SELECT doc_id, n_tokens,
         prefix_sum - n_tokens AS start_token,
         CAST(FLOOR((prefix_sum - n_tokens) / {_PACK_SEQ_LEN}) AS BIGINT)
           AS first_seq,
         CAST(FLOOR((prefix_sum - 1) / {_PACK_SEQ_LEN}) AS BIGINT)
           AS last_seq
  FROM summed
)
SELECT CAST(u.i AS BIGINT) AS seq_id, doc_id,
       CAST(GREATEST(start_token - u.i * {_PACK_SEQ_LEN}, 0) AS BIGINT)
         AS seg_start,
       CAST(LEAST((u.i + 1) * {_PACK_SEQ_LEN}, start_token + n_tokens)
            - u.i * {_PACK_SEQ_LEN}
            - GREATEST(start_token - u.i * {_PACK_SEQ_LEN}, 0) AS BIGINT)
         AS seg_len,
       CAST(u.i * {_PACK_SEQ_LEN}
            + GREATEST(start_token - u.i * {_PACK_SEQ_LEN}, 0)
            - start_token AS BIGINT) AS doc_offset,
       CAST(FLOOR(u.i / {_MANIFEST_SHARD_SEQS}) AS BIGINT) AS shard_id
FROM packed, unnest(range(first_seq, last_seq + 1)) AS u(i)
ORDER BY seq_id, doc_id
""",
    tags=("textops", "sampling"),
)
def text_sequence_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_expr("text")).cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences(docs, _PACK_SEQ_LEN)
    return sequence_spans(
        packed, _PACK_SEQ_LEN, shard_seqs=_MANIFEST_SHARD_SEQS
    ).orderBy("seq_id", "doc_id")


def epoch_expand(
    docs: DataFrame,
    epochs_ppm: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Expand each document to its source's (possibly fractional)
    epoch count: ``floor(e)`` full copies plus one extra copy iff the
    doc's deterministic md5 ppm coin < ``frac(e)`` — the LLaMA-style
    source-reweighting step expressed exactly in integer ppm
    arithmetic (``epochs_ppm`` carries (source, epochs_ppm) with
    epochs_ppm = round(e * 1e6); 2.4 epochs = 2_400_000).

    Output: one row per COPY — (id, source, copy_idx 0-based, n_copies)
    — the frame a downstream shuffle/pack consumes. The epochs table
    broadcasts (sources are few); copies materialize map-only via an
    explode over a sequence expression, so the only data movement is
    the output itself. A source absent from ``epochs_ppm`` defaults to
    exactly one epoch."""
    from quackml_spark.operators.sampling import PPM, hash_ppm

    e = F.coalesce(F.col("epochs_ppm"), F.lit(PPM)).cast("bigint")
    n_copies = (
        F.floor(e / PPM)
        + (hash_ppm(id_col, seed) < e % PPM).cast("bigint")
    )
    joined = docs.join(
        F.broadcast(epochs_ppm), source_col, "left"
    ).withColumn("n_copies", n_copies)
    return (
        joined.where(F.col("n_copies") > 0)
        .select(
            id_col,
            source_col,
            F.explode(
                F.sequence(F.lit(0), (F.col("n_copies") - 1).cast("int"))
            ).alias("copy_idx"),
            F.col("n_copies").cast("bigint").alias("n_copies"),
        )
    )


@register(
    "text_epoch_mix",
    extra=True,
    doc="Per-source epoch expansion (the LLaMA/RedPajama data-recipe "
    "step): each source gets a deterministic fractional epoch count "
    "in [0.5, 2.5) (md5 of the source name, ppm integer arithmetic); "
    "every doc expands to floor(e) copies plus one md5-coin extra for "
    "the fractional part. One broadcast join + map-only explode; the "
    "oracle replays the same coin and generate_series.",
    oracle=f"""
WITH eps AS (
  SELECT source,
         500000 + ('0x' || substr(md5(source), 1, 8))::BIGINT % 2000000
           AS epochs_ppm
  FROM (SELECT DISTINCT source FROM documents)
), n AS (
  SELECT d.doc_id, d.source,
         CAST(FLOOR(e.epochs_ppm / 1000000.0) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5('0|' || d.doc_id::VARCHAR), 1, 8))::BIGINT
                     % 1000000 < e.epochs_ppm % 1000000
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN eps e USING (source)
)
SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_idx, n_copies
FROM n, unnest(range(0, n_copies)) AS u(i)
WHERE n_copies > 0
ORDER BY doc_id, copy_idx
""",
    tags=("textops", "sampling"),
)
def text_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import md5_int32

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    eps = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (500000 + md5_int32(F.col("source")) % 2000000).alias(
                "epochs_ppm"
            ),
        )
    )
    return epoch_expand(docs, eps).orderBy("doc_id", "copy_idx")


def bpe_token_counts(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document REAL tokenizer token counts under a learned BPE
    merge table — the count a training run actually consumes, not the
    whitespace proxy. Output: (id, n_tokens bigint), one row per doc
    that has at least one [a-z]+ word (the trainer's alphabet; docs
    with none count zero tokens and are omitted, matching
    pack_sequences' zero-token drop).

    Scale shape: the merge replaces are applied to the DISTINCT-word
    vocabulary only — bounded (~10^7 entries for web corpora) however
    many documents feed it — never per word OCCURRENCE; occurrences
    then pick up their word's subtoken count by an equi-join on the
    word and sum per doc. At 100 TB that is one explode scan, one
    vocab-sized aggregate, a word-keyed shuffle join (the vocab side
    is small but can exceed broadcast; the join key is the word, so
    AQE handles the usual Zipf skew on stopwords via split-skew), and
    one doc-keyed partial-agg sum."""
    from quackml_spark.operators.text import bpe_encode_expr

    words = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("__word"),
    )
    # one encode per distinct word: bpe_encode_expr on the bare word
    # yields exactly that word's subtokens
    lut = (
        words.select("__word")
        .distinct()
        .withColumn(
            "__n_sub",
            F.size(bpe_encode_expr(F.col("__word"), merges)).cast("bigint"),
        )
    )
    return (
        words.join(lut, "__word")
        .groupBy(id_col)
        .agg(F.sum("__n_sub").alias("n_tokens"))
    )


_BPE_PACK_MERGES = 8


def _pack_bpe_oracle() -> str:
    """DuckDB replay: the trainer's unrolled merge CTEs (shared with
    text_bpe_train's oracle — one definition, text._bpe_merge_ctes),
    then subtoken counts read straight off the final vocab's merged
    symbol strings, summed per doc, then the packing prefix-sum
    windows of text_pack_sequences."""
    from quackml_spark.operators.text import _bpe_merge_ctes

    n = _BPE_PACK_MERGES
    ctes = _bpe_merge_ctes(n)
    ctes.append(
        f"""lut AS (
  SELECT word, length(string_split(spaced, ' ')) AS n_sub FROM vocab{n}
)"""
    )
    ctes.append(
        """doc_tokens AS (
  SELECT d.doc_id, SUM(l.n_sub) AS n_tokens
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents) d
  JOIN lut l ON d.word = l.word
  GROUP BY d.doc_id
)"""
    )
    ctes.append(
        """sized AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5('0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS prio
  FROM doc_tokens WHERE n_tokens > 0
)"""
    )
    ctes.append(
        """summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY prio, doc_id
                             ROWS UNBOUNDED PRECEDING) AS prefix_sum
  FROM sized
)"""
    )
    L = _PACK_SEQ_LEN
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix_sum - n_tokens AS BIGINT) AS start_token,
       CAST(FLOOR((prefix_sum - n_tokens) / {L}) AS BIGINT) AS first_seq,
       CAST(FLOOR((prefix_sum - 1) / {L}) AS BIGINT) AS last_seq,
       CAST(FLOOR((prefix_sum - 1) / {L})
            - FLOOR((prefix_sum - n_tokens) / {L}) + 1 AS BIGINT)
         AS n_segments
FROM summed
ORDER BY doc_id
"""
    )


@register(
    "text_pack_sequences_bpe",
    extra=True,
    doc="Tokenizer-TRUE sequence packing: the concat-and-chunk layout "
    "of text_pack_sequences computed over REAL learned-BPE token "
    "counts instead of the whitespace proxy — the artifact a "
    "pretraining pipeline actually ships. BPE merges train "
    "distributed (8 rounds, 1-row argmax each); counts come from a "
    "distinct-word LUT (merge replaces run O(vocab), never O(corpus "
    "occurrences)) joined back and summed per doc; the layout is the "
    "same two-phase distributed prefix sum. The oracle replays the "
    "identical unrolled merge iteration, LUT, and SUM windows in "
    "DuckDB, so every subtoken count and every stream offset is "
    "value-checked.",
    oracle=_pack_bpe_oracle(),
    tags=("textops", "tokenizer", "sampling", "bench"),
)
def text_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=_BPE_PACK_MERGES)
    counts = bpe_token_counts(docs, merges)
    return pack_sequences(counts, _PACK_SEQ_LEN).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Fill-in-the-middle (FIM) transformation — Bavarian et al. 2022,
# "Efficient Training of Language Models to Fill in the Middle".
# ---------------------------------------------------------------------------

def fim_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_ppm: int = 500_000,
    seed: int = 0,
    sentinels: tuple[str, str, str] = ("<PRE>", "<SUF>", "<MID>"),
) -> DataFrame:
    """FIM-transform a deterministic ``rate_ppm`` fraction of documents
    into PSM (prefix-suffix-middle) order: two pseudorandom character
    split points carve the text into prefix/middle/suffix, and the
    training text becomes ``<PRE> prefix <SUF> suffix <MID> middle`` —
    the autoregressive infilling recipe (applied at the document level,
    the paper's document-level variant). Untransformed rows pass
    through unchanged, so the op slots anywhere in the curation chain.

    Everything is a pure column expression (map-only, zero shuffles,
    whole-stage codegen): the apply coin and both split points are the
    engine's shared md5_int32 keyed on (seed, doc_id), the carve is
    character-based substr arithmetic — so the output is a pure
    function of (corpus, rate, seed) and replays bit-identically in
    SQL. At 100 TB this adds nothing to the plan but one projection.
    """
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError("rate_ppm must be in [0, 1e6]")
    from quackml_spark.operators.text import md5_int32

    pre, suf, mid = sentinels
    sid = F.col(id_col).cast("string")
    t = F.col(text_col)
    n = F.length(t)
    coin = md5_int32(F.concat(sid, F.lit(f":{seed}:fim"))) % F.lit(1_000_000)
    u1 = md5_int32(F.concat(sid, F.lit(f":{seed}:a"))) % (n + F.lit(1))
    u2 = md5_int32(F.concat(sid, F.lit(f":{seed}:b"))) % (n + F.lit(1))
    lo, hi = F.least(u1, u2), F.greatest(u1, u2)
    psm = F.concat(
        F.lit(pre),
        t.substr(F.lit(1), lo),
        F.lit(suf),
        t.substr(hi + F.lit(1), n - hi),
        F.lit(mid),
        t.substr(lo + F.lit(1), hi - lo),
    )
    applied = coin < F.lit(rate_ppm)
    return docs.withColumn("fim_applied", applied).withColumn(
        text_col, F.when(applied, psm).otherwise(t)
    )


def fim_carve_sql(rate_ppm: int, seed: int, source: str = "documents") -> str:
    """The FIM carve as a reusable SELECT (doc_id, fim_applied, text)
    over ``source`` — the exact SQL twin of :func:`fim_split`, shared by
    the standalone oracle and the curate()-chain oracle."""

    def h(tag: str) -> str:
        return (
            f"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}:{tag}'), 1, 8))"
            "::BIGINT"
        )

    return f"""
SELECT doc_id,
       coin < {rate_ppm} AS fim_applied,
       CASE WHEN coin < {rate_ppm}
            THEN '<PRE>' || substr(text, 1, lo)
                 || '<SUF>' || substr(text, hi + 1, n - hi)
                 || '<MID>' || substr(text, lo + 1, hi - lo)
            ELSE text END AS text
FROM (
  SELECT doc_id, text, n,
         {h("fim")} % 1000000 AS coin,
         least(u1, u2) AS lo, greatest(u1, u2) AS hi
  FROM (
    SELECT doc_id, text, length(text) AS n,
           {h("a")} % (length(text) + 1) AS u1,
           {h("b")} % (length(text) + 1) AS u2
    FROM {source}
  )
)
"""


def _fim_oracle(rate_ppm: int, seed: int) -> str:
    return fim_carve_sql(rate_ppm, seed) + "ORDER BY doc_id\n"


_FIM_RATE = 500_000


@register(
    "text_fim_split",
    extra=True,
    doc="Fill-in-the-middle training prep (Bavarian et al. 2022, "
    "document-level PSM): a deterministic 50% of documents are carved "
    "at two md5-derived character points and re-serialized as "
    "<PRE>prefix<SUF>suffix<MID>middle; the rest pass through. Pure "
    "map-only column expressions — the shared md5_int32 coin, substr "
    "arithmetic — zero shuffles, replayed character-exactly by the "
    "DuckDB oracle including every sentinel boundary.",
    oracle=_fim_oracle(_FIM_RATE, 0),
    tags=("textops", "sampling"),
)
def text_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return fim_split(docs, rate_ppm=_FIM_RATE, seed=0).select(
        "doc_id", "fim_applied", "text"
    ).orderBy("doc_id")


def bpe_fertility(
    docs: DataFrame,
    merges: list,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility per source: BPE subtokens per word
    (occurrence-weighted), in exact integer ppm — the tokenizer-eval
    number that prices each source's token budget (a source whose
    words fragment into 3x the subtokens costs 3x the compute per
    word of content). Output: (source, n_words, n_tokens,
    fertility_ppm).

    Same scale shape as bpe_token_counts: merge replaces run on the
    DISTINCT-word LUT only; occurrences pick up their word's subtoken
    count by a word-keyed join and aggregate per source — two
    map-side-combined shuffles however large the corpus.
    """
    from quackml_spark.operators.text import bpe_encode_expr, fan_out

    words = fan_out(docs.select(F.col(source_col).alias("source"), F.col(text_col))).select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("__word"),
    )
    lut = (
        words.select("__word")
        .distinct()
        .withColumn(
            "__n_sub",
            F.size(bpe_encode_expr(F.col("__word"), merges)).cast("bigint"),
        )
    )
    return (
        words.join(lut, "__word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__n_sub").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            F.expr("(n_tokens * 1000000) div n_words").alias("fertility_ppm"),
        )
        .orderBy("source")
    )


def _fertility_oracle() -> str:
    from quackml_spark.operators.text import _bpe_merge_ctes

    n = _BPE_PACK_MERGES
    ctes = _bpe_merge_ctes(n)
    ctes.append(
        f"""lut AS (
  SELECT word, length(string_split(spaced, ' ')) AS n_sub FROM vocab{n}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(l.n_sub) AS BIGINT) AS n_tokens,
       CAST((SUM(l.n_sub) * 1000000) // COUNT(*) AS BIGINT) AS fertility_ppm
FROM (SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents) d
JOIN lut l ON d.word = l.word
GROUP BY d.source
ORDER BY d.source
"""
    )


@register(
    "text_bpe_fertility",
    extra=True,
    doc="Tokenizer fertility per source (BPE subtokens per word, "
    "occurrence-weighted, exact integer ppm) under the corpus-trained "
    "8-merge BPE — the tokenizer-eval stat that prices each source's "
    "token budget. Merge replaces run O(distinct vocab); occurrences "
    "join the LUT and aggregate per source. The oracle replays the "
    "unrolled merge iteration and the same LUT join.",
    oracle=_fertility_oracle(),
    tags=("textops", "tokenizer", "profile"),
)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=_BPE_PACK_MERGES)
    return bpe_fertility(docs, merges)
