"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (BASELINE.json north star): media travels as a ``binary`` column
plus typed metadata (modality, mime, width/height/duration). The
Spark-side contracts — schema, partition-friendly batch shapes,
mapInPandas feature extraction, Pandas-UDF signatures — are real and
tested. The actual codec step is import-gated (PIL/librosa/av are not
in this container): ``decode_image`` raises NotImplementedError unless
a codec library is present, while ``extract_binary_features`` computes
real byte-level features (length, entropy-ish byte histogram stats,
md5) that need no codec.

The test data has no media files, so ``media_table`` synthesizes
deterministic binary payloads from document text (md5-keyed bytes) —
the pipeline downstream of decode is identical either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, modality string, mime string, width int, height int, "
    "duration_s double, payload binary"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media: payload bytes derived from text."""
    docs = load_table(spark, sf_dir, "documents")
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mod.alias("modality"),
        F.concat(F.lit("application/x-fake-"), mod).alias("mime"),
        F.when(mod == "image", (F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
        F.when(mod == "image", (F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
        F.when(mod != "image", (F.col("doc_id") % 30 + 1) / 2.0).alias("duration_s"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("payload"),
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: decode binary -> pixel array. Requires a codec library
    (PIL); the Spark plumbing (schema, Arrow batching) is the contract."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image requires Pillow, which is not installed in this "
            "environment; byte-level ops (extract_binary_features) work "
            "without a codec"
        ) from e
    raise NotImplementedError("codec present but decode not implemented yet")


def extract_binary_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: byte length,
    md5, mean byte value, distinct-byte count. Arrow-batched; one Python
    worker pass per partition — the shape a real decoder would use."""
    schema = (
        "doc_id bigint, modality string, n_bytes int, payload_md5 string, "
        "payload_hex string, mean_byte double, distinct_bytes int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "payload_hex": payloads.map(lambda b: bytes(b).hex()),
                    "mean_byte": payloads.map(
                        lambda b: sum(bytes(b)) / len(b) if len(b) else 0.0
                    ),
                    "distinct_bytes": payloads.map(lambda b: len(set(bytes(b)))),
                }
            )

    return df.mapInPandas(extract, schema)


def frame_sample(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of each frame is the stubbed step)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor(F.col("duration_s") / every_s).cast("int") - 1, F.lit(0)
        ),
    )
    return (
        df.where(F.col("modality") == "video")
        .select(
            "doc_id",
            "duration_s",
            F.explode(frames).alias("frame_idx"),
        )
        .withColumn("frame_ts", F.col("frame_idx") * every_s)
    )


@register(
    "multimodal_binary_features",
    doc="Binary-column feature extraction via mapInPandas; oracle checks "
    "byte length + md5 of the synthesized payloads.",
    oracle="""
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality,
       16 AS n_bytes,
       md5(text) AS payload_hex
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal",),
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    feats = extract_binary_features(media)
    return feats.select("doc_id", "modality", "n_bytes", "payload_hex").orderBy(
        "doc_id"
    )


@register(
    "multimodal_frame_plan",
    doc="Video frame-sampling plan: one row per sampled frame timestamp.",
    oracle="""
SELECT doc_id, i AS frame_idx, CAST(i AS DOUBLE) * 1.0 AS frame_ts
FROM (
  SELECT doc_id, (doc_id % 30 + 1) / 2.0 AS duration_s
  FROM documents WHERE doc_id % 3 = 2
), unnest(range(0, greatest(CAST(floor(duration_s) AS INT), 1))) AS t(i)
ORDER BY doc_id, frame_idx
""",
    tags=("multimodal",),
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        frame_sample(media, every_s=1.0)
        .select("doc_id", "frame_idx", "frame_ts")
        .orderBy("doc_id", "frame_idx")
    )


def resize_image(df: DataFrame, max_dim: int = 224) -> DataFrame:
    """STUB: actual pixel resampling needs a codec (PIL). The plan step
    (target geometry) is real Spark; see resize_plan."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_image requires Pillow; resize_plan computes the "
            "target geometry without a codec"
        ) from e
    raise NotImplementedError("codec present but resample not implemented yet")


def resize_plan(df: DataFrame, max_dim: int = 224) -> DataFrame:
    """Aspect-preserving resize targets for image rows (integer math so
    the plan is engine-exact): the long side becomes max_dim."""
    w, h = F.col("width").cast("bigint"), F.col("height").cast("bigint")
    long_side = F.greatest(w, h)
    tw = (w * max_dim) / long_side
    th = (h * max_dim) / long_side
    return df.where(F.col("modality") == "image").select(
        "doc_id",
        F.col("width").cast("bigint"),
        F.col("height").cast("bigint"),
        F.floor(tw).cast("bigint").alias("target_w"),
        F.floor(th).cast("bigint").alias("target_h"),
    )


@register(
    "multimodal_resize_plan",
    doc="Aspect-preserving resize geometry for image rows (the resample "
    "itself is the codec-gated stub, resize_image).",
    oracle="""
SELECT doc_id, width, height,
       (width * 224) // greatest(width, height) AS target_w,
       (height * 224) // greatest(width, height) AS target_h
FROM (
  SELECT doc_id,
         (doc_id % 8 + 1) * 64 AS width,
         (doc_id % 4 + 1) * 64 AS height
  FROM documents WHERE doc_id % 3 = 0
)
ORDER BY doc_id
""",
    tags=("multimodal",),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(media_table(spark, sf_dir)).orderBy("doc_id")
