"""Multimodal media handling: opaque binary columns + typed metadata,
with decode / feature-extract / resize / frame-sample implemented as
Arrow-batched pandas functions over mapInPandas (task brief: multimodal
columns; reference analogue: the media-crop sink S6,
run_dpsk_ocr_pdf.py:183-190, which we generalize to a media table keyed
by media_ref).

The container has no image/audio codecs, so the DECODE KERNEL is
swappable: `_decode_real` needs PIL and raises NotImplementedError
without it; `_decode_fake` is a deterministic stand-in (statistics
derived from the raw bytes) used by default so the Spark-side plumbing —
schema, partitioning, Arrow batch shape, join topology — is real and
tested end-to-end. Swapping in the real kernel changes no plan shape.

100 TB notes: media bytes ride in their own table (never inside the
span table — a 10 MB image next to 2 KB of spans would wreck scan
locality); the spans↔media equi-join broadcasts the *metadata*
projection only, never the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("data", BinaryType(), True),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("mean_byte", DoubleType(), True),
        StructField("thumb_w", IntegerType(), True),
        StructField("thumb_h", IntegerType(), True),
        StructField("decode_ok", StringType(), True),
    ]
)

THUMB_MAX = 128
_MIMES = ("image/jpeg", "image/png", "video/mp4")


def synth_media(spark: SparkSession, docs_with_media: DataFrame) -> DataFrame:
    """Deterministic media table for (doc_id, media_ref) pairs: payload
    bytes and dimensions are pure functions of the key (test corpus —
    at scale this is the binaryFile/Iceberg media table)."""
    d = docs_with_media
    seed = F.xxhash64("doc_id", "media_ref")
    return d.select(
        "doc_id",
        "media_ref",
        F.element_at(
            F.array(*[F.lit(m) for m in _MIMES]), (F.pmod(seed, F.lit(3)) + 1).cast("int")
        ).alias("mime"),
        (64 + F.pmod(seed, F.lit(1920))).cast("int").alias("width"),
        (64 + F.pmod(F.xxhash64("media_ref", "doc_id"), F.lit(1080)))
        .cast("int")
        .alias("height"),
        F.unhex(F.repeat(F.md5(F.concat("doc_id", "media_ref")), 4)).alias("data"),
    )


def _decode_fake(data: bytes) -> tuple[float, str]:
    """Deterministic stand-in for pixel decode: byte statistics."""
    if data is None or len(data) == 0:
        return float("nan"), "empty"
    return sum(data) / len(data), "ok"


def _decode_real(data: bytes) -> tuple[float, str]:
    """Real pixel decode (reference: run_dpsk_ocr_image.py:28-42
    Image.open → RGB): mean grayscale intensity + status. Gated on PIL,
    absent in this container; exercised by the skip-marked tests in
    tests/test_real_kernels.py wherever it exists."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL; container ships without codecs "
            "— plug the kernel here, plan shape is unchanged"
        ) from e
    import io

    if data is None or len(data) == 0:
        return float("nan"), "empty"
    try:
        with Image.open(io.BytesIO(data)) as im:
            px = list(im.convert("L").getdata())
        return (sum(px) / len(px)) if px else float("nan"), "ok"
    except Exception:
        return float("nan"), "error"


def decode_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas: one Arrow batch in, one
    out; no shuffle (narrow). Thumbnail dims = aspect-preserving fit to
    THUMB_MAX (the resize stage, computed not materialized)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = pdf["data"].map(
                _decode_real if use_real_codec else _decode_fake
            )
            # width/height are NULLABLE in MEDIA_TABLE_SCHEMA — Arrow
            # hands them to pandas as float64 with NaN. Nullable Int32
            # (not int32) carries the NaN through as SQL NULL instead of
            # raising "cannot convert non-finite values" and killing the
            # task over one undecodable row (review r4).
            scale = pd.concat(
                [pdf["width"], pdf["height"]], axis=1
            ).max(axis=1).clip(lower=1)
            factor = (THUMB_MAX / scale).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": pdf["data"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "mean_byte": stats.map(lambda s: s[0]),
                    "thumb_w": np.floor(pdf["width"] * factor).astype("Int32"),
                    "thumb_h": np.floor(pdf["height"] * factor).astype("Int32"),
                    "decode_ok": stats.map(lambda s: s[1]),
                }
            )

    return media.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_sec: int = 5) -> DataFrame:
    """Video frame-sampling plan: for video rows, the list of frame
    timestamps to extract (decode itself is the swappable kernel).
    Duration is metadata-derived (deterministic stand-in: n_bytes)."""
    duration = (F.length("data") / 8).cast("int")
    return media.filter(F.col("mime").startswith("video/")).select(
        "doc_id",
        "media_ref",
        F.sequence(
            F.lit(0), F.greatest(duration, F.lit(0)), F.lit(every_n_sec)
        ).alias("frame_ts"),
    )
