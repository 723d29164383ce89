"""Multimodal column plumbing (SURVEY §2.11 L5).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (schemas.MULTIMODAL_ASSET). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages —
the L6 escape hatch, used here because byte-level media decoding is
genuinely outside Spark SQL's expression language.

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_image_stub`` raises ``NotImplementedError`` when
asked for a real codec and otherwise applies a deterministic fake
decode, so the Spark-side contract — schema in/out, Arrow batch
shapes, partition behavior — is real and tested, and swapping in PIL/
ffmpeg later touches exactly one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("fake_mean_luma", T.DoubleType(), True),
    ]
)


def decode_image_stub(content: bytes | None, real_codec: bool = False) -> float | None:
    """Stand-in for a real image decode.

    ``real_codec=True`` is the seam where PIL/libvips would plug in —
    explicitly unimplemented in this container. The fake path returns
    a deterministic pseudo-luma derived from the byte histogram, so
    pipelines exercising the plumbing get stable, assertable values.
    """
    if content is None:
        return None
    if real_codec:
        raise NotImplementedError(
            "real image decoding requires an image library not present "
            "in this environment; wire PIL/libvips here"
        )
    if len(content) == 0:
        return 0.0
    return sum(content) / (len(content) * 255.0)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over multimodal assets.

    One ``mapInPandas`` pass: rows stay partitioned as read (no
    shuffle), bytes cross to Python once per batch via Arrow, and the
    output schema is fixed so downstream SQL keeps full Catalyst
    support.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # executor-side import

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "fake_mean_luma": content.map(decode_image_stub),
                }
            )

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stand-in for video: emit one row per sampled
    "frame" (byte offset) — demonstrates the 1→N mapInPandas shape a
    real frame sampler would use. Offsets are deterministic."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("byte_offset", T.LongType(), False),
        ]
    )

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, off in enumerate(range(0, len(content), every_n_bytes)):
                    rows.append((int(asset_id), idx, off))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "byte_offset"]
            )

    return assets.mapInPandas(_sample, schema=out_schema)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("target_width", T.IntegerType(), False),
        T.StructField("target_height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resized_bytes", T.LongType(), True),
    ]
)


def resize_image_stub(
    content: bytes | None, width: int, height: int, real_codec: bool = False
) -> bytes | None:
    """Stand-in for a real image resize (the PIL/libvips seam, like
    :func:`decode_image_stub`). The fake path emits a deterministic
    ``width*height``-byte payload by tiling the source bytes, so the
    1→1 byte-transform plumbing (binary in, binary out, size change)
    is real and assertable without a codec."""
    if content is None:
        return None
    if real_codec:
        raise NotImplementedError(
            "real image resizing requires an image library not present "
            "in this environment; wire PIL/libvips here"
        )
    target = width * height
    if len(content) == 0:
        return b"\x00" * target
    reps = target // len(content) + 1
    return (content * reps)[:target]


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize over multimodal assets: one ``mapInPandas``
    pass, no shuffle, binary column in → binary column out with typed
    target dimensions. At 100 TB this is the pattern for any byte-level
    media transform: partition-local, batch-at-a-time, fixed schema so
    everything around it stays Catalyst-planned."""

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["content"].map(
                lambda b: resize_image_stub(b, width, height)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "target_width": width,
                    "target_height": height,
                    "resized": resized,
                    "resized_bytes": resized.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                }
            )

    return assets.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests/demos: payload bytes
    derived from the asset id (no randomness, no files)."""
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.col("id").cast("string"), 256).alias("__hex"),
    )
    return base.select(
        "asset_id",
        "modality",
        F.to_binary(F.col("__hex"), F.lit("hex")).alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
