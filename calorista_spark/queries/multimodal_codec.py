"""Oracle-checked REAL-codec multimodal queries (SURVEY §2.11 L5, r6).

Until r6 the codec seam was honest-but-stubbed; these queries close it
with a real decode → (resample → re-encode →) decode pipeline that an
SQL oracle can verify. The trick: :func:`synthetic_image_assets`
generates NetPBM row-gradient images with closed-form pixel values
(``pixel(y, x) = (asset_id + y) % 256``), so the mean luminance the
codec extracts is independently computable by DuckDB from
``range()`` series — the oracle never needs to decode bytes.

Determinism notes (registry conventions): pixel sums are integer-exact
in both engines; the two divisions (``/n_rows`` then ``/255``) are
correctly-rounded IEEE quotients of identical reals, so the doubles
match bit-for-bit; mean luma is still quantized via
``FLOOR(x*1e6 + 0.5)/1e6`` as belt-and-braces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.operators.multimodal import (
    extract_audio_features,
    extract_features,
    resize_images,
    synthetic_audio_assets,
    synthetic_image_assets,
)
from calorista_spark.queries.registry import query

_N, _W, _H = 256, 24, 16
_RW, _RH = 12, 8  # resize target: rows sampled at stride 2
_AN, _RATE, _NS = 256, 8000, 1600  # audio: 256 clips of 0.2 s @ 8 kHz


def _luma6(col: str):
    return (F.floor(F.col(col) * 1e6 + F.lit(0.5)) / 1e6).alias(col)


_FEATURES_ORACLE = f"""
SELECT a.asset_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + y.y) % 256) * 1.0 / {_H}) / 255.0 * 1e6 + 0.5)
         / 1e6 AS mean_luma
FROM range({_N}) AS a(asset_id), range({_H}) AS y(y)
GROUP BY a.asset_id
ORDER BY a.asset_id
"""


@query("multimodal_image_features", _FEATURES_ORACLE)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode on the executors: P5 gradient assets →
    Arrow-batched ``mapInPandas`` decode (operators/codecs.py) →
    per-asset dimensions + mean luminance, verified against the
    closed-form oracle. ``sf_dir`` is unused — the assets are
    generated, not read (the only registry query with no table input,
    by design: the oracle must be able to re-derive pixel values)."""
    assets = synthetic_image_assets(spark, n=_N, width=_W, height=_H)
    return (
        extract_features(assets)
        .select("asset_id", "width", "height", _luma6("mean_luma"))
        .orderBy("asset_id")
    )


# identical closed form to the NetPBM features oracle — the PNG query
# pins the whole stdlib zlib+filter decode path to the same values
_PNG_ORACLE = f"""
SELECT a.asset_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + y.y) % 256) * 1.0 / {_H}) / 255.0 * 1e6 + 0.5)
         / 1e6 AS mean_luma
FROM range({_N}) AS a(asset_id), range({_H}) AS y(y)
GROUP BY a.asset_id
ORDER BY a.asset_id
"""


@query("multimodal_png_features", _PNG_ORACLE)
def multimodal_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode on the executors (r8 — the stdlib zlib+numpy
    decoder in operators/codecs.py, no Pillow): the same closed-form
    gradient assets as ``multimodal_image_features`` but ENCODED as
    real PNGs whose scanlines cycle all five filter types (None, Sub,
    Up, Average, Paeth), so every unfilter path and the chunk/CRC
    walker sit on the oracle-checked path. The oracle recomputes mean
    luma from the gradient's closed form — it never touches bytes, so
    encoder layout, zlib round-trip, and unfilter arithmetic are all
    pinned. ``sf_dir`` unused (generated assets by design)."""
    assets = synthetic_image_assets(spark, n=_N, width=_W, height=_H, fmt="png")
    return (
        extract_features(assets)
        .select("asset_id", "width", "height", _luma6("mean_luma"))
        .orderBy("asset_id")
    )


_RESIZE_ORACLE = f"""
SELECT a.asset_id,
       CAST({_RW} AS INTEGER) AS width,
       CAST({_RH} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + y.y * ({_H} // {_RH})) % 256) * 1.0 / {_RH})
             / 255.0 * 1e6 + 0.5) / 1e6 AS mean_luma
FROM range({_N}) AS a(asset_id), range({_RH}) AS y(y)
GROUP BY a.asset_id
ORDER BY a.asset_id
"""


@query("multimodal_resize_roundtrip", _RESIZE_ORACLE)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end codec roundtrip: decode → nearest-neighbor resample
    → re-encode (NetPBM) → decode again. Nearest-neighbor row picks
    are pure index arithmetic (``(arange(h_out) * h_in) // h_out`` =
    stride 2 here), so the oracle recomputes the resampled gradient's
    mean luma exactly — if any stage of the real codec drifted, the
    hash would break."""
    assets = synthetic_image_assets(spark, n=_N, width=_W, height=_H)
    resized = resize_images(assets, _RW, _RH, real_codec=True).select(
        "asset_id",
        F.lit("image").alias("modality"),
        F.col("resized").alias("content"),
    )
    return (
        extract_features(resized)
        .select("asset_id", "width", "height", _luma6("mean_luma"))
        .orderBy("asset_id")
    )


# WAV header = RIFF(12) + fmt(8+16) + data-header(8); mono 16-bit PCM
# payload = 2 bytes/sample. Pinning n_bytes in the oracle locks the
# ENCODER's byte layout, not just the decoded features.
_WAV_BYTES = 12 + 24 + 8 + 2 * _NS

_AUDIO_ORACLE = f"""
WITH v AS (
  SELECT a.asset_id,
         ((a.asset_id * 37 + k.k * 13) % 4001) - 2000 AS v
  FROM range({_AN}) AS a(asset_id), range({_NS}) AS k(k)
)
SELECT asset_id,
       CAST({_WAV_BYTES} AS BIGINT) AS n_bytes,
       CAST({_RATE} AS INTEGER) AS sample_rate,
       CAST({_NS} AS BIGINT) AS n_frames,
       CAST(1 AS INTEGER) AS n_channels,
       CAST({_NS * 1000 // _RATE} AS BIGINT) AS duration_ms,
       FLOOR(CAST(SUM(ABS(v)) AS DOUBLE) / {_NS} * 1e6 + 0.5) / 1e6
         AS mean_abs,
       FLOOR(sqrt(CAST(SUM(v * v) AS DOUBLE) / {_NS}) * 1e6 + 0.5) / 1e6
         AS rms
FROM v
GROUP BY asset_id
ORDER BY asset_id
"""


@query("multimodal_audio_features", _AUDIO_ORACLE)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode on the executors (r7 — closes the last
    modality gap): closed-form mono PCM WAV clips → Arrow-batched
    ``mapInPandas`` decode (operators/codecs.py decode_wav, a full
    RIFF chunk walker) → per-clip byte size, rate, frames, channels,
    duration, mean |amplitude| and RMS, verified against an oracle
    that recomputes every feature from the synthetic waveform's
    closed form — it never touches the bytes, so encoder layout,
    decoder arithmetic, and feature math are all pinned end-to-end.
    ``sf_dir`` unused, like the image codec queries (generated
    assets by design)."""
    assets = synthetic_audio_assets(spark, n=_AN, rate=_RATE, n_samples=_NS)
    feats = extract_audio_features(assets)
    return feats.select(
        "asset_id",
        "n_bytes",
        "sample_rate",
        "n_frames",
        "n_channels",
        "duration_ms",
        _luma6("mean_abs"),
        _luma6("rms"),
    ).orderBy("asset_id")


_VN, _VW, _VH, _VF, _VSTRIDE = 64, 16, 12, 16, 4

_VIDEO_ORACLE = f"""
SELECT a.asset_id,
       CAST(f.f AS INTEGER) AS frame_index,
       CAST({_VW} AS INTEGER) AS width,
       CAST({_VH} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + 3 * f.f + y.y) % 256) * 1.0 / {_VH})
             / 255.0 * 1e6 + 0.5) / 1e6 AS mean_luma
FROM range({_VN}) AS a(asset_id), range({_VF}) AS f(f), range({_VH}) AS y(y)
WHERE f.f % {_VSTRIDE} = 0
GROUP BY a.asset_id, f.f
ORDER BY a.asset_id, f.f
"""


@query("multimodal_video_frames", _VIDEO_ORACLE)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling over the PUBLISHED format (r8 —
    upgrades r7's synthetic CVID container): deterministic C420jpeg
    YUV4MPEG2 streams (ffmpeg-playable .y4m) are seek-decoded every
    4th frame via the format's fixed frame stride (header + k *
    frame_bytes — O(frame), never a stream scan), luma plane reduced
    to per-frame mean luminance — all verified against a closed-form
    oracle that recomputes each sampled frame's gradient. The 1→N
    mapInPandas frame-sampler shape with actual decode work inside;
    CVID remains supported as a sniffed test-fixture container."""
    from calorista_spark.operators.multimodal import (
        sample_video_frames,
        synthetic_video_assets,
    )

    assets = synthetic_video_assets(
        spark, n=_VN, width=_VW, height=_VH, n_frames=_VF
    )
    return (
        sample_video_frames(assets, stride=_VSTRIDE)
        .select(
            "asset_id", "frame_index", "width", "height", _luma6("mean_luma")
        )
        .orderBy("asset_id", "frame_index")
    )


# JPEG closed form: the block gradient is constant per 8-row band —
# pixel(y, x) = (asset_id + y - y%8) % 256 — and the flat quant table
# makes baseline JPEG round-trip those blocks EXACTLY (DC = 8·(v−128)
# divides by 8; every AC quantizes to 0), so the LOSSY codec's decoded
# mean luma is still independently computable by the oracle.
_JPEG_ORACLE = f"""
SELECT a.asset_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + y.y - (y.y % 8)) % 256) * 1.0 / {_H})
             / 255.0 * 1e6 + 0.5) / 1e6 AS mean_luma
FROM range({_N}) AS a(asset_id), range({_H}) AS y(y)
GROUP BY a.asset_id
ORDER BY a.asset_id
"""


@query("multimodal_jpeg_features", _JPEG_ORACLE)
def multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG decode on the executors (r9 — the pure-numpy
    ITU-T.81 codec in operators/codecs.py: marker walk, Annex-K
    Huffman, dequantize, IDCT; no Pillow anywhere): block-gradient
    assets encoded as real JPEGs whose constant 8×8 blocks survive the
    lossy path bit-exactly under the flat quant table, decoded via the
    same Arrow-batched feature extractor as every other format, and
    pinned by the closed-form oracle. Progressive/corrupt inputs raise
    typed errors (tests). ``sf_dir`` unused (generated assets by
    design)."""
    assets = synthetic_image_assets(
        spark, n=_N, width=_W, height=_H, fmt="jpeg"
    )
    return (
        extract_features(assets)
        .select("asset_id", "width", "height", _luma6("mean_luma"))
        .orderBy("asset_id")
    )


# GIF is lossless (palette-indexed), so the row-gradient closed form
# of the NetPBM/PNG oracles applies verbatim — the query pins the
# stdlib LZW decoder, interlace handling, and color-table mapping.
_GIF_ORACLE = f"""
SELECT a.asset_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       FLOOR((SUM((a.asset_id + y.y) % 256) * 1.0 / {_H}) / 255.0 * 1e6 + 0.5)
         / 1e6 AS mean_luma
FROM range({_N}) AS a(asset_id), range({_H}) AS y(y)
GROUP BY a.asset_id
ORDER BY a.asset_id
"""


@query("multimodal_gif_features", _GIF_ORACLE)
def multimodal_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF decode on the executors (r9 — the pure-stdlib LZW
    decoder in operators/codecs.py): the same closed-form gradient
    assets as the PNG query, encoded as spec-valid GIF89a (identity
    grayscale color table, compression-free LZW with periodic CLEAR
    codes), decoded through the shared Arrow-batched feature
    extractor, pinned by the closed-form oracle. With PNG, JPEG, and
    GIF all decoding pure-stdlib, every everyone-has-it image format
    now runs without Pillow. ``sf_dir`` unused (generated assets)."""
    assets = synthetic_image_assets(spark, n=_N, width=_W, height=_H, fmt="gif")
    return (
        extract_features(assets)
        .select("asset_id", "width", "height", _luma6("mean_luma"))
        .orderBy("asset_id")
    )
