"""Multimodal column plumbing (SURVEY §2.11 L5).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (schemas.MULTIMODAL_ASSET). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages —
the L6 escape hatch, used here because byte-level media decoding is
genuinely outside Spark SQL's expression language.

The codec itself lives in :mod:`calorista_spark.operators.codecs`
(r6): a REAL pure-numpy NetPBM (P5/P6) decode/resize/encode path that
runs in any environment, with Pillow picked up automatically for
PNG/JPEG when importable. Payloads no codec can handle surface as
nulls in the batched operators and as :class:`UnsupportedImageError`
(a ``NotImplementedError`` subclass) in the scalar helpers; the
deterministic fake path below remains for plumbing tests that want
assertable values on arbitrary bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calorista_spark.operators.codecs import (
    audio_features,
    decode_image_bytes,
    decode_wav,
    encode_netpbm,
    encode_wav,
    mean_luma,
    resize_nearest,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("fake_mean_luma", T.DoubleType(), True),
        # real-decode features (r6): null when no codec handles the bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def decode_image_stub(content: bytes | None, real_codec: bool = False) -> float | None:
    """Image decode → mean luma in [0, 1].

    ``real_codec=True`` runs the REAL codec (NetPBM via numpy; other
    formats via Pillow when importable) and raises
    ``UnsupportedImageError`` — a ``NotImplementedError`` subclass —
    for bytes nothing can decode. The default fake path returns a
    deterministic pseudo-luma from the byte histogram, so plumbing
    tests get stable values on arbitrary payloads.
    """
    if content is None:
        return None
    if real_codec:
        return mean_luma(decode_image_bytes(content))
    if len(content) == 0:
        return 0.0
    return sum(content) / (len(content) * 255.0)


def _try_decode(content: bytes | None):
    """(width, height, mean_luma) or (None, None, None) when the
    payload is null or no available codec handles it."""
    if content is None:
        return (None, None, None)
    try:
        arr = decode_image_bytes(content)
    except (NotImplementedError, ValueError):
        return (None, None, None)
    return (int(arr.shape[1]), int(arr.shape[0]), mean_luma(arr))


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
            decoded = content.map(_try_decode)
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
                    "width": decoded.map(lambda t: t[0]).astype("Int32"),
                    "height": decoded.map(lambda t: t[1]).astype("Int32"),
                    "mean_luma": decoded.map(lambda t: t[2]),
                }
            )

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_abs", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction (r7): REAL PCM WAV
    decode on the executors (operators/codecs.py decode_wav) → sample
    rate, frame/channel counts, duration, mean-|amplitude| and RMS.
    Same shape as :func:`extract_features` — one ``mapInPandas`` pass,
    no shuffle, fixed schema; undecodable payloads surface as null
    feature columns instead of failing the batch."""

    def _one(b: bytes | None):
        if b is None:
            return None
        try:
            rate, samples = decode_wav(b)
        except (NotImplementedError, ValueError):
            return None
        return audio_features(rate, samples)

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            feats = content.map(_one)

            def col(k, f=feats):
                return f.map(lambda d: d[k] if d is not None else None)

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "sample_rate": col("sample_rate").astype("Int32"),
                    "n_frames": col("n_frames").astype("Int64"),
                    "n_channels": col("n_channels").astype("Int32"),
                    "duration_ms": col("duration_ms").astype("Int64"),
                    "mean_abs": col("mean_abs"),
                    "rms": col("rms"),
                }
            )

    return assets.mapInPandas(_extract, schema=AUDIO_FEATURE_SCHEMA)


def synthetic_audio_assets(
    spark,
    n: int = 64,
    rate: int = 8000,
    n_samples: int = 1600,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic REAL audio clips for the codec path (the audio
    twin of :func:`synthetic_image_assets`): asset ``i`` is a mono
    16-bit PCM WAV whose samples follow the closed form

        sample[k] = ((i * 37 + k * 13) % 4001) - 2000

    so every decoded feature (mean |amplitude|, RMS, duration) is
    independently recomputable by an SQL oracle from ``range()``
    series — the oracle never touches the bytes. Generated
    executor-side via ``mapInPandas`` over ``spark.range``."""
    if num_partitions is None:
        num_partitions = max(
            1, min(spark.sparkContext.defaultParallelism, n // 64 or 1)
        )

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid in pdf["id"]:
                k = np.arange(n_samples, dtype=np.int64)
                samples = (int(aid) * 37 + k * 13) % 4001 - 2000
                rows.append(
                    (
                        int(aid),
                        "audio",
                        encode_wav(samples, rate),
                        "audio/wav",
                        None,
                        None,
                        int(n_samples * 1000 // rate),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        _gen, schema=ASSET_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video, tier 1 (r8): YUV4MPEG2 (.y4m) — the PUBLISHED raw-video
# interchange format (mjpegtools/ffmpeg): a plain-text stream header
# "YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<colorspace>\n" followed by
# frames, each "FRAME\n" + raw planar YUV. Every frame occupies the
# same byte span, so frame k lives at a computable offset — O(frame)
# seek-decode without an index, exactly the property the r7 CVID
# container faked. Supported colorspaces: Cmono (Y only), the C420
# family (C420, C420jpeg, C420mpeg2, C420paldv — identical plane
# layout), C422, C444. Sampling reads the luma plane.
#
# Tier 2: CVID (b"CVID" + counts + fixed-size NetPBM frames) is kept
# as the r7-era synthetic container — now a test fixture exercising
# the multi-container dispatch, no longer what the generators emit.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2 "

# extra plane bytes per luma pixel, by EXACT colorspace token (r9:
# prefix matching mapped C444alpha onto C444 and excluded the alpha
# plane from the frame stride, so every frame after index 0 failed the
# FRAME-marker check and was silently dropped — ADVICE r8). C444alpha
# carries full-size U, V AND A planes → 3.0.
_Y4M_CHROMA = {
    "mono": 0.0,
    "420": 0.5,
    "420jpeg": 0.5,
    "420mpeg2": 0.5,
    "420paldv": 0.5,
    "422": 1.0,
    "444": 2.0,
    "444alpha": 3.0,
}


def _y4m_layout(content: bytes) -> tuple[int, int, int, int, int]:
    """Parse the stream header → (width, height, header_len,
    y_bytes, frame_bytes). ``frame_bytes`` includes the 6-byte
    "FRAME\\n" marker; frames with per-frame parameters raise (the
    fixed-stride seek contract needs constant frame headers — every
    common encoder, incl. ffmpeg, writes bare FRAME markers)."""
    if not content.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = content.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = None
    colorspace = "420jpeg"  # spec default when C is absent
    for tok in content[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            colorspace = val.decode("ascii")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    chroma = _Y4M_CHROMA.get(colorspace)
    if chroma is None:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    if chroma in (0.5,) and (width % 2 or height % 2):
        raise ValueError("C420 Y4M needs even dimensions")
    if chroma == 1.0 and width % 2:
        raise ValueError("C422 Y4M needs even width")
    y_bytes = width * height
    frame_data = y_bytes + int(y_bytes * chroma)
    header_len = nl + 1
    if content[header_len : header_len + 6] != b"FRAME\n":
        raise ValueError(
            "Y4M frame with per-frame parameters (or truncated stream); "
            "fixed-stride seek requires bare FRAME markers"
        )
    return width, height, header_len, y_bytes, 6 + frame_data


def y4m_frame_count(content: bytes) -> int:
    _w, _h, header_len, _yb, frame_bytes = _y4m_layout(content)
    return (len(content) - header_len) // frame_bytes


def decode_y4m_frame(content: bytes, index: int) -> np.ndarray:
    """Seek-decode the LUMA plane of frame ``index`` → (H, W) uint8.
    Pure offset arithmetic (header + k * frame_bytes) — O(frame)."""
    width, height, header_len, y_bytes, frame_bytes = _y4m_layout(content)
    n_frames = (len(content) - header_len) // frame_bytes
    if not 0 <= index < n_frames:
        raise IndexError(f"frame {index} of {n_frames}")
    off = header_len + index * frame_bytes
    if content[off : off + 6] != b"FRAME\n":
        raise ValueError(f"Y4M frame marker missing at offset {off}")
    arr = np.frombuffer(
        content, dtype=np.uint8, count=y_bytes, offset=off + 6
    )
    return arr.reshape(height, width)


def encode_y4m(
    frames: list[np.ndarray], colorspace: str = "mono", fps: str = "25:1"
) -> bytes:
    """Equal-shaped grayscale (H, W) luma frames → a YUV4MPEG2 stream.
    ``Cmono`` writes the luma plane alone; the ``C420`` family pads
    neutral chroma (0x80) — both layouts byte-deterministic, playable
    by ffmpeg/mpv."""
    if not frames:
        raise ValueError("Y4M needs at least one frame")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError("frames must share dimensions")
    h, w = shapes.pop()
    chroma = _Y4M_CHROMA.get(colorspace)
    if chroma is None:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    if chroma == 0.5 and (w % 2 or h % 2):
        raise ValueError("C420 Y4M needs even dimensions")
    if chroma == 1.0 and w % 2:
        raise ValueError("C422 Y4M needs even width")
    header = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C{colorspace}\n".encode(
        "ascii"
    )
    if colorspace == "444alpha":
        # neutral U/V planes + fully-opaque alpha plane
        chroma_pad = b"\x80" * (2 * w * h) + b"\xff" * (w * h)
    else:
        chroma_pad = b"\x80" * int(w * h * chroma)
    parts = [header]
    for f in frames:
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        parts.append(chroma_pad)
    return b"".join(parts)


_VIDEO_MAGIC = b"CVID"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Concatenate equal-shaped grayscale frames into the container.
    Every frame encodes to the same NetPBM byte size (fixed header for
    fixed dims), so frame k lives at a computable offset — seekable
    sampling without an index, like any fixed-rate raw stream."""
    import struct

    if not frames:
        return _VIDEO_MAGIC + struct.pack("<II", 0, 0)
    payloads = [encode_netpbm(f) for f in frames]
    sizes = {len(p) for p in payloads}
    if len(sizes) != 1:
        raise ValueError("frames must share dimensions")
    return (
        _VIDEO_MAGIC
        + struct.pack("<II", len(payloads), sizes.pop())
        + b"".join(payloads)
    )


def decode_video_frame(content: bytes, index: int) -> np.ndarray:
    """Decode frame ``index`` by direct offset arithmetic + the real
    NetPBM decoder — O(frame), not O(stream)."""
    import struct

    if content[:4] != _VIDEO_MAGIC:
        raise ValueError("not a CVID container")
    n_frames, frame_bytes = struct.unpack("<II", content[4:12])
    if not 0 <= index < n_frames:
        raise IndexError(f"frame {index} of {n_frames}")
    off = 12 + index * frame_bytes
    from calorista_spark.operators.codecs import decode_netpbm

    return decode_netpbm(content[off : off + frame_bytes])


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def sample_video_frames(assets: DataFrame, stride: int = 4) -> DataFrame:
    """REAL frame sampling: every ``stride``-th frame of each video is
    seek-decoded (offset arithmetic, never a full-stream scan) and
    reduced to dimensions + mean luminance — the canonical 1→N
    ``mapInPandas`` shape of a production frame sampler, with the
    byte-level work Arrow-batched and partition-local. Containers are
    sniffed per asset: YUV4MPEG2 (.y4m — the published raw format;
    r8) or the CVID test container. Undecodable or null payloads
    contribute no rows (same totality policy as the image features'
    null columns, but 1→N ops drop instead)."""
    import struct

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    continue
                content = bytes(content)
                if content.startswith(_Y4M_MAGIC):
                    try:
                        n_frames = y4m_frame_count(content)
                    except ValueError:
                        continue
                    decode = decode_y4m_frame
                elif content[:4] == _VIDEO_MAGIC:
                    n_frames, _fb = struct.unpack("<II", content[4:12])
                    decode = decode_video_frame
                else:
                    continue
                for idx in range(0, n_frames, stride):
                    try:
                        arr = decode(content, idx)
                    except (ValueError, IndexError):
                        continue
                    rows.append(
                        (
                            int(asset_id),
                            idx,
                            int(arr.shape[1]),
                            int(arr.shape[0]),
                            mean_luma(arr),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return assets.mapInPandas(_sample, schema=VIDEO_FRAME_SCHEMA)


def synthetic_video_assets(
    spark,
    n: int = 64,
    width: int = 16,
    height: int = 12,
    n_frames: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic REAL videos (the video twin of
    :func:`synthetic_image_assets`): asset ``i``'s frame ``f`` is a
    luma row-gradient with ``pixel(y, x) = (i + 3*f + y) % 256`` —
    closed-form, so an SQL oracle recomputes every sampled frame's
    mean luma from ``range()`` series. r8: emitted as real C420jpeg
    YUV4MPEG2 streams (ffmpeg-playable), exercising the published-
    format path end-to-end; CVID remains a test fixture."""
    if num_partitions is None:
        num_partitions = max(
            1, min(spark.sparkContext.defaultParallelism, n // 64 or 1)
        )

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid in pdf["id"]:
                frames = []
                for f in range(n_frames):
                    y = (
                        np.arange(height, dtype=np.int64) + int(aid) + 3 * f
                    ) % 256
                    frames.append(
                        np.repeat(y.astype(np.uint8)[:, None], width, axis=1)
                    )
                rows.append(
                    (
                        int(aid),
                        "video",
                        encode_y4m(frames, colorspace="420jpeg"),
                        "video/x-yuv4mpeg",
                        width,
                        height,
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        _gen, schema=ASSET_SCHEMA
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stand-in for ARBITRARY byte payloads: emit one
    row per sampled byte offset — the 1→N mapInPandas plumbing shape,
    kept for tests over non-video bytes. For real video frame decode
    see :func:`sample_video_frames`. Offsets are deterministic."""
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
    """Image resize → bytes.

    ``real_codec=True`` runs the REAL path: decode (NetPBM/numpy, or
    Pillow when importable) → nearest-neighbor resample → re-encode as
    NetPBM (uncompressed, so output bytes are bit-deterministic across
    platforms); undecodable bytes raise ``UnsupportedImageError``. The
    default fake path emits a deterministic ``width*height``-byte
    payload by tiling the source bytes, so the 1→1 byte-transform
    plumbing is assertable on arbitrary payloads."""
    if content is None:
        return None
    if real_codec:
        return encode_netpbm(
            resize_nearest(decode_image_bytes(content), width, height)
        )
    target = width * height
    if len(content) == 0:
        return b"\x00" * target
    reps = target // len(content) + 1
    return (content * reps)[:target]


def resize_images(
    assets: DataFrame, width: int, height: int, real_codec: bool = False
) -> DataFrame:
    """Arrow-batched resize over multimodal assets: one ``mapInPandas``
    pass, no shuffle, binary column in → binary column out with typed
    target dimensions. At 100 TB this is the pattern for any byte-level
    media transform: partition-local, batch-at-a-time, fixed schema so
    everything around it stays Catalyst-planned.

    With ``real_codec=True``, decodable images are really resampled
    (nearest-neighbor) and re-encoded as NetPBM; undecodable payloads
    yield null rather than failing the batch."""

    def _resize_one(b: bytes | None) -> bytes | None:
        if not real_codec:
            return resize_image_stub(b, width, height)
        if b is None:
            return None
        try:
            return resize_image_stub(b, width, height, real_codec=True)
        except (NotImplementedError, ValueError):
            return None

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["content"].map(_resize_one)
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


ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthetic_image_assets(
    spark,
    n: int = 64,
    width: int = 24,
    height: int = 16,
    rgb: bool = False,
    num_partitions: int | None = None,
    fmt: str = "netpbm",
) -> DataFrame:
    """Deterministic REAL images for the codec path: asset ``i`` is a
    NetPBM row-gradient where every pixel in row ``y`` has value
    ``(i + y) % 256`` (P5 grayscale by default; ``rgb=True`` tiles the
    same gradient across 3 channels as P6).

    Generated executor-side via ``mapInPandas`` over ``spark.range`` —
    no driver materialization, so the generator itself scales. The
    closed-form pixel values make decoded features (mean luma per
    asset) independently computable by an SQL oracle.

    Partitioning: defaults to ~64 assets per partition (capped at the
    session default parallelism). ``spark.range``'s raw default —
    one split per core — puts a Python-worker spin-up behind every
    handful of rows at small ``n``, which dominated the benched cost
    of the codec queries 10×."""
    if num_partitions is None:
        num_partitions = max(
            1,
            min(spark.sparkContext.defaultParallelism, n // 64 or 1),
        )

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid in pdf["id"]:
                y = (np.arange(height, dtype=np.int64) + int(aid)) % 256
                if fmt == "jpeg":
                    # BLOCK gradient: constant per 8-row band, so every
                    # 8x8 block is constant → DC-only under the flat
                    # quant table → the lossy codec round-trips these
                    # EXACTLY and the oracle stays closed-form
                    yy = np.arange(height, dtype=np.int64)
                    y = (int(aid) + (yy - yy % 8)) % 256
                arr = np.repeat(y.astype(np.uint8)[:, None], width, axis=1)
                if rgb:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                if fmt == "png":
                    # cycle all five scanline filters so the corpus
                    # exercises every unfilter path in decode_png
                    from calorista_spark.operators.codecs import encode_png

                    payload = encode_png(arr, row_filters=[0, 1, 2, 3, 4])
                    mime = "image/png"
                elif fmt == "jpeg":
                    from calorista_spark.operators.codecs import encode_jpeg

                    payload = encode_jpeg(
                        arr, subsampling="4:2:0" if rgb else "4:4:4"
                    )
                    mime = "image/jpeg"
                elif fmt == "gif":
                    from calorista_spark.operators.codecs import encode_gif

                    payload = encode_gif(
                        arr if arr.ndim == 2 else arr[:, :, 0]
                    )
                    mime = "image/gif"
                else:
                    payload = encode_netpbm(arr)
                    mime = (
                        "image/x-portable-pixmap"
                        if rgb
                        else "image/x-portable-graymap"
                    )
                rows.append(
                    (int(aid), "image", payload, mime, width, height, None)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        _gen, schema=ASSET_SCHEMA
    )


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
