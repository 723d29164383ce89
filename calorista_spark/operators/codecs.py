"""Real image codec behind the multimodal seam (SURVEY §2.11 L5).

Two tiers, dispatched by content sniffing:

- **NetPBM (P5 grayscale / P6 RGB)** — implemented here in pure
  numpy, so the *real* decode → transform → encode path runs and is
  tested in any environment. NetPBM is the standard uncompressed
  interchange format; its byte layout (ASCII header + raw samples)
  makes decode/encode deterministic across platforms.
- **PNG/JPEG and everything else** — delegated to Pillow when it is
  importable (optional dependency, absent in this container); a
  clear :class:`UnsupportedImageError` otherwise. The seam is this
  module's ``decode_image_bytes`` — nothing else in the package
  needs to change when a codec library appears.

Reference parity note: the reference system (coldshrine/calorista)
has no media handling at all — this implements the north-star
"multimodal columns" capability for a training-data pipeline, where
images ride as opaque ``binary`` columns and byte-level transforms
run Arrow-batched in ``mapInPandas`` (see operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

try:  # optional — not present in this container
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:  # pragma: no cover - depends on environment
    _PILImage = None
    HAVE_PIL = False


class UnsupportedImageError(NotImplementedError):
    """Raised when no available codec can handle the byte format.

    Subclasses ``NotImplementedError`` so callers that treated the
    pre-r6 stub seam as "not implemented" keep working unchanged.
    """


def sniff_format(content: bytes) -> str | None:
    """Best-effort magic-byte sniff: 'pgm' | 'ppm' | 'png' | 'jpeg' |
    'gif' | None (unrecognized)."""
    if content.startswith(b"P5"):
        return "pgm"
    if content.startswith(b"P6"):
        return "ppm"
    if content.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if content.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if content.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return None


def _netpbm_header(buf: bytes) -> tuple[int, int, int, int]:
    """Parse a binary NetPBM header → (width, height, maxval,
    data_offset). Handles arbitrary whitespace and ``#`` comments per
    the spec; exactly one whitespace byte separates maxval from the
    raster."""
    toks: list[int] = []
    i = 2  # past the P5/P6 magic
    while len(toks) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated NetPBM header")
        toks.append(int(buf[i:j]))
        i = j
    width, height, maxval = toks
    return width, height, maxval, i + 1  # single whitespace after maxval


def decode_netpbm(content: bytes) -> np.ndarray:
    """Binary P5 → (H, W) uint8; binary P6 → (H, W, 3) uint8."""
    fmt = sniff_format(content)
    if fmt not in ("pgm", "ppm"):
        raise ValueError(f"not a binary NetPBM payload (sniffed {fmt!r})")
    width, height, maxval, off = _netpbm_header(content)
    if not (0 < maxval <= 255):
        raise ValueError(f"only 8-bit NetPBM supported (maxval={maxval})")
    channels = 3 if fmt == "ppm" else 1
    n = width * height * channels
    if len(content) - off < n:
        raise ValueError("NetPBM raster shorter than header promises")
    arr = np.frombuffer(content, dtype=np.uint8, count=n, offset=off)
    return arr.reshape((height, width, 3) if channels == 3 else (height, width))


def encode_netpbm(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → binary P5; (H, W, 3) uint8 → binary P6.

    The output encoding is always NetPBM regardless of what the input
    was decoded from: uncompressed and compressor-free, so re-encoded
    bytes are bit-identical across platforms (the same determinism
    argument as the quantized-sum convention)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_image_bytes(content: bytes) -> np.ndarray:
    """Decode any supported image payload → uint8 array ((H, W) gray
    or (H, W, 3) RGB). NetPBM always works (numpy); other formats
    need Pillow. This is THE codec seam."""
    fmt = sniff_format(content)
    if fmt in ("pgm", "ppm"):
        return decode_netpbm(content)
    if HAVE_PIL:  # pragma: no cover - exercised only where PIL exists
        import io

        with _PILImage.open(io.BytesIO(content)) as im:
            im = im.convert("RGB") if im.mode not in ("L", "RGB") else im
            return np.asarray(im)
    raise UnsupportedImageError(
        f"no codec for format {fmt or 'unknown'}: NetPBM (P5/P6) is "
        "built in; PNG/JPEG/GIF need Pillow, which is not importable here"
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width[, C]) — pure index
    arithmetic, so identical on every platform (no filter kernels,
    no float rounding ambiguity)."""
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    src_h, src_w = arr.shape[0], arr.shape[1]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return arr[rows][:, cols]


def mean_luma(arr: np.ndarray) -> float:
    """Mean luminance normalized to [0, 1]. Grayscale: plain mean.
    RGB: ITU-R BT.601 weights (0.299, 0.587, 0.114)."""
    a = arr.astype(np.float64)
    if a.ndim == 3:
        a = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return float(a.mean() / 255.0)
