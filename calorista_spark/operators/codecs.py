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

import math

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


# ---------------------------------------------------------------------------
# PNG: pure-stdlib decoder/encoder (r8 — closes the "a format a user
# actually has" gap from the r7 verdict). Non-interlaced 8-bit PNGs
# decode with zlib + numpy only; Adam7/16-bit fall through to Pillow
# when importable, else raise the typed error. Spec: RFC 2083 /
# https://www.w3.org/TR/png-3/ (chunk layout, filter types 0-4).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type: 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(content: bytes):
    """Yield (type, data) PNG chunks, CRC-verified (zlib.crc32)."""
    import struct
    import zlib

    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(content):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG stream ended before IEND")


def decode_png(content: bytes) -> np.ndarray:
    """Stdlib PNG decode → uint8 (H, W) gray or (H, W, 3) RGB.

    Supports every non-interlaced 8-bit color type: grayscale (0),
    RGB (2), palette (3, via PLTE), gray+alpha (4 → luma channel,
    alpha dropped) and RGBA (6 → RGB, alpha dropped). All five filter
    types unfilter per the spec (Sub via a per-channel cumulative sum;
    Average/Paeth per-byte — fine at asset sizes, and the Pillow seam
    remains the bulk path where it exists). Interlaced (Adam7) or
    non-8-bit depth raise :class:`UnsupportedImageError` so the
    dispatch in :func:`decode_image_bytes` can fall through to Pillow.
    """
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG with nonstandard compression/filter method")
    if interlace == 1 or depth != 8:
        raise UnsupportedImageError(
            f"stdlib PNG path handles non-interlaced 8-bit only "
            f"(depth={depth}, interlace={interlace}); Pillow would be "
            "needed for this file"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    bpp = _PNG_CHANNELS[color]
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int64)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: prefix sum per channel column
            cur = np.cumsum(line.reshape(-1, bpp), axis=0).reshape(-1) & 255
        elif ftype == 2:  # Up
            cur = (line + prev) & 255
        elif ftype == 3:  # Average
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((a + prev[x]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 255
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    if color == 0:
        return out
    if color == 2:
        return out.reshape(height, width, 3)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if len(plte) == 0 or len(plte) % 3 != 0:
            raise ValueError(
                f"PNG PLTE length {len(plte)} is not a positive multiple of 3"
            )
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        # malformed rasters referencing entries past the palette must
        # fail the codec seam's ValueError contract, not leak a raw
        # numpy IndexError (ADVICE r8)
        if int(out.max()) >= len(pal):
            raise ValueError(
                f"PNG palette index {int(out.max())} out of range "
                f"(PLTE has {len(pal)} entries)"
            )
        return pal[out]
    if color == 4:  # gray+alpha → luma
        return np.ascontiguousarray(out.reshape(height, width, 2)[:, :, 0])
    # color == 6: RGBA → RGB
    return np.ascontiguousarray(out.reshape(height, width, 4)[:, :, :3])


def encode_png(
    arr: np.ndarray, row_filters: list[int] | None = None
) -> bytes:
    """(H, W) uint8 → grayscale PNG; (H, W, 3) uint8 → RGB PNG.

    ``row_filters`` picks the per-scanline filter type (cycled; default
    ``[0]``) — asset generators cycle all five to exercise every
    unfilter path in :func:`decode_png`. Bytes are deterministic for a
    given zlib build (fixed compression level, no timestamps); the
    oracle-checked queries pin DECODED values, not encoded bytes, so
    zlib-version drift cannot break correctness."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, bpp = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, bpp = 2, 3
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    flat = arr.reshape(h, w * bpp).astype(np.int64)
    filters = row_filters or [0]
    lines: list[bytes] = []
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        ftype = filters[y % len(filters)]
        cur = flat[y]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = (cur - left) & 255
        elif ftype == 2:
            filt = (cur - prev) & 255
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = (cur - ((left + prev) >> 1)) & 255
        elif ftype == 4:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int64), prev[:-bpp]]
            )
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) & 255
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_image_bytes(content: bytes) -> np.ndarray:
    """Decode any supported image payload → uint8 array ((H, W) gray
    or (H, W, 3) RGB). NetPBM always works (numpy); non-interlaced
    8-bit PNG (r8), baseline JPEG (r9), and GIF87a/89a (r9) decode via
    the pure stdlib/numpy paths; only interlaced/16-bit PNG and
    progressive JPEG still fall through to Pillow when importable.
    This is THE codec seam."""
    fmt = sniff_format(content)
    if fmt in ("pgm", "ppm"):
        return decode_netpbm(content)
    if fmt == "png":
        try:
            return decode_png(content)
        except UnsupportedImageError:
            if not HAVE_PIL:
                raise
    if fmt == "jpeg":
        try:
            return decode_jpeg(content)
        except UnsupportedImageError:
            if not HAVE_PIL:
                raise
    if fmt == "gif":
        try:
            return decode_gif(content)
        except UnsupportedImageError:
            if not HAVE_PIL:
                raise
    if HAVE_PIL:  # pragma: no cover - exercised only where PIL exists
        import io

        with _PILImage.open(io.BytesIO(content)) as im:
            im = im.convert("RGB") if im.mode not in ("L", "RGB") else im
            return np.asarray(im)
    raise UnsupportedImageError(
        f"no codec for format {fmt or 'unknown'}: NetPBM (P5/P6) and "
        "non-interlaced 8-bit PNG are built in; JPEG/GIF/interlaced "
        "PNG need Pillow, which is not importable here"
    )




# ---------------------------------------------------------------------------
# Baseline JPEG codec — pure numpy/stdlib (r9, VERDICT r8 #4: "the one
# format a real user has that this sandbox cannot open"). Implements
# the public ITU-T.81 baseline process: SOI/APPn/DQT/DHT/SOF0/DRI/SOS
# marker walk, Annex-K Huffman tables, zigzag, flat-or-arbitrary 8-bit
# quantization, byte-stuffed entropy segments with restart intervals,
# orthonormal-matrix (I)DCT, 4:4:4 and 4:2:0 chroma, JFIF YCbCr.
# Progressive (SOF2), arithmetic, hierarchical, and 12-bit frames
# raise UnsupportedImageError (typed fall-through); malformed streams
# raise ValueError — the same contract as the PNG path.
# ---------------------------------------------------------------------------

# Decompression-bomb guard (the Pillow MAX_IMAGE_PIXELS idea): corrupt
# or hostile dimension fields must fail fast, not allocate gigabytes
# and grind a Python MCU loop — found by mutation-fuzzing the decoders
# (a flipped SOF height byte produced a 60 GB allocation).
_MAX_DECODE_PIXELS = 100_000_000


def _check_dims(w: int, h: int, fmt: str) -> None:
    if w <= 0 or h <= 0 or w * h > _MAX_DECODE_PIXELS:
        raise ValueError(
            f"implausible {fmt} dimensions {w}x{h} "
            f"(cap {_MAX_DECODE_PIXELS} pixels)"
        )


_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T.81 Annex K typical Huffman tables (public spec constants).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            a[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_DCT_A = None


def _dct_a() -> np.ndarray:
    global _DCT_A
    if _DCT_A is None:
        _DCT_A = _dct_matrix()
    return _DCT_A


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    return {
        (length, code): sym
        for sym, (code, length) in _huff_encode_table(bits, vals).items()
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coef, dc_pred, dc_tab, ac_tab) -> int:
    """Huffman-encode one quantized 8x8 block; returns the new DC
    predictor."""
    dc = int(coef[0, 0])
    diff = dc - dc_pred
    t = _category(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    zz = [int(coef.flat[_JPEG_ZZ[i]]) for i in range(64)]
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_tab[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_tab[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _fdct_quant(block_u8: np.ndarray, quant: np.ndarray) -> np.ndarray:
    a = _dct_a()
    shifted = block_u8.astype(np.float64) - 128.0
    coef = a @ shifted @ a.T
    return np.round(coef / quant).astype(np.int64)


def encode_jpeg(
    arr: np.ndarray,
    quant_value: int = 8,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) uint8 → baseline grayscale JPEG; (H, W, 3) uint8 RGB →
    baseline color JPEG (JFIF YCbCr), ``subsampling`` '4:4:4' or
    '4:2:0'. A FLAT quantization table (default all-8s) makes
    constant-per-block fixtures round-trip EXACTLY (DC = 8·(v−128) is
    divisible by 8; every AC quantizes to 0), which is what lets the
    decoded features be pinned by a closed-form SQL oracle. Bytes are
    deterministic (fixed tables, no timestamps)."""
    import struct

    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg needs a (H, W)[,3] uint8 array")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("color input must have exactly 3 channels")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    quant = np.full((8, 8), int(quant_value), dtype=np.int64)
    if not 1 <= quant_value <= 255:
        raise ValueError("quant_value must be in [1, 255]")

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zz_quant = bytes(int(quant.flat[_JPEG_ZZ[i]]) for i in range(64))
    out += seg(0xFFDB, b"\x00" + zz_quant)  # DQT table 0
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    if not color:
        comps = [(1, 0x11, 0)]
    elif subsampling == "4:4:4":
        comps = [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)]
    else:
        comps = [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += struct.pack(">BBB", cid, hv, tq)
    out += seg(0xFFC0, sof)

    def dht(cls: int, dest: int, bits, vals) -> bytes:
        return seg(
            0xFFC4,
            bytes([cls << 4 | dest]) + bytes(bits) + bytes(vals),
        )

    out += dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if color:
        out += dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)

    sos = bytes([len(comps)])
    for cid, _hv, _tq in comps:
        tabs = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, tabs])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)

    # component planes (level-unshifted uint8 → float YCbCr)
    if color:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [np.round(y), np.round(cb), np.round(cr)]
    else:
        planes = [arr.astype(np.float64)]

    hmax = 2 if (color and subsampling == "4:2:0") else 1
    mcu_h, mcu_w = 8 * hmax, 8 * hmax
    mcuy = -(-h // mcu_h)
    mcux = -(-w // mcu_w)

    def comp_plane(idx: int) -> np.ndarray:
        p = planes[idx]
        if color and subsampling == "4:2:0" and idx > 0:
            # pad to even then 2x2 mean (JFIF centered-ish average)
            ph = p
            if ph.shape[0] % 2:
                ph = np.vstack([ph, ph[-1:]])
            if ph.shape[1] % 2:
                ph = np.hstack([ph, ph[:, -1:]])
            p = (
                ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
            ) / 4.0
            p = np.round(p)
        # pad to the MCU grid by edge replication
        th = mcuy * (8 * (hmax if idx == 0 else 1))
        tw = mcux * (8 * (hmax if idx == 0 else 1))
        pad_h, pad_w = th - p.shape[0], tw - p.shape[1]
        return np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge")

    padded = [comp_plane(i) for i in range(len(planes))]
    dc_lum = _huff_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _huff_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _huff_encode_table(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _huff_encode_table(_AC_CHR_BITS, _AC_CHR_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out_bits = bw.flush()
                out += out_bits + struct.pack(">H", 0xFFD0 + rst)
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                hv = hmax if ci == 0 else 1
                for by in range(hv):
                    for bx in range(hv):
                        y0 = (my * hv + by) * 8
                        x0 = (mx * hv + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _fdct_quant(block, quant)
                        preds[ci] = _encode_block(
                            bw,
                            coef,
                            preds[ci],
                            dc_lum if ci == 0 else dc_chr,
                            ac_lum if ci == 0 else ac_chr,
                        )
            mcu_count += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy segment exhausted mid-symbol")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG decode → uint8 (H, W) gray or (H, W, 3) RGB.

    Seam contract: malformed/truncated streams raise ``ValueError``;
    non-baseline frames raise :class:`UnsupportedImageError` — never a
    raw struct.error/IndexError/StopIteration, so the Arrow-batched
    feature extractors can null the row instead of killing the task.
    """
    try:
        return _decode_jpeg_impl(content)
    except (UnsupportedImageError, ValueError):
        raise
    except (IndexError, StopIteration, Exception) as exc:
        raise ValueError(f"malformed JPEG stream: {type(exc).__name__}: {exc}") from exc


def _decode_jpeg_impl(content: bytes) -> np.ndarray:
    """Baseline JPEG decode → uint8 (H, W) gray or (H, W, 3) RGB.

    Handles the ITU-T.81 baseline DCT process (SOF0/SOF1): 8-bit
    samples, Huffman entropy coding, 1 or 3 components, 4:4:4 or
    4:2:0 sampling, restart intervals. Progressive (SOF2) and the
    other non-baseline frame types raise
    :class:`UnsupportedImageError`; malformed streams raise
    ``ValueError`` — same seam contract as :func:`decode_png`."""
    import re
    import struct

    if not content.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    scan = None
    scan_comps = None
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        # r10 (ADVICE r9): T.81 B.1.1.2 allows any number of 0xFF fill
        # bytes before the marker code — skip them instead of treating
        # the fill byte as the marker
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(content):
            break
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM, RSTn, SOI) carry no length field
            pos += 2
            continue
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise UnsupportedImageError("16-bit JPEG quant tables")
                zz = payload[p + 1 : p + 65]
                if len(zz) < 64:
                    raise ValueError("truncated DQT")
                tab = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    tab[_JPEG_ZZ[i]] = zz[i]
                quant[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, dest = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                (huff_dc if cls == 0 else huff_ac)[dest] = _huff_decode_table(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit JPEG")
            _check_dims(w, h, "JPEG")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise UnsupportedImageError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"non-baseline JPEG frame (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan_comps = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            data_start = pos + 2 + seglen
            # entropy data runs to the next non-RST marker; a stream
            # that simply ends without a terminating marker keeps its
            # final byte (r10, ADVICE r9 — the old p+1 bound dropped it)
            p = data_start
            terminated = False
            while p + 1 < len(content):
                if content[p] == 0xFF and content[p + 1] not in (0x00,) and not (
                    0xD0 <= content[p + 1] <= 0xD7
                ):
                    terminated = True
                    break
                p += 1
            if not terminated:
                p = len(content)
            scan = content[data_start:p]
            pos = p
            continue
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise UnsupportedImageError(f"{len(comps)}-component JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    samplings = {(c[1], c[2]) for c in comps}
    if len(comps) == 3 and not (
        samplings == {(1, 1)}
        or (comps[0][1], comps[0][2]) == (2, 2)
        and samplings == {(2, 2), (1, 1)}
    ):
        raise UnsupportedImageError(
            f"unsupported chroma sampling {sorted(samplings)}"
        )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # entropy-length sanity bound (CPU twin of the pixel cap): every
    # block costs >= 2 bits even as pure EOBs under any Huffman table,
    # so a scan too short for the frame's block count is malformed —
    # reject it up front instead of grinding a million-block Python
    # loop on fuzzer garbage.
    blocks_per_mcu = sum(c[1] * c[2] for c in comps)
    if mcux * mcuy * blocks_per_mcu * 2 > len(scan) * 8 + 64:
        raise ValueError(
            "JPEG entropy segment too short for the declared frame size"
        )
    a = _dct_a()
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64))

    # split on restart markers; each segment restarts DC prediction
    segments = re.split(b"\xff[\xd0-\xd7]", scan) if restart_interval else [scan]
    seg_iter = iter(segments)
    br = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))
    preds = [0] * len(comps)
    tabsel = {cid: (dc, ac) for cid, dc, ac in (scan_comps or [])}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                if tq not in quant:
                    raise ValueError(f"JPEG missing quant table {tq}")
                dsel, asel = tabsel.get(cid, (0, 0))
                if dsel not in huff_dc or asel not in huff_ac:
                    raise ValueError("JPEG missing Huffman tables")
                for by in range(cv):
                    for bx in range(ch):
                        t = _huff_read(br, huff_dc[dsel])
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        coef = np.zeros(64, dtype=np.int64)
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, huff_ac[asel])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = rs >> 4, rs & 0x0F
                            k += run
                            if k > 63 or size == 0:
                                raise ValueError("corrupt JPEG AC coefficients")
                            coef[_JPEG_ZZ[k]] = _extend(br.read_bits(size), size)
                            k += 1
                        block = coef.reshape(8, 8) * quant[tq]
                        pix = a.T @ block.astype(np.float64) @ a
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    def upsample(ci: int) -> np.ndarray:
        cid, ch, cv, _tq = comps[ci]
        p = planes[ci]
        if ch != hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv != vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        return p[:h, :w] + 128.0

    if len(comps) == 1:
        out = np.clip(np.round(upsample(0)), 0, 255).astype(np.uint8)
        return out
    y, cb, cr = (upsample(i) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF codec — pure stdlib/numpy (r9). Implements the public GIF87a/89a
# spec: logical screen descriptor, global/local color tables, LZW
# image data (variable code width, CLEAR/EOI), interlace, GCE
# transparency skipped (first frame decoded, animation frames beyond
# the first are out of scope for the feature seam). The encoder emits
# spec-valid LZW at literal code width with periodic CLEAR codes —
# deterministic bytes, no compression search. Malformed streams raise
# ValueError; exotic variants raise UnsupportedImageError.
# ---------------------------------------------------------------------------


def decode_gif(content: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → uint8 (H, W, 3) RGB.

    Same seam contract as :func:`decode_jpeg`: malformed/truncated
    streams raise ``ValueError``, table-less frames raise
    :class:`UnsupportedImageError`, nothing else escapes.
    """
    try:
        return _decode_gif_impl(content)
    except (UnsupportedImageError, ValueError):
        raise
    except Exception as exc:
        raise ValueError(f"malformed GIF stream: {type(exc).__name__}: {exc}") from exc


def _decode_gif_impl(content: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → uint8 (H, W, 3) RGB."""
    if not content.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF payload")
    import struct

    pos = 6
    if pos + 7 > len(content):
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", content[pos : pos + 7])
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            content, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(content):
                raise ValueError("truncated GIF sub-blocks")
            size = content[p]
            p += 1
            if size == 0:
                return p
            p += size

    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            raise ValueError("GIF contains no image descriptor")
        if b == 0x21:  # extension — skip
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        _ix, _iy, iw, ih, ipacked = struct.unpack(
            "<HHHHB", content[pos + 1 : pos + 10]
        )
        _check_dims(iw, ih, "GIF")
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                content, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise UnsupportedImageError("GIF frame without any color table")
        interlaced = bool(ipacked & 0x40)
        min_code_size = content[pos]
        pos += 1
        data = bytearray()
        while True:
            size = content[pos]
            pos += 1
            if size == 0:
                break
            data += content[pos : pos + size]
            pos += size
        idx = _lzw_decode(bytes(data), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF LZW stream shorter than raster")
        arr = np.array(idx[: iw * ih], dtype=np.int64).reshape(ih, iw)
        if interlaced:
            out = np.empty_like(arr)
            rows = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            for src_i, dst_i in enumerate(rows):
                out[dst_i] = arr[src_i]
            arr = out
        if int(arr.max(initial=0)) >= len(table):
            raise ValueError(
                f"GIF pixel index {int(arr.max())} out of color-table "
                f"range ({len(table)} entries)"
            )
        return table[arr]
    raise ValueError("GIF stream ended before an image descriptor")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-flavored LZW (LSB-first bit packing, CLEAR/EOI codes,
    code width grows after the table fills, capped at 12 bits)."""
    # spec bound: codes cap at 12 bits, so the root size must leave
    # room for CLEAR/EOI + at least one dictionary entry. A corrupt
    # size byte (e.g. 255) would otherwise build a 2^255-entry table —
    # the GIF twin of the JPEG dimension bomb (fuzz-found, r9).
    if not 1 <= min_code_size <= 11:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = []

    def reset() -> int:
        table.clear()
        table.extend((i,) for i in range(clear))
        table.append(())  # CLEAR placeholder
        table.append(())  # EOI placeholder
        return min_code_size + 1

    width = reset()
    acc = 0
    nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("invalid first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("LZW code out of sequence")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return out
    return out


def encode_gif(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → GIF89a with an identity 256-gray color table.

    Deterministic, compression-free LZW: every pixel is emitted as a
    literal 8-bit-rooted code, with a CLEAR before each code batch so
    the code width never grows past 9 bits — spec-valid output any
    decoder accepts, and byte-deterministic by construction (the
    NetPBM determinism argument applied to GIF)."""
    import struct

    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encode_gif needs a (H, W) uint8 array")
    h, w = arr.shape
    if h == 0 or w == 0:
        # r10 (ADVICE r9): a zero-area GIF would encode, but decode_gif's
        # dimension guard rejects it — refuse at encode time so the codec
        # round-trips everything it emits
        raise ValueError("encode_gif needs a non-empty array")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):  # identity grayscale table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = 8
    clear, eoi = 256, 257
    out.append(min_code_size)

    bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    flat = arr.reshape(-1)
    # CLEAR every 254 literals keeps the table at its initial size, so
    # the code width stays 9 bits throughout (table grows by one per
    # emitted code; 2^9 - 258 = 254 codes of headroom)
    put(clear, 9)
    for i, v in enumerate(flat.tolist()):
        if i and i % 254 == 0:
            put(clear, 9)
        put(int(v), 9)
    put(eoi, 9)
    if nbits:
        bits.append(acc & 0xFF)
    for off in range(0, len(bits), 255):
        chunk = bits[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Audio: PCM WAV (RIFF) codec — pure numpy/struct, no dependencies
# (r7: closes the "audio has no decoder" gap from the r6 verdict).
# ---------------------------------------------------------------------------


class UnsupportedAudioError(NotImplementedError):
    """Raised when no available codec can handle the audio bytes
    (same contract as :class:`UnsupportedImageError`)."""


def sniff_audio_format(content: bytes) -> str | None:
    """Magic-byte sniff: 'wav' | 'flac' | 'ogg' | 'mp3' | None."""
    if content.startswith(b"RIFF") and content[8:12] == b"WAVE":
        return "wav"
    if content.startswith(b"fLaC"):
        return "flac"
    if content.startswith(b"OggS"):
        return "ogg"
    if content.startswith((b"ID3", b"\xff\xfb", b"\xff\xf3", b"\xff\xf2")):
        return "mp3"
    return None


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """PCM RIFF/WAVE → (sample_rate, (n_frames, n_channels) int32).

    Walks the chunk list per the RIFF spec (tolerates extra chunks
    like LIST/fact and odd-length padding), supports the integer PCM
    widths (8-bit unsigned, 16/24/32-bit signed little-endian) —
    samples are returned widened to int32 so downstream feature math
    is exact. Compressed formats (format tag != 1) raise
    :class:`UnsupportedAudioError`; a truncated/garbled layout raises
    ``ValueError``. Byte order is fixed little-endian by the spec, so
    decoding is platform-deterministic.
    """
    if sniff_audio_format(content) != "wav":
        raise UnsupportedAudioError(
            f"not a RIFF/WAVE payload (sniffed "
            f"{sniff_audio_format(content)!r}); PCM WAV is built in — "
            "FLAC/OGG/MP3 would need an external codec library"
        )
    import struct

    pos, end = 12, len(content)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, csize = content[pos : pos + 4], struct.unpack(
            "<I", content[pos + 4 : pos + 8]
        )[0]
        if pos + 8 + csize > end:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {csize} bytes but "
                f"only {end - pos - 8} remain"
            )
        body = content[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise UnsupportedAudioError(
            f"only integer PCM (format tag 1) supported, got {audio_format}"
        )
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(
            data, dtype=np.dtype("<i2"), count=len(data) // 2
        ).astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8, count=len(data) // 3 * 3)
        b = raw.reshape(-1, 3).astype(np.int32)
        samples = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = np.where(samples >= 1 << 23, samples - (1 << 24), samples)
    elif bits == 32:
        samples = np.frombuffer(
            data, dtype=np.dtype("<i4"), count=len(data) // 4
        ).astype(np.int32)
    else:
        raise UnsupportedAudioError(f"unsupported PCM width {bits}")
    n_frames = len(samples) // channels
    return rate, samples[: n_frames * channels].reshape(n_frames, channels)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames[, n_channels]) int → 16-bit PCM RIFF/WAVE bytes.
    Little-endian by spec → bit-identical across platforms (the same
    determinism argument as :func:`encode_netpbm`)."""
    import struct

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (frames[, channels]), got {arr.shape}")
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError(
            "samples exceed int16 range; rescale 24/32-bit audio before "
            "encoding to 16-bit PCM (silent wraparound would corrupt)"
        )
    pcm = np.ascontiguousarray(arr, dtype="<i2").tobytes()
    channels = arr.shape[1]
    fmt_body = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    riff_size = 4 + (8 + len(fmt_body)) + (8 + len(pcm))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def audio_features(rate: int, samples: np.ndarray) -> dict[str, float | int]:
    """Deterministic per-clip features from decoded PCM: exact
    integer sums (int64) divided once, sqrt last — both IEEE ops are
    correctly rounded, so the doubles are engine-reproducible (the
    multimodal oracle recomputes them from the closed-form synthetic
    waveform)."""
    n_frames, n_channels = samples.shape
    flat = samples.astype(np.int64).ravel()
    n = max(len(flat), 1)
    mean_abs = float(int(np.abs(flat).sum()) / n)
    rms = float(np.sqrt(int((flat * flat).sum()) / n))
    return {
        "sample_rate": int(rate),
        "n_frames": int(n_frames),
        "n_channels": int(n_channels),
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "mean_abs": mean_abs,
        "rms": rms,
    }


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
