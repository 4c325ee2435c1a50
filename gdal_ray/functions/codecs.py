"""Image codec dispatch for the ``bytes``/``fmt`` columns of the image
corpus (input_hint schema: image_id, bytes, w, h, fmt, caption, phash).

Formats:

- ``png``  — real, spec-compliant lossless PNG (functions/png.py).
- ``jpeg`` — real baseline JFIF (functions/jpeg.py, pure numpy; ITU
  T.81 semantics matching the reference's vendored libjpeg). The
  corpus encoder uses flat quantization tables (lum 5 / chrom 4):
  the synthetic images carry white noise, where Annex K's
  low-frequency bias wastes rate; flat tables land PSNR ~41 dB —
  above the >=40 dB per-row invariant from BASELINE.json — at ~25%
  fewer entropy symbols. The legacy JQ5 quantize+zlib stand-in still
  DECODES (old payloads sniff by magic) but is no longer emitted.
- ``raw``  — zlib-compressed raw pixels with a tiny header (lossless,
  fastest; used for intermediate tiles).

All payloads carry their own shape header, so decode needs only bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .jpeg import decode_jpeg, decode_jpeg_batch, encode_jpeg
from .png import decode_png, encode_png

# flat quant tables tuned for the noisy synthetic corpus (see module
# docstring); chroma errors amplify ~2.9x through YCbCr->RGB, so
# chroma quantizes finer than luma
_JPEG_QLUM = np.full(64, 5, np.int64)
_JPEG_QCHROM = np.full(64, 4, np.int64)

_JQ_MAGIC = b"JQ5\x00"
_RAW_MAGIC = b"RAW\x00"
_RAW0_MAGIC = b"RW0\x00"
_JQ_LEVELS = 32  # 5-bit quantization
_JQ_STEP = 255.0 / (_JQ_LEVELS - 1)


def _encode_jq(pixels: np.ndarray) -> bytes:
    if pixels.dtype != np.uint8:
        raise ValueError("jpeg stand-in supports uint8 only")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    q = np.round(pixels.astype(np.float32) / _JQ_STEP).astype(np.uint8)
    return _JQ_MAGIC + struct.pack(">III", h, w, c) + zlib.compress(q.tobytes(), 6)


def _decode_jq(data: bytes) -> np.ndarray:
    h, w, c = struct.unpack(">III", data[4:16])
    q = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).reshape(h, w, c)
    out = np.clip(np.round(q.astype(np.float32) * _JQ_STEP), 0, 255).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out


def _encode_raw(pixels: np.ndarray) -> bytes:
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    dt = pixels.dtype.str.encode()  # e.g. b'|u1', b'<u2', b'<f4'
    return (
        _RAW_MAGIC
        + struct.pack(">III4s", h, w, c, dt)
        + zlib.compress(np.ascontiguousarray(pixels).tobytes(), 1)
    )


def _decode_raw(data: bytes) -> np.ndarray:
    h, w, c, dt = struct.unpack(">III4s", data[4:20])
    arr = np.frombuffer(zlib.decompress(data[20:]), dtype=np.dtype(dt.rstrip(b"\x00").decode()))
    arr = arr.reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


def _encode_raw0(pixels: np.ndarray) -> bytes:
    """Uncompressed raw (``raw0``): for payloads that never cross a
    process boundary (e.g. fragments composed inside the same task in
    the partitioned tiling path) the zlib round-trip is pure waste."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    dt = pixels.dtype.str.encode()
    return (_RAW0_MAGIC + struct.pack(">III4s", h, w, c, dt)
            + np.ascontiguousarray(pixels).tobytes())


def _decode_raw0(data: bytes) -> np.ndarray:
    h, w, c, dt = struct.unpack(">III4s", data[4:20])
    arr = np.frombuffer(data[20:],
                        dtype=np.dtype(dt.rstrip(b"\x00").decode()),
                        count=h * w * c).reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels, quant_tables=(_JPEG_QLUM, _JPEG_QCHROM),
                           restart_interval="auto")
    if fmt == "webp":
        from .webp import encode_webp_lossless

        return encode_webp_lossless(pixels)
    if fmt == "raw":
        return _encode_raw(pixels)
    if fmt == "raw0":
        return _encode_raw0(pixels)
    raise NotImplementedError(f"format {fmt!r} (no codec library in this environment)")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by sniffing magic bytes (fmt is advisory, like GDALOpenEx
    driver probing — reference gcore/gdaldataset.cpp:3621)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:4] == _JQ_MAGIC:
        return _decode_jq(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp(data)
    if data[:4] == _RAW_MAGIC:
        return _decode_raw(data)
    if data[:4] == _RAW0_MAGIC:
        return _decode_raw0(data)
    if (data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            or data[:2] == b"\xff\x4f"):
        from .jp2k import decode_jp2

        return decode_jp2(data)[0]
    raise NotImplementedError(f"unrecognized image payload (fmt hint {fmt!r})")


def decode_images(blobs: list[bytes]) -> list[np.ndarray]:
    """Decode a whole batch of image payloads, batching the JPEGs
    through the merged lockstep state machine (functions/jpeg.py
    decode_jpeg_batch) — the per-batch form every map_batches decode
    stage should use. Non-JPEG payloads decode per row as before;
    order is preserved."""
    outs: list = [None] * len(blobs)
    jpeg_pos: list[int] = []
    jpeg_blobs: list[bytes] = []
    for i, data in enumerate(blobs):
        if data[:2] == b"\xff\xd8":
            jpeg_pos.append(i)
            jpeg_blobs.append(data)
        else:
            outs[i] = decode_image(data)
    if jpeg_blobs:
        for i, px in zip(jpeg_pos, decode_jpeg_batch(jpeg_blobs)):
            outs[i] = px
    return outs


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
