"""Minimal real image codecs (PNG via stdlib zlib, uncompressed BMP) and
PSNR, used for the ``bytes BINARY`` image payload column and its
per-row invariant (input hint: decoded-pixel allclose, PSNR≥40dB for
lossy, caption byte-equality).

No image libraries exist in this sandbox, so:

* ``png``/``bmp`` are REAL encoders/decoders (lossless → PSNR = inf);
* ``jpeg`` is a clearly-marked deterministic FAKE lossy codec — pixel
  quantization (step 4 → ~47 dB) inside a PNG container.  The Spark-side
  plumbing (binary column, typed metadata, Arrow-batched decode UDFs,
  batch shapes) is real and tested; swap `encode_jpeg_fake` for a real
  codec when one is available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG."""
    height, width, _ = pixels.shape
    header = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(height))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", header)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by :func:`encode_png` (filter 0 only)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if kind == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack_from(
                ">IIBB", payload
            )
            if bit_depth != 8 or color_type != 2:
                raise ValueError("unsupported PNG variant")
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width * 3 + 1
    rows = []
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("unsupported PNG filter")
        rows.append(np.frombuffer(row[1:], dtype=np.uint8))
    return np.stack(rows).reshape(height, width, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an uncompressed 24-bit BMP."""
    height, width, _ = pixels.shape
    row_size = (width * 3 + 3) & ~3
    image_size = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up rows
        body += pixels[y, :, ::-1].tobytes()  # BGR order
        body += pad
    return header + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    _, width, height, _, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 24:
        raise ValueError("unsupported BMP depth")
    row_size = (width * 3 + 3) & ~3
    out = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        start = offset + (height - 1 - y) * row_size
        row = np.frombuffer(data[start : start + width * 3], dtype=np.uint8)
        out[y] = row.reshape(width, 3)[:, ::-1]
    return out


_FAKE_LOSSY_STEP = 4  # quantization step → PSNR ≈ 47 dB (≥ 40 dB target)


def encode_jpeg_fake(pixels: np.ndarray) -> bytes:
    """Deterministic FAKE lossy codec (quantize + PNG container).

    Stands in for a real JPEG encoder which is unavailable in-sandbox;
    marked by a leading sentinel so decoders know the quantization.
    """
    quantized = (
        (pixels.astype(np.int32) // _FAKE_LOSSY_STEP) * _FAKE_LOSSY_STEP
        + _FAKE_LOSSY_STEP // 2
    ).clip(0, 255).astype(np.uint8)
    return b"FAKEJPG0" + encode_png(quantized)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if not data.startswith(b"FAKEJPG0"):
            raise NotImplementedError(
                "real JPEG decoding is unavailable in this environment; "
                "only the deterministic fake codec is supported"
            )
        return decode_png(data[8:])
    raise ValueError(f"unknown format {fmt!r}")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg_fake(pixels)
    raise ValueError(f"unknown format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
