"""Image payload codec, perceptual hash, and PSNR.

The container has no PIL/opencv, so real PNG/JPEG codecs are stubbed by
a deterministic self-describing format (documented below).  The
Spark-side plumbing — binary column, typed metadata, Arrow-batched
decode UDFs, PSNR verification — is real; only the codec bytes differ
from on-disk PNG/JPEG.  Swapping in a real codec is a 2-function
change (``encode_image`` / ``decode_image``).

Formats (all little-endian):
  raw : b"RAW0" + u16 w + u16 h + h*w*3 uint8 pixels
  png : b"PNGZ" + u16 w + u16 h + zlib(pixels)           (lossless)
  jpg : b"JPGQ" + u16 w + u16 h + u8 q + zlib(quantized) (lossy,
        quantization step q; q=4 → PSNR ≈ 47 dB, satisfying the
        ≥40 dB invariant from BASELINE.json input_hint)

The verification role mirrors the reference's decoder-as-oracle
(/root/reference/Decoder/Decoder.cpp:63-118): decode both members of a
claimed pixel-duplicate pair and check allclose / PSNR.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = {"raw": b"RAW0", "png": b"PNGZ", "jpg": b"JPGQ"}
_MAGIC_REV = {v: k for k, v in MAGIC.items()}
JPG_QUANT_STEP = 4


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: uint8[(h, w, 3)] → format bytes."""
    h, w, _ = pixels.shape
    head = MAGIC[fmt] + struct.pack("<HH", w, h)
    if fmt == "raw":
        return head + pixels.tobytes()
    if fmt == "png":
        return head + zlib.compress(pixels.tobytes(), level=6)
    if fmt == "jpg":
        q = JPG_QUANT_STEP
        quant = ((pixels.astype(np.int32) // q) * q + q // 2).clip(0, 255)
        return (
            head
            + struct.pack("<B", q)
            + zlib.compress(quant.astype(np.uint8).tobytes(), level=6)
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(blob: bytes) -> np.ndarray:
    """format bytes → uint8[(h, w, 3)] pixels."""
    fmt = _MAGIC_REV.get(bytes(blob[:4]))
    if fmt is None:
        raise NotImplementedError(
            "real PNG/JPEG decode is stubbed in this sandbox; "
            f"unknown magic {bytes(blob[:4])!r}"
        )
    w, h = struct.unpack("<HH", bytes(blob[4:8]))
    if fmt == "raw":
        body = np.frombuffer(blob, dtype=np.uint8, count=h * w * 3, offset=8)
    elif fmt == "png":
        body = np.frombuffer(zlib.decompress(bytes(blob[8:])), dtype=np.uint8)
    else:  # jpg
        body = np.frombuffer(zlib.decompress(bytes(blob[9:])), dtype=np.uint8)
    return body.reshape(h, w, 3)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 pixel arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Simplified DCT-free 64-bit perceptual hash (deterministic).

    Gray → 8x8 block-mean downsample → bit i = cell_i > mean.  Returns
    int64-reinterpreted value (Spark LongType carrier).
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    if h >= 8 and w >= 8:
        # two reduceat passes (block row sums, then block column sums)
        # replace the 8x8 Python cell loop; block boundaries are the
        # same //-derived irregular edges, areas divide the sums back
        # to means
        rows = np.add.reduceat(gray, ys[:8], axis=0)
        cells = np.add.reduceat(rows, xs[:8], axis=1)
        cells /= np.outer(np.diff(ys), np.diff(xs))
    else:
        # degenerate tiny images: blocks overlap (ys/xs repeat), which
        # reduceat cannot express — keep the explicit slice loop
        cells = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                cells[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                                   xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).ravel()
    v = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        dtype=np.uint64
    )
    return int(v.astype(np.int64))
