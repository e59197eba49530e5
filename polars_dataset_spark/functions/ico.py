"""Pure-python ICO (Windows icon) decoder — no Pillow.

Implements the public ICO container format (ICONDIR header + directory
entries) with both payload kinds the format allows:

- an embedded PNG stream (Vista+ icons) — delegated to the in-repo
  full-spec PNG decoder (:mod:`polars_dataset_spark.functions.png`);
- a headerless DIB: ``BITMAPINFOHEADER`` whose ``biHeight`` is DOUBLED
  (XOR color mask + AND transparency mask stacked), 24/32-bpp
  uncompressed, bottom-up rows padded to 4 bytes. The AND mask is
  ignored (we produce grayscale, not alpha).

The LARGEST image in the directory wins (width 0 in a directory entry
means 256, per the spec). Returns float32 grayscale ``(H, W)`` in
[0, 1] — the shared contract of the image decoders feeding
``decode_media`` — or None on malformed input, never raising.

An encoder packs existing fixtures (PNG via the in-repo PNG encoder,
DIBs built directly) so round-trips exercise the directory walk, both
payload kinds, and the doubled-height DIB convention.
"""

from __future__ import annotations

import struct

import numpy as np

from polars_dataset_spark.functions.png import _MAX_PIXELS, decode_png_gray

__all__ = ["decode_ico_gray", "encode_ico"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_dib(data: bytes) -> "np.ndarray | None":
    if len(data) < 40:
        return None
    (hsz, w, h2, _planes, bpp, comp) = struct.unpack("<LllHHL", data[:20])
    if hsz != 40 or comp != 0 or bpp not in (24, 32) or w <= 0 or h2 <= 0:
        return None
    h = h2 // 2  # XOR + AND masks stacked: stored height is doubled
    if h == 0 or w * h > _MAX_PIXELS:
        return None
    row_bytes = (w * (bpp // 8) + 3) & ~3
    need = 40 + row_bytes * h  # AND mask may follow; we don't need it
    if len(data) < need:
        return None
    rows = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=40).reshape(
        h, row_bytes
    )
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    gray = px[:, :, :3].astype(np.float32).mean(axis=2) / 255.0  # BGR(A): mean only
    return np.ascontiguousarray(gray[::-1])  # bottom-up


def decode_ico_gray(blob: bytes) -> "np.ndarray | None":
    try:
        if len(blob) < 6:
            return None
        reserved, typ, count = struct.unpack("<HHH", blob[:6])
        if reserved != 0 or typ != 1 or count == 0:
            return None
        best = None  # (area, offset, size)
        for i in range(count):
            off = 6 + 16 * i
            if off + 16 > len(blob):
                return None
            bw, bh = blob[off], blob[off + 1]
            size, img_off = struct.unpack("<LL", blob[off + 8 : off + 16])
            w = bw or 256  # 0 means 256 per the spec
            h = bh or 256
            if img_off + size > len(blob):
                return None
            if best is None or w * h > best[0]:
                best = (w * h, img_off, size)
        data = blob[best[1] : best[1] + best[2]]
        if data[:8] == _PNG_MAGIC:
            return decode_png_gray(data)
        return _decode_dib(data)
    except Exception:
        return None


def _dib_bytes(img: np.ndarray, bpp: int = 32) -> bytes:
    """(H, W) gray or (H, W, 3) RGB float [0,1] → ICO DIB payload."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    rgb = np.round(img * 255.0).astype(np.uint8)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    px = rows[:, : w * nch].reshape(h, w, nch)
    px[:, :, 0] = rgb[:, :, 2]
    px[:, :, 1] = rgb[:, :, 1]
    px[:, :, 2] = rgb[:, :, 0]
    if nch == 4:
        px[:, :, 3] = 255
    body = rows[::-1].tobytes()  # bottom-up
    and_row = ((w + 31) // 32) * 4  # 1-bpp AND mask, padded to 32 bits
    and_mask = b"\x00" * (and_row * h)
    header = struct.pack("<LllHHLLllLL", 40, w, h * 2, 1, bpp, 0, 0, 0, 0, 0, 0)
    return header + body + and_mask


def encode_ico(images: "list[bytes]") -> bytes:
    """Pack pre-encoded payloads (PNG streams or DIBs from
    ``_dib_bytes``) into one ICO container. Width/height directory
    fields are parsed back out of each payload."""
    n = len(images)
    dirs, off = b"", 6 + 16 * n
    for data in images:
        if data[:8] == _PNG_MAGIC:
            w, h = struct.unpack(">LL", data[16:24])
        else:
            w = struct.unpack("<l", data[4:8])[0]
            h = struct.unpack("<l", data[8:12])[0] // 2
        dirs += struct.pack(
            "<BBBBHHLL", w % 256, h % 256, 0, 0, 1, 32, len(data), off
        )
        off += len(data)
    return struct.pack("<HHH", 0, 1, n) + dirs + b"".join(images)
