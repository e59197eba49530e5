"""Pure-python QOI decoder — no image library.

Implements the complete public QOI specification ("Quite OK Image
format", qoiformat.org, 2022 — a one-page spec, implemented in full):
14-byte header (``qoif`` magic, big-endian width/height, channels 3/4,
colorspace byte), the six chunk ops — ``QOI_OP_RGB`` (0xFE),
``QOI_OP_RGBA`` (0xFF), ``QOI_OP_INDEX`` (2-bit tag 00, 64-entry
running hash table ``(3r+5g+7b+11a) mod 64``), ``QOI_OP_DIFF``
(tag 01, 2-bit channel deltas biased −2), ``QOI_OP_LUMA`` (tag 10,
6-bit green delta biased −32 with red/blue expressed relative to it),
``QOI_OP_RUN`` (tag 11, run length biased −1, max 62) — wraparound
byte arithmetic throughout, and the 8-byte end marker.

Returns float32 grayscale ``(H, W)`` in [0, 1] (RGB channel mean,
alpha ignored) — the shared image-decoder contract of
``decode_media`` — or None on malformed input, never raising.

The encoder is a full spec encoder (greedy: run → index → diff → luma →
rgb/rgba), so round-trips exercise every op including hash-table
collisions and 62-pixel run splits.
"""

from __future__ import annotations

import struct

import numpy as np

from polars_dataset_spark.functions.png import _MAX_PIXELS

__all__ = ["decode_qoi_gray", "encode_qoi"]

_END = b"\x00" * 7 + b"\x01"


def decode_qoi_gray(blob: bytes) -> "np.ndarray | None":
    try:
        if len(blob) < 22 or blob[:4] != b"qoif":
            return None
        w, h = struct.unpack(">LL", blob[4:12])
        channels, colorspace = blob[12], blob[13]
        if channels not in (3, 4) or colorspace > 1 or w == 0 or h == 0:
            return None
        n_px = w * h
        if n_px > _MAX_PIXELS:
            return None
        out = np.empty((n_px, 3), dtype=np.uint8)
        index = np.zeros((64, 4), dtype=np.uint8)
        r, g, b, a = 0, 0, 0, 255
        pos, filled, n = 14, 0, len(blob)
        while filled < n_px:
            if pos >= n:
                return None
            byte = blob[pos]
            pos += 1
            if byte == 0xFE:  # QOI_OP_RGB
                if pos + 3 > n:
                    return None
                r, g, b = blob[pos], blob[pos + 1], blob[pos + 2]
                pos += 3
            elif byte == 0xFF:  # QOI_OP_RGBA
                if pos + 4 > n:
                    return None
                r, g, b, a = blob[pos], blob[pos + 1], blob[pos + 2], blob[pos + 3]
                pos += 4
            else:
                tag = byte >> 6
                if tag == 0b00:  # QOI_OP_INDEX
                    r, g, b, a = (int(v) for v in index[byte & 0x3F])
                elif tag == 0b01:  # QOI_OP_DIFF, deltas biased -2
                    r = (r + ((byte >> 4) & 0x03) - 2) & 0xFF
                    g = (g + ((byte >> 2) & 0x03) - 2) & 0xFF
                    b = (b + (byte & 0x03) - 2) & 0xFF
                elif tag == 0b10:  # QOI_OP_LUMA
                    if pos >= n:
                        return None
                    dg = (byte & 0x3F) - 32
                    rb = blob[pos]
                    pos += 1
                    r = (r + dg + ((rb >> 4) & 0x0F) - 8) & 0xFF
                    g = (g + dg) & 0xFF
                    b = (b + dg + (rb & 0x0F) - 8) & 0xFF
                else:  # QOI_OP_RUN, biased -1 (0xFE/0xFF handled above)
                    run = (byte & 0x3F) + 1
                    if filled + run > n_px:
                        return None
                    out[filled : filled + run] = (r, g, b)
                    filled += run
                    continue
            index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
            out[filled] = (r, g, b)
            filled += 1
        if blob[pos : pos + 8] != _END:
            return None
        gray = out.astype(np.float32).mean(axis=1) / 255.0
        return np.ascontiguousarray(gray.reshape(h, w).astype(np.float32))
    except Exception:
        return None


def encode_qoi(img: np.ndarray, channels: int = 3) -> bytes:
    """Full spec encoder for fixtures: (H, W, 3) or (H, W, 4) float
    [0, 1] (or (H, W) gray, broadcast to RGB). Greedy op choice per the
    reference encoder: run, then index, then diff, then luma, then
    rgb/rgba."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    px = np.round(img * 255.0).astype(np.uint8)
    if px.shape[2] == 3 and channels == 4:
        px = np.concatenate([px, np.full((h, w, 1), 255, np.uint8)], axis=2)
    flat = px.reshape(-1, px.shape[2])
    out = bytearray(b"qoif" + struct.pack(">LL", w, h) + bytes([channels, 0]))
    index = np.zeros((64, 4), dtype=np.uint8)
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(flat.shape[0]):
        r, g, b = int(flat[i, 0]), int(flat[i, 1]), int(flat[i, 2])
        a = int(flat[i, 3]) if flat.shape[1] == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0b11000000 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0b11000000 | (run - 1))
            run = 0
        ih = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if tuple(int(v) for v in index[ih]) == (r, g, b, a):
            out.append(ih)
        else:
            index[ih] = (r, g, b, a)
            if a == pa:
                dr, dg, db = (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF
                dr = dr - 256 if dr > 127 else dr
                dg = dg - 256 if dg > 127 else dg
                db = db - 256 if db > 127 else db
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0b01000000 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                    out.append(0b10000000 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(0xFE)
                    out += bytes((r, g, b))
            else:
                out.append(0xFF)
                out += bytes((r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
        continue
    if run:
        out.append(0b11000000 | (run - 1))
    return bytes(out) + _END
