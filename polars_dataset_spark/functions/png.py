"""Pure-python/numpy PNG codec over stdlib ``zlib`` — no Pillow.

PNG's only compression is DEFLATE, which ships in the Python standard
library, so a complete spec-faithful decode needs no codec stack at all
(unlike JPEG, whose entropy coding we implement by hand in
:mod:`polars_dataset_spark.functions.jpeg`). Implemented from the public
PNG specification (RFC 2083 / W3C PNG): signature + chunk walk
(IHDR/PLTE/tRNS ignored/IDAT/IEND), concatenated-IDAT inflate, and the
five per-row filters (None/Sub/Up/Average/Paeth) reconstructed exactly.

Supported — the FULL set of legal IHDR combinations: bit depths 1/2/4
(gray, palette), 8 and 16 (gray, RGB, palette≤8, gray+alpha, RGBA),
both non-interlaced and Adam7-interlaced. The decoder returns float32
(H, W) grayscale in [0, 1] — the channel mean, alpha ignored — which is
what the thumbnail pipeline in
:mod:`polars_dataset_spark.functions.multimodal` consumes.
Truncated, malformed or non-PNG blobs return ``None``, never raise.

Minimal ENCODERS (8-bit gray with selectable per-row filter so every
unfilter path is exercised by round-trips, RGB, 16-bit gray, packed
1/2/4-bit gray, and an Adam7-interlaced gray variant) produce real
fixtures in-container; encoders and decoder share no filter/unfilter
code, so round-trips genuinely test both directions.

Reference parity: the reference delegates image decode to Pillow
(polars_dataset.py has no media path at all — this module belongs to the
training-data-pipeline surface, not the reference surface).
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = [
    "decode_png_gray",
    "encode_png_gray",
    "encode_png_rgb",
    "encode_png_gray16",
    "encode_png_gray_packed",
    "encode_png_gray_interlaced",
]

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (at depth 8: also bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Sanity cap on w*h for untrusted corpus blobs (64 Mpx ≈ a 8192x8192 frame);
# shared with the GIF decoder's guard. Declared dimensions above this are
# treated as malformed (return None) before any allocation/decode work.
_MAX_PIXELS = 64 * 1024 * 1024


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorised over a pixel's channel vector."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# Adam7 pass geometry: (row start, col start, row step, col step)
_ADAM7 = (
    (0, 0, 8, 8),
    (0, 4, 8, 8),
    (4, 0, 8, 4),
    (0, 2, 4, 4),
    (2, 0, 4, 2),
    (0, 1, 2, 2),
    (1, 0, 2, 1),
)


def _stride_bytes(w: int, ch: int, depth: int) -> int:
    """Bytes per scanline (packed depths round up to whole bytes)."""
    return (w * ch * depth + 7) // 8


def _filter_bpp(ch: int, depth: int) -> int:
    """The byte distance the PNG filters look back by: whole-byte pixels
    use their byte size; sub-byte packed pixels use 1 (per spec)."""
    return max(1, (ch * depth) // 8)


def _unpack_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """uint8 scanline bytes (h, stride) -> integer samples (h, w, ch)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch).astype(np.uint16)
    if depth == 16:
        hi = rows[:, 0 : 2 * w * ch : 2].astype(np.uint16)
        lo = rows[:, 1 : 2 * w * ch : 2].astype(np.uint16)
        return ((hi << 8) | lo).reshape(h, w, ch)
    bits = np.unpackbits(rows, axis=1)[:, : w * ch * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = bits.reshape(h, w * ch, depth).astype(np.uint16) @ weights
    return vals.reshape(h, w, ch)


def _unfilter(
    raw: bytes, h: int, stride: int, bpp: int, offset: int = 0
) -> "np.ndarray | None":
    """Reconstruct filtered scanlines -> uint8 array (h, stride),
    reading ``h * (stride + 1)`` bytes starting at ``offset``."""
    w = stride // bpp  # filter groups per row; stride % bpp == 0 always
    rows = np.frombuffer(
        raw, np.uint8, count=h * (stride + 1), offset=offset
    ).reshape(h, stride + 1)
    filters = rows[:, 0]
    if filters.max(initial=0) > 4:
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: prefix sum (mod 256) per channel lane
            rec = np.cumsum(
                cur.reshape(w, bpp).astype(np.uint32), axis=0, dtype=np.uint32
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: fully vectorised
            rec = cur + prev  # uint8 wraps mod 256, as the spec requires
        elif f == 3:  # Average: sequential in x, vectorised over channels
            rec = np.zeros(stride, dtype=np.uint8)
            cur2, pr2 = cur.reshape(w, bpp), prev.reshape(w, bpp)
            rc = rec.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            for x in range(w):
                left = cur2[x] + (
                    (left.astype(np.uint16) + pr2[x].astype(np.uint16)) // 2
                ).astype(np.uint8)
                rc[x] = left
        else:  # Paeth: sequential in x, vectorised over channels
            rec = np.zeros(stride, dtype=np.uint8)
            cur2, pr2 = cur.reshape(w, bpp), prev.reshape(w, bpp)
            rc = rec.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(w):
                left = cur2[x] + _paeth(left, pr2[x], upleft)
                rc[x] = left
                upleft = pr2[x]
        out[y] = rec
        prev = rec
    return out


def decode_png_gray(data: bytes) -> "np.ndarray | None":
    """Decode a PNG blob to float32 grayscale (H, W) in [0, 1].

    Channel mean for color images, palette resolved through PLTE, alpha
    ignored. Returns ``None`` for anything unsupported or malformed —
    the mapInPandas decode path must never throw on a bad corpus blob.
    """
    try:
        if not data.startswith(_SIG):
            return None
        pos, ihdr, plte, idat = 8, None, None, []
        while pos + 8 <= len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            typ = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                return None
            if typ == b"IHDR":
                ihdr = body
            elif typ == b"PLTE":
                plte = body
            elif typ == b"IDAT":
                idat.append(body)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # length + type + body + CRC
        if ihdr is None or len(ihdr) < 13 or not idat:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, ctype, comp, filt, interlace = ihdr[8:13]
        ch = _CHANNELS.get(ctype)
        legal_depths = {
            0: (1, 2, 4, 8, 16),
            2: (8, 16),
            3: (1, 2, 4, 8),
            4: (8, 16),
            6: (8, 16),
        }
        if (
            ch is None
            or comp != 0
            or filt != 0
            or interlace not in (0, 1)
            or w <= 0
            or h <= 0
            or depth not in legal_depths[ctype]
        ):
            return None
        if w * h > _MAX_PIXELS:
            return None
        passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
        geo = []  # (ys, xs, dy, dx, pw, ph, stride) for non-empty passes
        for ys, xs, dy, dx in passes:
            pw = (w - xs + dx - 1) // dx
            ph = (h - ys + dy - 1) // dy
            if pw > 0 and ph > 0:
                geo.append((ys, xs, dy, dx, pw, ph, _stride_bytes(pw, ch, depth)))
        # Decompression-bomb guard: w/h are already parsed, so the exact
        # expected inflated size is known — cap the inflater at it instead of
        # letting a tiny crafted IDAT expand ~1000x into executor memory.
        expected = sum(ph * (st + 1) for _, _, _, _, _, ph, st in geo)
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected)
        if len(raw) < expected:
            return None
        # A valid stream may pause exactly at the cap with input left over;
        # only reject if the leftover genuinely inflates to MORE pixels.
        if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
            return None
        bpp = _filter_bpp(ch, depth)
        samples = np.zeros((h, w, ch), dtype=np.uint16)
        off = 0
        for ys, xs, dy, dx, pw, ph, st in geo:
            rows = _unfilter(raw, ph, st, bpp, off)
            if rows is None:
                return None
            off += ph * (st + 1)
            samples[ys::dy, xs::dx] = _unpack_samples(rows, pw, ch, depth)
        if ctype == 3:
            if plte is None or len(plte) < 3:
                return None
            pal = np.frombuffer(plte, np.uint8)
            pal = pal[: (pal.size // 3) * 3].reshape(-1, 3).astype(np.float32)
            idx = samples[:, :, 0].astype(np.int64)
            if int(idx.max(initial=0)) >= pal.shape[0]:
                return None
            return pal[idx].mean(axis=2) / 255.0
        color = samples[:, :, :3] if ctype in (2, 6) else samples[:, :, :1]
        maxv = float((1 << depth) - 1)
        return color.astype(np.float32).mean(axis=2) / maxv
    except Exception:  # noqa: BLE001 — corpus blobs may be arbitrary bytes
        return None


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _filter_rows(u8: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one PNG filter to every row (encoder side — written from the
    spec's FORWARD definitions, deliberately sharing nothing with
    ``_unfilter``)."""
    h = u8.shape[0]
    rows = u8.reshape(h, -1)
    w = rows.shape[1] // bpp
    out = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.uint8)
    for y in range(h):
        cur = rows[y]
        c2 = cur.reshape(w, bpp).astype(np.int32)
        p2 = prev.reshape(w, bpp).astype(np.int32)
        left = np.zeros((w, bpp), dtype=np.int32)
        left[1:] = c2[:-1]
        upleft = np.zeros((w, bpp), dtype=np.int32)
        upleft[1:] = p2[:-1]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = ((c2 - left) % 256).astype(np.uint8).reshape(-1)
        elif filter_type == 2:
            filt = ((c2 - p2) % 256).astype(np.uint8).reshape(-1)
        elif filter_type == 3:
            filt = ((c2 - (left + p2) // 2) % 256).astype(np.uint8).reshape(-1)
        elif filter_type == 4:
            p = left + p2 - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - p2),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p2, upleft)
            )
            filt = ((c2 - pred) % 256).astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"filter_type {filter_type} not in 0..4")
        out += b"%c" % filter_type + bytes(filt)
        prev = cur
    return bytes(out)


def encode_png_gray(
    img: np.ndarray, filter_type: int = 0
) -> bytes:
    """Encode float [0,1] (H, W) as an 8-bit grayscale PNG.

    ``filter_type`` selects the per-row filter (0..4) so round-trip
    tests can exercise every unfilter branch of the decoder.
    """
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    u8 = np.round(arr * 255.0).astype(np.uint8)
    h, w = u8.shape
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    raw = _filter_rows(u8, 1, filter_type)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_png_rgb(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode float [0,1] (H, W, 3) as an 8-bit truecolor PNG."""
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    u8 = np.round(arr * 255.0).astype(np.uint8)
    h, w, ch = u8.shape
    if ch != 3:
        raise ValueError("encode_png_rgb expects (H, W, 3)")
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    raw = _filter_rows(u8.reshape(h, w * 3), 3, filter_type)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray16(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode float [0,1] (H, W) as a 16-bit grayscale PNG (big-endian
    sample bytes; the filters operate bytewise with bpp=2 per spec)."""
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    u16 = np.round(arr * 65535.0).astype(np.uint16)
    h, w = u16.shape
    be = np.zeros((h, w * 2), dtype=np.uint8)
    be[:, 0::2] = (u16 >> 8).astype(np.uint8)
    be[:, 1::2] = (u16 & 0xFF).astype(np.uint8)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
    raw = _filter_rows(be, 2, filter_type)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray_packed(img: np.ndarray, depth: int, filter_type: int = 0) -> bytes:
    """Encode float [0,1] (H, W) as a packed 1/2/4-bit grayscale PNG —
    samples quantized to 2^depth levels, MSB-first within each byte,
    rows padded to whole bytes (spec 7.2)."""
    if depth not in (1, 2, 4):
        raise ValueError("packed depth must be 1, 2 or 4")
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    maxv = (1 << depth) - 1
    q = np.round(arr * maxv).astype(np.uint8)
    h, w = q.shape
    # expand each sample to its bits, MSB first, pad the row to bytes
    weights = np.arange(depth - 1, -1, -1)
    bits = ((q[:, :, None] >> weights) & 1).reshape(h, w * depth).astype(np.uint8)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    packed = np.packbits(bits, axis=1)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([depth, 0, 0, 0, 0])
    raw = _filter_rows(packed, 1, filter_type)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray_interlaced(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode float [0,1] (H, W) as an 8-bit grayscale Adam7-interlaced
    PNG: each of the seven passes is extracted by the spec's grid,
    filtered independently (reduced images are filtered as if standalone),
    and the filtered passes are concatenated into one zlib stream."""
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    u8 = np.round(arr * 255.0).astype(np.uint8)
    h, w = u8.shape
    raw = bytearray()
    for ys, xs, dy, dx in _ADAM7:
        sub = u8[ys::dy, xs::dx]
        if sub.size:
            raw += _filter_rows(sub, 1, filter_type)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 1])
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
