"""Pure-python GIF decoder (GIF87a/89a) — no Pillow.

Implements the public GIF specification (CompuServe GIF89a, 1990) and
the LZW variant it mandates: logical screen descriptor, global/local
color tables, extension-block skipping, image descriptor, variable-width
LZW decompression of the sub-block stream, and Adam-less interlace
reordering (the four-pass GIF scheme). Returns the FIRST image frame as
float32 grayscale (H, W) in [0, 1] (palette-resolved channel mean) —
the same contract as the PNG/JPEG/PPM/BMP decoders feeding the
thumbnail pipeline in :mod:`polars_dataset_spark.functions.multimodal`.
Unsupported or malformed blobs return ``None``, never raise.

A minimal encoder produces real fixtures in-container using the
classic fixed-code-size LZW stream (each pixel emitted as a literal
code, with a Clear code ahead of every dictionary overflow — a valid,
spec-conforming stream that needs no compression machinery), so
round-trips genuinely exercise the decoder's variable-width code reader.
"""

from __future__ import annotations

import numpy as np

from polars_dataset_spark.functions.png import _MAX_PIXELS

__all__ = ["decode_gif_gray", "encode_gif_gray"]


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> "list[int] | None":
    """Variable-width LZW per the GIF spec: codes start at
    ``min_code_size + 1`` bits, grow after the dictionary fills, reset on
    Clear. Returns the index stream (≥ ``n_expected`` entries hoped for,
    truncated streams return what they have) or None on corruption."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader, LSB-first as GIF mandates
    bitpos = 0
    nbits = len(data) * 8

    def read_code(size: int) -> int:
        nonlocal bitpos
        if bitpos + size > nbits:
            return -1
        v = 0
        for i in range(size):
            byte = data[(bitpos + i) >> 3]
            if (byte >> ((bitpos + i) & 7)) & 1:
                v |= 1 << i
        bitpos += size
        return v

    def fresh_table():
        return {i: (i,) for i in range(clear)}

    table = fresh_table()
    code_size = min_code_size + 1
    prev: "tuple[int, ...] | None" = None
    while len(out) < n_expected:
        code = read_code(code_size)
        if code < 0 or code == end:
            break
        if code == clear:
            table = fresh_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            table[len(table) + 2] = prev + (entry[0],)
        elif code == len(table) + 2:
            entry = prev + (prev[0],)  # the KwKwK case
            table[code] = entry
        else:
            return None
        out.extend(entry)
        prev = entry
        if len(table) + 2 >= (1 << code_size) and code_size < 12:
            code_size += 1
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_gray(data: bytes) -> "np.ndarray | None":
    """Decode the first frame of a GIF blob → float32 grayscale (H, W)
    in [0, 1]; ``None`` for non-GIF/malformed input."""
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        flags = data[10]
        pos = 13
        gct = None
        if flags & 0x80:  # global color table
            n = 2 << (flags & 0x07)
            gct = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(
                n, 3
            )
            pos += 3 * n
        while pos < len(data):
            block = data[pos]
            if block == 0x21:  # extension: label + sub-blocks, skip
                pos += 2
                while pos < len(data) and data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                w = int.from_bytes(data[pos + 5 : pos + 7], "little")
                h = int.from_bytes(data[pos + 7 : pos + 9], "little")
                iflags = data[pos + 9]
                pos += 10
                table = gct
                if iflags & 0x80:  # local color table wins
                    n = 2 << (iflags & 0x07)
                    table = np.frombuffer(
                        data, np.uint8, count=3 * n, offset=pos
                    ).reshape(n, 3)
                    pos += 3 * n
                if table is None or w <= 0 or h <= 0:
                    return None
                # Untrusted-blob guard: a malformed header declaring e.g.
                # 65535x65535 would make the interpreted-Python LZW loop
                # attempt ~4.3G indices and stall the executor task. Reject
                # past the shared pixel cap BEFORE decoding (never raise).
                if w * h > _MAX_PIXELS:
                    return None
                min_code = data[pos]
                pos += 1
                lzw = bytearray()
                while pos < len(data) and data[pos] != 0:
                    ln = data[pos]
                    lzw += data[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = _lzw_decode(min_code, bytes(lzw), w * h)
                if idx is None or len(idx) < w * h:
                    return None
                arr = np.asarray(idx[: w * h], dtype=np.int64)
                if int(arr.max(initial=0)) >= table.shape[0]:
                    return None
                px = arr.reshape(h, w)
                if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                    order = np.concatenate(
                        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
                    )
                    deinterlaced = np.empty_like(px)
                    deinterlaced[order] = px
                    px = deinterlaced
                return table.astype(np.float32)[px].mean(axis=2) / 255.0
            elif block == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except Exception:  # noqa: BLE001 — corpus blobs may be arbitrary bytes
        return None


def encode_gif_gray(img: np.ndarray, interlaced: bool = False) -> bytes:
    """Encode float [0,1] (H, W) as an 8-bit grayscale GIF87a: a 256-gray
    global palette and the fixed-code-size literal LZW stream (Clear
    ahead of every table overflow — valid per spec, no compressor
    needed)."""
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    u8 = np.round(arr * 255.0).astype(np.uint8)
    h, w = u8.shape
    pal = bytes(v for g in range(256) for v in (g, g, g))
    head = (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # GCT present, 256 entries
        + pal
    )
    iflags = 0x40 if interlaced else 0x00
    desc = b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([iflags])
    rows = u8
    if interlaced:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        rows = u8[order]
    pixels = rows.ravel()
    # literal LZW: 8-bit min code size -> 9-bit codes; emit Clear every
    # 254 literals so the table never grows past the 9-bit window
    min_code = 8
    clear, end = 256, 257
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += 9
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for i, p in enumerate(pixels):
        if i and i % 254 == 0:
            emit(clear)
        emit(int(p))
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)
    sub = bytearray([min_code])
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    return head + desc + bytes(sub) + b"\x3b"
