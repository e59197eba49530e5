"""Pure-python Truevision TGA decoder — no Pillow.

Implements the public TGA (TARGA) file format specification (Truevision
Inc., 1984/1989): the 18-byte header, image id skipping, color-mapped /
truecolor / grayscale images (types 1/2/3), their RLE variants
(types 9/10/11), 8-bit palette indices with 24/32-bit color maps,
16-bpp ARGB1555, 24-bpp BGR and 32-bpp BGRA pixels, and both vertical
orders (descriptor bit 5; bottom-up is the format's default) plus the
rare right-to-left bit 4. Returns float32 grayscale ``(H, W)`` in
[0, 1] (color → channel mean of R,G,B; alpha ignored) — the same
contract as the PNG/JPEG/GIF/TIFF decoders feeding the thumbnail
pipeline in :mod:`polars_dataset_spark.functions.multimodal`.
Unsupported or malformed blobs return ``None``, never raise.

RLE packets per the spec: header bit 7 set = run packet (count =
low 7 bits + 1, one pixel value repeated), clear = raw packet (count
pixels verbatim); packets never wrap between images but MAY wrap
across row boundaries (unlike BMP RLE) — the decoder fills a flat
pixel stream and reshapes.

Encoders for all supported paths produce real fixtures in-container,
so round-trips genuinely exercise the packet reader, palette indirection
and scanline ordering.
"""

from __future__ import annotations

import struct

import numpy as np

from polars_dataset_spark.functions.png import _MAX_PIXELS

__all__ = ["decode_tga_gray", "encode_tga", "encode_tga_rle", "encode_tga_palette"]


def _read_pixels_rle(data: bytes, pos: int, n_px: int, bpp: int) -> "np.ndarray | None":
    """Decode RLE packets into a flat (n_px, bpp) byte array."""
    out = np.empty((n_px, bpp), dtype=np.uint8)
    filled = 0
    n = len(data)
    while filled < n_px:
        if pos >= n:
            return None
        header = data[pos]
        pos += 1
        count = (header & 0x7F) + 1
        if count > n_px - filled:
            return None  # packet overruns the image: corrupt
        if header & 0x80:  # run packet: one pixel, repeated
            if pos + bpp > n:
                return None
            px = np.frombuffer(data[pos : pos + bpp], dtype=np.uint8)
            pos += bpp
            out[filled : filled + count] = px
        else:  # raw packet: count literal pixels
            need = count * bpp
            if pos + need > n:
                return None
            out[filled : filled + count] = np.frombuffer(
                data[pos : pos + need], dtype=np.uint8
            ).reshape(count, bpp)
            pos += need
        filled += count
    return out


def _to_gray(px: np.ndarray, depth: int, cmap: "np.ndarray | None") -> "np.ndarray | None":
    """(n, bytes-per-pixel) uint8 → (n,) float32 gray in [0,1]."""
    if cmap is not None:  # palette indices (8-bit)
        idx = px[:, 0].astype(np.int64)
        if idx.max(initial=0) >= cmap.shape[0]:
            return None
        rgb = cmap[idx]  # (n, 3) float32 already in [0,1]
        return rgb.mean(axis=1, dtype=np.float32).astype(np.float32)
    if depth == 8:  # grayscale
        return (px[:, 0].astype(np.float32) / 255.0)
    if depth == 16:  # ARGB1555, little-endian
        v = px[:, 0].astype(np.uint16) | (px[:, 1].astype(np.uint16) << 8)
        r = ((v >> 10) & 0x1F).astype(np.float32) / 31.0
        g = ((v >> 5) & 0x1F).astype(np.float32) / 31.0
        b = (v & 0x1F).astype(np.float32) / 31.0
        return ((r + g + b) / 3.0).astype(np.float32)
    # 24/32-bpp: byte order is B, G, R[, A]; alpha ignored
    bgr = px[:, :3].astype(np.float32) / 255.0
    return bgr.mean(axis=1, dtype=np.float32).astype(np.float32)


def decode_tga_gray(blob: bytes) -> "np.ndarray | None":
    try:
        if len(blob) < 18:
            return None
        (
            id_len, cmap_type, img_type,
            cmap_first, cmap_len, cmap_bits,
            _x0, _y0, width, height, depth, desc,
        ) = struct.unpack("<BBBHHBHHHHBB", blob[:18])
        rle = img_type in (9, 10, 11)
        base = img_type - 8 if rle else img_type
        if base not in (1, 2, 3) or width == 0 or height == 0:
            return None
        if width * height > _MAX_PIXELS:
            return None  # decompression-bomb guard, same policy as PNG
        pos = 18 + id_len
        cmap = None
        if base == 1:
            if cmap_type != 1 or depth != 8 or cmap_bits not in (24, 32):
                return None
            entry_bytes = cmap_bits // 8
            need = cmap_len * entry_bytes
            if pos + need > len(blob):
                return None
            raw = np.frombuffer(blob[pos : pos + need], dtype=np.uint8).reshape(
                cmap_len, entry_bytes
            )
            # entries are BGR[A]; build an R,G,B table indexed from cmap_first
            table = np.zeros((cmap_first + cmap_len, 3), dtype=np.float32)
            table[cmap_first:, 0] = raw[:, 2] / 255.0
            table[cmap_first:, 1] = raw[:, 1] / 255.0
            table[cmap_first:, 2] = raw[:, 0] / 255.0
            cmap = table
            pos += need
            bpp = 1
        elif base == 2:
            if depth not in (16, 24, 32):
                return None
            bpp = depth // 8
        else:  # grayscale
            if depth != 8:
                return None
            bpp = 1
        n_px = width * height
        if rle:
            px = _read_pixels_rle(blob, pos, n_px, bpp)
        else:
            need = n_px * bpp
            if pos + need > len(blob):
                return None
            px = np.frombuffer(blob[pos : pos + need], dtype=np.uint8).reshape(n_px, bpp)
        if px is None:
            return None
        gray = _to_gray(px, depth, cmap)
        if gray is None:
            return None
        img = gray.reshape(height, width)
        if not (desc & 0x20):  # bit 5 clear: bottom-up (the TGA default)
            img = img[::-1]
        if desc & 0x10:  # bit 4: right-to-left
            img = img[:, ::-1]
        return np.ascontiguousarray(img, dtype=np.float32)
    except Exception:
        return None


def _header(img_type: int, w: int, h: int, depth: int, top_down: bool,
            cmap_len: int = 0, cmap_bits: int = 0) -> bytes:
    desc = 0x20 if top_down else 0x00
    return struct.pack(
        "<BBBHHBHHHHBB",
        0, 1 if cmap_len else 0, img_type,
        0, cmap_len, cmap_bits,
        0, 0, w, h, depth, desc,
    )


def _pack_pixels(img: np.ndarray, depth: int) -> np.ndarray:
    """(H, W) gray or (H, W, 3) RGB float [0,1] → (n, bpp) uint8 rows
    in file order (B, G, R[, A])."""
    if img.ndim == 2:
        if depth != 8:
            raise ValueError("gray fixtures are 8-bit")
        return np.round(img * 255.0).astype(np.uint8).reshape(-1, 1)
    rgb = np.round(img * 255.0).astype(np.uint8).reshape(-1, 3)
    if depth == 24:
        return rgb[:, ::-1]  # BGR
    if depth == 32:
        out = np.empty((rgb.shape[0], 4), dtype=np.uint8)
        out[:, 0] = rgb[:, 2]
        out[:, 1] = rgb[:, 1]
        out[:, 2] = rgb[:, 0]
        out[:, 3] = 255
        return out
    if depth == 16:  # ARGB1555
        r = (rgb[:, 0].astype(np.uint16) * 31 + 127) // 255
        g = (rgb[:, 1].astype(np.uint16) * 31 + 127) // 255
        b = (rgb[:, 2].astype(np.uint16) * 31 + 127) // 255
        v = (1 << 15) | (r << 10) | (g << 5) | b
        out = np.empty((rgb.shape[0], 2), dtype=np.uint8)
        out[:, 0] = v & 0xFF
        out[:, 1] = v >> 8
        return out
    raise ValueError(f"unsupported depth {depth}")


def encode_tga(img: np.ndarray, depth: int = 24, top_down: bool = False) -> bytes:
    """Uncompressed fixture encoder: (H, W) gray float [0,1] → type 3,
    (H, W, 3) RGB → type 2 at ``depth`` 16/24/32."""
    h, w = img.shape[:2]
    img_type = 3 if img.ndim == 2 else 2
    rows = _pack_pixels(img, 8 if img.ndim == 2 else depth)
    body = rows.reshape(h, w * rows.shape[1])
    if not top_down:
        body = body[::-1]
    return _header(img_type, w, h, 8 if img.ndim == 2 else depth, top_down) + body.tobytes()


def encode_tga_rle(img: np.ndarray, depth: int = 24, top_down: bool = False,
                   max_packet: int = 128) -> bytes:
    """RLE fixture encoder (types 10/11): greedy maximal runs, raw
    packets for the rest — packets wrap across row boundaries, which is
    legal and exercises the decoder's flat-stream fill."""
    h, w = img.shape[:2]
    img_type = 11 if img.ndim == 2 else 10
    rows = _pack_pixels(img, 8 if img.ndim == 2 else depth)
    body = rows.reshape(h, w * rows.shape[1])
    if not top_down:
        body = body[::-1]
    px = body.reshape(h * w, rows.shape[1])
    out = bytearray()
    i, n = 0, px.shape[0]
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < max_packet and (px[j] == px[i]).all():
            j += 1
        if j - i >= 2:
            out.append(0x80 | (j - i - 1))
            out += px[i].tobytes()
            i = j
        else:
            # raw: until the next run of >= 2 or packet cap
            j = i + 1
            while (
                j < n and j - i < max_packet
                and not (j + 1 < n and (px[j + 1] == px[j]).all())
            ):
                j += 1
            out.append(j - i - 1)
            out += px[i:j].tobytes()
            i = j
    return _header(img_type, w, h, 8 if img.ndim == 2 else depth, top_down) + bytes(out)


def encode_tga_palette(
    indices: np.ndarray, palette: np.ndarray, cmap_bits: int = 24, top_down: bool = False
) -> bytes:
    """Color-mapped fixture encoder (type 1): ``indices`` (H, W) uint8
    into ``palette`` (n, 3) RGB float [0,1], stored as BGR[A] entries."""
    h, w = indices.shape
    n = palette.shape[0]
    entry = cmap_bits // 8
    pal = np.round(palette * 255.0).astype(np.uint8)
    raw = np.empty((n, entry), dtype=np.uint8)
    raw[:, 0] = pal[:, 2]
    raw[:, 1] = pal[:, 1]
    raw[:, 2] = pal[:, 0]
    if entry == 4:
        raw[:, 3] = 255
    body = indices.astype(np.uint8)
    if not top_down:
        body = body[::-1]
    return (
        _header(1, w, h, 8, top_down, cmap_len=n, cmap_bits=cmap_bits)
        + raw.tobytes()
        + body.tobytes()
    )
