"""Pure-numpy baseline JPEG (JFIF) codec — no Pillow/libjpeg.

Implements the public ITU-T T.81 baseline process from the spec alone:
segment parsing (DQT/DHT/SOF0/SOS/DRI), canonical Huffman decoding with
byte-stuffing and restart markers, dequantisation, 8×8 inverse DCT via
the separable orthonormal DCT matrix, and MCU assembly. The decoder
returns the LUMA plane as float32 (H, W) in [0, 1] — chroma blocks are
entropy-decoded (the bitstream demands it) but not reconstructed, which
is exactly what the grayscale-thumbnail pipeline in
:mod:`polars_dataset_spark.functions.multimodal` needs.

A minimal grayscale ENCODER (single component, flat quant table,
fixed-length canonical Huffman tables written to DHT) lets the test
suite produce real JPEG fixtures in-container; decoder and encoder
share only the constant tables below, so a round-trip genuinely
exercises both directions of the format.

Unsupported (return ``None``): progressive (SOF2), arithmetic coding,
12-bit precision, hierarchical — the baseline process covers the
overwhelming majority of real-corpus JPEGs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg_gray", "encode_jpeg_gray"]

# zig-zag scan order: index z -> (row, col) of the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: forward B = C A C^T, inverse A = C^T B C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C[0, :] *= np.sqrt(1.0 / 8.0)
_C[1:, :] *= np.sqrt(2.0 / 8.0)


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self._bits.size:
            raise EOFError
        b = int(self._bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self._bits.size:
            raise EOFError
        chunk = self._bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: BITS (count per code length 1..16) +
    HUFFVAL -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segments(data: bytes, start: int) -> list[bytes]:
    """De-stuffed entropy-coded segments from ``start``, split at restart
    markers; stops at any other marker (EOI, next SOS, ...)."""
    segs: list[bytearray] = [bytearray()]
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:  # real marker: end of scan
            break
    return [bytes(s) for s in segs]


def decode_jpeg_gray(data: bytes) -> "np.ndarray | None":
    """Decode a baseline JPEG blob to its luma plane, float32 (H, W) in
    [0, 1]; ``None`` if the blob is not a decodable baseline JPEG."""
    try:
        return _decode_jpeg_gray(data)
    except (EOFError, ValueError, IndexError, KeyError):
        return None


def _decode_jpeg_gray(data: bytes) -> "np.ndarray | None":
    if len(data) < 4 or data[0:2] != b"\xff\xd8":  # SOI
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h_img = w_img = 0
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tab = np.frombuffer(seg[j : j + 64], np.uint8).astype(np.int32)
                    j += 64
                else:
                    tab = np.frombuffer(seg[j : j + 128], ">u2").astype(np.int32)
                    j += 128
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = seg[j + 17 : j + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
            if seg[0] != 8:  # 12-bit precision unsupported
                return None
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                {
                    "id": seg[6 + 3 * k],
                    "h": seg[7 + 3 * k] >> 4,
                    "v": seg[7 + 3 * k] & 0x0F,
                    "tq": seg[8 + 3 * k],
                }
                for k in range(nc)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            for k in range(ns):
                cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                scan[cs] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                data,
                i + 2 + seglen,
                comps,
                scan,
                qt,
                huff_dc,
                huff_ac,
                h_img,
                w_img,
                restart_interval,
            )
        i += 2 + seglen
    return None


def _decode_scan(
    data: bytes,
    start: int,
    comps: list[dict],
    scan: dict,
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    h_img: int,
    w_img: int,
    restart_interval: int,
) -> "np.ndarray | None":
    if not comps or h_img <= 0 or w_img <= 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    luma = comps[0]
    # the grayscale pipeline needs the luma plane at full resolution;
    # every real-world baseline JPEG has Y at the max sampling factors
    if luma["h"] != hmax or luma["v"] != vmax:
        return None
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    plane = np.zeros((mcuy * vmax * 8, mcux * hmax * 8), dtype=np.float32)
    qy = qt[luma["tq"]].astype(np.float64)
    dq = np.zeros(64)
    segments = _entropy_segments(data, start)
    seg_idx = 0
    r = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    per_mcu = restart_interval or (mcux * mcuy)
    done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if done and done % per_mcu == 0 and seg_idx + 1 < len(segments):
                seg_idx += 1
                r = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dct, act = scan[c["id"]]
                tdc, tac = huff_dc[dct], huff_ac[act]
                is_luma = c is comps[0]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        # DC
                        s = _decode_symbol(r, tdc)
                        diff = _extend(r.read_bits(s), s)
                        pred[c["id"]] += diff
                        if is_luma:
                            dq[:] = 0.0
                            dq[0] = pred[c["id"]] * qy[0]
                        # AC
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, tac)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            val = _extend(r.read_bits(size), size)
                            if is_luma:
                                dq[k] = val * qy[k]
                            k += 1
                        if is_luma:
                            blk = np.zeros(64)
                            blk[_ZIGZAG] = dq
                            px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = px
            done += 1
    out = np.clip(plane[:h_img, :w_img], 0.0, 255.0) / 255.0
    return out.astype(np.float32)


# --------------------------------------------------------------------------
# minimal grayscale encoder (test-fixture generator and thumbnail sink)
# --------------------------------------------------------------------------

# fixed-length canonical tables: 12 DC symbols at 4 bits, the full 162
# AC (run, size) alphabet at 8 bits — valid JPEG tables (Kraft sum < 1),
# written to DHT so ANY conformant decoder (including ours) reads them
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes(_AC_SYMBOLS)


def _enc_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    dec = _build_huffman(bits, vals)
    return {sym: (length, code) for (length, code), sym in dec.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-padding


def _size_of(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """Encode a float [0, 1] (or uint8) grayscale array as a baseline
    JFIF JPEG (single component, flat quantisation — near-lossless up to
    DCT rounding)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    h, w = a.shape
    dc_enc = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT: flat, table 0
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))  # SOF0: 1 component, no subsampling
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS

    # pad to 8x8 multiple by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    writer = _BitWriter()
    pred = 0
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            blk = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coef = _C @ blk @ _C.T
            # zz[z] = raster coefficient at zigzag position z
            zz = np.round(coef.reshape(64)[_ZIGZAG]).astype(np.int64)
            # DC
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _size_of(diff)
            ln, code = dc_enc[s]
            writer.write(code, ln)
            if s:
                writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            # AC
            run = 0
            last_nz = max(np.nonzero(zz[1:])[0], default=-1)
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_enc[0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                s = _size_of(v)
                ln, code = ac_enc[(run << 4) | s]
                writer.write(code, ln)
                writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 62:
                ln, code = ac_enc[0x00]  # EOB
                writer.write(code, ln)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
