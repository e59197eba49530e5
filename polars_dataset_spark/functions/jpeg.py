"""Pure-numpy JPEG (JFIF) codec — no Pillow/libjpeg.

Implements the public ITU-T T.81 processes from the spec alone:

- BASELINE (SOF0/1): segment parsing (DQT/DHT/SOS/DRI), canonical
  Huffman decoding with byte-stuffing and restart markers,
  dequantisation, 8×8 inverse DCT via the separable orthonormal DCT
  matrix, and MCU assembly.
- PROGRESSIVE (SOF2, T.81 Annex G): spectral selection (per-band AC
  scans with EOB runs) and successive approximation (point-transformed
  first scans + bitwise refinement scans for both DC and AC),
  interleaved or single-component DC scans, restart markers.

The decoder returns the LUMA plane as float32 (H, W) in [0, 1] —
chroma is entropy-decoded only where the bitstream demands it (shared
baseline scans, interleaved DC scans) and never reconstructed, which is
exactly what the grayscale-thumbnail pipeline in
:mod:`polars_dataset_spark.functions.multimodal` needs.

Minimal grayscale ENCODERS (single component, flat quant table,
fixed-length canonical Huffman tables written to DHT; a baseline one
and a progressive one taking an (Ss, Se, Ah, Al) scan script) let the
test suite produce real JPEG fixtures in-container; decoder and
encoders share only the constant tables below, so a round-trip
genuinely exercises both directions of the format.

Unsupported (return ``None``): arithmetic coding, 12-bit precision,
lossless and hierarchical processes — vanishingly rare in real corpora.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg_gray", "encode_jpeg_gray", "encode_jpeg_gray_progressive"]

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


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuffed entropy-coded segments from ``start``, split at restart
    markers; stops at any other marker (EOI, next SOS, ...). Returns the
    segments and the offset of the terminating marker (or EOF) so a
    progressive decoder can continue parsing the next scan."""
    segs: list[bytearray] = [bytearray()]
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
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
    return [bytes(s) for s in segs], i


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
    progressive = False
    prog: "dict | None" = None  # progressive coefficient store
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline/ext, SOF2 progressive
            if seg[0] != 8:  # 12-bit precision unsupported
                return None
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            order = []
            for k in range(ns):
                cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                scan[cs] = (tables >> 4, tables & 0x0F)
                order.append(cs)
            if not progressive:
                segments, _ = _entropy_segments(data, i + 2 + seglen)
                return _decode_scan(
                    segments,
                    comps,
                    scan,
                    qt,
                    huff_dc,
                    huff_ac,
                    h_img,
                    w_img,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if prog is None:
                prog = _init_progressive(comps, h_img, w_img)
                if prog is None:
                    return None
            segments, end = _entropy_segments(data, i + 2 + seglen)
            _decode_progressive_scan(
                prog,
                segments,
                comps,
                order,
                scan,
                huff_dc,
                huff_ac,
                ss,
                se,
                ah,
                al,
                restart_interval,
            )
            i = end
            continue
        i += 2 + seglen
    if progressive and prog is not None and prog["any_scan"]:
        return _reconstruct_progressive(prog, comps, qt, h_img, w_img)
    return None


def _decode_scan(
    segments: list[bytes],
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
# progressive (SOF2) decode: spectral selection + successive approximation,
# implemented from ITU-T T.81 Annex G (the public spec; the refinement
# control flow matches the spec's figure G.7, the same public algorithm
# libjpeg's phuff coders realize)
# --------------------------------------------------------------------------


def _init_progressive(comps: list[dict], h_img: int, w_img: int) -> "dict | None":
    if not comps or h_img <= 0 or w_img <= 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    luma = comps[0]
    if luma["h"] != hmax or luma["v"] != vmax:
        return None
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    # luma coefficient store over the PADDED (interleaved-MCU) block grid,
    # zigzag index space; non-interleaved scans touch only the true grid
    return {
        "hmax": hmax,
        "vmax": vmax,
        "mcux": mcux,
        "mcuy": mcuy,
        "h_img": h_img,
        "w_img": w_img,
        "coef": np.zeros((mcuy * vmax, mcux * hmax, 64), dtype=np.int64),
        "any_scan": False,
    }


def _comp_block_grid(prog: dict, c: dict) -> tuple[int, int]:
    """A component's own (non-interleaved) block grid (T.81 A.1.1:
    component dims are the image dims scaled by sampling/max, ceiled)."""
    cw = -(-prog["w_img"] * c["h"] // prog["hmax"])
    chh = -(-prog["h_img"] * c["v"] // prog["vmax"])
    return -(-cw // 8), -(-chh // 8)


def _refine_nonzero(coef: np.ndarray, k: int, bit: int, p1: int, m1: int) -> None:
    """Append one successive-approximation bit to an already-nonzero
    coefficient (T.81 G.1.2.3: only when the bit position is still 0)."""
    if bit and (coef[k] & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else m1


def _ac_first_block(
    r: _BitReader, tac: dict, coef: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of an Ah=0 AC scan (spectral band [ss, se], values
    scaled by 2^al). Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(r, tac)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.read_bits(run)
            break
        k += run
        if k > se:
            raise ValueError("AC coefficient index past band end")
        coef[k] = _extend(r.read_bits(size), size) << al
        k += 1
    return eobrun


def _ac_refine_block(
    r: _BitReader, tac: dict, coef: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of an Ah>0 AC refinement scan (T.81 figure G.7)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(r, tac)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run != 15:  # EOBn: run length of all-done blocks
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # ZRL: skip 16 still-zero coefficients, refining along the way
            else:
                if size != 1:
                    raise ValueError("refinement scan size must be 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(coef, k, r.read_bit(), p1, m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(coef, k, r.read_bit(), p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    prog: dict,
    segments: list[bytes],
    comps: list[dict],
    order: list[int],
    scan: dict,
    huff_dc: dict,
    huff_ac: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """Decode one progressive scan into the luma coefficient store.

    DC scans (ss == 0) may interleave all components (every component's
    diffs/bits must be entropy-decoded to stay in sync; only luma is
    stored). AC scans are single-component by spec; non-luma AC scans
    carry no information the grayscale pipeline needs and each scan is
    an independent entropy segment, so they are skipped outright."""
    coef = prog["coef"]
    luma_id = comps[0]["id"]
    by_comp = {c["id"]: c for c in comps}
    scomps = [by_comp[cid] for cid in order]

    if ss == 0:  # ---- DC scan (se must be 0; may be interleaved) ----
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        interleaved = len(scomps) > 1
        if interleaved:
            units = prog["mcux"] * prog["mcuy"]
            ux = prog["mcux"]
        else:
            bw_c, bh_c = _comp_block_grid(prog, scomps[0])
            units = bw_c * bh_c
            ux = bw_c
        per_rst = restart_interval or units
        seg_idx = 0
        r = _BitReader(segments[0])
        pred = {c["id"]: 0 for c in scomps}
        for u in range(units):
            if u and u % per_rst == 0 and seg_idx + 1 < len(segments):
                seg_idx += 1
                r = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in scomps}
            uy, uxi = divmod(u, ux)
            for c in scomps:
                is_luma = c["id"] == luma_id
                nby = c["v"] if interleaved else 1
                nbx = c["h"] if interleaved else 1
                for by in range(nby):
                    for bx in range(nbx):
                        if interleaved:
                            gy, gx = uy * c["v"] + by, uxi * c["h"] + bx
                        else:
                            gy, gx = uy, uxi
                        if ah == 0:  # first DC scan: DPCM as in baseline
                            s = _decode_symbol(r, huff_dc[scan[c["id"]][0]])
                            pred[c["id"]] += _extend(r.read_bits(s), s)
                            if is_luma:
                                coef[gy, gx, 0] = pred[c["id"]] << al
                        else:  # refinement: one raw bit per block
                            bit = r.read_bit()
                            if is_luma and bit:
                                coef[gy, gx, 0] |= 1 << al
        prog["any_scan"] = True
        return

    # ---- AC scan: single component by spec ----
    if len(scomps) != 1:
        raise ValueError("interleaved AC scan is not legal in progressive JPEG")
    c = scomps[0]
    if c["id"] != luma_id:
        return  # chroma AC scan: independent segment, nothing to keep
    tac = huff_ac[scan[c["id"]][1]]
    bw_c, bh_c = _comp_block_grid(prog, c)
    units = bw_c * bh_c
    per_rst = restart_interval or units
    seg_idx = 0
    r = _BitReader(segments[0])
    eobrun = 0
    block_fn = _ac_first_block if ah == 0 else _ac_refine_block
    for u in range(units):
        if u and u % per_rst == 0 and seg_idx + 1 < len(segments):
            seg_idx += 1
            r = _BitReader(segments[seg_idx])
            eobrun = 0
        gy, gx = divmod(u, bw_c)
        eobrun = block_fn(r, tac, coef[gy, gx], ss, se, al, eobrun)
    prog["any_scan"] = True


def _reconstruct_progressive(
    prog: dict, comps: list[dict], qt: dict, h_img: int, w_img: int
) -> "np.ndarray | None":
    """Dequantise + IDCT the accumulated luma coefficients (vectorised
    over all blocks) and crop to the true image size."""
    luma = comps[0]
    qy = qt[luma["tq"]].astype(np.float64)
    coef = prog["coef"].astype(np.float64) * qy[None, None, :]
    by, bx = coef.shape[0], coef.shape[1]
    blocks = np.zeros((by, bx, 64))
    blocks[:, :, _ZIGZAG] = coef
    b8 = blocks.reshape(by, bx, 8, 8)
    # inverse DCT: A = C^T B C, batched over the block grid
    px = np.einsum("ki,yxkl,lj->yxij", _C, b8, _C) + 128.0
    plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
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
    + [run << 4 for run in range(1, 15)]  # EOBn (progressive EOB runs)
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


# --------------------------------------------------------------------------
# progressive grayscale encoder (fixture generator for the SOF2 decoder;
# shares only the constant tables and _BitWriter with the baseline encoder,
# nothing with the decoder)
# --------------------------------------------------------------------------

_DEFAULT_SCANS = (
    (0, 0, 0, 1),  # DC first, successive approximation Al=1
    (0, 0, 1, 0),  # DC refinement (raw bit per block)
    (1, 5, 0, 1),  # AC band [1,5] first, Al=1
    (6, 63, 0, 1),  # AC band [6,63] first, Al=1
    (1, 5, 1, 0),  # AC band [1,5] refinement
    (6, 63, 1, 0),  # AC band [6,63] refinement
)


class _ProgWriter(_BitWriter):
    """Bit writer plus the progressive EOB-run state (T.81 G.1.2.2-3):
    pending EOB runs fold trailing-zero blocks together; refinement
    correction bits buffered inside a run are emitted right after the
    symbol that closes it."""

    def __init__(self, ac_enc: dict):
        super().__init__()
        self._ac = ac_enc
        self.eobrun = 0
        self.be: list[int] = []  # correction bits buffered across the run

    def sym(self, symbol: int) -> None:
        ln, code = self._ac[symbol]
        self.write(code, ln)

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.be:
            self.write(b, 1)
        self.be = []


def encode_jpeg_gray_progressive(
    img: np.ndarray,
    scans: "tuple | list" = _DEFAULT_SCANS,
    restart_interval: int = 0,
) -> bytes:
    """Encode a float [0,1] (or uint8) grayscale array as a PROGRESSIVE
    (SOF2) JFIF JPEG: single component, flat quantisation, the given
    ``(Ss, Se, Ah, Al)`` scan script (default: successive-approximation
    DC pair + two spectral AC bands, each with a refinement pass — every
    decoder path). ``restart_interval`` > 0 inserts DRI/RSTn markers."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    h, w = a.shape
    dc_enc = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    # all blocks' zigzag coefficients, once
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    bh, bw = ph // 8, pw // 8
    zz = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coefs = _C @ blk @ _C.T
            zz[by, bx] = np.round(coefs.reshape(64)[_ZIGZAG]).astype(np.int64)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))  # SOF2
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    n_blocks = bh * bw
    per_rst = restart_interval or n_blocks
    for ss, se, ahh, all_ in scans:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ahh << 4) | all_]))
        wtr = _ProgWriter(ac_enc)
        pred = 0
        rst = 0
        for u in range(n_blocks):
            if u and u % per_rst == 0:
                wtr.emit_eobrun()
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                wtr = _ProgWriter(ac_enc)
                pred = 0
            by, bx = divmod(u, bw)
            block = zz[by, bx]
            if ss == 0:
                v0 = int(block[0])
                if ahh == 0:  # DC first: DPCM of the point-transformed value
                    val = v0 >> all_  # arithmetic shift, per T.81 G.1.2.1
                    diff = val - pred
                    pred = val
                    s = _size_of(diff)
                    ln, code = dc_enc[s]
                    wtr.write(code, ln)
                    if s:
                        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                else:  # DC refinement: the Al-th bit of the shifted value
                    wtr.write((v0 >> all_) & 1, 1)
            elif ahh == 0:
                _enc_ac_first(wtr, block, ss, se, all_)
            else:
                _enc_ac_refine(wtr, block, ss, se, all_)
        wtr.emit_eobrun()
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _enc_ac_first(wtr: _ProgWriter, block: np.ndarray, ss: int, se: int, al: int) -> None:
    """One block of an Ah=0 AC scan (T.81 G.1.2.2): magnitudes point-
    transformed by >> Al (toward zero), trailing zeros folded into the
    writer's pending EOB run."""
    run = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(block[k])
        t = (abs(v)) >> al
        if t == 0:
            run += 1
            continue
        wtr.emit_eobrun()
        while run > 15:
            wtr.sym(0xF0)  # ZRL
            run -= 16
        s = t.bit_length()
        wtr.sym((run << 4) | s)
        sv = t if v >= 0 else -t
        wtr.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
        run = 0
        emitted = True
    if run > 0 or not emitted:
        wtr.eobrun += 1
        if wtr.eobrun == 0x7FFF:
            wtr.emit_eobrun()


def _enc_ac_refine(wtr: _ProgWriter, block: np.ndarray, ss: int, se: int, al: int) -> None:
    """One block of an Ah>0 AC refinement scan (T.81 G.1.2.3): newly
    nonzero coefficients emit (run, 1) symbols; history-nonzero ones emit
    bare correction bits, buffered so they land right after the symbol
    whose zero-run spans them."""
    absv = [abs(int(v)) >> al for v in block]
    signs = [1 if int(v) >= 0 else 0 for v in block]
    eobpos = ss - 1  # last newly-nonzero position in the band
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eobpos = k
    run = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            run += 1
            continue
        # ZRLs only when a newly-nonzero coefficient still follows;
        # otherwise the zero run folds into the EOB run
        while run > 15 and k <= eobpos:
            wtr.emit_eobrun()
            wtr.sym(0xF0)
            run -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:  # history-nonzero: bare correction bit
            br.append(t & 1)
            continue
        # newly nonzero (t == 1)
        wtr.emit_eobrun()
        wtr.sym((run << 4) | 1)
        wtr.write(signs[k], 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        wtr.eobrun += 1
        wtr.be.extend(br)
        if wtr.eobrun == 0x7FFF:
            wtr.emit_eobrun()
