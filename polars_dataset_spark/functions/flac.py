"""Pure-python FLAC decoder — no codec library.

Implements the public FLAC format (xiph.org spec / RFC 9639) for the
cases a speech/music corpus actually contains: STREAMINFO parsing, frame
headers (both blocking strategies, the UTF-8-style coded number, all
block-size/sample-rate/sample-size codes, CRC-8 verified), subframe
types CONSTANT / VERBATIM / FIXED (orders 0–4) / LPC (any order,
signed quantized coefficients + shift), wasted bits, Rice residual
coding (both 4- and 5-bit parameter widths, partitioned, including the
verbatim escape), and all four channel assignments (independent,
left/side, right/side, mid/side). Frame CRC-16 is verified; a failed
CRC, truncation, or any reserved/invalid code returns ``None`` — the
same no-throw contract as the image decoders.

``decode_flac(blob)`` returns ``(sample_rate, n_channels, frames)`` with
``frames`` a float64 ``(n, n_channels)`` array in [-1, 1] — exactly the
tuple :func:`multimodal._decode_wav` produces, so the audio feature
operators (``decode_audio``, ``audio_spectrogram``) work on FLAC via
magic-byte sniffing with no other change.

A minimal in-container *encoder* produces real fixtures: constant /
verbatim / fixed-predictor subframes with genuine Rice-coded partitioned
residuals, every stereo decorrelation mode, wasted bits, multi-frame
streams, and correct CRC-8/CRC-16 — so round-trips exercise each decode
path bit-for-bit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_flac", "encode_flac"]

_MAX_SAMPLES = 1 << 26  # ~64M samples: bounds memory per blob

# CRC tables COMPUTED at import from the spec polynomials (x^8+x^2+x+1,
# x^16+x^15+x^2+1) — derived, not copied.
def _crc_table(poly: int, width: int) -> "list[int]":
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _Bits:
    """MSB-first bit reader over bytes; raises EOFError past the end."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise EOFError
        out = 0
        pos = self.pos
        # byte-aligned fast path for wide reads
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n, avail)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:  # corrupt stream guard
                raise EOFError
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(br: "_Bits") -> int:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36
    bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(br: "_Bits", blocksize: int, order: int) -> "list[int]":
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if blocksize % (1 << po) != 0:
        raise ValueError("partition order does not divide blocksize")
    out: list[int] = []
    part_len = blocksize >> po
    if part_len <= order and po > 0 or (po == 0 and blocksize <= order):
        raise ValueError("partition shorter than predictor order")
    for p in range(1 << po):
        n = part_len - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            if raw:
                out.extend(br.read_signed(raw) for _ in range(n))
            else:
                out.extend([0] * n)
        else:
            for _ in range(n):
                q = br.unary()
                r = br.read(k) if k else 0
                v = (q << k) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(br: "_Bits", blocksize: int, bps: int) -> "list[int]":
    if br.read(1) != 0:
        raise ValueError("subframe pad bit set")
    code = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exhaust sample size")
    if code == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif code == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= code <= 12:  # FIXED order 0-4
        order = code - 8
        if order > blocksize:
            raise ValueError("order > blocksize")
        samples = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for i, r in enumerate(resid):
            pos = order + i
            samples.append(r + sum(c * samples[pos - 1 - j] for j, c in enumerate(coeffs)))
    elif code >= 32:  # LPC, order = low 5 bits + 1
        order = (code & 31) + 1
        if order > blocksize:
            raise ValueError("order > blocksize")
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid lpc precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        for i, r in enumerate(resid):
            pos = order + i
            pred = sum(c * samples[pos - 1 - j] for j, c in enumerate(coeffs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(blob: bytes):
    """Decode a full FLAC stream → ``(rate, n_channels, frames)`` or
    ``None`` (malformed / unsupported / CRC failure — never raises)."""
    try:
        if blob is None or len(blob) < 42 or blob[:4] != b"fLaC":
            return None
        pos = 4
        rate = nch = bps = None
        total = 0
        # metadata blocks
        while True:
            if pos + 4 > len(blob):
                return None
            head = blob[pos]
            length = int.from_bytes(blob[pos + 1 : pos + 4], "big")
            body = blob[pos + 4 : pos + 4 + length]
            if len(body) < length:
                return None
            if head & 0x7F == 0:  # STREAMINFO
                if length != 34:
                    return None
                br = _Bits(body)
                br.read(16); br.read(16); br.read(24); br.read(24)
                rate = br.read(20)
                nch = br.read(3) + 1
                bps = br.read(5) + 1
                total = br.read(36)
            pos += 4 + length
            if head & 0x80:
                break
        if not rate or nch is None or total > _MAX_SAMPLES:
            return None

        chans: "list[list[int]]" = [[] for _ in range(nch)]
        # frames
        while pos < len(blob):
            frame_start = pos
            br = _Bits(blob, pos * 8)
            sync = br.read(14)
            if sync != 0x3FFE:
                return None
            if br.read(1) != 0:
                return None
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            if br.read(1) != 0:
                return None
            _read_utf8_number(br)
            if bs_code == 0:
                return None
            elif bs_code == 6:
                blocksize = br.read(8) + 1
            elif bs_code == 7:
                blocksize = br.read(16) + 1
            else:
                blocksize = _BLOCKSIZE[bs_code]
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif sr_code == 15:
                return None
            fbps = bps if ss_code == 0 else _BPS.get(ss_code)
            if fbps is None:
                return None
            br.align()
            hdr_end = br.pos >> 3
            if _crc8(blob[frame_start:hdr_end]) != br.read(8):
                return None

            if ch_code <= 7:
                f_nch = ch_code + 1
                if f_nch != nch:
                    return None
                subs = [_read_subframe(br, blocksize, fbps) for _ in range(nch)]
            elif ch_code in (8, 9, 10):
                if nch != 2:
                    return None
                extra0 = 1 if ch_code == 9 else 0  # side channel gets +1 bit
                extra1 = 1 if ch_code in (8, 10) else 0
                a = _read_subframe(br, blocksize, fbps + extra0)
                b = _read_subframe(br, blocksize, fbps + extra1)
                if ch_code == 8:  # left/side: right = left - side
                    subs = [a, [x - s for x, s in zip(a, b)]]
                elif ch_code == 9:  # right/side: left = right + side
                    subs = [[x + s for x, s in zip(b, a)], b]
                else:  # mid/side
                    left, right = [], []
                    for m, s in zip(a, b):
                        mm = (m << 1) | (s & 1)
                        left.append((mm + s) >> 1)
                        right.append((mm - s) >> 1)
                    subs = [left, right]
            else:
                return None
            br.align()
            crc_end = br.pos >> 3
            if _crc16(blob[frame_start:crc_end]) != br.read(16):
                return None
            pos = br.pos >> 3
            for c in range(nch):
                chans[c].extend(subs[c])
            if sum(len(c) for c in chans) > _MAX_SAMPLES:
                return None

        n = min(len(c) for c in chans)
        if total and n > total:
            n = total  # last frame may be padded in odd encoders
        if n == 0:
            return None
        arr = np.stack([np.asarray(c[:n], dtype=np.float64) for c in chans], axis=1)
        return rate, nch, arr / float(1 << (bps - 1))
    except (EOFError, ValueError, KeyError, IndexError, ZeroDivisionError):
        return None
    except Exception:
        return None


# ---------------------------------------------------------------- encoder

class _BitsW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _write_utf8_number(w: "_BitsW", v: int) -> None:
    """Minimal UTF-8-style form: n-byte encodings carry 7-n lead payload
    bits plus 6 per continuation byte."""
    if v < 0x80:
        w.write(v, 8)
        return
    caps = {2: 11, 3: 16, 4: 21, 5: 26, 6: 31, 7: 36}
    n = next(k for k, cap in caps.items() if v.bit_length() <= cap)
    parts = []
    x = v
    for _ in range(n - 1):
        parts.append(x & 0x3F)
        x >>= 6
    # lead byte: n ones, a zero, then the remaining high payload bits
    lead_prefix = (0xFF ^ ((1 << (8 - n)) - 1)) & 0xFF
    w.write(lead_prefix | x, 8)
    for p in reversed(parts):
        w.write(0x80 | p, 8)


def _rice_encode(w: "_BitsW", resid: "list[int]", k: int) -> None:
    for r in resid:
        v = r * 2 if r >= 0 else -r * 2 - 1  # zigzag
        for _ in range(v >> k):
            w.write(0, 1)
        w.write(1, 1)
        if k:
            w.write(v & ((1 << k) - 1), k)


def _best_rice_k(resid: "list[int]") -> int:
    best_k, best_cost = 0, None
    for k in range(15):
        cost = sum(((r * 2 if r >= 0 else -r * 2 - 1) >> k) + 1 + k for r in resid)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _write_subframe(
    w: "_BitsW", samples: "list[int]", bps: int, kind: str, order: int = 2,
    wasted: int = 0, partition_order: int = 0,
) -> None:
    w.write(0, 1)
    eff = bps - wasted
    if wasted:
        samples = [s >> wasted for s in samples]
    if kind == "constant":
        w.write(0, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.write(0, 1)
            w.write(1, 1)
        w.write_signed(samples[0], eff)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.write(0, 1)
            w.write(1, 1)
        for s in samples:
            w.write_signed(s, eff)
        return
    if kind == "lpc":
        # genuine quantized-LPC: a smoothed 2-tap predictor (c = [3, -1],
        # shift 1 → prediction (3·s[i-1] − s[i-2]) >> 1), residuals exact
        order = 2
        coeffs = [3, -1]
        shift = 1
        prec = 4
        w.write(32 + (order - 1), 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.write(0, 1)
            w.write(1, 1)
        for s in samples[:order]:
            w.write_signed(s, eff)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(c, prec)
        resid = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs)) >> shift)
            for i in range(order, len(samples))
        ]
    else:
        # fixed predictor
        w.write(8 + order, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.write(0, 1)
            w.write(1, 1)
        coeffs = _FIXED_COEFFS[order]
        for s in samples[:order]:
            w.write_signed(s, eff)
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
            for i in range(order, len(samples))
        ]
    w.write(0, 2)  # 4-bit rice params
    w.write(partition_order, 4)
    blocksize = len(samples)
    part_len = blocksize >> partition_order
    idx = 0
    for p in range(1 << partition_order):
        n = part_len - (order if p == 0 else 0)
        chunk = resid[idx : idx + n]
        idx += n
        k = _best_rice_k(chunk)
        w.write(k, 4)
        _rice_encode(w, chunk, k)


def encode_flac(
    frames: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 256,
    subframe: str = "fixed",
    order: int = 2,
    stereo_mode: str = "independent",
    wasted: int = 0,
    partition_order: int = 0,
) -> bytes:
    """Encode int samples ``(n, ch)`` (already in [-2^(bps-1), 2^(bps-1)))
    as a valid FLAC stream. Fixture encoder: picks ONE subframe type /
    stereo mode for the whole stream so tests can target decode paths."""
    frames = np.atleast_2d(np.asarray(frames, dtype=np.int64))
    if frames.ndim == 1:
        frames = frames[:, None]
    # STREAMINFO's 5-bit field stores bps-1, so only 4..32 is encodable
    # (RFC 9639); out-of-range values would WRAP in the header while the
    # subframes write the real width — a silently undecodable stream
    if not 4 <= bps <= 32:
        raise ValueError(f"encode_flac: bps must be in 4..32, got {bps}")
    n, nch = frames.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitsW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, blocksize):
        blk = frames[start : start + blocksize]
        bs = len(blk)
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy -> frame number coded
        w.write(7, 4)  # explicit 16-bit blocksize-1
        w.write(0, 4)  # rate from streaminfo
        ch_code = {
            "independent": nch - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[stereo_mode]
        w.write(ch_code, 4)
        # sample-size code derived from bps (was hardcoded to 16's code
        # 4, which mis-labeled non-16-bit streams; ADVICE r5). Depths
        # without a dedicated code (e.g. 13) use code 0 = get-from-
        # STREAMINFO, which already records bps-1 and which the decoder
        # honors (fbps = bps if ss_code == 0) — RFC 9639 §9.1.4 / ADVICE r6.
        # bps=32 also uses code 0: its dedicated code 7 is new in RFC 9639
        # and pre-RFC decoders treat 7 as reserved/invalid, while code 0
        # is honored by every decoder generation — ADVICE r7
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0)
        w.write(bps_code, 3)
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitsW()
        for b in hdr:
            w2.write(b, 8)
        w2.write(_crc8(hdr), 8)

        if stereo_mode == "independent":
            subs = [(blk[:, c].tolist(), bps) for c in range(nch)]
        else:
            L = blk[:, 0].astype(np.int64)
            R = blk[:, 1].astype(np.int64)
            side = (L - R).tolist()
            if stereo_mode == "left_side":
                subs = [(L.tolist(), bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bps + 1), (R.tolist(), bps)]
            else:
                mid = ((L + R) >> 1).tolist()
                subs = [(mid, bps), (side, bps + 1)]
        for samples, sbps in subs:
            _write_subframe(
                w2, samples, sbps, subframe, order=order, wasted=wasted,
                partition_order=partition_order,
            )
        w2.align()
        frame_body = w2.bytes()
        w3 = _BitsW()
        for b in frame_body:
            w3.write(b, 8)
        w3.write(_crc16(frame_body), 16)
        out += w3.bytes()
        frame_no += 1
    return bytes(out)
