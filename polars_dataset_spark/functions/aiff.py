"""Pure-python AIFF decoder — no audio library.

Implements the public Audio Interchange File Format specification
(Apple, 1989 — the big-endian sibling of RIFF/WAVE): the IFF
``FORM``/``AIFF`` container, ``COMM`` (channels, frame count, sample
width, and the sample rate stored as an 80-bit IEEE 754 *extended*
float — the format's one genuinely odd corner, parsed here from its
sign/15-bit exponent/63-bit explicit-integer-bit mantissa fields) and
``SSND`` (offset + block-size header, then big-endian two's-complement
PCM). 8- and 16-bit PCM, any channel count, word-aligned chunks.

Returns the same ``(rate, n_channels, frames)`` contract as the WAV /
G.711 / FLAC decoders in this package, with frames float64 in [-1, 1],
shape ``(n_frames, n_channels)`` — magic-byte sniffed by
``decode_audio``/``audio_spectrogram``. Malformed blobs return None,
never raise. An encoder produces real fixtures (including the 80-bit
rate) so round-trips exercise the whole parse.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_aiff", "encode_aiff", "pack_extended80", "unpack_extended80"]


def unpack_extended80(b: bytes) -> "float | None":
    """80-bit IEEE extended float (big-endian, explicit integer bit) →
    python float. AIFF sample rates are small positive integers in
    practice, but the parse is the general one."""
    if len(b) != 10:
        return None
    se = int.from_bytes(b[0:2], "big")
    mant = int.from_bytes(b[2:10], "big")
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        return None  # inf/nan: not a sample rate
    # value = mant / 2^63 * 2^(exp - 16383); explicit integer bit is
    # mant's top bit (no hidden bit in the 80-bit format)
    return sign * float(mant) * 2.0 ** (exp - 16383 - 63)


def pack_extended80(x: float) -> bytes:
    """python float → 80-bit IEEE extended (big-endian)."""
    if x == 0.0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    m, e = np.frexp(x)  # x = m * 2^e, m in [0.5, 1)
    exp = int(e) - 1 + 16383  # normalize to [1, 2) mantissa
    mant = int(m * 2.0 ** 64)  # m in [0.5,1) → top bit set in 64-bit field
    return struct.pack(">H", sign | exp) + struct.pack(">Q", mant)


def decode_aiff(data: bytes) -> "tuple[int, int, np.ndarray] | None":
    try:
        if len(data) < 12 or data[:4] != b"FORM" or data[8:12] != b"AIFF":
            return None
        pos, comm, ssnd = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "big")
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"COMM":
                comm = body
            elif cid == b"SSND":
                ssnd = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
            return None
        n_channels, n_frames, bits = struct.unpack(">hLh", comm[0:8])
        rate_f = unpack_extended80(comm[8:18])
        if rate_f is None or rate_f <= 0 or n_channels < 1 or bits not in (8, 16):
            return None
        offset, _blk = struct.unpack(">LL", ssnd[0:8])
        raw = ssnd[8 + offset :]
        if bits == 16:
            n = len(raw) // 2 * 2
            samples = (
                np.frombuffer(raw[:n], dtype=">i2").astype(np.float64) / 32768.0
            )
        else:  # AIFF 8-bit is SIGNED (unlike WAV)
            samples = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
        usable = min(samples.size // n_channels, n_frames)
        if usable <= 0:
            return None
        return (
            int(round(rate_f)),
            n_channels,
            samples[: usable * n_channels].reshape(usable, n_channels),
        )
    except Exception:
        return None


def encode_aiff(frames: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Fixture encoder: int samples on the 16-bit (or 8-bit) scale,
    shape (n_frames, n_channels) → AIFF bytes."""
    if frames.ndim == 1:
        frames = frames[:, None]
    n_frames, n_channels = frames.shape
    if bits == 16:
        raw = frames.astype(">i2").tobytes()
    elif bits == 8:
        raw = frames.astype(np.int8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    comm = struct.pack(">hLh", n_channels, n_frames, bits) + pack_extended80(float(rate))
    ssnd = struct.pack(">LL", 0, 0) + raw
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + struct.pack(">L", len(body)) + body
