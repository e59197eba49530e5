"""ITU-T G.711 companded audio (μ-law / A-law) — pure numpy.

The two classic 8-bit telephony codecs, decoded straight from their
public integer definitions (ITU-T Recommendation G.711; the reference
integer forms are the well-known public-domain CCITT tables):

- μ-law: byte complemented, then ``mag = ((m·8 + 132) << e) − 132``
  over sign/exponent/mantissa bit fields — 14-bit dynamic range mapped
  onto a 16-bit linear scale (max magnitude 32124);
- A-law: byte XOR 0x55, then ``mag = m·16 + 8`` for segment 0 else
  ``(m·16 + 264) << (e − 1)`` (max magnitude 32256); the sign bit SET
  means positive, unlike μ-law.

Both decoders are exact integer maps (every byte → one canonical
16-bit-scale value), which is what makes a full cross-engine value
oracle possible: the same bit-field arithmetic restates in ANSI SQL.
Encoders are provided for fixtures and round-trips; ``decode ∘ encode``
reproduces the canonical quantization levels exactly.

WAV carries these as format tags 6 (A-law) and 7 (μ-law) with 8 bits
per sample; :func:`polars_dataset_spark.functions.multimodal._decode_wav`
dispatches here so ``decode_audio``/``audio_spectrogram`` accept
telephony WAVs with no codec library.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "mulaw_decode",
    "mulaw_encode",
    "alaw_decode",
    "alaw_encode",
    "g711_wav_bytes",
    "decode_au",
    "encode_au",
]

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """μ-law bytes (uint8) → int32 linear samples on the 16-bit scale."""
    u = (~np.asarray(b, dtype=np.uint8)).astype(np.int32) & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (((m << 3) + _MULAW_BIAS) << e) - _MULAW_BIAS
    return np.where(sign != 0, -mag, mag)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16-scale linear samples → μ-law bytes (uint8)."""
    x = np.asarray(x, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = position of the leading bit above bit 7 (0..7)
    e = np.clip((np.floor(np.log2(mag)).astype(np.int32)) - 7, 0, 7)
    m = (mag >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | m)).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes (uint8) → int32 linear samples on the 16-bit scale."""
    a = (np.asarray(b, dtype=np.uint8).astype(np.int32)) ^ 0x55
    sign = a & 0x80  # SET = positive (opposite of μ-law)
    e = (a >> 4) & 0x07
    m = a & 0x0F
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0))
    return np.where(sign != 0, mag, -mag)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16-scale linear samples → A-law bytes (uint8)."""
    x = np.asarray(x, dtype=np.int32)
    positive = x >= 0
    mag = np.where(positive, x, -x - 1) >> 3  # 13-bit magnitude
    mag = np.minimum(mag, 0xFFF)
    e = np.clip(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4, 0, 7)
    m = np.where(e == 0, (mag >> 1) & 0x0F, (mag >> e) & 0x0F)
    a = (e << 4) | m
    return ((a ^ np.where(positive, 0xD5, 0x55)) & 0xFF).astype(np.uint8)


def g711_wav_bytes(payload: bytes, fmt_tag: int, rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE container around raw G.711 bytes
    (``fmt_tag`` 6 = A-law, 7 = μ-law) — fixture/encoder side of the
    decoder above."""
    if fmt_tag not in (6, 7):
        raise ValueError(f"fmt_tag must be 6 (A-law) or 7 (mu-law), got {fmt_tag}")
    block = channels  # 8 bits/sample
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block, block, 8)
    data = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


# --- Sun AU (.au/.snd) container -----------------------------------------
# The classic NeXT/Sun audio format (public spec): 24-byte big-endian
# header — magic ".snd", data offset, data size (0xFFFFFFFF = unknown),
# encoding, sample rate, channels — then raw big-endian samples. The
# format's native encodings 1 (G.711 mu-law) and 27 (G.711 A-law) reuse
# the decoders above; 2/3 are signed linear PCM (8/16-bit).

AU_MULAW, AU_PCM8, AU_PCM16, AU_ALAW = 1, 2, 3, 27


def decode_au(data: bytes) -> "tuple[int, int, np.ndarray] | None":
    """AU blob → (rate, n_channels, frames float64 in [-1, 1]) or None —
    the shared audio-decoder contract."""
    try:
        if len(data) < 24 or data[:4] != b".snd":
            return None
        offset, size, enc, rate, channels = struct.unpack(">LLLLL", data[4:24])
        if offset < 24 or rate == 0 or channels == 0:
            return None
        raw = data[offset:]
        if size != 0xFFFFFFFF:
            raw = raw[:size]
        if enc == AU_MULAW:
            samples = mulaw_decode(np.frombuffer(raw, dtype=np.uint8)).astype(np.float64) / 32768.0
        elif enc == AU_ALAW:
            samples = alaw_decode(np.frombuffer(raw, dtype=np.uint8)).astype(np.float64) / 32768.0
        elif enc == AU_PCM8:  # signed, unlike WAV's unsigned 8-bit
            samples = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
        elif enc == AU_PCM16:  # big-endian
            n = len(raw) // 2 * 2
            samples = np.frombuffer(raw[:n], dtype=">i2").astype(np.float64) / 32768.0
        else:
            return None  # float/ADPCM encodings out of scope
        n_frames = samples.size // channels
        if n_frames == 0:
            return None
        return int(rate), int(channels), samples[: n_frames * channels].reshape(
            n_frames, channels
        )
    except Exception:
        return None


def encode_au(payload: bytes, encoding: int, rate: int = 8000, channels: int = 1) -> bytes:
    """Fixture encoder: raw sample bytes (already in the target
    encoding, big-endian for PCM16) wrapped in an AU header."""
    if encoding not in (AU_MULAW, AU_PCM8, AU_PCM16, AU_ALAW):
        raise ValueError(f"unsupported AU encoding {encoding}")
    return (
        b".snd" + struct.pack(">LLLLL", 24, len(payload), encoding, rate, channels)
        + payload
    )
