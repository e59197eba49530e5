"""Perceptual audio fingerprinting (functions/audiohash): the
invariances the operator exists for — lossless re-encode across
containers (WAV/FLAC/AIFF), resampling, gain, stereo fold-down — plus
discrimination, null gates, and the banded pair operator."""

import struct

import numpy as np
import pytest

from polars_dataset_spark.functions.audiohash import (
    audio_fingerprint,
    audio_neardup_pairs,
    audiohash64,
)


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _rich(rate, base=330.0, secs=0.6, amp=0.4):
    """Harmonic-rich AM-modulated signal — float frames (n, 1)."""
    t = np.arange(int(rate * secs)) / rate
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.0 * t))
    sig = amp * env * (
        np.sin(2 * np.pi * base * t)
        + 0.5 * np.sin(2 * np.pi * 2.3 * base * t)
        + 0.25 * np.sin(2 * np.pi * 4.1 * base * t)
    )
    return sig[:, None]


def _wav(frames, rate):
    raw = (frames * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    nch = frames.shape[1]
    block = nch * 2
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, 16)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def _ints(frames):
    return (frames * 32768.0).clip(-32768, 32767).astype(np.int64)


def test_resample_invariance():
    h8 = audiohash64(8000, _rich(8000))
    for rate in (16000, 22050, 44100):
        h = audiohash64(rate, _rich(rate))
        assert _ham(h8, h) <= 3, rate


def test_gain_and_stereo_invariance():
    sig = _rich(8000)
    h = audiohash64(8000, sig)
    assert audiohash64(8000, 0.15 * sig) == h
    assert audiohash64(8000, np.repeat(sig, 2, axis=1)) == h


def test_discrimination():
    h = audiohash64(8000, _rich(8000))
    assert _ham(h, audiohash64(8000, _rich(8000, base=550.0))) > 16
    t = np.arange(4800) / 8000
    tone = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
    assert _ham(h, audiohash64(8000, tone)) > 16


def test_short_and_empty_are_none():
    assert audiohash64(8000, _rich(8000, secs=0.05)) is None
    assert audiohash64(8000, np.zeros((0, 1))) is None
    assert audiohash64(0, _rich(8000)) is None


def test_cross_container_reencodes_hash_identically():
    from polars_dataset_spark.functions.aiff import encode_aiff
    from polars_dataset_spark.functions.flac import encode_flac
    from polars_dataset_spark.functions.multimodal import _decode_audio_blob

    sig = _rich(8000)
    blobs = {
        "wav": _wav(sig, 8000),
        "flac": encode_flac(_ints(sig), rate=8000),
        "aiff": encode_aiff(_ints(sig), 8000),
    }
    hashes = {}
    for name, blob in blobs.items():
        rate, _nch, frames = _decode_audio_blob(blob)
        hashes[name] = audiohash64(rate, frames)
    # identical PCM through three containers -> identical signature
    assert hashes["wav"] == hashes["flac"] == hashes["aiff"]


def test_audio_neardup_pairs_end_to_end(spark):
    from polars_dataset_spark.functions.aiff import encode_aiff
    from polars_dataset_spark.functions.flac import encode_flac

    sig = _rich(8000)
    rows = [
        (0, bytearray(_wav(sig, 8000))),                       # original
        (1, bytearray(encode_flac(_ints(sig), rate=8000))),     # FLAC re-encode
        (2, bytearray(encode_aiff(_ints(sig), 8000))),          # AIFF re-encode
        (3, bytearray(_wav(_rich(44100), 44100))),              # 44.1k resample
        (4, bytearray(_wav(_rich(8000, base=550.0), 8000))),    # different recording
        (5, bytearray(b"not audio")),                           # undecodable
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_neardup_pairs(df, max_hamming=3).collect()
    }
    assert set(pairs) == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0  # re-encode: exact
    assert all(h <= 3 for h in pairs.values())


def test_audio_fingerprint_nulls(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"junk")), (1, None)], "media_id long, content binary"
    )
    out = {r.media_id: r.audiohash for r in audio_fingerprint(df).collect()}
    assert out[0] is None and out[1] is None


def test_audio_index_filter_against(spark):
    """Arriving-vs-corpus audio dedup: re-encoded and resampled copies
    of corpus recordings drop; novel recordings, undecodable blobs, and
    too-short clips are KEPT."""
    from polars_dataset_spark.functions.aiff import encode_aiff
    from polars_dataset_spark.functions.audiohash import (
        audio_filter_against,
        build_audio_index,
    )
    from polars_dataset_spark.functions.flac import encode_flac

    sig_a = _rich(8000)
    sig_b = _rich(8000, base=550.0)
    corpus = spark.createDataFrame(
        [(0, bytearray(_wav(sig_a, 8000))), (1, bytearray(_wav(sig_b, 8000)))],
        "media_id long, content binary",
    )
    idx = build_audio_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, bytearray(encode_flac(_ints(sig_a), rate=8000))),   # re-encode of corpus a: drop
            (11, bytearray(_wav(_rich(44100, base=550.0), 44100))),  # 44.1k copy of corpus b: drop
            (12, bytearray(_wav(_rich(8000, base=770.0), 8000))),    # novel recording: keep
            (13, bytearray(encode_aiff(_ints(sig_a[:400]), 8000))),  # too short to hash: keep
            (14, bytearray(b"junk")),                                # undecodable: keep
        ],
        "media_id long, content binary",
    )
    kept = sorted(r.media_id for r in audio_filter_against(batch, idx).collect())
    idx.unpersist()
    assert kept == [12, 13, 14]
