"""Pure-python FLAC decoder (functions/flac.py): round-trips across
subframe types / stereo modes / rice partitions / wasted bits via the
in-container fixture encoder, UTF-8 coded numbers, CRC rejection,
malformed inputs, and the Spark end-to-end path through decode_audio."""

import numpy as np
import pytest

from polars_dataset_spark.functions.flac import (
    _Bits,
    _BitsW,
    _read_utf8_number,
    _write_utf8_number,
    decode_flac,
    encode_flac,
)


def _sig(n, ch, seed=0, amp=20000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    base = (amp * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    out = np.stack([base + rng.randint(-50, 50, size=n) for _ in range(ch)], axis=1)
    return np.clip(out, -(1 << 15), (1 << 15) - 1)


def _roundtrip(frames, **kw):
    got = decode_flac(encode_flac(frames, **kw))
    assert got is not None
    rate, nch, arr = got
    assert arr.shape == frames.shape
    assert np.allclose(arr, frames / float(1 << 15), atol=1e-12)
    return rate, nch


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    _roundtrip(_sig(1000, 1), subframe="fixed", order=order)


def test_verbatim_constant_lpc():
    _roundtrip(_sig(1000, 1, 1), subframe="verbatim")
    _roundtrip(np.full((700, 1), 123, dtype=np.int64), subframe="constant")
    _roundtrip(_sig(1000, 1, 2), subframe="lpc")  # quantized-coefficient path


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    rate, nch = _roundtrip(_sig(900, 2, 3), subframe="fixed", order=2, stereo_mode=mode)
    assert nch == 2 and rate == 8000


def test_rice_partitions_and_wasted_bits():
    _roundtrip(_sig(1024, 1, 4), subframe="fixed", order=2, partition_order=3)
    w = (_sig(512, 1, 5) >> 2) << 2  # samples with 2 zero low bits
    _roundtrip(w, subframe="fixed", order=1, wasted=2)


def test_multi_frame_stream():
    _roundtrip(_sig(2000, 1, 6), blocksize=128)  # 16 frames, frame-number coding


def test_utf8_coded_numbers_all_widths():
    for v in [0, 127, 128, 2047, 2048, 65535, (1 << 21) - 1, 1 << 21, (1 << 36) - 1]:
        w = _BitsW()
        _write_utf8_number(w, v)
        assert _read_utf8_number(_Bits(w.bytes())) == v


def test_crc_rejection_and_malformed():
    blob = bytearray(encode_flac(_sig(600, 1, 7)))
    # flip one bit inside frame data: the CRC-16 must reject the stream
    blob[-10] ^= 0x01
    assert decode_flac(bytes(blob)) is None
    for bad in [None, b"", b"fLaC", b"RIFFxxxx", bytes(blob)[:60], encode_flac(_sig(64, 1))[:-2]]:
        assert decode_flac(bad) is None


def test_decode_audio_flac_end_to_end(spark):
    from polars_dataset_spark.functions import decode_audio

    frames = _sig(4000, 2, 8)
    blob = encode_flac(frames, rate=8000, stereo_mode="mid_side")
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"not audio"))],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in decode_audio(df).collect()}
    r0 = out[0]
    assert r0.sample_rate == 8000 and r0.n_channels == 2 and r0.n_frames == 4000
    assert abs(r0.duration_s - 0.5) < 1e-9
    mono = (frames / float(1 << 15)).mean(axis=1)
    assert abs(r0.rms - float(np.sqrt((mono**2).mean()))) < 1e-6
    assert out[1].sample_rate is None  # malformed -> nulls, never raise


def test_audio_spectrogram_flac_tone_peak(spark):
    from polars_dataset_spark.functions import audio_spectrogram

    # pure 1 kHz tone at 8 kHz: peak must land on bin 32 of a 256-pt frame
    t = np.arange(4000)
    tone = (0.5 * (1 << 15) * np.sin(2 * np.pi * 1000 * t / 8000)).astype(np.int64)
    blob = encode_flac(tone[:, None], rate=8000, subframe="verbatim")
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    row = audio_spectrogram(df).first()
    assert row.sample_rate == 8000
    assert abs(int(np.asarray(row.mean_spectrum).argmax()) - 32) <= 1
