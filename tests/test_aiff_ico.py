"""AIFF audio (functions/aiff.py) and ICO image (functions/ico.py)."""

import struct

import numpy as np
import pytest

from polars_dataset_spark.functions.aiff import (
    decode_aiff,
    encode_aiff,
    pack_extended80,
    unpack_extended80,
)
from polars_dataset_spark.functions.ico import _dib_bytes, decode_ico_gray, encode_ico
from polars_dataset_spark.functions.png import encode_png_gray

RNG = np.random.RandomState(11)


# --- AIFF ---------------------------------------------------------------


@pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000, 96000])
def test_extended80_roundtrip(rate):
    assert unpack_extended80(pack_extended80(float(rate))) == float(rate)


def test_extended80_specials():
    assert unpack_extended80(pack_extended80(0.0)) == 0.0
    assert unpack_extended80(b"\x7f\xff" + b"\x00" * 8) is None  # inf/nan
    assert unpack_extended80(b"\x00" * 9) is None  # wrong length


def test_aiff_16bit_stereo_roundtrip():
    i = np.arange(1000)
    st = np.stack([(i * 37) % 1001 - 500, (i * 53) % 997 - 498], axis=1).astype(np.int64)
    rate, nch, fr = decode_aiff(encode_aiff(st, 8000))
    assert (rate, nch) == (8000, 2) and fr.shape == (1000, 2)
    assert np.allclose(fr, st / 32768.0)


def test_aiff_8bit_signed():
    mono = ((np.arange(256) * 7) % 256 - 128).astype(np.int64)
    rate, nch, fr = decode_aiff(encode_aiff(mono[:, None], 22050, bits=8))
    assert (rate, nch) == (22050, 1)
    assert np.allclose(fr[:, 0], mono / 128.0)  # AIFF 8-bit is SIGNED


def test_aiff_malformed():
    good = encode_aiff(np.zeros((10, 1), dtype=np.int64), 8000)
    assert decode_aiff(b"FORM") is None
    assert decode_aiff(b"RIFF" + good[4:]) is None
    assert decode_aiff(good[:20]) is None


def test_aiff_through_decode_audio(spark):
    from polars_dataset_spark.functions import decode_audio

    i = np.arange(800)
    sig = (10000 * np.sin(2 * np.pi * 440 * i / 44100)).astype(np.int64)
    df = spark.createDataFrame(
        [(0, bytearray(encode_aiff(sig[:, None], 44100)))],
        "media_id long, content binary",
    )
    r = decode_audio(df).collect()[0]
    assert r["sample_rate"] == 44100 and r["n_frames"] == 800
    assert abs(r["rms"] - float(np.sqrt(((sig / 32768.0) ** 2).mean()))) < 1e-6


# --- ICO ----------------------------------------------------------------


@pytest.mark.parametrize("bpp", [24, 32])
def test_ico_dib_roundtrip(bpp):
    rgb = RNG.randint(0, 256, (8, 9, 3)) / 255.0
    d = decode_ico_gray(encode_ico([_dib_bytes(rgb, bpp=bpp)]))
    exp = np.round(rgb * 255).astype(np.uint8).mean(axis=2) / 255.0
    assert d.shape == (8, 9) and np.allclose(d, exp, atol=1e-6)


def test_ico_largest_member_wins():
    g = RNG.randint(0, 256, (12, 10)) / 255.0
    big = RNG.randint(0, 256, (20, 20, 3)) / 255.0
    png = encode_png_gray(g)
    # PNG larger than DIB -> PNG wins
    d = decode_ico_gray(encode_ico([_dib_bytes(np.full((4, 4), 0.5)), png]))
    assert d.shape == (12, 10) and np.allclose(d, np.round(g * 255) / 255.0, atol=1e-6)
    # DIB larger than PNG -> DIB wins
    d = decode_ico_gray(encode_ico([png, _dib_bytes(big)]))
    assert d.shape == (20, 20)


def test_ico_malformed():
    assert decode_ico_gray(b"") is None
    assert decode_ico_gray(b"\x00" * 6) is None  # count 0
    assert decode_ico_gray(struct.pack("<HHH", 0, 2, 1) + b"\x00" * 16) is None  # .cur
    # directory pointing past the blob
    bad = struct.pack("<HHH", 0, 1, 1) + struct.pack("<BBBBHHLL", 4, 4, 0, 0, 1, 32, 999, 22)
    assert decode_ico_gray(bad) is None


def test_ico_through_decode_media(spark):
    from polars_dataset_spark.functions import decode_media

    g = RNG.randint(0, 256, (8, 8)) / 255.0
    rows = [
        (0, bytearray(encode_ico([encode_png_gray(g)]))),
        (1, bytearray(b"nonsense")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["decoded"] for r in decode_media(df, decoder="ico", target_size=(8, 8)).collect()}
    assert out[1] is None
    assert np.allclose(np.array(out[0]).reshape(8, 8), np.round(g * 255) / 255.0, atol=1e-6)
