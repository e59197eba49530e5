"""G.711 mu-law / A-law codecs (functions/g711.py) and their WAV path."""

import numpy as np
import pytest

from polars_dataset_spark.functions.g711 import (
    alaw_decode,
    alaw_encode,
    g711_wav_bytes,
    mulaw_decode,
    mulaw_encode,
)


def test_mulaw_known_anchor_values():
    # canonical public G.711 values: 0xFF = +0, 0x00 = -32124, 0x80 = +32124
    d = mulaw_decode(np.array([0xFF, 0x00, 0x80, 0x7F], dtype=np.uint8))
    assert list(d) == [0, -32124, 32124, 0]


def test_alaw_known_anchor_values():
    # 0xD5 = +8, 0x55 = -8, 0xAA = +32256? no: max is at 0xAA^0x55=0xFF → seg7 m15
    d = alaw_decode(np.array([0xD5, 0x55, 0xAA, 0x2A], dtype=np.uint8))
    assert d[0] == 8 and d[1] == -8
    assert d[2] == 32256 and d[3] == -32256  # full-scale positive/negative


def test_mulaw_byte_fixed_point_modulo_negative_zero():
    b = np.arange(256, dtype=np.uint8)
    rt = mulaw_encode(mulaw_decode(b))
    # 0x7F is "negative zero": decodes to 0, re-encodes as +0 = 0xFF.
    # Every other byte is a fixed point of encode∘decode.
    mism = np.nonzero(rt != b)[0]
    assert list(mism) == [0x7F]
    assert mulaw_decode(np.array([0x7F], dtype=np.uint8))[0] == 0


def test_alaw_byte_fixed_point():
    b = np.arange(256, dtype=np.uint8)
    assert (alaw_encode(alaw_decode(b)) == b).all()


def test_encode_quantization_error_bounded():
    x = np.linspace(-32000, 32000, 4001).astype(np.int32)
    for enc, dec, tol_lo in ((mulaw_encode, mulaw_decode, 4), (alaw_encode, alaw_decode, 8)):
        err = np.abs(dec(enc(x)).astype(np.int64) - x)
        # companding: error grows with magnitude; segment width at full
        # scale is 1024 (mu) / 1024 (A) → half-width bound
        assert err.max() <= 1024
        small = np.abs(x) < 100
        assert err[small].max() <= tol_lo * 2


def test_wav_container_dispatch(spark):
    from polars_dataset_spark.functions import decode_audio

    i = np.arange(800)
    sig = (8000 * np.sin(2 * np.pi * 440 * i / 8000)).astype(np.int32)
    rows = [
        (6, bytearray(g711_wav_bytes(bytes(alaw_encode(sig)), fmt_tag=6))),
        (7, bytearray(g711_wav_bytes(bytes(mulaw_encode(sig)), fmt_tag=7))),
    ]
    df = spark.createDataFrame(rows, "media_id int, content binary")
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    ref_rms = float(np.sqrt(((sig / 32768.0) ** 2).mean()))
    for mid in (6, 7):
        r = out[mid]
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert r["n_frames"] == 800
        # companded round-trip keeps rms within ~1% of the source
        assert abs(r["rms"] - ref_rms) / ref_rms < 0.01
        assert 0 < r["peak"] <= 1.0


def test_wav_bytes_validates_tag():
    with pytest.raises(ValueError):
        g711_wav_bytes(b"\x00", fmt_tag=1)


# --- Sun AU container ----------------------------------------------------


def test_au_all_encodings_roundtrip():
    from polars_dataset_spark.functions.g711 import (
        AU_ALAW,
        AU_MULAW,
        AU_PCM8,
        AU_PCM16,
        decode_au,
        encode_au,
    )

    i = np.arange(1000)
    sig = ((i * 37) % 1001 - 500).astype(np.int64)
    rate, nch, fr = decode_au(encode_au(sig.astype(">i2").tobytes(), AU_PCM16))
    assert (rate, nch) == (8000, 1) and np.allclose(fr[:, 0], sig / 32768.0)
    s8 = ((i * 7) % 256 - 128).astype(np.int8)
    _, _, fr = decode_au(encode_au(s8.tobytes(), AU_PCM8))
    assert np.allclose(fr[:, 0], s8 / 128.0)  # AU 8-bit PCM is SIGNED
    for enc, encf, decf in (
        (AU_MULAW, mulaw_encode, mulaw_decode),
        (AU_ALAW, alaw_encode, alaw_decode),
    ):
        pay = bytes(encf(sig * 8))
        _, _, fr = decode_au(encode_au(pay, enc))
        assert np.allclose(fr[:, 0], decf(np.frombuffer(pay, np.uint8)) / 32768.0)


def test_au_malformed_and_dispatch(spark):
    from polars_dataset_spark.functions import decode_audio
    from polars_dataset_spark.functions.g711 import AU_MULAW, decode_au, encode_au

    assert decode_au(b".snd") is None
    assert decode_au(b".snd" + b"\x00" * 20) is None  # zero rate/channels
    bad_enc = encode_au(b"\x00" * 10, AU_MULAW)
    bad_enc = bad_enc[:15] + b"\x63" + bad_enc[16:]  # unknown encoding 99
    assert decode_au(bad_enc) is None
    payload = bytes(((np.arange(256) * 9) % 256).astype(np.uint8))
    df = spark.createDataFrame(
        [(0, bytearray(encode_au(payload, AU_MULAW, rate=16000)))],
        "media_id long, content binary",
    )
    r = decode_audio(df).collect()[0]
    assert r["sample_rate"] == 16000 and r["n_frames"] == 256
