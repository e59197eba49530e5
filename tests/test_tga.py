"""TGA decoder (functions/tga.py): round-trips across every supported
path via the in-repo fixture encoders, malformed handling, Spark e2e."""

import numpy as np
import pytest

from polars_dataset_spark.functions.tga import (
    decode_tga_gray,
    encode_tga,
    encode_tga_palette,
    encode_tga_rle,
)

RNG = np.random.RandomState(7)
GRAY = (RNG.randint(0, 256, (5, 7)) / 255.0).astype(np.float64)
RGB = (RNG.randint(0, 256, (4, 6, 3)) / 255.0).astype(np.float64)


@pytest.mark.parametrize("top_down", [False, True])
def test_gray_uncompressed_roundtrip(top_down):
    d = decode_tga_gray(encode_tga(GRAY, top_down=top_down))
    assert d.shape == GRAY.shape and np.allclose(d, GRAY, atol=1 / 255)


@pytest.mark.parametrize("depth", [16, 24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_truecolor_roundtrip(depth, top_down):
    d = decode_tga_gray(encode_tga(RGB, depth=depth, top_down=top_down))
    tol = 2 / 31 if depth == 16 else 1 / 255
    assert d.shape == RGB.shape[:2] and np.allclose(d, RGB.mean(axis=2), atol=tol)


@pytest.mark.parametrize("top_down", [False, True])
def test_rle_roundtrips(top_down):
    assert np.allclose(
        decode_tga_gray(encode_tga_rle(GRAY, top_down=top_down)), GRAY, atol=1 / 255
    )
    assert np.allclose(
        decode_tga_gray(encode_tga_rle(RGB, depth=24, top_down=top_down)),
        RGB.mean(axis=2),
        atol=1 / 255,
    )
    # long runs wrapping across row boundaries (the flat-stream case)
    flat = np.full((3, 9), 0.5)
    flat[1, 4] = 1.0
    assert np.allclose(
        decode_tga_gray(encode_tga_rle(flat, top_down=top_down)), flat, atol=1 / 255
    )


@pytest.mark.parametrize("cmap_bits", [24, 32])
def test_palette_roundtrip(cmap_bits):
    idx = RNG.randint(0, 4, (6, 5)).astype(np.uint8)
    pal = RNG.randint(0, 256, (4, 3)) / 255.0
    d = decode_tga_gray(encode_tga_palette(idx, pal, cmap_bits=cmap_bits))
    exp = np.round(pal * 255).astype(np.uint8)[idx].mean(axis=2) / 255.0
    assert np.allclose(d, exp, atol=1e-6)


def test_right_to_left_bit():
    blob = bytearray(encode_tga(GRAY, top_down=True))
    blob[17] |= 0x10  # descriptor bit 4: right-to-left
    d = decode_tga_gray(bytes(blob))
    assert np.allclose(d, GRAY[:, ::-1], atol=1 / 255)


def test_malformed_inputs_return_none():
    good = encode_tga(GRAY)
    cases = [
        b"",
        b"\x00" * 17,                      # short header
        b"\x00" * 18,                      # zero dimensions
        good[: len(good) - 5],             # truncated pixels
        bytes([0, 0, 7]) + good[3:],       # unknown image type
    ]
    for blob in cases:
        assert decode_tga_gray(blob) is None
    # RLE packet overrun
    rle = bytearray(encode_tga_rle(GRAY))
    rle[18] = 0xFF  # first packet claims a 128-run in a 35-px image
    assert decode_tga_gray(bytes(rle)) is None
    # palette index out of range
    pal_blob = bytearray(encode_tga_palette(np.zeros((2, 2), np.uint8), np.ones((1, 3))))
    pal_blob[-1] = 9
    assert decode_tga_gray(bytes(pal_blob)) is None


def test_spark_end_to_end(spark):
    from polars_dataset_spark.functions import decode_media

    rows = [
        (0, bytearray(encode_tga_rle(RGB, depth=24))),
        (1, bytearray(b"not a tga")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["decoded"] for r in decode_media(df, decoder="tga", target_size=(4, 6)).collect()}
    assert out[1] is None
    got = np.array(out[0]).reshape(4, 6)
    assert np.allclose(got, RGB.mean(axis=2), atol=1 / 255)
