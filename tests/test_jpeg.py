"""Baseline-JPEG codec tests (functions/jpeg.py): pure-numpy encode →
decode round-trips (the encoder and decoder share only the constant
tables, so a round-trip exercises both directions of T.81 baseline),
malformed-input behavior, and the decode_media('jpeg') Spark path."""

import numpy as np
import pytest

from polars_dataset_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg_gray
from polars_dataset_spark.functions.multimodal import decode_media


def _roundtrip(img: np.ndarray) -> np.ndarray:
    blob = encode_jpeg_gray(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    dec = decode_jpeg_gray(blob)
    assert dec is not None
    assert dec.shape == img.shape
    return dec


def test_roundtrip_random():
    rng = np.random.default_rng(7)
    img = rng.random((37, 53)).astype(np.float32)
    dec = _roundtrip(img)
    # flat quant table -> only DCT rounding error (~1.5/255)
    assert np.abs(dec - img).max() < 0.01


def test_roundtrip_gradient_and_extremes():
    # smooth gradient + saturated rows; 8x8-aligned and unaligned dims
    for h, w in [(8, 8), (16, 24), (9, 13), (64, 1)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((x + y) / max(h + w - 2, 1)).astype(np.float32)
        img[0, :] = 0.0
        img[-1, :] = 1.0
        dec = _roundtrip(img)
        assert np.abs(dec - img).max() < 0.01


def test_roundtrip_constant_image():
    # DC-only blocks: every AC coefficient zero -> pure EOB path
    img = np.full((24, 16), 0.5, dtype=np.float32)
    dec = _roundtrip(img)
    assert np.abs(dec - img).max() < 0.005


def test_malformed_blobs_decode_to_none():
    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(b"not a jpeg at all") is None
    assert decode_jpeg_gray(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no scan
    blob = bytearray(encode_jpeg_gray(np.zeros((16, 16), dtype=np.float32)))
    assert decode_jpeg_gray(bytes(blob[: len(blob) // 2])) is None  # truncated


def test_decode_media_jpeg_end_to_end(spark):
    rng = np.random.default_rng(11)
    img = rng.random((32, 32)).astype(np.float32)
    blob = encode_jpeg_gray(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"garbage"))], "id int, content binary"
    )
    got = {
        r.id: r.decoded
        for r in decode_media(df, decoder="jpeg", target_size=(8, 8)).collect()
    }
    assert got[2] is None
    px = np.array(got[1]).reshape(8, 8)
    # nearest-neighbor 32->8 picks pixel (4i, 4j)
    expect = img[::4, ::4]
    assert px == pytest.approx(expect, abs=0.01)
