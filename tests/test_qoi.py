"""QOI decoder (functions/qoi.py): full-spec round-trips + Spark e2e."""

import numpy as np
import pytest

from polars_dataset_spark.functions.qoi import decode_qoi_gray, encode_qoi

RNG = np.random.RandomState(5)


def _expect_gray(img):
    return np.round(img[..., :3] * 255).astype(np.uint8).astype(np.float32).mean(axis=2) / 255.0


def test_random_rgb_roundtrip():
    rgb = RNG.randint(0, 256, (13, 17, 3)) / 255.0
    d = decode_qoi_gray(encode_qoi(rgb))
    assert d.shape == (13, 17) and np.allclose(d, _expect_gray(rgb), atol=1e-6)


def test_runs_and_gradients():
    # constant rows force >62-px runs (split packets); the gradient row
    # forces DIFF/LUMA chains
    img = np.zeros((4, 200, 3))
    img[1, :, :] = np.linspace(0, 1, 200)[:, None]
    img[2] = 0.5
    d = decode_qoi_gray(encode_qoi(img))
    assert np.allclose(d, _expect_gray(img), atol=1e-6)


def test_palette_image_exercises_index_op():
    pal = np.array([[0.1, 0.2, 0.3], [0.9, 0.1, 0.5], [0.3, 0.3, 0.3]])
    img = pal[RNG.randint(0, 3, (10, 10))]
    blob = encode_qoi(img)
    # an index-heavy stream is much smaller than raw RGB ops
    # (4 B/px = 400 + 22 container bytes); ~2 B/px proves INDEX fired
    assert len(blob) < 250
    assert np.allclose(decode_qoi_gray(blob), _expect_gray(img), atol=1e-6)


def test_rgba_channel_path():
    rgba = RNG.randint(0, 256, (6, 7, 4)) / 255.0
    d = decode_qoi_gray(encode_qoi(rgba, channels=4))
    assert np.allclose(d, _expect_gray(rgba), atol=1e-6)


def test_malformed():
    good = encode_qoi(RNG.randint(0, 256, (5, 5, 3)) / 255.0)
    assert decode_qoi_gray(b"") is None
    assert decode_qoi_gray(b"qoif" + b"\x00" * 18) is None  # zero dims
    assert decode_qoi_gray(good[:-3]) is None  # broken end marker
    assert decode_qoi_gray(good[:20]) is None  # truncated stream


def test_spark_end_to_end(spark):
    from polars_dataset_spark.functions import decode_media

    rgb = RNG.randint(0, 256, (8, 8, 3)) / 255.0
    df = spark.createDataFrame(
        [(0, bytearray(encode_qoi(rgb))), (1, bytearray(b"junk"))],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r["decoded"] for r in decode_media(df, decoder="qoi", target_size=(8, 8)).collect()}
    assert out[1] is None
    assert np.allclose(np.array(out[0]).reshape(8, 8), _expect_gray(rgb), atol=1e-6)
