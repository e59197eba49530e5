"""GIF codec tests (functions/gif.py): literal-LZW encode → variable-
width LZW decode round-trips (sequential and interlaced), malformed
inputs, and the decode_media('gif') Spark path. GIF is lossless for an
8-bit grayscale palette, so round-trips must be exact to quantization."""

import numpy as np
import pytest

from polars_dataset_spark.functions.gif import decode_gif_gray, encode_gif_gray
from polars_dataset_spark.functions.multimodal import decode_media


@pytest.mark.parametrize("interlaced", [False, True])
def test_roundtrip(interlaced):
    rng = np.random.default_rng(3 if interlaced else 4)
    img = rng.random((21, 33)).astype(np.float32)
    blob = encode_gif_gray(img, interlaced=interlaced)
    assert blob[:6] == b"GIF87a" and blob[-1:] == b"\x3b"
    dec = decode_gif_gray(blob)
    assert dec is not None and dec.shape == img.shape
    assert np.abs(dec - img).max() <= 0.5 / 255 + 1e-7


def test_shapes_and_gradient():
    for h, w in [(1, 1), (8, 8), (64, 1), (1, 64), (13, 7), (300, 3)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((x + y) / max(h + w - 2, 1)).astype(np.float32)
        dec = decode_gif_gray(encode_gif_gray(img))
        assert dec is not None and dec.shape == (h, w)
        assert np.abs(dec - img).max() <= 0.5 / 255 + 1e-7


def test_malformed_blobs_decode_to_none():
    assert decode_gif_gray(b"") is None
    assert decode_gif_gray(b"not a gif") is None
    good = encode_gif_gray(np.zeros((8, 8), dtype=np.float32))
    assert decode_gif_gray(good[: len(good) // 2]) is None  # truncated
    # trailer with no image block
    assert decode_gif_gray(good[:13] + good[13 : 13 + 768] + b"\x3b") is None
    # corrupt LZW stream: flip a byte inside the first data sub-block
    broken = bytearray(good)
    broken[13 + 768 + 10 + 1 + 1 + 5] ^= 0xFF
    out = decode_gif_gray(bytes(broken))
    # corruption either fails cleanly or yields a (wrong) frame — never raises
    assert out is None or out.shape == (8, 8)


def test_decode_media_gif_end_to_end(spark):
    rng = np.random.default_rng(6)
    img = rng.random((32, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif_gray(img))), (2, bytearray(b"garbage"))],
        "id int, content binary",
    )
    got = {
        r.id: r.decoded
        for r in decode_media(df, decoder="gif", target_size=(8, 8)).collect()
    }
    assert got[2] is None
    px = np.array(got[1]).reshape(8, 8)
    assert px == pytest.approx(img[::4, ::4], abs=0.5 / 255 + 1e-6)


def test_huge_declared_dimensions_rejected():
    """ADVICE r3: a malformed descriptor declaring 65535x65535 must be
    rejected BEFORE the pure-Python LZW loop runs (would attempt ~4.3G
    indices)."""
    import time

    img = np.zeros((4, 4), dtype=np.float32)
    good = bytearray(encode_gif_gray(img))
    # image descriptor starts after header(13) + GCT(768): 0x2C + 4 coord
    # bytes, then w(2) h(2) little-endian
    desc = 13 + 768
    assert good[desc] == 0x2C
    good[desc + 5 : desc + 7] = (65535).to_bytes(2, "little")
    good[desc + 7 : desc + 9] = (65535).to_bytes(2, "little")
    t0 = time.monotonic()
    assert decode_gif_gray(bytes(good)) is None
    assert time.monotonic() - t0 < 1.0  # fails fast, no LZW stall
