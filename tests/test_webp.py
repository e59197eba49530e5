"""WebP-lossless (VP8L) codec tests (functions/webp.py): fixture-encoder
round-trips through every decoder path — plain literals, simple and
zero-bit prefix codes, subtract-green, all 14 predictor modes,
cross-color multipliers, color-indexing with sub-byte bundling, color
cache, LZ77 backrefs via both plain and 2-D plane-code distances, meta
prefix groups — plus malformed inputs, the dimension-bomb guard, and
the decode_media('webp') Spark path. VP8L is lossless, so round-trips
must be bit-exact."""

import time

import numpy as np
import pytest

from polars_dataset_spark.functions.multimodal import decode_media
from polars_dataset_spark.functions.webp import (
    _DIST_MAP,
    _BitWriter,
    decode_webp_gray,
    encode_webp_lossless,
)


def _rt(img: np.ndarray, **kw) -> None:
    blob = encode_webp_lossless(img, **kw)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    out = decode_webp_gray(blob)
    exp = img.astype(np.float32).mean(axis=2) / 255.0
    assert out is not None and out.shape == exp.shape
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_distance_map_matches_spec_table():
    """The generated neighborhood table must reproduce the spec's
    literal (dx, dy) list — pinned for the first 40 entries, 120 total,
    every entry pointing at an already-decoded pixel."""
    spec40 = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert _DIST_MAP[:40] == spec40
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(dy > 0 or dx > 0 for dx, dy in _DIST_MAP)


def test_roundtrip_plain_and_shapes():
    rng = np.random.default_rng(7)
    _rt(rng.integers(0, 256, (13, 17, 3), dtype=np.uint8))
    for h, w in [(1, 1), (1, 40), (40, 1), (8, 8), (31, 5)]:
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([(x * 7) % 256, (y * 13) % 256, (x + y) % 256], axis=2)
        _rt(img.astype(np.uint8))


def test_roundtrip_subtract_green_and_cross_color():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (12, 19, 3), dtype=np.uint8)
    _rt(img, subtract_green=True)
    _rt(img, color_mult=(10, -20, 5))
    _rt(img, color_mult=(-128, 127, -1), color_bits=2)


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_each_predictor_mode(mode):
    rng = np.random.default_rng(100 + mode)
    img = rng.integers(0, 256, (11, 14, 3), dtype=np.uint8)
    _rt(img, predictor=np.full((3, 4), mode), predictor_bits=2)


def test_roundtrip_mixed_predictor_blocks():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    modes = np.arange(16).reshape(4, 4) % 14  # every mode in one image
    _rt(img, predictor=modes, predictor_bits=2)


@pytest.mark.parametrize("n_colors", [2, 4, 16, 200])
def test_roundtrip_palette_bundling(n_colors):
    rng = np.random.default_rng(200 + n_colors)
    idx = rng.integers(0, n_colors, (9, 23), dtype=np.int64)
    lut = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    # force all palette entries present
    idx.flat[:n_colors] = np.arange(n_colors)
    _rt(lut[idx], palette=True)


def test_roundtrip_cache_backrefs_meta_and_solid():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _rt(img, cache_bits=6)
    rep = np.tile(rng.integers(0, 256, (1, 20, 3), dtype=np.uint8), (10, 1, 1))
    _rt(rep, row_backrefs=True)  # dist == width -> plane code (0, 1)
    _rt(img, meta_bits=3)
    solid = np.full((9, 9, 3), 137, dtype=np.uint8)
    _rt(solid)  # zero-bit single-symbol codes
    _rt(solid, row_backrefs=True)  # green alphabet symbol >= 256 forces
    # the code-length-coded form (simple form is 8-bit-symbol-only)


def test_roundtrip_transform_composition():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _rt(img, subtract_green=True, predictor=np.full((4, 5), 2), predictor_bits=2)
    pal = (rng.integers(0, 16, (9, 14, 1), dtype=np.uint8) * 17).repeat(3, axis=2)
    _rt(pal, palette=True, predictor=np.full((3, 2), 1), predictor_bits=2)
    _rt(img, color_mult=(7, 3, -9), subtract_green=True)


def test_fuzz_random_option_combos():
    rng = np.random.default_rng(123)
    for _ in range(25):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw = {}
        if rng.random() < 0.4:
            kw["subtract_green"] = True
        if rng.random() < 0.4:
            kw["cache_bits"] = int(rng.integers(1, 9))
        if rng.random() < 0.4:
            pb = int(rng.integers(2, 5))
            kw["predictor"] = rng.integers(
                0, 14, (-(-h >> pb) or 1, -(-w >> pb) or 1)
            )
            kw["predictor_bits"] = pb
        if rng.random() < 0.3:
            kw["color_mult"] = tuple(int(v) for v in rng.integers(-64, 64, 3))
        _rt(img, **kw)


def test_malformed_blobs_decode_to_none():
    rng = np.random.default_rng(12)
    good = encode_webp_lossless(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    assert decode_webp_gray(b"") is None
    assert decode_webp_gray(b"RIFF") is None
    assert decode_webp_gray(b"not a webp at all") is None
    assert decode_webp_gray(good[:20]) is None  # truncated header
    assert decode_webp_gray(good[:-5]) is None  # truncated bitstream
    assert decode_webp_gray(good[:12] + b"VP8 " + good[16:]) is None  # lossy
    corrupted = bytes(b ^ 0xFF for b in good)
    assert decode_webp_gray(corrupted) is None
    # random noise after a valid signature byte
    noisy = bytearray(good)
    for i in range(25, min(len(noisy), 60)):
        noisy[i] ^= 0xA5
    out = decode_webp_gray(bytes(noisy))
    assert out is None or out.shape == (8, 8)  # clean fail or wrong pixels


def test_huge_declared_dimensions_rejected():
    """A 5-byte blob declaring 16384x16384 must be rejected before the
    per-pixel Python loop runs — same untrusted-blob contract as the
    GIF/PNG decoders."""
    hdr = _BitWriter()
    hdr.write(16383, 14)
    hdr.write(16383, 14)
    hdr.write(0, 1)
    hdr.write(0, 3)
    payload = b"\x2f" + hdr.getvalue() + b"\x00" * 10
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff = b"WEBP" + vp8l
    bomb = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    t0 = time.monotonic()
    assert decode_webp_gray(bomb) is None
    assert time.monotonic() - t0 < 1.0


def test_backref_cannot_escape_decoded_prefix():
    """A hand-built stream whose LZ77 copy reaches before pixel 0 must
    fail cleanly (decoder range check), not read garbage."""
    rng = np.random.default_rng(13)
    rep = np.tile(rng.integers(0, 256, (1, 8, 3), dtype=np.uint8), (4, 1, 1))
    blob = bytearray(encode_webp_lossless(rep, row_backrefs=True))
    # flipping bits in the entropy-coded tail scrambles distances; the
    # decoder must never raise whatever it reads
    for i in range(len(blob) - 6, len(blob)):
        broken = bytearray(blob)
        broken[i] ^= 0x5A
        out = decode_webp_gray(bytes(broken))
        assert out is None or out.shape == (4, 8)


def test_decode_media_webp_end_to_end(spark):
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_webp_lossless(img, subtract_green=True))),
            (2, bytearray(b"garbage")),
        ],
        "id int, content binary",
    )
    got = {
        r.id: r.decoded
        for r in decode_media(df, decoder="webp", target_size=(8, 8)).collect()
    }
    assert got[2] is None
    px = np.array(got[1]).reshape(8, 8)
    exp = img.astype(np.float32).mean(axis=2) / 255.0
    assert px == pytest.approx(exp[::4, ::4], abs=1e-5)
