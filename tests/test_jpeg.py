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


# --------------------------------------------------------------------------
# progressive (SOF2) decode
# --------------------------------------------------------------------------

from polars_dataset_spark.functions.jpeg import (  # noqa: E402
    encode_jpeg_gray_progressive,
)

_SCRIPTS = {
    # spectral selection only (no successive approximation)
    "spectral": [(0, 0, 0, 0), (1, 10, 0, 0), (11, 63, 0, 0)],
    # default: SA pairs for DC and two AC bands
    "default": None,
    # deep successive approximation (two refinement levels)
    "deep_sa": [
        (0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
        (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0),
    ],
    # one wide AC band, no SA
    "single_band": [(0, 0, 0, 0), (1, 63, 0, 0)],
}


@pytest.mark.parametrize("script", sorted(_SCRIPTS))
def test_progressive_roundtrip_matches_baseline(script):
    """Every scan shape must reconstruct the EXACT coefficients the
    baseline stream carries (same blocks, same flat quantisation), so
    the decoded planes agree to float32 rounding."""
    rng = np.random.default_rng(29)
    img = rng.random((24, 33)).astype(np.float32)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    kwargs = {} if _SCRIPTS[script] is None else {"scans": _SCRIPTS[script]}
    blob = encode_jpeg_gray_progressive(img, **kwargs)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    dec = decode_jpeg_gray(blob)
    assert dec is not None and dec.shape == img.shape
    assert np.abs(dec.astype(np.float64) - base.astype(np.float64)).max() < 1e-6


def test_progressive_with_restart_markers():
    rng = np.random.default_rng(31)
    img = rng.random((24, 24)).astype(np.float32)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    dec = decode_jpeg_gray(encode_jpeg_gray_progressive(img, restart_interval=3))
    assert dec is not None
    assert np.abs(dec.astype(np.float64) - base.astype(np.float64)).max() < 1e-6


def test_progressive_constant_and_extreme_shapes():
    for h, w in [(8, 8), (9, 13), (64, 1), (1, 64), (16, 24)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((x + y) / max(h + w - 2, 1)).astype(np.float32)
        dec = decode_jpeg_gray(encode_jpeg_gray_progressive(img))
        assert dec is not None and dec.shape == (h, w)
        assert np.abs(dec - img).max() < 0.01
    # all-zero AC: the EOB-run path covers whole scans
    flat = np.full((24, 16), 0.5, dtype=np.float32)
    dec = decode_jpeg_gray(encode_jpeg_gray_progressive(flat))
    assert dec is not None and np.abs(dec - flat).max() < 0.005


def test_progressive_malformed_to_none():
    img = np.full((16, 16), 0.25, dtype=np.float32)
    blob = bytearray(encode_jpeg_gray_progressive(img))
    assert decode_jpeg_gray(bytes(blob[: len(blob) * 2 // 3])) is None  # truncated
    # progressive stream with NO scans at all (headers then EOI)
    sos = bytes(blob).find(b"\xff\xda")
    assert decode_jpeg_gray(bytes(blob[:sos]) + b"\xff\xd9") is None


def test_decode_media_progressive_jpeg_end_to_end(spark):
    rng = np.random.default_rng(13)
    img = rng.random((32, 32)).astype(np.float32)
    blob = encode_jpeg_gray_progressive(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"nope"))], "id int, content binary"
    )
    got = {
        r.id: r.decoded
        for r in decode_media(df, decoder="jpeg", target_size=(8, 8)).collect()
    }
    assert got[2] is None
    px = np.array(got[1]).reshape(8, 8)
    assert px == pytest.approx(img[::4, ::4], abs=0.02)


def test_progressive_three_component_interleaved_dc():
    """Real-world progressive color JPEGs open with an interleaved DC
    scan over all components (luma at 2x2 sampling => 4 luma blocks per
    MCU in block-raster order) followed by per-component AC scans. Hand-
    build one from the spec: a blockwise-constant 32x16 image (every 8x8
    block one value => DC-only, flat quant table, DC coefficient = 8*(v-128)),
    chroma scans carried as zero diffs / pure EOB runs."""
    from polars_dataset_spark.functions.jpeg import (
        _BitWriter,
        _enc_table,
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _size_of,
    )

    h, w = 16, 32  # hmax=vmax=2 -> exactly 1x2 MCUs, no padding blocks
    rng = np.random.default_rng(17)
    block_vals = rng.integers(40, 216, size=(h // 8, w // 8))
    img = np.repeat(np.repeat(block_vals, 8, axis=0), 8, axis=1).astype(np.uint8)

    dc_enc = _enc_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _enc_table(_ENC_AC_BITS, _ENC_AC_VALS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    # SOF2: Y id=1 sampling 2x2, Cb id=2 1x1, Cr id=3 1x1, all qtable 0
    out += seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)

    # interleaved DC scan (Ah=0, Al=0) over 2 MCUs
    wtr = _BitWriter()

    def put_diff(diff):
        s = _size_of(diff)
        ln, code = dc_enc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    pred = {1: 0, 2: 0, 3: 0}
    for mx in range(2):  # mcuy=1, mcux=2
        for by in range(2):  # luma 2x2 blocks, raster within MCU
            for bx in range(2):
                val = 8 * (int(block_vals[by, mx * 2 + bx]) - 128)
                put_diff(val - pred[1])
                pred[1] = val
        put_diff(0 - pred[2])  # chroma DC: encode a real diff to zero
        pred[2] = 0
        put_diff(0 - pred[3])
        pred[3] = 0
    wtr.flush()
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00]))
    out += wtr.out

    # per-component AC scans, each one EOB-run covering all 8 (luma) or
    # 2 (chroma) blocks of that component's own grid
    for cid, nblocks in [(1, 8), (2, 2), (3, 2)]:
        wtr = _BitWriter()
        nbits = nblocks.bit_length() - 1
        ln, code = ac_enc[nbits << 4]
        wtr.write(code, ln)
        if nbits:
            wtr.write(nblocks - (1 << nbits), nbits)
        wtr.flush()
        out += seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x00]))
        out += wtr.out
    out += b"\xff\xd9"

    dec = decode_jpeg_gray(bytes(out))
    assert dec is not None and dec.shape == (h, w)
    assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 0.005
