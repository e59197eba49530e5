"""Header-probe tests (r8 VERDICT #6): container-level metadata must be
parseable for the formats whose entropy DECODE is gated (lossy-WebP/VP8,
arithmetic/12-bit JPEG), and agree with the in-repo encoders for the
formats we do decode. Pure-Python — no Spark session needed."""

import struct

import numpy as np
import pytest

from polars_dataset_spark.functions.multimodal import probe_media_header


_AV_NONE = {"sample_rate": None, "channels": None, "duration_s": None}


def _img(expected):
    """probe_media_header returns ONE uniform dict shape (r9): image rows
    carry the audio/video fields as None."""
    return {**expected, **_AV_NONE}


def _vp8_lossy(width: int, height: int, keyframe: bool = True) -> bytes:
    tag = (0 if keyframe else 1) | (3 << 1) | (1 << 4) | (100 << 5)
    payload = tag.to_bytes(3, "little")
    if keyframe:
        payload += b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    else:
        payload += b"\x00" * 7
    return (
        b"RIFF" + (12 + len(payload)).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + len(payload).to_bytes(4, "little") + payload
    )


def test_vp8_lossy_keyframe_dims():
    meta = probe_media_header(_vp8_lossy(1920, 1080))
    assert meta == _img({
        "fmt": "webp_vp8", "width": 1920, "height": 1080,
        "mode": "lossy_key", "gated": True,
    })


def test_vp8_lossy_dims_mask_scaling_bits():
    # the 16-bit fields carry 2 scaling bits above the 14-bit dimension
    blob = _vp8_lossy(0x3FFF | (2 << 14) & 0xFFFF, 16)
    raw = bytearray(_vp8_lossy(100, 16))
    raw[26] = 0xFF
    raw[27] = 0xBF  # width word 0xBFFF: scale 2, width 0x3FFF
    meta = probe_media_header(bytes(raw))
    assert meta["width"] == 0x3FFF


def test_vp8_interframe_has_no_dims():
    meta = probe_media_header(_vp8_lossy(0, 0, keyframe=False))
    assert meta["fmt"] == "webp_vp8"
    assert meta["width"] is None and meta["gated"] is True


def test_vp8x_canvas_dims():
    payload = bytes([0x10, 0, 0, 0]) + (4095).to_bytes(3, "little") + (2159).to_bytes(3, "little")
    blob = (
        b"RIFF" + (12 + len(payload)).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + len(payload).to_bytes(4, "little") + payload
    )
    meta = probe_media_header(blob)
    assert (meta["fmt"], meta["width"], meta["height"]) == ("webp_vp8x", 4096, 2160)
    assert meta["gated"] is True


def test_vp8l_matches_own_encoder():
    from polars_dataset_spark.functions.webp import encode_webp_lossless

    img = np.stack([(np.arange(35, dtype=np.float64).reshape(5, 7) % 256) / 255.0] * 3, axis=-1)
    meta = probe_media_header(encode_webp_lossless(img))
    assert (meta["fmt"], meta["width"], meta["height"]) == ("webp_vp8l", 7, 5)
    assert meta["gated"] is False


def _jpeg_sof(marker: int, precision: int, width: int, height: int) -> bytes:
    seg = bytes([precision]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([1, 0x11, 0, 0x11])
    # realistic prefix: APP0 before the SOF, as encoders emit
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    return b"\xff\xd8" + app0 + bytes([0xFF, marker]) + (2 + len(seg)).to_bytes(2, "big") + seg


@pytest.mark.parametrize(
    "marker,precision,mode,gated",
    [
        (0xC0, 8, "baseline", False),
        (0xC2, 8, "progressive", False),
        (0xC9, 8, "arith_sequential", True),
        (0xCA, 8, "arith_progressive", True),
        (0xC1, 12, "extended_sequential_p12", True),
        (0xC0, 12, "baseline_p12", True),
        (0xC3, 8, "lossless", True),
    ],
)
def test_jpeg_sof_modes(marker, precision, mode, gated):
    meta = probe_media_header(_jpeg_sof(marker, precision, 640, 480))
    assert meta == _img({
        "fmt": "jpeg", "width": 640, "height": 480, "mode": mode, "gated": gated,
    })


def test_jpeg_matches_own_encoder():
    from polars_dataset_spark.functions.jpeg import encode_jpeg_gray

    img = (np.arange(16 * 24, dtype=np.float64).reshape(16, 24) % 256) / 255.0
    meta = probe_media_header(encode_jpeg_gray(img))
    assert (meta["fmt"], meta["width"], meta["height"]) == ("jpeg", 24, 16)
    assert meta["gated"] is False


def test_png_gif_qoi_bmp_ppm_tiff_match_encoders():
    from polars_dataset_spark.functions.gif import encode_gif_gray
    from polars_dataset_spark.functions.png import encode_png_gray
    from polars_dataset_spark.functions.qoi import encode_qoi
    from polars_dataset_spark.functions.tiff import encode_tiff_gray

    img = (np.arange(6 * 9, dtype=np.float64).reshape(6, 9) % 256) / 255.0
    rgb = np.stack([(img * 255).astype(np.uint8)] * 3, axis=-1)
    for enc, fmt in [
        (encode_png_gray, "png"),
        (encode_gif_gray, "gif"),
        (lambda g: encode_qoi(rgb), "qoi"),
        (encode_tiff_gray, "tiff"),
    ]:
        meta = probe_media_header(enc(img))
        assert (meta["fmt"], meta["width"], meta["height"]) == (fmt, 9, 6), fmt
        assert meta["gated"] is False
    ppm = b"P5\n# c\n9 6\n255\n" + bytes(54)
    meta = probe_media_header(ppm)
    assert (meta["fmt"], meta["width"], meta["height"]) == ("ppm", 9, 6)


def test_junk_and_truncated_return_none():
    assert probe_media_header(b"") is None
    assert probe_media_header(b"hello world, not media") is None
    assert probe_media_header(None) is None
    assert probe_media_header(_vp8_lossy(64, 64)[:15]) is None
    assert probe_media_header(b"\xff\xd8\xff\xda\x00\x02") is None  # SOS, no SOF
