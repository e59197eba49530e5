"""Exif extraction (functions/exif): spec-exact fixtures in both byte
orders, bounds-hostile truncations, and the Spark map-only probe."""

import struct

from polars_dataset_spark.functions.exif import exif_probe, parse_exif
from polars_dataset_spark.suite import _exif_jpeg_fixture


def test_parse_both_endians_agree():
    le = parse_exif(_exif_jpeg_fixture(little=True))
    be = parse_exif(_exif_jpeg_fixture(little=False))
    assert le == be
    assert le["make"] == "ACME" and le["model"] == "Cam9000"
    assert le["orientation"] == 6
    assert le["datetime_original"] == "2023:05:17 10:20:30"
    assert abs(le["gps_lat"] - 37.775) < 1e-9
    assert abs(le["gps_lon"] - (-122.41916666666667)) < 1e-9


def test_parse_gps_absent():
    info = parse_exif(_exif_jpeg_fixture(little=True, gps=False))
    assert info["gps_lat"] is None and info["gps_lon"] is None
    assert info["make"] == "ACME"


def test_parse_bare_tiff():
    jpg = _exif_jpeg_fixture(little=True)
    app1 = jpg.index(b"Exif\x00\x00")
    tiff = jpg[app1 + 6 : -2]
    info = parse_exif(tiff)
    assert info is not None and info["orientation"] == 6


def test_datetime_fallback_to_ifd0():
    """Without an Exif IFD, DateTime (0x0132) stands in."""
    e = "<"

    def entry(tag, typ, cnt, val4):
        return struct.pack(e + "HHI", tag, typ, cnt) + val4

    dt = b"2020:01:02 03:04:05\x00"
    off_dt = 8 + 2 + 12 + 4
    ifd0 = (
        struct.pack(e + "H", 1)
        + entry(0x0132, 2, len(dt), struct.pack(e + "I", off_dt))
        + struct.pack(e + "I", 0)
    )
    tiff = b"II*\x00" + struct.pack(e + "I", 8) + ifd0 + dt
    info = parse_exif(tiff)
    assert info["datetime_original"] == "2020:01:02 03:04:05"


def test_parse_hostile_inputs():
    assert parse_exif(b"") is None
    assert parse_exif(b"garbage bytes") is None
    assert parse_exif(b"\xff\xd8\xff\xd9") is None  # JPEG, no APP1
    assert parse_exif(b"II*\x00") is None  # truncated TIFF header
    # IFD0 offset pointing past the blob
    assert parse_exif(b"II*\x00" + struct.pack("<I", 10_000)) is None
    # APP1 that claims Exif but truncates mid-IFD: every read is
    # bounds-checked, so this must return None/partial, never raise
    jpg = _exif_jpeg_fixture(little=True)
    for cut in (6, 14, 20, 40, 60):
        app1 = jpg.index(b"Exif\x00\x00")
        truncated = jpg[: app1 + cut]
        parse_exif(truncated)  # must not raise


def test_wrong_magic_and_entry_types():
    """A TIFF whose magic is not 42, and entries with absurd counts,
    are rejected / skipped."""
    assert parse_exif(b"II+\x00" + struct.pack("<I", 8)) is None
    e = "<"
    huge = struct.pack(e + "HHI", 0x010F, 2, 1 << 21) + struct.pack(e + "I", 8)
    tiff = b"II*\x00" + struct.pack(e + "I", 8) + struct.pack(e + "H", 1) + huge + struct.pack(e + "I", 0)
    info = parse_exif(tiff)
    assert info is not None and info["make"] is None


def test_exif_probe_spark(spark):
    rows = [
        (0, bytearray(_exif_jpeg_fixture(little=True))),
        (1, bytearray(b"no exif here")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in exif_probe(df).collect()}
    assert got[0].make == "ACME" and got[0].orientation == 6
    assert got[1].make is None and got[1].gps_lat is None
    assert got[2].make is None
