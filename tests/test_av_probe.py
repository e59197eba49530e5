"""Unit tests for the audio/video container probers (r9, VERDICT r8 #1):
every fixture is hand-built from the public spec byte-for-byte, so each
expected value is closed-form arithmetic, not a decoder comparison."""

import struct

import pytest

from polars_dataset_spark.functions import probe_av_header, probe_media_header


# ---------------------------------------------------------------- builders


def mp3_bytes(n_frames=38, id3_size=None):
    """MPEG1 Layer III, 128 kbps CBR, 44100 Hz, stereo.
    Frame header ff fb 90 00; frame size = 1152*128000/(8*44100) = 417."""
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    body = frame * n_frames
    if id3_size is None:
        return body
    tag = (
        b"ID3\x04\x00\x00"
        + bytes(
            [
                (id3_size >> 21) & 0x7F,
                (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F,
                id3_size & 0x7F,
            ]
        )
        + b"\x00" * id3_size
    )
    return tag + body


def ogg_page(header_type, granule, seq, payload, serial=7):
    assert len(payload) <= 255
    return (
        b"OggS\x00"
        + bytes([header_type])
        + granule.to_bytes(8, "little")
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00" * 4  # CRC not verified by the prober
        + bytes([1, len(payload)])
        + payload
    )


def ogg_vorbis_bytes(rate=44100, channels=2, last_granule=88200):
    ident = (
        b"\x01vorbis"
        + (0).to_bytes(4, "little")
        + bytes([channels])
        + rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (128000).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + b"\xb8\x01"
    )
    return (
        ogg_page(2, 0, 0, ident)
        + ogg_page(0, 0, 1, b"\x03vorbis comment")
        + ogg_page(4, last_granule, 2, b"\x00" * 10)
    )


def ogg_opus_bytes(channels=2, preskip=312, last_granule=96312):
    head = (
        b"OpusHead\x01"
        + bytes([channels])
        + preskip.to_bytes(2, "little")
        + (48000).to_bytes(4, "little")
        + (0).to_bytes(2, "little")
        + b"\x00"
    )
    return (
        ogg_page(2, 0, 0, head)
        + ogg_page(4, last_granule, 1, b"\x00" * 10)
    )


def _box(t, payload):
    return struct.pack(">I", 8 + len(payload)) + t + payload


def mp4_bytes(timescale=1000, duration=2500, w=640, h=360, mvhd_v1=False):
    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomavc1")
    if mvhd_v1:
        mvhd = _box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration) + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80,
        )
    tkhd = _box(b"tkhd", b"\x00" * 76 + struct.pack(">II", w << 16, h << 16))
    avc1 = (
        struct.pack(">I", 86) + b"avc1"
        + b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + b"\x00" * 50
    )
    stsd_v = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + avc1)
    hdlr_v = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
    mdia_v = _box(
        b"mdia", hdlr_v + _box(b"minf", _box(b"stbl", stsd_v))
    )
    trak_v = _box(b"trak", tkhd + mdia_v)
    mp4a = (
        struct.pack(">I", 36) + b"mp4a"
        + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8  # reserved
        + struct.pack(">HH", 2, 16)  # channels, samplesize
        + b"\x00" * 4  # pre_defined + reserved
        + struct.pack(">I", 44100 << 16)
    )
    stsd_a = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + mp4a)
    hdlr_a = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 13)
    mdia_a = _box(
        b"mdia", hdlr_a + _box(b"minf", _box(b"stbl", stsd_a))
    )
    trak_a = _box(b"trak", mdia_a)
    return ftyp + _box(b"moov", mvhd + trak_v + trak_a)


def _eid(i):
    return i.to_bytes((i.bit_length() + 7) // 8, "big")


def _esz(n):
    if n < 127:
        return bytes([0x80 | n])
    return struct.pack(">H", 0x4000 | n)


def _el(eid, payload):
    return _eid(eid) + _esz(len(payload)) + payload


def webm_bytes(doc=b"webm", unknown_segment_size=False, duration=1500.0):
    hdr = _el(0x1A45DFA3, _el(0x4282, doc))
    info = _el(
        0x1549A966,
        _el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        + _el(0x4489, struct.pack(">f", duration)),
    )
    video = _el(0xE0, _el(0xB0, (1280).to_bytes(2, "big"))
                + _el(0xBA, (720).to_bytes(2, "big")))
    trk_v = _el(0xAE, _el(0x83, b"\x01") + _el(0x86, b"V_VP9") + video)
    audio = _el(0xE1, _el(0xB5, struct.pack(">f", 48000.0)) + _el(0x9F, b"\x02"))
    trk_a = _el(0xAE, _el(0x83, b"\x02") + _el(0x86, b"A_OPUS") + audio)
    body = info + _el(0x1654AE6B, trk_v + trk_a)
    if unknown_segment_size:
        return hdr + _eid(0x18538067) + b"\xff" + body
    return hdr + _el(0x18538067, body)


def wav_bytes(rate=44100, channels=2, seconds=1.0, tag=1):
    byte_rate = rate * channels * 2
    nd = int(byte_rate * seconds)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", tag, channels, rate, byte_rate, channels * 2, 16
    )
    dat = b"data" + struct.pack("<I", nd) + b"\x00" * nd
    return b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(dat)) + b"WAVE" + fmt + dat


def flac_bytes(rate=44100, channels=2, total=88200):
    packed = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | total
    streaminfo = (
        struct.pack(">HH", 1024, 1024) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo


def _ieee80(v):
    import math

    m, e = math.frexp(v)  # v = m * 2**e, 0.5 <= m < 1
    return struct.pack(">H", 16382 + e) + int(m * (1 << 64)).to_bytes(8, "big")


def aiff_bytes(rate=44100.0, channels=1, frames=22050):
    comm = (
        b"COMM" + struct.pack(">I", 18)
        + struct.pack(">HIH", channels, frames, 16) + _ieee80(rate)
    )
    return b"FORM" + struct.pack(">I", 4 + len(comm)) + b"AIFF" + comm


def au_bytes(rate=8000, channels=1, data_size=16000, enc=1):
    return b".snd" + struct.pack(">IIIII", 24, data_size, enc, rate, channels)


def y4m_bytes(w=320, h=240, fn=25, fd=1, frames=3):
    hdr = f"YUV4MPEG2 W{w} H{h} F{fn}:{fd} Ip A1:1 C420\n".encode()
    frame = b"FRAME\n" + b"\x00" * (w * h * 3 // 2)
    return hdr + frame * frames


# ------------------------------------------------------------------ tests


def test_mp3_cbr_no_tag():
    m = probe_av_header(mp3_bytes())
    assert m["fmt"] == "mp3" and m["mode"] == "mpeg1_layer3"
    assert m["sample_rate"] == 44100 and m["channels"] == 2 and m["gated"]
    assert m["duration_s"] == pytest.approx(38 * 417 * 8 / 128000)


def test_mp3_id3v2_skip():
    m = probe_av_header(mp3_bytes(id3_size=257))
    assert m["fmt"] == "mp3" and m["sample_rate"] == 44100
    # tag bytes excluded from the duration estimate
    assert m["duration_s"] == pytest.approx(38 * 417 * 8 / 128000)


def test_mp3_mono_mpeg2():
    # MPEG2 Layer III 64kbps 22050 mono: ff f3 80 c0
    # frame = 576*64000/(8*22050) = 209
    frame = b"\xff\xf3\x80\xc0" + b"\x00" * 205
    m = probe_av_header(frame * 10)
    assert m["mode"] == "mpeg2_layer3" and m["sample_rate"] == 22050
    assert m["channels"] == 1


def test_mp3_rejects_stray_sync_in_noise():
    # a stray 0xFF + plausible second byte but frame math lands on junk
    junk = b"ab\xff\xfb\x90\x00" + b"Q" * 2000 + b"\xff\x00" + b"R" * 500
    assert probe_av_header(junk) is None


def test_ogg_vorbis():
    m = probe_av_header(ogg_vorbis_bytes())
    assert m["fmt"] == "ogg" and m["mode"] == "vorbis" and m["gated"]
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(2.0)


def test_ogg_opus_preskip():
    m = probe_av_header(ogg_opus_bytes())
    assert m["mode"] == "opus" and m["sample_rate"] == 48000
    assert m["duration_s"] == pytest.approx(2.0)


def test_mp4_v0():
    m = probe_av_header(mp4_bytes())
    assert m["fmt"] == "mp4" and m["mode"] == "avc1" and m["gated"]
    assert (m["width"], m["height"]) == (640, 360)
    assert m["duration_s"] == pytest.approx(2.5)
    assert m["sample_rate"] == 44100 and m["channels"] == 2


def test_mp4_mvhd_v1():
    m = probe_av_header(mp4_bytes(timescale=90000, duration=450000, mvhd_v1=True))
    assert m["duration_s"] == pytest.approx(5.0)


def test_webm():
    m = probe_av_header(webm_bytes())
    assert m["fmt"] == "webm" and m["mode"] == "V_VP9" and m["gated"]
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["sample_rate"] == 48000 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(1.5)


def test_mkv_unknown_segment_size():
    m = probe_av_header(webm_bytes(doc=b"matroska", unknown_segment_size=True))
    assert m["fmt"] == "mkv" and (m["width"], m["height"]) == (1280, 720)


def test_wav():
    m = probe_av_header(wav_bytes())
    assert m["fmt"] == "wav" and m["mode"] == "pcm" and not m["gated"]
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(1.0)


def test_flac_streaminfo():
    m = probe_av_header(flac_bytes())
    assert m["fmt"] == "flac" and not m["gated"]
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(2.0)


def test_aiff_extended_rate():
    m = probe_av_header(aiff_bytes())
    assert m["fmt"] == "aiff" and m["sample_rate"] == 44100
    assert m["channels"] == 1 and m["duration_s"] == pytest.approx(0.5)


def test_au_mulaw():
    m = probe_av_header(au_bytes())
    assert m["fmt"] == "au" and m["mode"] == "mulaw" and not m["gated"]
    assert m["duration_s"] == pytest.approx(2.0)


def test_y4m_header_and_frame_count():
    m = probe_av_header(y4m_bytes())
    assert m["fmt"] == "y4m" and (m["width"], m["height"]) == (320, 240)
    assert m["duration_s"] == pytest.approx(3 / 25)


def test_dispatch_from_probe_media_header():
    # probe_media_header falls through to the AV probers…
    m = probe_media_header(wav_bytes())
    assert m["fmt"] == "wav"
    # …and image blobs still probe as images (no AV misfire on RIFF/WEBP),
    # with the UNIFORM dict shape: audio fields present and None
    vp8l_sig = b"RIFF" + b"\x0c\x00\x00\x00" + b"WEBP" + b"VP8L" + b"\x05\x00\x00\x00" + b"\x2f" + (8 | (7 << 14)).to_bytes(4, "little")
    img = probe_media_header(vp8l_sig)
    assert img["fmt"] == "webp_vp8l"
    assert img["sample_rate"] is None and img["duration_s"] is None


def test_junk_stays_unrecognized():
    assert probe_av_header(b"not a media blob") is None
    assert probe_av_header(b"\x00" * 100) is None
    assert probe_av_header(None) is None
    assert probe_av_header(b"Og") is None


def test_id3_prefix_prose_not_audio():
    # plain text starting with the three magic bytes must NOT classify
    # (r9 review): version byte ' ' (0x20) is not an ID3v2 version
    assert probe_av_header(b"ID3 is a tagging format used by mp3 files") is None
    # a REAL tag header with no audio frames still reports id3_only
    tag_only = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    m = probe_av_header(tag_only)
    assert m["fmt"] == "mp3" and m["mode"] == "id3_only"


def test_y4m_frame_in_payload_not_counted():
    # pixel bytes spelling 'FRAME' must not inflate the frame count
    hdr = b"YUV4MPEG2 W4 H4 F25:1 C420\n"
    payload = b"FRAME" + b"\x00" * 19  # 4*4*3//2 = 24 bytes
    blob = hdr + b"FRAME\n" + payload
    m = probe_av_header(blob)
    assert m["duration_s"] == pytest.approx(1 / 25)


def test_mp4_truncated_sample_entry_no_garbage_dims():
    # a 16-byte first stsd entry followed by another entry: fields must
    # be None, never read from the NEXT entry's bytes (r9 review)
    short = struct.pack(">I", 16) + b"avc1" + b"\x00" * 8
    second = struct.pack(">I", 86) + b"avc9" + b"\x00" * 78
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 2) + short + second)
    trak = _box(
        b"trak",
        _box(b"mdia",
             _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
             + _box(b"minf", _box(b"stbl", stsd))),
    )
    blob = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"moov", trak)
    m = probe_av_header(blob)
    assert m["fmt"] == "mp4" and m["mode"] == "avc1"
    assert m["width"] is None and m["height"] is None


def test_mp3_xing_exact_vbr_duration():
    # Xing frame count overrides the CBR byte estimate: MPEG1 L3 stereo,
    # side info 32 -> tag at frame+36; flags bit0 set, 77 frames
    first = bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 413)
    first[36:40] = b"Xing"
    first[40:44] = (1).to_bytes(4, "big")
    first[44:48] = (77).to_bytes(4, "big")
    blob = bytes(first) + (b"\xff\xfb\x90\x00" + b"\x00" * 413) * 3
    m = probe_av_header(blob)
    assert m["mode"] == "mpeg1_layer3_vbr"
    assert m["duration_s"] == pytest.approx(77 * 1152 / 44100)


def test_mp3_info_tag_stays_cbr_mode():
    first = bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 413)
    first[36:40] = b"Info"
    first[40:44] = (1).to_bytes(4, "big")
    first[44:48] = (38).to_bytes(4, "big")
    m = probe_av_header(bytes(first) + (b"\xff\xfb\x90\x00" + b"\x00" * 413) * 2)
    assert m["mode"] == "mpeg1_layer3"  # Info = LAME CBR marker
    assert m["duration_s"] == pytest.approx(38 * 1152 / 44100)


def test_mp3_vbri_frame_count():
    first = bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 413)
    first[36:40] = b"VBRI"
    first[40:42] = (1).to_bytes(2, "big")   # version
    first[46:50] = (99999).to_bytes(4, "big")  # byte count
    first[50:54] = (50).to_bytes(4, "big")     # frames
    m = probe_av_header(bytes(first) + (b"\xff\xfb\x90\x00" + b"\x00" * 413) * 2)
    assert m["mode"] == "mpeg1_layer3_vbr"
    assert m["duration_s"] == pytest.approx(50 * 1152 / 44100)


def test_ogg_theora_dims():
    ident = (
        b"\x80theora" + bytes([3, 2, 1])
        + (40).to_bytes(2, "big") + (30).to_bytes(2, "big")  # FMBW/FMBH
        + (640).to_bytes(3, "big") + (480).to_bytes(3, "big")  # PICW/PICH
        + bytes([0, 0])
        + (25).to_bytes(4, "big") + (1).to_bytes(4, "big")  # FRN/FRD
    )
    m = probe_av_header(ogg_page(2, 0, 0, ident))
    assert m["fmt"] == "ogg" and m["mode"] == "theora"
    assert (m["width"], m["height"]) == (640, 480)
