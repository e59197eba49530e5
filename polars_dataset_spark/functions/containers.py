"""Audio/video CONTAINER header probing — pure arithmetic from public
file-format specs, no entropy decode.

On a real crawl, MP3/MP4/WebM blobs dominate media bytes; their frame
headers and box/element trees carry codec, dimensions, sample rate,
channel count and duration as plain integers/floats, so a 100 TB corpus
can be inventoried (and filtered/bucketed by modality, resolution or
length) without any codec stack (VERDICT r8 #1 — the same
container-side-inventory contract the image prober established).

Formats and the public specs they're parsed from:

- MP3 / MPEG audio: ID3v2.3/2.4 tag skip (syncsafe size) + the 32-bit
  MPEG frame header (ISO/IEC 11172-3 / 13818-3): version, layer,
  bitrate/samplerate table indices, channel mode; duration estimated
  from the CBR frame math (audio bytes × 8 / bitrate).
- OGG (RFC 3533 pages) with Vorbis I identification headers and Opus
  (RFC 7845 ``OpusHead``); duration exact from the LAST page's granule
  position (tail scan, bounded), not a bitrate guess.
- MP4/M4A (ISO/IEC 14496-12 box walk): ``ftyp`` brand, ``mvhd``
  timescale+duration (v0/v1), ``hdlr``-typed ``stsd`` sample entries
  (visual: width/height; audio: channels/samplerate), ``tkhd`` dims as
  fallback.
- WebM/MKV (Matroska EBML): DocType, Info's TimestampScale+Duration,
  Tracks' PixelWidth/PixelHeight/SamplingFrequency/Channels/CodecID.
- WAV (RIFF fmt/data), FLAC (STREAMINFO), AIFF/AIFC (COMM, 80-bit
  extended rate), AU (.snd header), Y4M (stream header + frame count) —
  so the prober's inventory is uniform across everything
  ``decode_audio``/``sample_frames`` already decode (gated=False) and
  the compressed containers they cannot (gated=True).

All parsers return ``None`` on unrecognized/truncated input; the caller
(``probe_media_header``) treats that as "not this format".
"""

from __future__ import annotations

__all__ = ["probe_av_header"]


# ---------------------------------------------------------------- MP3

# bitrate tables in kbps, index 1..14 (0=free, 15=bad); keyed by
# (mpeg1?, layer). MPEG2/2.5 share one table for layers II+III.
_MP3_BITRATES = {
    (True, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {  # version bits -> sample-rate table
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}
_MP3_VERSION_NAME = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}


def _mp3_frame(data: bytes, i: int) -> "dict | None":
    """Parse one MPEG audio frame header at offset i; None if invalid."""
    if i + 4 > len(data) or data[i] != 0xFF or (data[i + 1] & 0xE0) != 0xE0:
        return None
    vbits = (data[i + 1] >> 3) & 3
    lbits = (data[i + 1] >> 1) & 3
    if vbits == 1 or lbits == 0:
        return None
    layer = 4 - lbits  # bits 11/10/01 -> layer 1/2/3
    br_idx = data[i + 2] >> 4
    sr_idx = (data[i + 2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    mpeg1 = vbits == 3
    bitrate = _MP3_BITRATES[(mpeg1, layer)][br_idx] * 1000
    rate = _MP3_RATES[vbits][sr_idx]
    padding = (data[i + 2] >> 1) & 1
    chan_mode = data[i + 3] >> 6
    if layer == 1:
        frame_size = (12 * bitrate // rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and not mpeg1) else 1152
        frame_size = spf * bitrate // (8 * rate) + padding
    return {
        "version": vbits,
        "layer": layer,
        "bitrate": bitrate,
        "rate": rate,
        "channels": 1 if chan_mode == 3 else 2,
        "frame_size": frame_size,
    }


def _probe_mp3(data: bytes) -> "dict | None":
    n = len(data)
    off = 0
    # a valid ID3v2 header is more than the three magic bytes (plain text
    # starting "ID3 is a tagging format…" must NOT classify as audio —
    # r9 review): version major must be 2/3/4 (not 0xFF), revision not
    # 0xFF, the low flag nibble zero, and all four syncsafe size bytes
    # MSB-clear (ID3v2.4 §3.1)
    has_id3 = (
        n >= 10
        and data[:3] == b"ID3"
        and data[3] in (2, 3, 4)
        and data[4] != 0xFF
        and (data[5] & 0x0F) == 0
        and not any(data[i] & 0x80 for i in (6, 7, 8, 9))
    )
    if has_id3:
        size = (
            ((data[6] & 0x7F) << 21)
            | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7)
            | (data[9] & 0x7F)
        )
        off = 10 + size + (10 if data[5] & 0x10 else 0)
    # scan a bounded window for the first valid frame sync; require the
    # header's frame math to land on ANOTHER valid sync (or EOF) so
    # arbitrary 0xFF bytes in non-MP3 blobs don't classify as audio
    limit = min(n - 4, off + 4096)
    i = off
    while i <= limit:
        fr = _mp3_frame(data, i)
        if fr and fr["frame_size"] >= 4:
            nxt = i + fr["frame_size"]
            if nxt >= n - 4 or _mp3_frame(data, nxt):
                mpeg1 = fr["version"] == 3
                spf = (
                    384 if fr["layer"] == 1
                    else 576 if (fr["layer"] == 3 and not mpeg1)
                    else 1152
                )
                mode = f"{_MP3_VERSION_NAME[fr['version']]}_layer{fr['layer']}"
                # VBR headers carry the EXACT frame count — most crawled
                # MP3s are LAME VBR, where a CBR byte estimate is off by
                # the bitrate spread. Xing/Info sits after the first
                # frame's side info; VBRI at a fixed +32 (r9 polish).
                frames = None
                side = (32 if fr["channels"] == 2 else 17) if mpeg1 else (
                    17 if fr["channels"] == 2 else 9
                )
                x = i + 4 + side
                if data[x : x + 4] in (b"Xing", b"Info") and n >= x + 12:
                    if _be(data, x + 4, 4) & 1:  # frames-present flag
                        frames = _be(data, x + 8, 4)
                    if data[x : x + 4] == b"Xing":
                        mode += "_vbr"
                elif data[i + 36 : i + 40] == b"VBRI" and n >= i + 54:
                    frames = _be(data, i + 50, 4)
                    mode += "_vbr"
                if frames:
                    duration = frames * spf / fr["rate"]
                else:
                    # CBR estimate from byte count and first-frame
                    # bitrate — exact for true CBR streams
                    duration = (n - i) * 8.0 / fr["bitrate"]
                return {
                    "fmt": "mp3",
                    "width": None,
                    "height": None,
                    "mode": mode,
                    "gated": True,
                    "sample_rate": fr["rate"],
                    "channels": fr["channels"],
                    "duration_s": duration,
                }
        i += 1
    if has_id3:
        # ID3 tag with no parseable audio yet (tag-only blob)
        return {"fmt": "mp3", "width": None, "height": None, "mode": "id3_only",
                "gated": True, "sample_rate": None, "channels": None,
                "duration_s": None}
    return None


# ---------------------------------------------------------------- OGG


def _le(data: bytes, o: int, w: int) -> int:
    return int.from_bytes(data[o : o + w], "little")


def _be(data: bytes, o: int, w: int) -> int:
    return int.from_bytes(data[o : o + w], "big")


def _ogg_last_granule(data: bytes) -> "int | None":
    """Granule position of the LAST page: scan a bounded tail for the
    final 'OggS' capture. Exact stream length for a complete blob."""
    tail_start = max(0, len(data) - 65536)
    pos = data.rfind(b"OggS", tail_start)
    while pos > 0:
        if len(data) >= pos + 27 and data[pos + 4] == 0:
            g = _le(data, pos + 6, 8)
            if g != (1 << 64) - 1:  # -1 = no packet ends on this page
                return g
        pos = data.rfind(b"OggS", tail_start, pos)
    return None


def _probe_ogg(data: bytes) -> "dict | None":
    n = len(data)
    if n < 28 or data[:4] != b"OggS" or data[4] != 0:
        return None
    nsegs = data[26]
    p = 27 + nsegs  # first packet of the first page
    if p >= n:
        return None
    granule = _ogg_last_granule(data)
    if data[p : p + 7] == b"\x01vorbis" and n >= p + 28:
        rate = _le(data, p + 12, 4)
        return {
            "fmt": "ogg",
            "width": None,
            "height": None,
            "mode": "vorbis",
            "gated": True,
            "sample_rate": rate,
            "channels": data[p + 11],
            "duration_s": (granule / rate) if (granule and rate) else None,
        }
    if data[p : p + 8] == b"OpusHead" and n >= p + 19:
        preskip = _le(data, p + 10, 2)
        dur = None
        if granule is not None and granule >= preskip:
            dur = (granule - preskip) / 48000.0  # granules are ALWAYS 48 kHz
        return {
            "fmt": "ogg",
            "width": None,
            "height": None,
            "mode": "opus",
            "gated": True,
            # Opus decodes at 48 kHz regardless of the recorded input
            # rate (RFC 7845 §5.1) — report the decode rate
            "sample_rate": 48000,
            "channels": data[p + 9],
            "duration_s": dur,
        }
    if data[p : p + 7] == b"\x80theora" and n >= p + 30:
        # Theora spec §6.2: PICW/PICH are 24-bit at +14/+17. Granule-
        # position durations need KFGSHIFT-aware decoding — left None
        # rather than guessed.
        return {"fmt": "ogg", "width": _be(data, p + 14, 3),
                "height": _be(data, p + 17, 3), "mode": "theora",
                "gated": True, "sample_rate": None, "channels": None,
                "duration_s": None}
    return {"fmt": "ogg", "width": None, "height": None, "mode": None,
            "gated": True, "sample_rate": None, "channels": None,
            "duration_s": None}


# ---------------------------------------------------------------- MP4


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in a span."""
    o = start
    while o + 8 <= end:
        size = _be(data, o, 4)
        typ = data[o + 4 : o + 8]
        hdr = 8
        if size == 1:
            if o + 16 > end:
                return
            size = _be(data, o + 8, 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing span
            size = end - o
        if size < hdr or o + size > end:
            return
        yield typ, o + hdr, o + size
        o += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes):
    """First box matching a nested type path; (payload_start, payload_end)."""
    span = (start, end)
    for want in path:
        found = None
        for typ, s, e in _mp4_boxes(data, *span):
            if typ == want:
                found = (s, e)
                break
        if found is None:
            return None
        span = found
    return span


def _probe_mp4(data: bytes) -> "dict | None":
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        return None
    brand = data[8:12]
    out = {
        "fmt": "m4a" if brand in (b"M4A ", b"M4B ") else "mp4",
        "width": None, "height": None, "mode": None, "gated": True,
        "sample_rate": None, "channels": None, "duration_s": None,
    }
    moov = _mp4_find(data, 0, n, b"moov")
    if moov is None:
        return out
    codec_v = codec_a = None
    for typ, s, e in _mp4_boxes(data, *moov):
        if typ == b"mvhd" and e - s >= 24:
            ver = data[s]
            if ver == 1 and e - s >= 32:
                timescale, dur = _be(data, s + 20, 4), _be(data, s + 24, 8)
            else:
                timescale, dur = _be(data, s + 12, 4), _be(data, s + 16, 4)
            if timescale:
                out["duration_s"] = dur / timescale
        elif typ == b"trak":
            hdlr = _mp4_find(data, s, e, b"mdia", b"hdlr")
            handler = data[hdlr[0] + 8 : hdlr[0] + 12] if hdlr else b""
            stsd = _mp4_find(data, s, e, b"mdia", b"minf", b"stbl", b"stsd")
            entry, esize = None, 0
            if stsd and stsd[1] - stsd[0] >= 16:
                es = stsd[0] + 8  # ver/flags + entry_count
                esize = _be(data, es, 4)
                if esize >= 16 and es + esize <= stsd[1]:
                    entry = es
            # field reads are bounded by the ENTRY's declared size, not
            # the stsd span — a truncated first entry must yield None,
            # not bytes of the next entry (r9 review)
            if handler == b"vide" and entry is not None:
                codec_v = data[entry + 4 : entry + 8].decode("latin1").strip()
                if esize >= 36:
                    out["width"] = _be(data, entry + 32, 2)
                    out["height"] = _be(data, entry + 34, 2)
            elif handler == b"soun" and entry is not None:
                codec_a = data[entry + 4 : entry + 8].decode("latin1").strip()
                if esize >= 36:
                    out["channels"] = _be(data, entry + 24, 2)
                    out["sample_rate"] = _be(data, entry + 32, 4) >> 16
            if out["width"] is None:
                tkhd = _mp4_find(data, s, e, b"tkhd")
                if tkhd is not None:
                    ts = tkhd[0]
                    doff = 88 if data[ts] == 1 else 76
                    if ts + doff + 8 <= tkhd[1]:
                        w = _be(data, ts + doff, 4) >> 16
                        h = _be(data, ts + doff + 4, 4) >> 16
                        if w and h:
                            out["width"], out["height"] = w, h
    out["mode"] = codec_v or codec_a
    return out


# ------------------------------------------------------- WebM / MKV


def _ebml_vint(data: bytes, o: int, keep_marker: bool):
    """(value, n_bytes) of the EBML varint at o; None on truncation.
    IDs keep the length-marker bit (matching the spec's element-ID
    constants); sizes strip it. An all-ones size means 'unknown'."""
    if o >= len(data):
        return None
    b = data[o]
    length = next((k + 1 for k in range(8) if b & (0x80 >> k)), None)
    if length is None or o + length > len(data):
        return None
    if keep_marker:
        return _be(data, o, length), length
    val = (b & (0xFF >> length)) * (1 << (8 * (length - 1))) + _be(
        data, o + 1, length - 1
    )
    if val == (1 << (7 * length)) - 1:
        return None, length  # unknown size
    return val, length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) within a master
    element's span; an unknown-size child extends to the span's end."""
    o = start
    while o < end:
        rid = _ebml_vint(data, o, keep_marker=True)
        if rid is None:
            return
        eid, idlen = rid
        rsz = _ebml_vint(data, o + idlen, keep_marker=False)
        if rsz is None:
            return
        size, szlen = rsz
        s = o + idlen + szlen
        e = end if size is None else min(s + size, end)
        yield eid, s, e
        o = e


def _ebml_float(data: bytes, s: int, e: int) -> "float | None":
    import struct

    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    return None


def _probe_ebml(data: bytes) -> "dict | None":
    n = len(data)
    if n < 8 or data[:4] != b"\x1aE\xdf\xa3":
        return None
    out = {
        "fmt": "mkv", "width": None, "height": None, "mode": None,
        "gated": True, "sample_rate": None, "channels": None,
        "duration_s": None,
    }
    ts_scale, dur_units = 1_000_000, None
    codec_v = codec_a = None
    for eid, s, e in _ebml_children(data, 0, n):
        if eid == 0x1A45DFA3:  # EBML header
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == 0x4282:  # DocType
                    doc = data[cs:ce].rstrip(b"\x00").decode("latin1")
                    out["fmt"] = "webm" if doc == "webm" else "mkv"
        elif eid == 0x18538067:  # Segment
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == 0x1549A966:  # Info
                    for iid, is_, ie in _ebml_children(data, cs, ce):
                        if iid == 0x2AD7B1:
                            ts_scale = _be(data, is_, ie - is_)
                        elif iid == 0x4489:
                            dur_units = _ebml_float(data, is_, ie)
                elif cid == 0x1654AE6B:  # Tracks
                    for tid, ts_, te in _ebml_children(data, cs, ce):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        codec = None
                        for fid, fs, fe in _ebml_children(data, ts_, te):
                            if fid == 0x86:
                                codec = (
                                    data[fs:fe].rstrip(b"\x00").decode("latin1")
                                )
                            elif fid == 0xE0:  # Video
                                for vid, vs, ve in _ebml_children(data, fs, fe):
                                    if vid == 0xB0:
                                        out["width"] = _be(data, vs, ve - vs)
                                    elif vid == 0xBA:
                                        out["height"] = _be(data, vs, ve - vs)
                                codec_v = codec_v or codec
                            elif fid == 0xE1:  # Audio
                                for aid, as_, ae in _ebml_children(data, fs, fe):
                                    if aid == 0xB5:
                                        f = _ebml_float(data, as_, ae)
                                        if f:
                                            out["sample_rate"] = int(round(f))
                                    elif aid == 0x9F:
                                        out["channels"] = _be(data, as_, ae - as_)
                                codec_a = codec_a or codec
                        if codec and codec_v is None and codec_a is None:
                            codec_v = codec  # track with no V/A sub-element
                elif cid == 0x1F43B675:  # Cluster: media data starts
                    break
    if dur_units is not None:
        out["duration_s"] = dur_units * ts_scale / 1e9
    out["mode"] = codec_v or codec_a
    return out


# ------------------------------------------------ uncompressed audio

_WAV_TAGS = {1: "pcm", 3: "float", 6: "alaw", 7: "mulaw", 0xFFFE: "extensible"}


def _probe_wav(data: bytes) -> "dict | None":
    n = len(data)
    if n < 36 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    rate = channels = byte_rate = data_size = None
    mode = None
    o = 12
    while o + 8 <= n:
        cid, csz = data[o : o + 4], _le(data, o + 4, 4)
        if cid == b"fmt " and o + 24 <= n:
            tag = _le(data, o + 8, 2)
            channels = _le(data, o + 10, 2)
            rate = _le(data, o + 12, 4)
            byte_rate = _le(data, o + 16, 4)
            mode = _WAV_TAGS.get(tag, f"fmt_{tag}")
        elif cid == b"data":
            data_size = min(csz, n - o - 8)
        o += 8 + csz + (csz & 1)
    if rate is None:
        return None
    dur = (data_size / byte_rate) if (data_size and byte_rate) else None
    return {"fmt": "wav", "width": None, "height": None, "mode": mode,
            "gated": False, "sample_rate": rate, "channels": channels,
            "duration_s": dur}


def _probe_flac(data: bytes) -> "dict | None":
    n = len(data)
    if n < 42 or data[:4] != b"fLaC":
        return None
    o = 4
    while o + 4 <= n:
        btype, blen = data[o] & 0x7F, _be(data, o + 1, 3)
        if btype == 0 and o + 4 + 34 <= n:  # STREAMINFO
            bits = _be(data, o + 4 + 10, 8)
            rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            total = bits & ((1 << 36) - 1)
            return {
                "fmt": "flac", "width": None, "height": None,
                "mode": "lossless", "gated": False, "sample_rate": rate,
                "channels": channels,
                "duration_s": (total / rate) if (rate and total) else None,
            }
        if data[o] & 0x80:  # last-metadata-block flag
            break
        o += 4 + blen
    return None


def _ieee_extended(data: bytes, o: int) -> float:
    """80-bit IEEE 754 extended float (AIFF sample rates)."""
    exp = _be(data, o, 2) & 0x7FFF
    mant = _be(data, o + 2, 8)
    if exp == 0 and mant == 0:
        return 0.0
    return mant * 2.0 ** (exp - 16383 - 63)


def _probe_aiff(data: bytes) -> "dict | None":
    n = len(data)
    if n < 12 or data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        return None
    o = 12
    while o + 8 <= n:
        cid, csz = data[o : o + 4], _be(data, o + 4, 4)
        if cid == b"COMM" and o + 8 + 18 <= n:
            channels = _be(data, o + 8, 2)
            frames = _be(data, o + 10, 4)
            rate = _ieee_extended(data, o + 16)
            return {
                "fmt": "aiff", "width": None, "height": None,
                "mode": "aifc" if data[8:12] == b"AIFC" else "pcm",
                "gated": False,
                "sample_rate": int(round(rate)) if rate else None,
                "channels": channels,
                "duration_s": (frames / rate) if rate else None,
            }
        o += 8 + csz + (csz & 1)
    return None


_AU_WIDTHS = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8, 27: 1}
_AU_NAMES = {1: "mulaw", 2: "pcm8", 3: "pcm16", 4: "pcm24", 5: "pcm32",
             6: "float", 7: "double", 27: "alaw"}


def _probe_au(data: bytes) -> "dict | None":
    n = len(data)
    if n < 24 or data[:4] != b".snd":
        return None
    data_size = _be(data, 8, 4)
    enc = _be(data, 12, 4)
    rate = _be(data, 16, 4)
    channels = _be(data, 20, 4)
    width = _AU_WIDTHS.get(enc)
    dur = None
    if width and rate and channels and data_size != 0xFFFFFFFF:
        dur = data_size / (rate * channels * width)
    return {"fmt": "au", "width": None, "height": None,
            "mode": _AU_NAMES.get(enc, f"enc_{enc}"), "gated": False,
            "sample_rate": rate, "channels": channels, "duration_s": dur}


def _probe_y4m(data: bytes) -> "dict | None":
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fn, fd = 0, 1
    for tok in data[9:nl].split(b" "):
        if not tok:
            continue
        try:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"F" and b":" in tok:
                num, den = tok[1:].split(b":", 1)
                fn, fd = int(num), int(den)
        except ValueError:
            return None
    if not (w and h):
        return None
    # count frames by WALKING frame boundaries, not by substring count —
    # raw YCbCr payload bytes can spell 'FRAME' (r9 review). Frame size
    # follows from the colorspace tag (default C420).
    cs = b"420"
    for tok in data[9:nl].split(b" "):
        if tok[:1] == b"C":
            cs = tok[1:]
    digits = cs[:3]
    if digits == b"444":
        frame_bytes = w * h * 3
    elif digits == b"422":
        frame_bytes = w * h * 2
    elif cs[:4] == b"mono":
        frame_bytes = w * h
    else:  # 420 family (jpeg/paldv/p10 treated as 8-bit 4:2:0 baseline)
        frame_bytes = w * h * 3 // 2
    frames, o = 0, nl + 1
    while data[o : o + 5] == b"FRAME":
        eol = data.find(b"\n", o)
        if eol < 0:
            break
        frames += 1
        o = eol + 1 + frame_bytes
    return {"fmt": "y4m", "width": w, "height": h, "mode": "yuv4mpeg",
            "gated": False, "sample_rate": None, "channels": None,
            "duration_s": (frames * fd / fn) if (frames and fn) else None}


# ------------------------------------------------------------ dispatch

_PROBES = (
    _probe_wav,
    _probe_flac,
    _probe_aiff,
    _probe_au,
    _probe_ogg,
    _probe_mp4,
    _probe_ebml,
    _probe_y4m,
    _probe_mp3,  # LAST: frame-sync scan is the weakest signature
)


def probe_av_header(data: bytes) -> "dict | None":
    """Container metadata for an audio/video blob (see module docstring):
    ``{fmt, width, height, mode, gated, sample_rate, channels,
    duration_s}`` or ``None`` when no container signature matches."""
    if data is None or len(data) < 4:
        return None
    for probe in _PROBES:
        try:
            meta = probe(data)
        except (IndexError, ValueError, OverflowError):
            meta = None
        if meta is not None:
            return meta
    return None
