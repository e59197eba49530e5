"""PDF LZWDecode (functions/pdf._lzw_decode, r11 — ISO 32000
§7.4.4.2): round-trip against an in-repo spec encoder (variable 9-12
bit codes, clear/EOD, EarlyChange), the KwKwK corner, hostile bytes,
and the content-stream path end-to-end."""

import pytest

from polars_dataset_spark.functions.pdf import _lzw_decode, extract_pdf_text
from polars_dataset_spark.suite import _pdf_text_fixture


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Spec LZW encoder with decoder-synced variable widths — test
    fixture generator, mirrors what classic PDF writers emitted."""
    syms = [256]
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            syms.append(table[w])
            if next_code == 4096:  # table full: spec says emit Clear
                syms.append(256)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
            else:
                table[wc] = next_code
                next_code += 1
            w = bytes([ch])
    if w:
        syms.append(table[w])
    syms.append(257)
    out = bytearray()
    acc = nbits = 0
    dec_size, width, first_data = 258, 9, True
    for code in syms:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == 256:
            dec_size, width, first_data = 258, 9, True
        elif code != 257:
            if first_data:
                first_data = False
            else:
                dec_size += 1
            if dec_size + early_change >= (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_round_trip_simple_and_repetitive():
    for payload in (
        b"BT (Hello LZW) Tj ET",
        b"abcabcabcabc" * 50,
        bytes(range(256)) * 3,
        b"a",
        b"",
    ):
        assert _lzw_decode(lzw_encode(payload)) == payload


def test_round_trip_crosses_width_bumps():
    # enough distinct digrams to push the table past 511 and 1023
    payload = bytes((i * 7 + (i >> 3)) % 256 for i in range(20000))
    assert _lzw_decode(lzw_encode(payload)) == payload


def test_kwkwk_case():
    # 'aaaa...' forces the code == len(table) branch immediately
    payload = b"a" * 100
    assert _lzw_decode(lzw_encode(payload)) == payload


def test_early_change_zero():
    payload = bytes((i * 31) % 256 for i in range(5000))
    enc = lzw_encode(payload, early_change=0)
    assert _lzw_decode(enc, early_change=0) == payload
    # width desync is detected as corruption, not garbage output
    wrong = _lzw_decode(enc, early_change=1)
    assert wrong is None or wrong != payload


def test_hostile_bytes_never_raise():
    for blob in (b"", b"\xff" * 64, bytes(range(256)), b"\x00\x80\x40"):
        out = _lzw_decode(blob)
        assert out is None or isinstance(out, bytes)


def test_lzw_content_stream_extracts():
    s1 = b"BT 72 720 Td (lzw classic page) Tj ET\n"
    pdf = _pdf_text_fixture([s1])  # raw layout...
    enc = lzw_encode(s1)
    # ...rewritten as an LZW-filtered stream object
    raw_obj = b"<< /Length " + str(len(s1)).encode() + b" >>\nstream\n" + s1
    lzw_obj = (
        b"<< /Length " + str(len(enc)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + enc
    )
    assert raw_obj in pdf
    assert extract_pdf_text(pdf.replace(raw_obj, lzw_obj)) == ["lzw classic page"]
