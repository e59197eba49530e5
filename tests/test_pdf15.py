"""PDF 1.5+ structures (functions/pdf, r11 — VERDICT r10 #2): xref
streams (W field widths, PNG predictors over zlib), object-stream
inflation, type-2 live-copy pinning, probe page_count recovery, the
honest gates kept honest, and hostile truncations."""

import zlib

from polars_dataset_spark.functions.pdf import (
    _expand_object_streams,
    _parse_xref_stream,
    _png_unpredict,
    _split_objects,
    extract_pdf_text,
    probe_pdf,
)
from polars_dataset_spark.suite import _pdf15_text_fixture, _pdf_fixture

S1 = (
    b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 TD (second line) Tj ET\n"
    b"BT 72 600 Td [(A) -400 (B) 10 (C)] TJ ET\n"
)
S2 = (
    b"BT 72 720 Td (paren \\(x\\) and \\\\ slash \\100) Tj ET\n"
    b"BT 72 700 Td <48454C4C4F> Tj (cont)' ET\n"
)
P1 = "Hello World\nsecond line\nA BC"
P2 = "paren (x) and \\ slash @\nHELLO\ncont"


def test_modern_raw_and_flate_match_classic_text():
    raw = extract_pdf_text(_pdf15_text_fixture([S1, S2]))
    fl = extract_pdf_text(_pdf15_text_fixture([S1, S2], content_flate=True))
    assert raw == fl == [P1, P2]


def test_xref_type2_pinning_beats_last_writer():
    # a later ObjStm redefines page 1 to point at 'STALE' content, but
    # the xref stream does not reference that copy — it must lose
    assert extract_pdf_text(_pdf15_text_fixture([S1], stale_copy=True)) == [P1]


def test_probe_page_count_recovered_through_objstm():
    info = probe_pdf(_pdf15_text_fixture([b"", b"", b""]))
    assert info["version"] == "1.5" and info["page_count"] == 3
    # damaged/unparseable ObjStm keeps the honest NULL gate
    assert probe_pdf(_pdf_fixture(hidden_tree=True))["page_count"] is None


def test_png_unpredict_all_filter_tags():
    # encode 4 rows of 5 columns with each PNG filter, decode back
    rows = [bytes([10, 20, 30, 40, 50]), bytes([13, 21, 34, 55, 89]),
            bytes([255, 0, 128, 7, 200]), bytes([1, 1, 2, 3, 5])]
    cols = 5

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    enc = bytearray()
    prev = bytes(cols)
    for tag, row in zip((0, 1, 2, 3, 4), rows + [rows[0]]):
        enc.append(tag)
        for i in range(cols):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if tag == 0:
                enc.append(row[i])
            elif tag == 1:
                enc.append((row[i] - left) & 0xFF)
            elif tag == 2:
                enc.append((row[i] - up) & 0xFF)
            elif tag == 3:
                enc.append((row[i] - ((left + up) >> 1)) & 0xFF)
            else:
                enc.append((row[i] - paeth(left, up, ul)) & 0xFF)
        prev = row
    out = _png_unpredict(bytes(enc), cols)
    assert out == b"".join(rows + [rows[0]])
    # malformed layouts gate to None
    assert _png_unpredict(bytes(enc)[:-1], cols) is None
    assert _png_unpredict(b"\x09" + bytes(cols), cols) is None  # bad tag


def test_xref_stream_index_subsections_and_w_defaults():
    # two subsections via /Index, W=[0 2 1]: type defaults to 1
    entries = {3: (1, 300, 0), 4: (1, 400, 1), 10: (1, 1000, 2)}
    payload = b"".join(
        f2.to_bytes(2, "big") + bytes([f3]) for _, (t, f2, f3) in sorted(entries.items())
    )
    stm = zlib.compress(payload)
    obj = (
        b"<< /Type /XRef /Size 11 /W [0 2 1] /Index [3 2 10 1]"
        b" /Filter /FlateDecode /Length " + str(len(stm)).encode()
        + b" >>\nstream\n" + stm + b"\nendstream"
    )
    assert _parse_xref_stream(obj) == entries


def test_expand_prefers_toplevel_when_xref_silent():
    # no xref stream: a top-level definition wins over an ObjStm copy
    inner = b"<< /Type /Page /Parent 2 0 R >>"
    header = b"5 0\n"
    payload = header + inner + b"\n"
    stm = zlib.compress(payload)
    data = (
        b"%PDF-1.5\n"
        b"5 0 obj\n<< /TopLevel true >>\nendobj\n"
        b"7 0 obj\n<< /Type /ObjStm /N 1 /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length " + str(len(stm)).encode()
        + b" >>\nstream\n" + stm + b"\nendstream\nendobj\n"
    )
    merged = _expand_object_streams(_split_objects(data))
    assert b"/TopLevel" in merged[5]


def test_truncation_never_raises():
    pdf = _pdf15_text_fixture([S1, S2], content_flate=True)
    for cut in range(0, len(pdf), 89):
        out = extract_pdf_text(pdf[:cut])  # must not raise
        assert out is None or isinstance(out, list)
    # bit-flips across the xref/objstm region must not raise either
    for pos in range(len(pdf) - 400, len(pdf), 17):
        mut = bytearray(pdf)
        mut[pos] ^= 0xFF
        out = extract_pdf_text(bytes(mut))
        assert out is None or isinstance(out, list)


def test_encrypted_xref_dict_gates_extraction():
    pdf = _pdf15_text_fixture([S1])
    # inject /Encrypt into the XRef stream dict (1.5+ files put the
    # trailer keys there) — extraction must gate to None
    enc = pdf.replace(b"/Type /XRef /Size", b"/Type /XRef /Encrypt 9 0 R /Size")
    info = probe_pdf(enc)
    assert info["encrypted"] is True
    assert extract_pdf_text(enc) is None


def test_encrypt_beyond_2k_in_trailer_dict_is_seen():
    # ADVICE r10: /Encrypt sitting past a fixed 2048-byte window used to
    # be missed — the scan now runs to the dict's balanced close
    filler = b" ".join(
        b"/K%d (%s)" % (i, b"x" * 40) for i in range(60)
    )  # ~2.8 KiB of benign keys before /Encrypt
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"
        b"trailer\n<< /Size 3 /Root 1 0 R " + filler + b" /Encrypt 9 0 R >>\n"
        b"startxref\n0\n%%EOF\n"
    )
    assert probe_pdf(pdf)["encrypted"] is True
