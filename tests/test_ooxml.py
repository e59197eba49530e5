"""ZIP container + DOCX extraction (functions/ooxml): spec-encoder
round-trips cross-validated against stdlib ``zipfile`` (an independent
reader of the same public format), honest gates for encrypted members /
exotic methods / ZIP64 / malformed XML, and the bounded-inflate
zip-bomb guard."""

import io
import zipfile
import zlib

from polars_dataset_spark.functions.ooxml import (
    _MAX_MEMBER,
    build_zip,
    extract_docx_text,
    parse_zip_entries,
    read_zip_entry,
)

DOC_XML = (
    b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
    b'wordprocessingml/2006/main"><w:body>'
    b"<w:p><w:r><w:t>one</w:t></w:r></w:p>"
    b"<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
    b"</w:body></w:document>"
)


def test_build_zip_readable_by_stdlib_zipfile():
    blob = build_zip([("x/y.txt", b"payload bytes"), ("z.bin", bytes(300))])
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.namelist() == ["x/y.txt", "z.bin"]
    assert zf.read("x/y.txt") == b"payload bytes"
    assert zf.read("z.bin") == bytes(300)
    assert zf.testzip() is None  # CRCs valid


def test_parse_matches_stdlib_on_zipfile_built_archive():
    # the inverse direction: stdlib writes, our parser reads
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", "alpha")
        zf.writestr("dir/b.txt", "beta" * 100)
    blob = buf.getvalue()
    entries = parse_zip_entries(blob)
    assert [e["name"] for e in entries] == ["a.txt", "dir/b.txt"]
    assert read_zip_entry(blob, entries[0]) == b"alpha"
    assert read_zip_entry(blob, entries[1]) == b"beta" * 100


def test_stored_and_deflate_methods():
    for method in (0, 8):
        blob = build_zip([("f", b"x" * 50)], method=method)
        e = parse_zip_entries(blob)[0]
        assert e["method"] == method and e["uncompressed_size"] == 50
        assert read_zip_entry(blob, e) == b"x" * 50


def test_encrypted_member_gates():
    blob = build_zip([("s.txt", b"secret")], encrypted_names={"s.txt"})
    e = parse_zip_entries(blob)[0]
    assert e["encrypted"] is True
    assert read_zip_entry(blob, e) is None


def test_exotic_method_gates():
    blob = bytearray(build_zip([("f", b"x")], method=0))
    # rewrite method field to 14 (LZMA) in both headers
    i = blob.find(b"PK\x03\x04")
    blob[i + 8 : i + 10] = (14).to_bytes(2, "little")
    j = blob.find(b"PK\x01\x02")
    blob[j + 10 : j + 12] = (14).to_bytes(2, "little")
    e = parse_zip_entries(bytes(blob))[0]
    assert read_zip_entry(bytes(blob), e) is None


def test_crc_mismatch_gates():
    blob = bytearray(build_zip([("f", b"payload")], method=0))
    i = blob.find(b"payload")
    blob[i] ^= 0xFF
    e = parse_zip_entries(bytes(blob))[0]
    assert read_zip_entry(bytes(blob), e) is None


def test_not_a_zip_and_truncation_gate():
    assert parse_zip_entries(b"junk") is None
    blob = build_zip([("f", b"x" * 100)])
    for cut in range(0, len(blob), 7):
        out = parse_zip_entries(blob[:cut])
        assert out is None or isinstance(out, list)  # never raises


def test_zip64_gated():
    blob = bytearray(build_zip([("f", b"x")]))
    eocd = blob.rfind(b"PK\x05\x06")
    # plant an EOCD64 locator immediately before the EOCD record
    loc = b"PK\x06\x07" + bytes(16)
    blob = blob[:eocd] + loc + blob[eocd:]
    assert parse_zip_entries(bytes(blob)) is None


def test_zip_bomb_bounded():
    # 200 MB of zeros deflates to ~200 KB; member cap must bound the
    # allocation. The CRC check is skipped at the cap (truncated body).
    payload = b"\x00" * (200 << 20)
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    assert len(comp) < (1 << 20)
    entry = {
        "name": "bomb", "method": 8, "flags": 0, "encrypted": False,
        "crc32": zlib.crc32(payload), "compressed_size": len(comp),
        "uncompressed_size": len(payload), "offset": 0, "is_dir": False,
    }
    blob = (
        b"PK\x03\x04\x14\x00\x00\x00\x08\x00" + bytes(16)
        + (4).to_bytes(2, "little") + b"\x00\x00" + b"bomb" + comp
    )
    out = read_zip_entry(blob, entry)
    assert out is not None and len(out) == _MAX_MEMBER


def test_docx_text_paragraphs_tabs_breaks():
    blob = build_zip([("word/document.xml", DOC_XML)])
    assert extract_docx_text(blob) == "one\na\tb\nc"


def test_docx_gates():
    assert extract_docx_text(b"nope") is None
    assert extract_docx_text(build_zip([("other.xml", b"<a/>")])) is None
    assert (
        extract_docx_text(build_zip([("word/document.xml", b"<broken")]))
        is None
    )
    enc = build_zip(
        [("word/document.xml", DOC_XML)],
        encrypted_names={"word/document.xml"},
    )
    assert extract_docx_text(enc) is None


def test_docx_real_writer_shape():
    # a docx assembled by stdlib zipfile (different writer, same spec)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", DOC_XML.decode())
    assert extract_docx_text(buf.getvalue()) == "one\na\tb\nc"


# ------------------------------------------------------- xlsx/pptx (r12)

def test_xlsx_shared_inline_numeric_cells():
    ss = (b'<sst xmlns="x"><si><t>alpha</t></si>'
          b"<si><r><t>be</t></r><r><t>ta</t></r></si></sst>")
    sheet = (b'<worksheet xmlns="x"><sheetData>'
             b'<row><c t="s"><v>0</v></c><c><v>42</v></c></row>'
             b'<row><c t="s"><v>1</v></c>'
             b'<c t="inlineStr"><is><t>inline</t></is></c>'
             b'<c t="s"><v>99</v></c><c/></row>'
             b"</sheetData></worksheet>")
    from polars_dataset_spark.functions.ooxml import extract_xlsx_text

    blob = build_zip([
        ("xl/workbook.xml", b"<workbook/>"),
        ("xl/sharedStrings.xml", ss),
        ("xl/worksheets/sheet1.xml", sheet),
    ])
    # out-of-range shared index and empty cell yield '' not a crash
    assert extract_xlsx_text(blob) == "alpha\t42\nbeta\tinline\t\t"


def test_xlsx_no_shared_strings_part():
    from polars_dataset_spark.functions.ooxml import extract_xlsx_text

    sheet = b'<worksheet><sheetData><row><c><v>7</v></c></row></sheetData></worksheet>'
    blob = build_zip([
        ("xl/workbook.xml", b"<workbook/>"),
        ("xl/worksheets/sheet1.xml", sheet),
    ])
    assert extract_xlsx_text(blob) == "7"


def test_pptx_slides_in_name_order():
    from polars_dataset_spark.functions.ooxml import extract_pptx_text

    def slide(txt):
        return (b'<p:sld xmlns:p="pp" xmlns:a="aa"><p:txBody><a:p><a:r>'
                b"<a:t>" + txt + b"</a:t></a:r></a:p></p:txBody></p:sld>")

    blob = build_zip([
        ("ppt/presentation.xml", b"<presentation/>"),
        ("ppt/slides/slide2.xml", slide(b"two")),
        ("ppt/slides/slide1.xml", slide(b"one")),
    ])
    assert extract_pptx_text(blob) == "one\n\ntwo"


def test_office_router_kinds():
    from polars_dataset_spark.functions.ooxml import _office_kind_and_text

    assert _office_kind_and_text(build_zip([("a.txt", b"x")])) == ("zip", None)
    assert _office_kind_and_text(b"junk") == (None, None)
    k, t = _office_kind_and_text(build_zip([("word/document.xml", DOC_XML)]))
    assert k == "docx" and t == "one\na\tb\nc"


def test_office_malformed_parts_gate_not_raise():
    from polars_dataset_spark.functions.ooxml import (
        extract_pptx_text,
        extract_xlsx_text,
    )

    bad_x = build_zip([("xl/workbook.xml", b"<workbook/>"),
                       ("xl/worksheets/sheet1.xml", b"<broken")])
    assert extract_xlsx_text(bad_x) == ""  # sheet skipped, no crash
    bad_p = build_zip([("ppt/presentation.xml", b"<presentation/>"),
                       ("ppt/slides/slide1.xml", b"<broken")])
    assert extract_pptx_text(bad_p) == ""


# ------------------------------------------------------------ epub (r12)

CONTAINER_XML = (
    b'<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    b'<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles>'
    b"</container>"
)


def _epub(opf, chapters):
    members = [("mimetype", b"application/epub+zip"),
               ("META-INF/container.xml", CONTAINER_XML),
               ("OEBPS/content.opf", opf)]
    members += [("OEBPS/" + n, b) for n, b in chapters]
    return build_zip(members)


def test_epub_spine_order_beats_manifest_order():
    from polars_dataset_spark.functions.ooxml import extract_epub_text

    opf = (b'<package><manifest>'
           b'<item id="b" href="b.xhtml" media-type="application/xhtml+xml"/>'
           b'<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
           b"</manifest>"
           b'<spine><itemref idref="a"/><itemref idref="b"/></spine></package>')
    blob = _epub(opf, [
        ("b.xhtml", b"<html><body><p>second</p></body></html>"),
        ("a.xhtml", b"<html><body><p>first</p></body></html>"),
    ])
    assert extract_epub_text(blob) == "first\n\nsecond"


def test_epub_missing_chapter_and_non_html_items_skipped():
    from polars_dataset_spark.functions.ooxml import extract_epub_text

    opf = (b'<package><manifest>'
           b'<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
           b'<item id="gone" href="gone.xhtml" media-type="application/xhtml+xml"/>'
           b'<item id="css" href="s.css" media-type="text/css"/>'
           b"</manifest>"
           b'<spine><itemref idref="a"/><itemref idref="gone"/>'
           b'<itemref idref="css"/></spine></package>')
    blob = _epub(opf, [("a.xhtml", b"<html><body><p>only</p></body></html>")])
    assert extract_epub_text(blob) == "only"


def test_epub_gates():
    from polars_dataset_spark.functions.ooxml import extract_epub_text

    assert extract_epub_text(b"junk") is None
    assert extract_epub_text(build_zip([("a.txt", b"x")])) is None
    # container names an OPF that doesn't exist
    blob = build_zip([("META-INF/container.xml", CONTAINER_XML)])
    assert extract_epub_text(blob) is None
    # spine resolves to zero readable chapters
    opf = b'<package><manifest/><spine/></package>'
    assert extract_epub_text(_epub(opf, [])) is None


def test_epub_router_kind():
    from polars_dataset_spark.functions.ooxml import _office_kind_and_text

    opf = (b'<package><manifest>'
           b'<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
           b"</manifest><spine><itemref idref=\"a\"/></spine></package>")
    blob = _epub(opf, [("a.xhtml", b"<html><body><p>hi</p></body></html>")])
    assert _office_kind_and_text(blob) == ("epub", "hi")
