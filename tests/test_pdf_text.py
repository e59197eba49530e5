"""PDF text extraction for classic files (functions/pdf, r10): raw and
FlateDecode content streams, /Contents arrays, string syntax corners
(escapes, octal, hex, ' operator, TJ kerning), the honest gates
(encrypted / ObjStm page trees / other filters), hostile truncations,
and the exploding Spark operator."""

import zlib

from polars_dataset_spark.functions.pdf import extract_pdf_text, pdf_text
from polars_dataset_spark.suite import _pdf_fixture, _pdf_text_fixture

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


def test_raw_and_flate_identical():
    raw = extract_pdf_text(_pdf_text_fixture([S1, S2], flate=False))
    fl = extract_pdf_text(_pdf_text_fixture([S1, S2], flate=True))
    assert raw == fl == [P1, P2]


def test_contents_array_is_one_logical_stream():
    # tokens never span members (§7.8.2) — text must be identical to
    # the single-stream layout
    assert extract_pdf_text(_pdf_text_fixture([S1], contents_array=True)) == [P1]


def test_string_syntax_corners():
    # octal with fewer than 3 digits terminated by non-octal, nested
    # balanced parens without escapes, line continuation
    s = (
        b"BT (\\101\\102: (nested) ok) Tj ET\n"
        b"BT (split\\\nline) Tj ET\n"
    )
    pages = extract_pdf_text(_pdf_text_fixture([s]))
    assert pages == ["AB: (nested) ok\nsplit line"] or pages == [
        "AB: (nested) ok\nsplitline"
    ]


def test_gates_return_none():
    assert extract_pdf_text(_pdf_fixture(encrypted=True)) is None
    assert extract_pdf_text(_pdf_fixture(hidden_tree=True)) is None
    assert extract_pdf_text(b"not a pdf") is None
    assert extract_pdf_text(b"") is None


def test_probe_fixture_pages_have_no_content():
    # the q205 inventory fixture has pages but no /Contents: every page
    # extracts as '' (not None — the page tree IS visible)
    assert extract_pdf_text(_pdf_fixture(pages=3)) == ["", "", ""]


def test_other_filter_and_corrupt_flate_yield_empty_page():
    pdf = _pdf_text_fixture([S1]).replace(
        b">>\nstream", b" /Filter /DCTDecode >>\nstream", 1
    )
    assert extract_pdf_text(pdf) == [""]
    fl = _pdf_text_fixture([S1], flate=True)
    comp = zlib.compress(S1)
    assert comp in fl
    corrupt = fl.replace(comp, b"\x00" * len(comp))
    assert extract_pdf_text(corrupt) == [""]


def test_truncation_never_raises():
    pdf = _pdf_text_fixture([S1, S2], flate=True)
    for cut in range(0, len(pdf), 97):
        out = extract_pdf_text(pdf[:cut])  # must not raise
        assert out is None or isinstance(out, list)


def test_incremental_update_later_object_wins():
    pdf = _pdf_text_fixture([S1])
    # append a redefinition of the content object (incremental update)
    new_stream = b"BT 72 720 Td (updated text) Tj ET\n"
    update = (
        b"4 0 obj\n<< /Length " + str(len(new_stream)).encode()
        + b" >>\nstream\n" + new_stream + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    )
    assert extract_pdf_text(pdf + update) == ["updated text"]


def test_pdf_text_operator_explodes_and_gates(spark):
    rows = [
        (0, bytearray(_pdf_text_fixture([S1, S2]))),
        (1, bytearray(_pdf_fixture(encrypted=True))),
        (2, bytearray(b"junk")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    got = sorted(
        ((r.doc_blob_id, r.page_idx, r.page_text) for r in pdf_text(df).collect()),
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    assert got == [
        (0, 0, P1),
        (0, 1, P2),
        (1, None, None),
        (2, None, None),
        (3, None, None),
    ]


def test_pdf_text_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [(0, bytearray(_pdf_text_fixture([S1])))], "doc_blob_id long, content binary"
    )
    plan = pdf_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
