"""PDF prober (functions/pdf): spec-shaped fixtures, the hidden-tree
gate, and hostile inputs."""

from polars_dataset_spark.functions.pdf import pdf_probe, probe_pdf
from polars_dataset_spark.suite import _pdf_fixture


def test_classic_page_tree_exact():
    info = probe_pdf(_pdf_fixture(pages=7))
    assert info["version"] == "1.4"
    assert info["page_count"] == 7
    assert info["encrypted"] is False and info["linearized"] is False
    assert info["n_objects"] == 9  # catalog + pages node + 7 pages


def test_nested_page_tree_takes_root_count():
    """Child /Pages nodes carry subset counts; the root's /Count is the
    max and IS the total page count."""
    pdf = _pdf_fixture(pages=2)
    pdf = pdf.replace(
        b"trailer",
        b"8 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [9 0 R] /Count 1 >>\n"
        b"endobj\ntrailer",
    )
    assert probe_pdf(pdf)["page_count"] == 2


def test_outline_count_does_not_leak():
    """/Type /Outlines also carries /Count — it must not be mistaken
    for a page count."""
    pdf = _pdf_fixture(pages=2)
    pdf = pdf.replace(
        b"trailer",
        b"8 0 obj\n<< /Type /Outlines /Count 99 >>\nendobj\ntrailer",
    )
    assert probe_pdf(pdf)["page_count"] == 2


def test_hidden_tree_gates_to_none():
    info = probe_pdf(_pdf_fixture(hidden_tree=True, version="1.6"))
    assert info["version"] == "1.6"
    assert info["page_count"] is None  # gate, not a guess
    assert info["n_objects"] == 2


def test_encrypt_and_linearized_flags():
    assert probe_pdf(_pdf_fixture(encrypted=True))["encrypted"] is True
    assert probe_pdf(_pdf_fixture(linearized=True))["linearized"] is True
    # /Linearized only counts within the first 1 KiB (Annex F: first object)
    late = _pdf_fixture(pages=3) + b" " * 2048 + b"/Linearized 1"
    assert probe_pdf(late)["linearized"] is False


def test_hostile_inputs():
    assert probe_pdf(b"") is None
    assert probe_pdf(b"not a pdf") is None
    assert probe_pdf(b"%PDF-") is None  # version digits required
    assert probe_pdf(b"%PDF-1.7") == {
        "version": "1.7",
        "page_count": None,
        "encrypted": False,
        "linearized": False,
        "n_objects": 0,
    }


def test_count_reversed_key_order():
    """/Count before /Type /Pages within the same dict still matches."""
    pdf = _pdf_fixture(pages=2).replace(
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        b"<< /Count 2 /Kids [3 0 R 4 0 R] /Type /Pages >>",
    )
    assert probe_pdf(pdf)["page_count"] == 2


def test_pdf_probe_spark(spark):
    rows = [
        (0, bytearray(_pdf_fixture(pages=4))),
        (1, bytearray(b"plain text blob")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    got = {r.doc_blob_id: r for r in pdf_probe(df).collect()}
    assert got[0].page_count == 4 and got[0].version == "1.4"
    assert got[1].version is None and got[2].version is None
