"""Encoding-anomaly detection (functions/text.with_encoding_anomalies)."""

import pytest

from polars_dataset_spark.functions import with_encoding_anomalies


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "perfectly clean prose"),
        (2, "caf\u00c3\u00a9 and na\u00c3\u00afve"),  # 2x mojibake letters
        (3, "lost \ufffd chars \ufffd\ufffd here"),  # 3x replacement
        (4, "binary\u0007junk\u0000 here"),  # BEL + NUL
        (5, "tabs\tand\nnewlines are fine"),
        (6, "\u00e2\u0080\u009cquoted\u00e2\u0080\u009d and \u00c2\u00a0nbsp"),
        (7, "\u00ef\u00bb\u00bfBOM leftover"),
        (8, None),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_counts(docs):
    out = {r["id"]: r for r in with_encoding_anomalies(docs).collect()}
    assert out[1]["encoding_clean"] and out[5]["encoding_clean"]
    assert out[2]["n_mojibake"] == 2 and not out[2]["encoding_clean"]
    assert out[3]["n_replacement"] == 3
    assert out[4]["n_control"] == 2  # BEL + NUL; tab/newline exempt
    assert out[6]["n_mojibake"] == 3  # two curly quotes + nbsp artifact
    assert out[7]["n_mojibake"] == 1  # BOM
    # null text propagates nulls, not crashes
    assert out[8]["n_replacement"] is None and out[8]["encoding_clean"] is None


def test_prefix_and_plan(docs):
    from tests.test_plans import count_exchanges, explain_str

    out = with_encoding_anomalies(docs, out_prefix="enc_")
    assert "enc_n_mojibake" in out.columns
    assert count_exchanges(out) == 0
    assert "pythonudf" not in explain_str(out).lower()
