"""with_script_profile (functions/text): per-script counts/fractions,
dominance, tie-breaks, und gate, and pattern portability to RE2."""

import duckdb
import pytest

from polars_dataset_spark.functions.text import SCRIPT_RANGES, with_script_profile


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    return {r.id: r for r in with_script_profile(df).collect()}


def test_pure_scripts(spark):
    got = _run(
        spark,
        ["hello world", "привет мир", "γειά σου", "مرحبا", "שלום",
         "नमस्ते", "你好 こんにちは 안녕"],
    )
    expect = ["latin", "cyrillic", "greek", "arabic", "hebrew",
              "devanagari", "cjk"]
    for i, script in enumerate(expect):
        assert got[i].dominant_script == script, (i, script)
        assert got[i][f"frac_{script}"] == 1.0


def test_mixed_counts_and_fractions(spark):
    (r,) = _run(spark, ["abc где 12"]).values()
    assert r.n_latin == 3 and r.n_cyrillic == 3
    assert r.n_chars_nws == 8
    assert r.frac_latin == r.frac_cyrillic == 0.375
    # tie at 3-3: first-in-dict order wins -> latin
    assert r.dominant_script == "latin"


def test_no_script_chars_is_und(spark):
    got = _run(spark, ["12345 !!!", ""])
    assert got[0].dominant_script == "und"
    assert got[1].dominant_script == "und" and got[1].n_chars_nws == 0


def test_latin_accents_counted(spark):
    (r,) = _run(spark, ["café señor"]).values()
    assert r.n_latin == 9 and r.dominant_script == "latin"


@pytest.mark.parametrize("name,pat", list(SCRIPT_RANGES.items()))
def test_patterns_are_re2_portable(name, pat):
    con = duckdb.connect()
    # must parse and match in RE2 exactly as in Java
    n = con.execute(
        "SELECT length(regexp_replace(?, ?, '', 'g'))",
        ["abc привет 你好 γ م ש न", pat],
    ).fetchone()[0]
    assert isinstance(n, int)
