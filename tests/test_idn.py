"""IDN decoding + homograph flagging (functions/idn): pinned decode
pairs, invalid-punycode gates, case handling, per-label mixing
semantics, and null passthrough."""

from pyspark.sql import functions as F

from polars_dataset_spark.functions.idn import (
    decode_idn_hosts,
    decode_label,
    flag_homograph_hosts,
)


def test_decode_label_pinned_pairs():
    assert decode_label("xn--bcher-kva") == "bücher"
    assert decode_label("xn--p1ai") == "рф"
    assert decode_label("xn--qxam") == "ελ"
    assert decode_label("xn--pypal-4ve") == "pаypal"
    assert decode_label("plain") == "plain"
    assert decode_label("XN--BCHER-KVA") == "bücher"  # case-insensitive
    assert decode_label("xn--invalid-@@@") is None


def _run(spark, hosts):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id int, host string"
    )
    out = flag_homograph_hosts(decode_idn_hosts(df))
    return {r.id: r for r in out.collect()}


def test_dataframe_decode_and_flags(spark):
    got = _run(
        spark,
        [
            "www.example.com",
            "xn--bcher-kva.de",
            "xn--pypal-4ve.com",
            "mixed.xn--p1ai",
            "xn--bad-@@@.com",
            None,
        ],
    )
    assert got[0].host_unicode == "www.example.com" and got[0].is_idn is False
    assert got[0].mixed_script_label is False
    assert got[1].host_unicode == "bücher.de" and got[1].is_idn
    assert got[1].mixed_script_label is False
    assert got[2].host_unicode == "pаypal.com" and got[2].mixed_script_label
    # cross-label mix is NOT a homograph
    assert got[3].host_unicode == "mixed.рф" and got[3].mixed_script_label is False
    # invalid punycode: claimed IDN, decode nulls, flag null
    assert got[4].host_unicode is None and got[4].is_idn is True
    assert got[4].mixed_script_label is None
    assert got[5].host_unicode is None and got[5].is_idn is None


def test_greek_latin_mix_flags(spark):
    # 'tεst' = latin t,s,t + greek ε in one label
    df = spark.createDataFrame([("xn--tst-4xc.gr",)], "host string")
    (r,) = flag_homograph_hosts(decode_idn_hosts(df)).collect()
    assert r.host_unicode == "tεst.gr"
    assert r.mixed_script_label
