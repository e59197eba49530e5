"""Regression tests for the round-5 ADVICE findings: NULL rule booleans
in flag_bots for single-event users, blank-line routing around the
dedup_lines window, drop_frequent_lines' unforced join strategy,
cdc_chunks' NULL-text garbage row, and encode_flac's hardcoded 16-bit
frame-header sample-size code."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import cdc_chunks, flag_bots
from polars_dataset_spark.functions.dedup import dedup_lines, drop_frequent_lines
from polars_dataset_spark.functions.flac import decode_flac, encode_flac


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_flag_bots_single_event_user_is_concrete_false(spark):
    # u1: one event -> span 0 -> events_per_day NULL, gap_cv NULL; the
    # only rule that CAN fire is too_narrow (entropy 0 < threshold)
    events = spark.createDataFrame(
        [("u1", "click", _ts(0))]
        + [("u2", t, _ts(i)) for i, t in enumerate(["a", "b", "c", "d", "e"] * 4)],
        "user_id string, event_type string, ts timestamp",
    )
    out = flag_bots(events, max_entropy_bits=-1.0).collect()
    rows = {r["user_id"]: r for r in out}
    u1 = rows["u1"]
    # with the entropy rule disabled (threshold -1), every rule is
    # concretely False for the single-event user — not NULL
    assert u1["too_hot"] is False
    assert u1["too_regular"] is False
    assert u1["too_narrow"] is False
    assert u1["is_bot"] is False


def test_flag_bots_single_event_user_survives_both_filters(spark):
    events = spark.createDataFrame(
        [("u1", "click", _ts(0)), ("u2", "a", _ts(0)), ("u2", "b", _ts(30))],
        "user_id string, event_type string, ts timestamp",
    )
    f = flag_bots(events, max_entropy_bits=-1.0)
    n_bot = f.filter(F.col("is_bot")).count()
    n_human = f.filter(~F.col("is_bot")).count()
    # the NULL bug dropped single-event users from BOTH partitions
    assert n_bot + n_human == 2


def test_dedup_lines_blank_routing_values_unchanged(spark):
    docs = spark.createDataFrame(
        [
            (1, "nav menu\n\nunique one\n  \nnav menu"),
            (2, "nav menu\n\nunique two"),
            (3, "\n  \n"),  # blank-only document
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # first occurrence of 'nav menu' (doc 1, pos 0) survives; later ones
    # vanish; blank and whitespace-only lines survive VERBATIM everywhere
    assert out[1]["text"] == "nav menu\n\nunique one\n  "
    assert out[2]["text"] == "\nunique two"
    assert out[3]["text"] == "\n  \n"
    assert out[3]["n_kept"] == 3


def test_dedup_lines_keep_blank_false_dedupes_blanks_too(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "\nc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs, keep_blank=False).collect()}
    # only the FIRST empty line in corpus order (doc 1, pos 1) survives
    assert out[1]["text"] == "a\n\nb"
    assert out[2]["text"] == "c"


def test_drop_frequent_lines_values_without_forced_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"boilerplate footer\nbody {i}") for i in range(1, 5)]
        + [(9, "rare line\nbody 9")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in drop_frequent_lines(docs, min_docs=3).collect()}
    for i in range(1, 5):
        assert out[i]["text"] == f"body {i}"  # removed EVERYWHERE incl. first
    assert out[9]["text"] == "rare line\nbody 9"  # below threshold: untouched


def test_cdc_chunks_null_text_emits_no_rows(spark):
    docs = spark.createDataFrame(
        [(1, "hello world, this is a long enough document to chunk"),
         (2, None), (3, "")],
        "doc_id long, text string",
    )
    ch = cdc_chunks(docs, window=8, mask_bits=3)
    rows = ch.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc  # NULL text: no rows, no all-NULL garbage chunk
    # non-null docs unaffected; chunks still rebuild the original
    rebuilt = "".join(
        r["chunk_text"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    )
    assert rebuilt == "hello world, this is a long enough document to chunk"
    # empty string is a real (single empty) chunk, not dropped
    assert 3 in by_doc and by_doc[3][0]["chunk_len"] == 0


def test_encode_flac_derives_sample_size_code():
    t = np.arange(400)
    frames = (100 * np.sin(2 * np.pi * 5 * t / 400)).astype(np.int64)[:, None]
    got = decode_flac(encode_flac(frames, bps=8))
    assert got is not None
    rate, nch, arr = got
    # normalization must use 2^(bps-1)=128, not 32768 — the hardcoded
    # 16-bit header code made 8-bit streams decode at the wrong depth
    assert np.allclose(arr, frames / 128.0, atol=1e-12)


def test_encode_flac_odd_bps_roundtrips_via_streaminfo_code():
    # bps=13 has no dedicated frame-header sample-size code; the encoder
    # must fall back to code 0 (get-from-STREAMINFO, RFC 9639) instead of
    # raising, and the decoder reads the depth from STREAMINFO (ADVICE r6)
    t = np.arange(256)
    frames = (1000 * np.sin(2 * np.pi * 3 * t / 256)).astype(np.int64)[:, None]
    got = decode_flac(encode_flac(frames, bps=13))
    assert got is not None
    rate, nch, arr = got
    assert np.allclose(arr, frames / float(1 << 12), atol=1e-12)
