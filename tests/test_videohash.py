"""Perceptual video fingerprinting (functions/videohash, r11 — the
video member of the modality matrix): invariances of the 64-bit
temporal signature, the null gates, the banded pair operator, and the
arriving-vs-corpus index filter (sequential-batch parity)."""

import numpy as np
import pytest

from polars_dataset_spark.functions.videohash import (
    _hash_blob,
    build_video_index,
    video_fingerprint,
    video_filter_against,
    video_neardup_pairs,
    videohash64,
)
from polars_dataset_spark.suite import _video_clip_fixture, _y4m_fixture


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


A = _video_clip_fixture()
B = _video_clip_fixture(phase=0.37)
HA = videohash64(A)


def test_colorspace_reencode_is_bit_identical():
    # C420 / C444 / Cmono carry the same luma -> identical hash
    h420 = _hash_blob(_y4m_fixture(A))
    h444 = _hash_blob(_y4m_fixture(A, colorspace=b"C444"))
    hmono = _hash_blob(_y4m_fixture(A, colorspace=b"Cmono"))
    assert h420 == h444 == hmono == HA


def test_spatial_temporal_brightness_invariances():
    assert _ham(HA, videohash64([f[::2, ::2] for f in A])) <= 4
    assert _ham(HA, videohash64(A[::2])) <= 4
    bright = [np.clip(f.astype(int) + 12, 0, 255).astype(np.uint8) for f in A]
    assert _ham(HA, videohash64(bright)) == 0
    # doubling every frame (2x fps upsample) keeps segment content
    assert _ham(HA, videohash64([f for f in A for _ in range(2)])) == 0


def test_different_clips_far_apart():
    assert _ham(HA, videohash64(B)) > 16
    static = [np.tile(np.arange(48, dtype=np.uint8)[:, None], (1, 64))] * 16
    assert _ham(HA, videohash64(static)) > 16


def test_null_gates():
    assert videohash64(A[:7]) is None  # fewer frames than segments
    assert videohash64([]) is None
    assert _hash_blob(b"not a video") is None
    assert _hash_blob(None) is None


def test_gain_invariance_is_exact_without_clipping():
    scaled = [np.asarray(f, dtype=np.float64) * 0.37 for f in A]
    assert videohash64(scaled) == HA


def test_video_fingerprint_operator(spark):
    rows = [
        (0, bytearray(_y4m_fixture(A))),
        (1, bytearray(_y4m_fixture(A[:7]))),
        (2, bytearray(b"junk")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r.videohash for r in video_fingerprint(df).collect()}
    assert got[0] == HA and got[1] is None and got[2] is None and got[3] is None


def test_video_neardup_pairs_end_to_end(spark):
    rows = [
        (0, bytearray(_y4m_fixture(A))),
        (1, bytearray(_y4m_fixture(A, colorspace=b"C444"))),
        (5, bytearray(_y4m_fixture(B))),
        (7, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in video_neardup_pairs(df).collect()}
    assert pairs == {(0, 1): 0}


def test_video_index_filter_matches_sequential_batches(spark):
    corpus = spark.createDataFrame(
        [(0, bytearray(_y4m_fixture(A)))], "media_id long, content binary"
    )
    idx = build_video_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, "retime", bytearray(_y4m_fixture(A[::2], fps="25:2"))),
            (11, "novel", bytearray(_y4m_fixture(B))),
            (12, "short", bytearray(_y4m_fixture(A[:7]))),
            (13, "junk", bytearray(b"nope")),
        ],
        "media_id long, kind string, content binary",
    )
    kept = {r.media_id for r in video_filter_against(batch, idx).collect()}
    # retimed corpus copy drops; novel/too-short/undecodable are kept
    assert kept == {11, 12, 13}
    idx.unpersist()


def test_pair_plan_has_no_cartesian(spark):
    rows = [(i, bytearray(_y4m_fixture(_video_clip_fixture(phase=i / 7.0))))
            for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    plan = (
        video_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
