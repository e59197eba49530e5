"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`polars_dataset_spark.suite`; every entry is
an operator from SURVEY.md §2 expressed through the package's public API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from polars_dataset_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The star join through the Dataset API: broadcast dimension chain over
    the fact table, revenue per region."""
    return suite.flagship(spark, "/root/testdata/sf0.001")


# The driver scores the FIRST 50 entries of queries(); registration order
# left q51-q137 without a driver correctness row for two rounds
# (VERDICT r02 "What's missing" #1).  This explicit priority list front-
# loads (a) q25, driver hash-red in r01/r02 — fixed this round (oracle
# HUGEINT session_id now cast to BIGINT), and (b) 49 never-driver-checked
# queries spanning every unverified family: connected components, packing,
# sampling, corpus ops, event analytics, the new q76/q77 contract oracles,
# and the six oracles whose HUGEINT outputs were caught by the same-class
# audit (q62/q68/q69/q94/q108/q124).  The remaining never-checked queries
# follow (rotate into the window next round), previously-driver-green
# q01-q50 last.
_DRIVER_PRIORITY = [
    "q25_sessionize",
    "q60_clean_corpus",
    "q62_fill_nan",
    "q63_connected_components",
    "q64_dedup_components",
    "q66_stratified_sample",
    "q67_hash_sample",
    "q68_pack_sequences",
    "q69_pack_global",
    "q73_hash_sample_by",
    "q76_regrid_uniform",
    "q77_fourier_spline",
    "q81_sample_exact_n",
    "q89_decontamination",
    "q91_temperature_mix",
    "q92_token_budget",
    "q93_chunk_documents",
    "q94_vocab_oov",
    "q95_surprisal",
    "q96_pii_redaction",
    "q97_tfidf_topk",
    "q98_chunk_dedup",
    "q108_packing_report",
    "q111_funnel",
    "q112_cohort_retention",
    "q113_merge_upsert",
    "q114_snapshot_diff",
    "q115_weighted_sample",
    "q116_group_quantiles",
    "q117_zscore_outliers",
    "q118_quality_audit",
    "q119_savgol_smooth",
    "q120_detrend",
    "q121_normalize",
    "q122_autocorr",
    "q123_ohlc",
    "q124_source_kl",
    "q125_rolling_corr",
    "q126_winsorize",
    "q127_mad_outliers",
    "q128_interevent_times",
    "q129_audience_overlap",
    "q130_fuzzy_join",
    "q131_cluster_report",
    "q132_centroid_separation",
    "q133_rfm_segments",
    "q134_event_transitions",
    "q135_pareto_abc",
    "q136_wow_growth",
    "q137_new_vs_returning",
]


def _qnum(name: str) -> int:
    return int(name.split("_")[0][1:])


def _driver_history() -> "tuple[set[str], set[str]]":
    """Scan past driver correctness artifacts (CORRECTNESS_r*.json beside
    this file): returns (ever_failed, ever_green) query-name sets. Used
    to rotate the driver's 50-query scoring window automatically —
    failed queries re-enter first, never-checked next, proven-green
    last — so no hand-maintained priority list can go stale."""
    import glob
    import json

    failed: set[str] = set()
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            (green if ok else failed).add(name)
    # a later green clears an earlier failure; a later failure re-flags
    # (keep it simple: any recorded failure without a LATER green is
    # approximated by set difference — failures that were subsequently
    # fixed and re-scored green drop out)
    return failed - green, green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window scores the queries that
    most need a driver row: (1) queries a past round scored RED and no
    later round scored green, (2) queries with no driver row ever
    (newest additions included automatically), (3) proven-green queries
    last — each group in _DRIVER_PRIORITY order then query number, so
    the window rotates round-over-round without hand edits."""
    all_q = dict(suite.QUERIES)
    failed, green = _driver_history()
    prio_rank = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}

    def key(n: str):
        if n in failed:
            tier = 0
        elif n not in green:
            tier = 1
        else:
            tier = 2
        return (tier, prio_rank.get(n, len(prio_rank)), _qnum(n))

    return {n: all_q[n] for n in sorted(all_q, key=key)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for EVERY query (no rows-only
    entries) — including the LSH family (seeded hyperplanes / seeded
    minhash lanes replayed as literals), regrid (on-knot identity), FFT
    (O(n²) SQL DFT), simhash (portable md5-bit variant), IVF
    (fixed-centroid variant), and the off-knot spline pair q76/q77
    (contract oracles: knot-exact endpoint values, grid span, bin/knot
    counts, Nyquist frequency, DC/Nyquist realness, FFT-vs-direct-sum —
    with off-knot numerics additionally pinned by pytest/hypothesis)."""
    return dict(suite.ORACLES)
