"""Merge the r12 sf10-decade evidence into CORRECTNESS_SF10_r12.json
(VERDICT r11 #6: shrink the exclusion list 4 -> 2).

Inputs and row provenance (explicit per query):
- ``CORRECTNESS_SF10_r11.json`` — carried forward for queries whose
  implementation is UNCHANGED in r12 (code-change-aware: the r12
  touched set re-earns its rows).
- ``CORRECTNESS_SF10S_r12.json`` (sweep at /tmp/sf10s) — fresh rows
  for the r12-touched set (urls/robots/pii/sitemap/pdf/warc changes)
  and the new q229-q233.
- ``CORRECTNESS_SF10Q_r12.json`` (sweep at /tmp/sf10q, the 1/8
  md5-keyed documents subset) — q130/q141 convert from adjudicated
  exclusions to value-checked rows: their ORACLES were restated with
  the cross-side AllPairs prefix filter (suite._cross_jaccard_pair_ctes
  — exact, identical value set), which runs in ~14 s / ~9 s where the
  old brute-force l-JOIN-r-ON-TRUE replay timed out at 560 s.

Remaining exclusions (2), each individually adjudicated: q47 (output
volume ~SF^2 — unhashable at any subset preserving the property) and
q61 (declared-quadratic exact SPARK baseline — the pair space itself
is the cost).

Usage: python tools/merge_sf10_r12.py
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r12 touched these implementations AFTER every r11 sweep ran — their
# r11 rows are stale evidence and must not be carried forward
R12_TOUCHED = {
    "q130_fuzzy_join",        # oracle restated (prefix filter)
    "q141_neardup_vs_corpus", # oracle restated (prefix filter)
    "q179_url_filter",        # urls.py fragment-safe query regex
    "q205_pdf_probe",         # pdf.py gen tracking / decrypt wiring
    "q207_url_canonicalize",
    "q211_pdf_text",
    "q215_outlink_frontier",
    "q216_pdf15_text",
    "q218_robots_frontier",   # RFC 9309 group merge
    "q221_pii_scrub",         # SSN area class fix
    "q222_sitemap_entries",   # bounded inflate
    "q223_anchor_inlinks",    # canonicalize path
    "q224_jsonl_roundtrip",   # localCheckpoint materialization
    "q225_fetch_schedule",
    "q227_cdxj_surt",         # SURT fragment fix
    "q228_warc_range_fetch",  # warc.py shares the writer module
    # session 3: warc.py gained http_location (parse schema) +
    # status/location/record_type writer params — every query through
    # parse_warc/write_warc re-earns on the r12 sf10s sweep
    "q206_warc_ingest",
    "q210_html_to_text",
    "q231_warc_roundtrip",
    "q236_warc_revisit_dedup",
}

# exclusions that REMAIN after r12, each individually adjudicated
ADJUDICATED = {
    "q47_theta_join": (
        "OUTPUT volume: the inequality join's result grows ~SF^2 — "
        "754,950,100 rows at sf10s (measured r10), unhashable by any "
        "checker; value-green at sf1 (r9 sweep) where the output is "
        "comparison-sized"
    ),
    "q61_join_where": (
        "declared-quadratic exact SPARK baseline (the operator IS a "
        "theta join, same asymptotics as the reference's join_where; "
        "BENCH_OFFSCALE rows) — times out on the sf10q leg too (the "
        "pair space itself is the cost); value-green at sf1 (r9 sweep)"
    ),
}


def _load(name: str) -> "dict":
    try:
        with open(os.path.join(_REPO, name)) as fh:
            return json.load(fh)["queries"]
    except (OSError, ValueError, KeyError):
        return {}


def main() -> int:
    carried = _load("CORRECTNESS_SF10_r11.json")
    sampled = _load("CORRECTNESS_SF10S_r12.json")
    quad = _load("CORRECTNESS_SF10Q_r12.json")

    merged: "dict[str, dict]" = {}
    for name, row in carried.items():
        if name in R12_TOUCHED:
            continue  # stale: must re-earn below
        if row.get("status") in ("match", "match_sampled"):
            merged[name] = row
    for name, row in sampled.items():
        if row.get("status") == "match" or row.get("match") is True:
            merged[name] = {
                "status": "match_sampled",
                "fixture": "/tmp/sf10s (keyed subset, r12 sweep)",
                "spark_rows": row.get("spark_rows"),
            }
    for name, row in quad.items():
        if row.get("status") == "match" or row.get("match") is True:
            merged[name] = {
                "status": "match_sampled",
                "fixture": (
                    "/tmp/sf10q (1/8 md5-keyed docs subset of sf10, r12 — "
                    "oracle restated with the cross-side AllPairs prefix "
                    "filter; exact value set, ~14 s where the brute-force "
                    "replay timed out)"
                ),
                "spark_rows": row.get("spark_rows"),
            }

    import sys

    sys.path.insert(0, _REPO)
    from polars_dataset_spark import suite

    excluded: "dict[str, dict]" = {}
    for name in sorted(suite.QUERIES):
        if name in merged:
            continue
        if name in ADJUDICATED:
            excluded[name] = {"status": "skipped", "adjudication": ADJUDICATED[name]}
        else:
            excluded[name] = {"status": "pending", "err": "no sf10 evidence yet"}
    merged.update(excluded)

    n_value = sum(
        1 for r in merged.values() if r.get("status") in ("match", "match_sampled")
    )
    artifact = {
        "round": 12,
        "n_queries": len(merged),
        "n_value_checked": n_value,
        "n_excluded": sum(
            1 for r in merged.values() if r.get("status") in ("skipped", "pending")
        ),
        "protocol": (
            "r11 rows carried where the implementation is unchanged; the "
            "r12-touched set + new q229-q233 re-earned on /tmp/sf10s; "
            "q130/q141 value-checked on /tmp/sf10q after their oracles "
            "were restated with the exact cross-side AllPairs prefix "
            "filter; remaining 2 exclusions individually adjudicated "
            "(q47 output volume, q61 declared-quadratic Spark side)"
        ),
        "queries": dict(sorted(merged.items())),
    }
    out_path = os.path.join(_REPO, "CORRECTNESS_SF10_r12.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"value-checked {n_value} / {len(merged)}; "
        f"excluded {artifact['n_excluded']}; wrote {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
