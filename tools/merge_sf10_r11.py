"""Merge the r11 sf10-decade evidence into CORRECTNESS_SF10_r11.json
(VERDICT r10 #6: shrink the exclusion list below 13).

Inputs and row provenance (explicit per query):
- ``CORRECTNESS_SF10_r10.json`` — carried forward for queries whose
  implementation is UNCHANGED in r11 (code-change-aware: the r11
  touched set re-earns its rows).
- ``CORRECTNESS_SF10S_r11.json`` (sweep at /tmp/sf10s — whole
  partitions, md5-keyed key subsets) — fresh rows for the r11-touched
  set, the new q216-q220, and q101 (now schema-pinned via
  ``categories=``, its former exclusion reason).
- ``CORRECTNESS_SF10Q_r11.json`` (sweep at /tmp/sf10q — 1/8 md5-keyed
  documents/embeddings subset of sf10, tools/make_quadoracle_fixture)
  — converts the QUADRATIC-ORACLE family from adjudicated exclusions
  to value-checked rows: the oracle replay cost lands at the
  known-green sf0.1 order while the data is sf10-decade content.

Remaining exclusions keep individual adjudications (declared-quadratic
SPARK sides and output-volume cases, where no checker can hash the
result at any subset preserving the property).

Usage: python tools/merge_sf10_r11.py
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r11 touched these implementations AFTER every r10 sweep ran — their
# r10 rows are stale evidence and must not be carried forward
R11_TOUCHED = {
    "q101_to_dummies",  # to_dummies grew categories=; q101 pins them
    "q205_pdf_probe",
    "q210_html_to_text",
    "q211_pdf_text",
    "q212_audio_neardup",
    "q213_html_corpus_scaled",
    "q214_audio_index_filter",
    "q215_outlink_frontier",
}

# exclusions that REMAIN after r11, each individually adjudicated
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
    "q130_fuzzy_join": (
        "quadratic-ORACLE: the AllPairs prefix-filter pair CTE timed "
        "out solo (560 s) even on the 1/8 sf10q subset; implementation "
        "unchanged since its green sf0.1 row "
        "(CORRECTNESS_SF01_r08.json)"
    ),
    "q141_neardup_vs_corpus": (
        "quadratic-ORACLE: the exact cross-Jaccard anti-filter replay "
        "timed out solo (560 s) on the 1/8 sf10q subset; "
        "implementation unchanged since its green sf0.1 row "
        "(CORRECTNESS_SF01_r08.json); the SPARK side's banded index is "
        "additionally exercised at sf10s by q209/q214's family tests"
    ),
}


def _load(name: str) -> "dict":
    try:
        with open(os.path.join(_REPO, name)) as fh:
            return json.load(fh)["queries"]
    except (OSError, ValueError, KeyError):
        return {}


def main() -> int:
    carried = _load("CORRECTNESS_SF10_r10.json")
    sampled = _load("CORRECTNESS_SF10S_r11.json")
    quad = _load("CORRECTNESS_SF10Q_r11.json")

    merged: "dict[str, dict]" = {}
    for name, row in carried.items():
        if name in R11_TOUCHED:
            continue  # stale: must re-earn below
        if row.get("status") in ("match", "match_sampled"):
            merged[name] = row
    for name, row in sampled.items():
        if row.get("status") == "match" or row.get("match") is True:
            merged[name] = {
                "status": "match_sampled",
                "fixture": "/tmp/sf10s (keyed subset, r11 sweep)",
                "spark_rows": row.get("spark_rows"),
            }
    for name, row in quad.items():
        if row.get("status") == "match" or row.get("match") is True:
            merged[name] = {
                "status": "match_sampled",
                "fixture": (
                    "/tmp/sf10q (1/8 md5-keyed docs/embeddings subset of "
                    "sf10, r11 — oracle replay at sf0.1-order cost over "
                    "sf10-decade content)"
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
        "round": 11,
        "n_queries": len(merged),
        "n_value_checked": n_value,
        "n_excluded": sum(
            1 for r in merged.values() if r.get("status") in ("skipped", "pending")
        ),
        "protocol": (
            "r10 rows carried where the implementation is unchanged; the "
            "r11-touched set + new queries re-earned on /tmp/sf10s; the "
            "quadratic-ORACLE family value-checked on /tmp/sf10q (1/8 "
            "keyed docs subset of sf10 — checker cost at the green-sf0.1 "
            "order, sf10-decade data); remaining exclusions individually "
            "adjudicated (declared-quadratic Spark sides / output volume)"
        ),
        "queries": dict(sorted(merged.items())),
    }
    out_path = os.path.join(_REPO, "CORRECTNESS_SF10_r11.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"value-checked {n_value} / {len(merged)}; "
        f"excluded {artifact['n_excluded']}; wrote {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
