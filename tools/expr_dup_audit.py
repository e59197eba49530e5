"""Find operators whose optimized plan DUPLICATES an expensive
expression — the q199 disease (round 7).

Catalyst's CollapseProject merges adjacent projections by textually
inlining the producer's expressions at every consumer reference, UNLESS
the alias is non-cheap and referenced more than once. An operator built
as one giant projection never gives the rule that chance: every
reference to a named sub-expression (ends/starts/bounds/...) becomes a
full copy in the physical plan — q199's md5-per-position boundary chain
appeared 16 times and ran ~4.5x slower than its staged rewrite.

This tool scans every suite query's optimized plan for long repeated
call-expression snippets rooted at expensive functions and reports
(query, snippet-prefix, copies). Copies >= the threshold deserve the
staged-projection treatment (alias the intermediate in its own select).

Usage: python tools/expr_dup_audit.py [sf_dir] [--min-copies 4]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_dataset_spark import suite
from polars_dataset_spark.session import get_spark

# functions whose per-row cost makes duplication matter: hashes, string
# builders, array pipelines, higher-order lambdas, regex
_EXPENSIVE = (
    "md5", "sha2", "crc32", "xxhash64", "hash",
    "sequence", "aggregate", "zip_with", "transform", "filter",
    "array_sort", "sort_array", "regexp_replace", "regexp_extract_all",
    "split", "levenshtein", "conv",
)
_CALL = re.compile(r"\b(" + "|".join(_EXPENSIVE) + r")\((.{0,120})")


def snippets(plan: str) -> Counter:
    """Count long expensive-call snippets. The 120-char argument prefix
    is enough to identify a specific sub-expression while tolerating
    differing expr-ids deeper in the tree."""
    c: Counter = Counter()
    for m in _CALL.finditer(plan):
        frag = m.group(0)
        # strip Catalyst expr-ids (#1234) so copies of the same
        # expression over the same columns hash together
        frag = re.sub(r"#\d+", "#", frag)
        if len(frag) >= 40:
            c[frag] += 1
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--min-copies", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark("expr_dup_audit")
    hits = []
    for name, fn in sorted(suite.QUERIES.items()):
        try:
            plan = fn(spark, args.sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        except Exception as exc:  # surface, don't die mid-scan
            print(f"{name}: PLAN ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        worst = [
            (copies, frag)
            for frag, copies in snippets(plan).items()
            if copies >= args.min_copies
        ]
        if worst:
            worst.sort(reverse=True)
            copies, frag = worst[0]
            hits.append((copies, name, frag, len(plan)))
    hits.sort(reverse=True)
    if not hits:
        print("no expensive-expression duplication at threshold", args.min_copies)
    for copies, name, frag, plen in hits:
        print(f"{name}: x{copies} (plan {plen} chars)  {frag[:100]}")
    spark.stop()


if __name__ == "__main__":
    main()
