"""Find operators whose optimized plan DUPLICATES an expensive
expression — the q199 disease (round 7).

Catalyst's CollapseProject merges adjacent projections by textually
inlining the producer's expressions at every consumer reference, UNLESS
the alias is non-cheap and referenced more than once. An operator built
as one giant projection never gives the rule that chance: every
reference to a named sub-expression (ends/starts/bounds/...) becomes a
full copy in the physical plan — q199's md5-per-position boundary chain
appeared 16 times and ran ~4.5x slower than its staged rewrite.

The detector lives in :func:`polars_dataset_spark.plans.
expensive_snippet_counts` and is ALSO enforced suite-wide by
``tests/test_plans.py`` against an adjudicated allowlist; this tool is
the exploratory front-end (arbitrary thresholds, full snippet text).

Copies >= the threshold usually deserve the staged-projection treatment
(alias the intermediate in its own select) — but read the plan first:
filter PUSHDOWN also substitutes derivations into predicates (bounded
~2x, usually worth it), and literal fan-outs (LSH band slices) repeat by
construction.

Usage: python tools/expr_dup_audit.py [sf_dir] [--min-copies 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_dataset_spark import suite
from polars_dataset_spark.plans import expensive_snippet_counts
from polars_dataset_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--min-copies", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark("expr_dup_audit")
    hits = []
    for name, fn in sorted(suite.QUERIES.items()):
        try:
            counts = expensive_snippet_counts(fn(spark, args.sf_dir))
        except Exception as exc:  # surface, don't die mid-scan
            print(f"{name}: PLAN ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        worst = [(c, frag) for frag, c in counts.items() if c >= args.min_copies]
        if worst:
            worst.sort(reverse=True)
            copies, frag = worst[0]
            hits.append((copies, name, frag))
    hits.sort(reverse=True)
    if not hits:
        print("no expensive-expression duplication at threshold", args.min_copies)
    for copies, name, frag in hits:
        print(f"{name}: x{copies}  {frag[:100]}")
    spark.stop()


if __name__ == "__main__":
    main()
