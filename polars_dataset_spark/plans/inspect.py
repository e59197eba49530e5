"""Physical-plan inspection utilities.

The scale contract of this engine ("would this plan survive 100 TB?") is
enforced as *testable plan properties*, not prose: filters must reach the
parquet scan, projections must prune the read schema, dimension joins must
broadcast, top-k must plan TakeOrderedAndProject. These helpers extract
those facts from the executed plan so ``tests/test_plans.py`` can assert
them and any regression (a shim that breaks pushdown, an operator that
sneaks in a sort-merge join) fails CI rather than surfacing as a 100×
slowdown on a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_joins",
    "count_exchanges",
    "expensive_snippet_counts",
    "has_take_ordered",
    "has_unbounded_single_partition",
    "is_python_path",
    "plan_report",
    "scale_report",
    "single_partition_consumers",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _executed(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame, text: "str | None" = None) -> list[str]:
    """Filter predicates that reached the data source scan. Pass ``text``
    (a pre-rendered formatted explain) to avoid re-rendering the plan."""
    text = explain_str(df) if text is None else text
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame, text: "str | None" = None) -> list[list[str]]:
    """Column lists actually read from each scan (column pruning check).
    Pass ``text`` (a pre-rendered formatted explain) to skip the render."""
    text = explain_str(df) if text is None else text
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def count_joins(df: DataFrame, text: "str | None" = None) -> dict[str, int]:
    text = _executed(df) if text is None else text
    return {
        "broadcast_hash": text.count("BroadcastHashJoin"),
        "sort_merge": text.count("SortMergeJoin"),
        "shuffled_hash": text.count("ShuffledHashJoin"),
        "broadcast_nested_loop": text.count("BroadcastNestedLoopJoin"),
    }


def count_exchanges(df: DataFrame, text: "str | None" = None) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    text = _executed(df) if text is None else text
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text))


def has_take_ordered(df: DataFrame, text: "str | None" = None) -> bool:
    return "TakeOrderedAndProject" in (_executed(df) if text is None else text)


def single_partition_consumers(df: DataFrame, text: "str | None" = None) -> list[str]:
    """For every ``Exchange SinglePartition`` in the EXECUTED plan, the
    head word of the nearest consumer line above it (the operator that
    reads the single partition). The round-7 review found the old check
    — ``"Exchange SinglePartition" in explain_str(df)`` — was DEAD:
    formatted explain prints the node name and its arguments on separate
    lines, so the substring never occurs and the guard enforced nothing.
    The simple executedPlan string does contain it on one line.

    Scale adjudication belongs to the CALLER: a single-partition
    exchange feeding a final global aggregate carries one partial row
    per upstream partition (bounded — the normal global-agg shape),
    while one feeding a Sort/Window/flatMap carries the full data set
    (the true 100-TB red flag). Pass ``text`` (a pre-rendered simple
    executedPlan string) to skip the render."""
    text = _executed(df) if text is None else text
    lines = text.split("\n")
    # pass-through wrappers between an exchange and its real consumer.
    # "Final"/"Initial" are what head() reduces the AQE section headers
    # ("== Final Plan ==" / "== Initial Plan ==") to; AdaptiveSparkPlan
    # is the AQE root wrapper. All three show up in POST-execution plan
    # strings (isFinalPlan=true renders both sections) — the round-8
    # review found the walk mis-attributing consumers there.
    wrappers = {
        "ShuffleQueryStage", "AQEShuffleRead", "InputAdapter",
        "WholeStageCodegen", "ResultQueryStage", "TableCacheQueryStage",
        "InMemoryRelation", "Final", "Initial", "AdaptiveSparkPlan",
    }

    def head(s: str) -> str:
        w = re.sub(r"^[\s:*+\-()0-9=]*", "", s)
        return re.split(r"[ \[(]", w, maxsplit=1)[0]

    # Depth must be the TREE-DRAWING prefix only (spaces, ':', '+', '-').
    # The old lstrip-a-char-set version also consumed whole-stage-codegen
    # markers ("*(2) "), so once a plan executed (AQE final plans render
    # codegen stars) a starred consumer measured 5 chars DEEPER than its
    # true depth and the walk skipped it, mis-reporting a bounded global
    # aggregate as an unbounded single-partition consumer. Strip the
    # codegen token separately — it carries no depth information.
    _tree_prefix = re.compile(r"^[ :+\-]*")

    def depth(s: str) -> int:
        return _tree_prefix.match(s).end()

    out: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        consumer = ""
        for j in range(i - 1, -1, -1):
            if not lines[j].strip() or depth(lines[j]) >= d:
                continue
            h = head(lines[j])
            d = depth(lines[j])
            if h in wrappers or not h:
                continue  # keep walking up past the wrapper
            consumer = h
            break
        out.append(consumer or "<root>")
    return out


_BOUNDED_SINGLE_PART_CONSUMERS = frozenset(
    # final global aggregates: the exchange moves one partial-state row
    # per upstream partition, bounded at any data size
    {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
)


def has_unbounded_single_partition(df: DataFrame, text: "str | None" = None) -> bool:
    """True when some single-partition exchange feeds a NON-aggregate
    consumer (global sort, keyless window, single-threaded map) — the
    shape that does not survive 100 TB. Final global aggregates are
    bounded (one partial row per upstream partition) and allowed."""
    return any(
        c not in _BOUNDED_SINGLE_PART_CONSUMERS
        for c in single_partition_consumers(df, text)
    )


def plan_report(df: DataFrame) -> dict:
    """One-call summary used in notebooks/debugging."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "joins": count_joins(df),
        "shuffle_exchanges": count_exchanges(df),
        "take_ordered": has_take_ordered(df),
    }


def scale_report(df: DataFrame) -> dict:
    """One-call "would this plan survive 100 TB?" audit of a DataFrame —
    the same checks the suite-wide plan tests enforce, exposed for users
    building their own pipelines:

    - ``single_partition`` / ``cartesian`` / ``nested_loop_join``: the
      three shapes that do not scale (a global single-partition
      exchange, an |L|×|R| product, a key-less join) — each fine only
      when one side is provably tiny;
    - ``python_udf``: whether any stage leaves the JVM (Arrow-batched
      or otherwise) — fine for kernel-shaped work, a smell on a
      filter/projection path;
    - ``shuffle_exchanges`` / ``joins`` / ``take_ordered`` /
      ``pushed_filters`` / ``read_schemas``: the plan_report fields;
    - ``worst_expr_dup``: max copies of any one expensive expression in
      the optimized plan (see :func:`expensive_snippet_counts`) — above
      ~5, look for a single giant projection to stage.
    """
    # exactly three plan renders for the whole audit: the formatted
    # explain (pushdown/pruning), the simple executed string (joins,
    # exchanges, single-partition, python — its one-line nodes are what
    # make substring checks actually match; the formatted mode splits
    # node name and arguments across lines, the round-7 dead-guard
    # finding), and the optimized plan (duplication counts)
    formatted = explain_str(df)
    executed = _executed(df)
    dup = expensive_snippet_counts(df)
    sp = single_partition_consumers(df, executed)
    return {
        "pushed_filters": pushed_filters(df, formatted),
        "read_schemas": read_schema_columns(df, formatted),
        "joins": count_joins(df, executed),
        "shuffle_exchanges": count_exchanges(df, executed),
        "take_ordered": has_take_ordered(df, executed),
        "single_partition": any(
            c not in _BOUNDED_SINGLE_PART_CONSUMERS for c in sp
        ),
        "single_partition_consumers": sp,
        "cartesian": "CartesianProduct" in executed,
        "nested_loop_join": "BroadcastNestedLoopJoin" in executed,
        "python_udf": is_python_path(executed),
        "worst_expr_dup": max(dup.values(), default=0),
    }


_PY_NODE_HEAD_RE = re.compile(
    # a plan line = tree prefix, optional codegen star, then the node name;
    # Python-eval nodes are BatchEvalPython / ArrowEvalPython and every
    # pandas/arrow fan-out (MapInPandas, FlatMapGroupsInPandas,
    # FlatMapCoGroupsInPandas, ApplyInPandasWithState, MapInArrow,
    # FlatMapGroupsInArrow, PythonMapInArrow)
    r"^[ :+\-]*(?:\*\(\d+\) )?"
    r"(?:\w*(?:BatchEvalPython|ArrowEvalPython|InPandas|InArrow)\w*)\b",
    re.MULTILINE,
)


def is_python_path(executed_plan_text: str) -> bool:
    """Whether any stage of the (simple executed) plan text leaves the
    JVM: row-at-a-time UDFs (BatchEvalPython), Arrow-batched scalar UDFs
    (ArrowEvalPython), every pandas fan-out (MapInPandas,
    FlatMapGroupsInPandas, FlatMapCoGroupsInPandas,
    ApplyInPandasWithState — all contain "InPandas"), and the Arrow map
    variants (MapInArrow, FlatMapGroupsInArrow — "InArrow").

    Matches node NAMES at line heads only — the round-8 review found the
    old whole-text lowercase substring scan false-positived on string
    literals in predicates (e.g. a filter comparing a column against
    the literal 'MapInPandas')."""
    return _PY_NODE_HEAD_RE.search(executed_plan_text) is not None


_TREE_PREFIX_RE = re.compile(r"^[ :+\-]*")


def _dedupe_cached_subtrees(plan: str) -> str:
    """Collapse REPEATED ``InMemoryRelation`` subtree dumps to one copy.

    When a frame is persisted and consumed N times (e.g. clean_corpus's
    cache feeding 16 LSH band branches plus the anti-join probe), the
    plan STRING prints the full cached lineage at every reference, but
    execution computes it once and the other N−1 references are cache
    scans. Counting expensive snippets inside those repeats would report
    phantom duplication (q60 read ×272 post-persist when the real
    per-row cost went DOWN) — so keep the first dump of each distinct
    relation (duplication *inside* the cached plan still counts) and
    drop the textual repeats. Distinctness is the header line with
    Catalyst expr-ids stripped."""
    # Spark's treeString always ends with a newline; trailing blanks would
    # otherwise be absorbed into the LAST dump's subtree scan and its
    # fingerprint, so a final dump never matched an earlier identical one
    # (ADVICE r8). Blank lines are also excluded from fingerprints below.
    lines = plan.rstrip("\n").split("\n")
    depths = [_TREE_PREFIX_RE.match(ln).end() for ln in lines]

    # Pass 1: fingerprint every InMemoryRelation DUMP as header + its
    # whole subtree (expr-ids stripped). Two DISTINCT cached frames can
    # share a schema — e.g. the same corpus persisted after two
    # different filters renders identical headers — so a header-only
    # fingerprint would delete real work from the audit (r8 review).
    # Dumps of the SAME relation render the same subtree text; dumps
    # that differ keep both copies (over-counting is the safe failure
    # direction for a duplication detector).
    seen: set[str] = set()
    drop_header: set[int] = set()
    for i, line in enumerate(lines):
        body = line[depths[i] :]
        if not body.startswith("InMemoryRelation"):
            continue
        j = i + 1
        while j < len(lines) and (not lines[j].strip() or depths[j] > depths[i]):
            j += 1
        # fingerprint DEPTH-STRIPPED bodies: the same relation printed on
        # different branches carries different tree-drawing prefixes
        # (':' continuation vs spaces), which must not defeat the dedupe
        fingerprint = re.sub(
            r"#\d+",
            "#",
            body
            + "\n"
            + "\n".join(
                # keep RELATIVE depth (nesting structure), drop the
                # branch-dependent prefix characters
                " " * (depths[k] - depths[i]) + lines[k][depths[k] :]
                for k in range(i + 1, j)
                if lines[k].strip()
            ),
        )
        if fingerprint in seen:
            drop_header.add(i)
        else:
            seen.add(fingerprint)

    # Pass 2: emit, skipping dropped dumps and AQE initial-plan echoes
    out: list[str] = []
    skip_threshold: int | None = None
    skip_inclusive = False
    for i, line in enumerate(lines):
        depth = depths[i]
        if skip_threshold is not None:
            if not line.strip():
                # blanks INSIDE a dropped subtree / Initial-Plan section
                # stay dropped — pass 1 treats them as part of the
                # subtree, so ending the skip here would leak the rest of
                # the region back into the deduped text (ADVICE r8)
                continue
            if depth > skip_threshold or (
                skip_inclusive and depth == skip_threshold
            ):
                continue
            skip_threshold = None
        body = line[depth:]
        if i in drop_header:
            # subtree lines print strictly deeper than the header
            skip_threshold, skip_inclusive = depth, False
            continue
        if body.startswith("== Initial Plan =="):
            # a cached AQE plan prints BOTH its final and initial plans;
            # the initial section is a textual echo of the same work.
            # Section BODY lines print at the header's own depth →
            # inclusive skip.
            skip_threshold, skip_inclusive = depth, True
            continue
        out.append(line)
    return "\n".join(out)


# functions whose per-row cost makes duplication matter: hashes, string
# builders, array pipelines, higher-order lambdas, regex
_EXPENSIVE_FNS = (
    "md5", "sha2", "crc32", "xxhash64", "hash",
    "sequence", "aggregate", "zip_with", "transform", "filter",
    "array_sort", "sort_array", "regexp_replace", "regexp_extract_all",
    "split", "levenshtein", "conv",
)
_EXPENSIVE_CALL_RE = re.compile(r"\b(" + "|".join(_EXPENSIVE_FNS) + r")\(")


def expensive_snippet_counts(df: DataFrame) -> dict[str, int]:
    """Copies of each long expensive-call snippet in the OPTIMIZED plan —
    the round-7 duplication detector. Catalyst's CollapseProject inlines
    a projection's expressions at every consumer reference unless the
    alias is non-cheap AND referenced more than once; an operator built
    as one giant projection therefore pays N× for every named
    sub-expression (q199's md5 boundary chain appeared 16 times and ran
    4.5× slower than its staged rewrite).

    Each snippet is the call text up to its MATCHING close paren (capped
    at 400 chars, so an over-long call truncates identically every
    time): a fixed-length raw prefix would bleed into each copy's
    DIFFERENT surrounding context and make N copies hash to N distinct
    singletons, and a greedy multi-hundred-char match would swallow a
    second copy starting inside the first (finditer is non-overlapping —
    here matches are just ``name(``, so close copies all count).
    Catalyst expr-ids (#123) are stripped so copies of the same
    expression hash together; snippets under 40 chars are ignored (too
    generic to indicate a real chain)."""
    plan = _dedupe_cached_subtrees(
        df._jdf.queryExecution().optimizedPlan().toString()
    )
    counts: dict[str, int] = {}
    for m in _EXPENSIVE_CALL_RE.finditer(plan):
        depth, j = 1, m.end()
        limit = min(len(plan), m.start() + 600)
        while j < limit and depth:
            c = plan[j]
            if c == "\\":
                j += 2  # escaped char (regex literals like \( in the plan
                # text) must not move the paren depth — an unbalanced
                # escaped paren would otherwise desync the scan and run
                # every copy to the cap with different trailing context
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        # normalize BEFORE the length cap: expr-ids differ in digit count
        # across join branches (#87 vs #1042), so a raw-offset cap would
        # cover different logical spans and split copies of the same
        # over-long chain into distinct fragments
        frag = re.sub(r"#\d+", "#", plan[m.start() : j])[:400]
        if len(frag) >= 40:
            counts[frag] = counts.get(frag, 0) + 1
    return counts
