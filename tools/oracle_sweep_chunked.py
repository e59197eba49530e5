"""Chunked full-suite oracle sweep for BIG fixtures (r9, VERDICT r8 #2).

``tests/run_oracle_check.py`` runs the whole suite in one process — fine
at the driver fixtures, but an sf1 sweep (6 M lineitem / 50 k documents)
has a heavy tail on BOTH sides (Spark heavies, DuckDB oracle CTEs), and
one stuck query must not discard hours of green results. This driver:

1. splits the suite into chunks of ``--chunk`` queries,
2. runs each chunk as a ``run_oracle_check.py <sf_dir> --json`` child
   with a per-chunk ``--timeout`` (a timeout kills ONLY that chunk),
3. retries every query of a timed-out chunk SOLO with the same budget,
   so one slow query can't shadow its chunk-mates,
4. merges everything into one artifact with explicit per-query status:
   ``match`` / ``rows_only`` / ``timeout`` / error text — timeouts and
   ``--skip`` entries are recorded as EXCLUSIONS, never silently absent.

Usage:
    python tools/oracle_sweep_chunked.py /tmp/sf1 CORRECTNESS_SF1_r09.json \
        [--chunk 12] [--timeout 560] [--skip qNNN_a,qNNN_b] [--resume]
        [--only qNNN_a,qNNN_b]   # restrict the sweep to these queries

``--resume`` seeds already-green entries from an existing artifact at the
output path and re-runs only the rest (pending / timeout / crash /
mismatch) — an interrupted multi-hour sweep continues instead of
restarting, and a post-fix re-sweep touches only the previously-red rows.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _run_chunk(
    sf_dir: str, names: "list[str]", timeout: int
) -> "tuple[str, dict | None]":
    """One run_oracle_check.py child over `names`.

    Returns ``("ok", queries)``, ``("timeout", None)``, or
    ``("crash", None)`` — a crashed child (import error, OOM-kill,
    invalid JSON) must NOT be recorded as a timeout, or a systematic
    failure reads as 192 independent slow queries (r9 review)."""
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
        out_path = fh.name
    cmd = [
        sys.executable,
        os.path.join(_REPO, "tests", "run_oracle_check.py"),
        sf_dir,
        "--json",
        out_path,
        *names,
    ]
    try:
        try:
            subprocess.run(
                cmd, timeout=timeout, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, check=False,
            )
        except subprocess.TimeoutExpired:
            return "timeout", None
        except OSError:
            return "crash", None
        try:
            with open(out_path) as fh:
                return "ok", json.load(fh)["queries"]
        except (OSError, ValueError, KeyError):
            return "crash", None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main() -> int:
    args = sys.argv[1:]
    chunk, timeout, skip, only = 12, 560, set(), set()
    resume = "--resume" in args
    if resume:
        args.remove("--resume")
    for flag, cast in (
        ("--chunk", int),
        ("--timeout", int),
        ("--skip", str),
        ("--only", str),
    ):
        if flag in args:
            i = args.index(flag)
            val = cast(args[i + 1])
            args = args[:i] + args[i + 2 :]
            if flag == "--chunk":
                chunk = val
            elif flag == "--timeout":
                timeout = val
            elif flag == "--skip":
                skip = {s for s in val.split(",") if s}
            else:
                only = {s for s in val.split(",") if s}
    if len(args) != 2:
        print(__doc__)
        return 2
    sf_dir, out_json = args

    from polars_dataset_spark import suite

    names = sorted(suite.QUERIES)
    if only:
        missing = only - set(names)
        if missing:
            print(f"--only names not in suite: {sorted(missing)}")
            return 2
        names = [n for n in names if n in only]
    results: "dict[str, dict]" = {
        n: {"status": "skipped", "err": "excluded via --skip"} for n in skip
    }
    def ok(r):
        return r.get("match") is True or r.get("rows_only") is True

    prior: "dict[str, dict]" = {}
    if resume:
        try:
            with open(os.path.join(_REPO, out_json)) as fh:
                prior = {
                    n: r
                    for n, r in json.load(fh)["queries"].items()
                    if ok(r) and n not in skip
                }
            print(f"resume: keeping {len(prior)} green rows", flush=True)
        except (OSError, ValueError, KeyError):
            print("resume: no usable prior artifact; full sweep", flush=True)
    results.update(prior)
    todo = [n for n in names if n not in skip and n not in prior]
    for n in todo:
        results[n] = {"status": "pending", "err": "sweep not reached"}
    t0 = time.time()

    def write_artifact():
        greens = sum(1 for r in results.values() if ok(r))
        excluded = {n: r for n, r in results.items() if not ok(r)}
        artifact = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_green": greens,
            "exclusions": {
                n: r.get("err") or r.get("problems") for n, r in excluded.items()
            },
            "wall_sec": round(time.time() - t0, 1),
            "queries": results,
        }
        # write-then-rename so the artifact is always valid JSON even if
        # the sweep is interrupted mid-chunk
        dst = os.path.join(_REPO, out_json)
        with open(dst + ".tmp", "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        os.replace(dst + ".tmp", dst)
        return greens, excluded

    for c0 in range(0, len(todo), chunk):
        batch = todo[c0 : c0 + chunk]
        status, got = _run_chunk(sf_dir, batch, timeout)
        if status != "ok":
            print(f"chunk {batch[0]}..{batch[-1]} {status}; retrying solo",
                  flush=True)
            for n in batch:
                sstat, solo = _run_chunk(sf_dir, [n], timeout)
                if sstat == "ok" and solo is not None and n in solo:
                    results[n] = solo[n]
                elif sstat == "timeout":
                    results[n] = {"status": "timeout",
                                  "err": f"exceeded {timeout}s solo"}
                    print(f"TIMEOUT {n}", flush=True)
                else:
                    results[n] = {"status": "crash",
                                  "err": "child crashed / produced no JSON"}
                    print(f"CRASH {n}", flush=True)
                write_artifact()
        else:
            for n in batch:
                results[n] = got.get(
                    n, {"status": "missing", "err": "absent from chunk output"}
                )
        write_artifact()
        done = min(c0 + chunk, len(todo))
        print(f"[{done}/{len(todo)}] {time.time() - t0:.0f}s", flush=True)

    greens, excluded = write_artifact()
    print(f"{greens}/{len(results)} green; exclusions: {sorted(excluded)}")
    return 0 if greens == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
