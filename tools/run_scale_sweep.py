#!/usr/bin/env python
"""Whole-catalog scale sweep: every key at the 10x rung, and every
documents/embeddings key at the 100x rung.

The r9 ladder (6 hand-picked family keys) caught two real scale bugs
that eight rounds of sf0.1 benching never touched — a fixed block
grid OOMing at 200k vectors and dense-graph components going
Σ deg^k. This tool closes the coverage gap the hand-list leaves: it
executes EVERY catalog key against the scaled replicas
(tools/make_scaled_sf.py) and records per-key wall seconds, so a
super-linear stage anywhere in the 480-key surface shows up as a
number, not a hope. Keys whose tables aren't present at a rung are
recorded as skipped (the 100x replica carries only
documents/embeddings + the fixed dims); keys that exceed the watchdog
budget are CANCELLED via their job group and recorded as timeouts —
a timeout at 10x/100x with a sub-second sf0.1 cost IS the finding.

One shared session per rung (plan compilation dominates a fresh
session per key); each key self-warms at sf0.001 so the recorded
number is the scaled-data execution, not first-call codegen. Keys
run SEQUENTIALLY so the watchdog budget means "this key alone had
the whole 32-thread box" — no co-tenant noise in what we flag.

Usage: python tools/run_scale_sweep.py --round 9 [--rung 10x|100x]
       [--timeout 150] [--keys k1,k2]
Writes/merges SCALE_SWEEP_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNGS = {
    "10x": os.path.join(REPO, ".benchdata", "sf1"),
    "100x": os.path.join(REPO, ".benchdata", "sf10"),
}
SF_WARM = "/root/testdata/sf0.001"


def run_rung(rung: str, sf_dir: str, timeout: float,
             only: list[str] | None) -> dict:
    from llm_map_reduce_summarizer_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(f"scale-sweep-{rung}")
    sc = spark.sparkContext
    if rung == "100x":
        # scale-aware shuffle sizing (r11): the session default pins
        # shuffle.partitions = cpus (right for the sf0.1 gate), but at
        # the 100x rung the TPC-H fact shuffles put multi-GB in each
        # of 32 partitions and the hash maps thrash/OOM. 256 keeps
        # per-task state at gate-rung size — exactly the
        # partitions ∝ data sizing a real cluster uses. Runtime conf,
        # AQE still coalesces small stages. Pair with
        # SPARK_GRAFT_DRIVER_MEM=64g (the 16g default was sized for
        # the documents-only 100x replica).
        spark.conf.set("spark.sql.shuffle.partitions", "256")
    tables = {
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    }
    qs = entrymod.queries()
    keys = sorted(qs) if not only else [k for k in sorted(qs) if k in only]
    out: dict[str, dict] = {}
    n_run = n_skip = n_to = n_err = 0
    for key in keys:
        group = f"sweep-{key}"

        def execute(q=qs[key], g=group):
            sc.setJobGroup(g, g, interruptOnCancel=True)
            try:
                q(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                sc.setJobGroup("", "")

        # warm-up compiles the shapes; missing-table/contract raises
        # surface here and classify as skips, not timings
        try:
            qs[key](spark, SF_WARM).write.format("noop").mode(
                "overwrite"
            ).save()
            # cheap static screen: don't even start keys whose source
            # tables aren't in this rung's replica (the loader would
            # raise mid-plan anyway, but this keeps the log clean)
            missing = _missing_tables(qs[key], spark, sf_dir, tables)
        except Exception as exc:  # pragma: no cover - env specific
            out[key] = {"status": "warmup_error", "err": repr(exc)[:300]}
            n_err += 1
            continue
        if missing:
            out[key] = {"status": "skip", "missing": sorted(missing)}
            n_skip += 1
            continue

        err: list[str] = []
        t0 = time.perf_counter()
        th = threading.Thread(
            target=lambda: _capture(execute, err), daemon=True
        )
        th.start()
        th.join(timeout)
        sec = round(time.perf_counter() - t0, 2)
        if th.is_alive():
            # watchdog fired: cancel and then DRAIN — a runaway task
            # outliving a 30s grace keeps executing on the shared
            # session and contaminates the next key's wall-clock
            # (ADVICE r9), so wait until the worker thread actually
            # exits (bounded at 300s) and flag the row if it never does
            sc.cancelJobGroup(group)
            drain0 = time.perf_counter()
            while th.is_alive() and time.perf_counter() - drain0 < 300:
                th.join(5)
            row = {"status": "timeout", "budget_sec": timeout}
            if th.is_alive():
                row["undrained"] = True
                print(
                    f"WARN {key}: cancelled tasks not drained after "
                    "300s — subsequent timings on this rung may be "
                    "contaminated",
                    flush=True,
                )
            out[key] = row
            n_to += 1
            print(f"TIMEOUT {key} after {timeout}s", flush=True)
        elif err:
            low = err[0].lower()
            if "no such file" in low or "path does not exist" in low:
                out[key] = {"status": "skip", "missing": ["<runtime>"]}
                n_skip += 1
            elif (
                "spark.llm_map_reduce_summarizer." in err[0]
                and "ValueError" in err[0]
            ):
                # an ENFORCED verification-tier cap fired (the raise
                # names its conf): the rung exceeds the key's
                # documented scale contract — by design, not a bug
                out[key] = {"status": "contract_raise", "err": err[0][-300:]}
                n_skip += 1
            else:
                # NOTE tail capture ([-300:]): the END of a traceback
                # carries the exception line — the r9 artifact stored
                # the head and physically could not show what failed.
                # "cancelled"/"interrupted" text lands here too: the
                # watchdog branch above owns every real timeout (this
                # branch only runs when the first join returned), so a
                # cancellation-looking error with no live watchdog is
                # an ERROR, not a timeout (ADVICE r9).
                out[key] = {"status": "error", "err": err[0][-300:]}
                n_err += 1
                print(f"ERROR {key}: {err[0][-160:]}", flush=True)
        else:
            out[key] = {"status": "ok", "sec": sec}
            n_run += 1
            if sec > 30:
                print(f"SLOW {key}: {sec}s", flush=True)
    print(
        f"{rung}: {n_run} ok, {n_skip} skipped, {n_to} timeout, "
        f"{n_err} error",
        flush=True,
    )
    return out


def _capture(fn, err: list) -> None:
    try:
        fn()
    except Exception:
        err.append(traceback.format_exc()[-1200:])


def _missing_tables(q, spark, sf_dir: str, present: set[str]) -> set[str]:
    """Tables a key's plan would read at sf_dir that the rung lacks.

    Resolved by building the UNEXECUTED plan against sf0.001 and
    scraping its parquet scan paths — the catalog convention loads via
    sources.tables.load_table(sf_dir, name), so the table set of a
    plan is sf-independent. The needed set is parsed from the plan's
    actual ``<name>.parquet`` relation paths (path-component anchored),
    not a hand-maintained whitelist — a key reading a new table can't
    slip past the static screen (ADVICE r9)."""
    try:
        plan = q(spark, SF_WARM)._jdf.queryExecution().analyzed().toString()
    except Exception:
        return set()
    needed = set(re.findall(r"/([A-Za-z0-9_]+)\.parquet", plan))
    return needed - present


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--rung", choices=list(RUNGS), default=None)
    ap.add_argument("--timeout", type=float, default=150.0)
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    only = args.keys.split(",") if args.keys else None
    rungs = [args.rung] if args.rung else list(RUNGS)

    path = os.path.join(REPO, f"SCALE_SWEEP_r{args.round:02d}.json")
    data: dict = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
    data.setdefault(
        "note",
        "whole-catalog execution at the scaled rungs "
        "(tools/make_scaled_sf.py replicas): per-key wall sec on "
        "local[32], one key at a time, watchdog-cancelled at "
        "budget_sec. skip = rung lacks the key's source tables; a "
        "timeout here with a sub-second sf0.1 bench cost flags a "
        "super-linear stage.",
    )
    for rung in rungs:
        sf_dir = RUNGS[rung]
        if not os.path.isdir(sf_dir):
            sys.exit(f"{sf_dir} missing — run tools/make_scaled_sf.py")
        out = run_rung(rung, sf_dir, args.timeout, only)
        # a --keys re-run refreshes just those rows; a full run
        # replaces the rung (prevents a single-key fixup from
        # clobbering 479 sibling measurements)
        if only and isinstance(data.get(rung), dict):
            data[rung] = {**data[rung], **out}
        else:
            data[rung] = out
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(data, fh, indent=1)
        print(f"wrote {path} [{rung}]", flush=True)


if __name__ == "__main__":
    main()
