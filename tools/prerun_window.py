#!/usr/bin/env python
"""Builder-side pre-run of the NEXT driver window: WINDOW_PRERUN_r{N}.json.

VERDICT r9 item 1: the r9 driver window forfeited 36 first-time keys
to an environmental DuckDB OOM in the driver sandbox (46/50 rows
err'd on a 2048-byte allocation, including keys hash-green in earlier
rounds). This tool armors the round against a repeat: it computes the
EXACT 50-key window the driver will check (the first 50 keys of
``__spark_entry__.queries()`` order — the two-pool LRV interleave is a
pure function of the committed CORRECTNESS artifacts, so builder and
driver derive the same window at the same HEAD) and runs each key
through the driver's own compare (``tests/oracle_utils.run_compare``)
at sf0.01. If the driver sandbox OOMs again, this artifact is a
same-window, same-code adjudication record instead of a whole-catalog
one.

Usage: python tools/prerun_window.py --round 10 [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF = "/root/testdata/sf0.01"
WINDOW = 50


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from llm_map_reduce_summarizer_spark.session import get_spark

    import __spark_entry__ as entrymod
    from oracle_utils import run_compare

    spark = get_spark("prerun-window")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    window = list(qs)[:WINDOW]

    def one(key: str):
        t0 = time.perf_counter()
        try:
            if key in osql:
                problems = run_compare(spark, SF, qs[key], osql[key])
            else:
                # driver records a rows-only check for oracle-less keys
                n = qs[key](spark, SF).count()
                problems = [] if n >= 0 else ["negative row count"]
        except Exception:
            problems = [f"exception:\n{traceback.format_exc()[-800:]}"]
        return key, problems, round(time.perf_counter() - t0, 1)

    results: dict[str, dict] = {}
    failures: dict[str, list[str]] = {}
    t_start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for key, problems, sec in pool.map(one, window):
            results[key] = {
                "status": "ok" if not problems else "fail",
                "oracle": key in osql,
                "sec": sec,
            }
            if problems:
                failures[key] = problems
                print(f"FAIL {key}: {problems}", flush=True)

    out = {
        "round": args.round,
        "sf": 0.01,
        "window": window,
        "keys": len(window),
        "ok": len(window) - len(failures),
        "failures": failures,
        "total_sec": round(time.perf_counter() - t_start, 1),
        "note": (
            "builder pre-run of the driver's exact next 50-key window "
            "(first 50 keys of __spark_entry__.queries() order at this "
            "HEAD) through tests/oracle_utils.run_compare at sf0.01 — "
            "the same-window, same-code adjudication record VERDICT r9 "
            "item 1 asked for, in case the driver sandbox OOMs again"
        ),
        "results": results,
    }
    path = os.path.join(REPO, f"WINDOW_PRERUN_r{args.round:02d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(f"{path}: {out['ok']}/{len(window)} ok")


if __name__ == "__main__":
    main()
