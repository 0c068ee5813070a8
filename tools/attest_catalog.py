#!/usr/bin/env python
"""Whole-catalog local attestation: VERIFY_LOCAL_r{N}.json.

Runs the driver's exact Spark-vs-DuckDB compare
(tests/oracle_utils.run_compare) over EVERY catalog key at sf0.01,
plus a headline/heavy spot-check at sf0.1, and writes the round's
VERIFY_LOCAL artifact. This is the standing r7+ convention (the
driver's own window covers only 50 keys/round; this attests the
backlog at HEAD every round) — previously a /tmp script, now
committed.

Keys run through a thread pool (same safety argument as
tests/test_oracle.py: independent keys, uuid-named stream sinks,
per-call DuckDB connections).

Usage: python tools/attest_catalog.py --round 8 [--workers 8]
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

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

# headline + heaviest keys re-checked at 10x the gate's scale
SPOTCHECK_SF01 = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_revenue_forecast", "q18_large_orders", "topk_per_group",
    "events_sessionize", "events_hourly", "pipeline_e2e",
    "reduce_hierarchical", "doc_quality", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "knn_bruteforce", "emb_neardup",
    "emb_clusters", "emb_dedup_apply", "emb_kmeans",
    "corpus_semantic_dedup", "corpus_dsir_weights", "knn_ivfpq",
    "corpus_dedup_incremental", "knn_graph", "corpus_kn_bigram_lm",
    "events_attribution_markov",
]

# VERDICT r8 item 5: the statistics-heavy keys (quantiles, sketches,
# CIs, tests, entropy/divergence, forecasts, DP/anonymity) are the
# ones whose value bugs only surface at larger group cardinalities
# (interpolation branches, sketch bounds), so they join the sf0.1
# pass. Selected by NAME PATTERN against the live catalog, not a
# hand-list — a new stat key is attested at sf0.1 the round it ships.
import re  # noqa: E402

STATS_PATTERN = re.compile(
    r"quantile|sketch|_ci\b|_ci_|ci$|ks_|chi2|anova|bootstrap|entropy"
    r"|perplex|diverg|drift|corr|median|hist|gini|zipf|heaps|lognormal"
    r"|burstiness|tdigest|percentile|stddev|variance|mannwhitney"
    r"|regression|theta|forecast|msprt|cuped|dp_|t_closeness|anonym"
    r"|yule|delta|outlier|anomal|winsor|mad|benford|autocorr|season"
    r"|ewma|holt|changepoint|cusum"
)


# VERDICT r9 item 7: keep raising sf0.1 coverage toward the full
# catalog at ~40-45 keys/round. The rotation is self-advancing: keys
# already attested ok at sf0.1 in ANY committed VERIFY_LOCAL artifact
# drop out of the pool, so each round's run covers the next slice in
# sorted order with zero hand-maintenance.
SF01_ROTATION = 45


def _sf01_covered() -> set[str]:
    import glob

    covered: set[str] = set()
    for p in glob.glob(os.path.join(REPO, "VERIFY_LOCAL_r*.json")):
        try:
            with open(p, encoding="utf-8") as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        spot = data.get("sf0_1_spotcheck", {}).get("results", {})
        covered.update(
            k for k, v in spot.items() if v.get("status") == "ok"
        )
    return covered


def sf01_keys(
    all_keys: list[str],
    rotation: int = SF01_ROTATION,
    full: bool = False,
) -> list[str]:
    # --full-sf01 (VERDICT r10 item 6): the whole catalog at sf0.1 in
    # ONE run at this HEAD — the standing per-round gate (the rotation
    # union proved itself by catching corpus_ppl_buckets, but a
    # union's members were attested at different HEADs)
    if full:
        return sorted(all_keys)
    sel = set(SPOTCHECK_SF01)
    sel.update(k for k in all_keys if STATS_PATTERN.search(k))
    done = _sf01_covered() | sel
    sel.update([k for k in sorted(all_keys) if k not in done][:rotation])
    return sorted(sel)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--full-sf01",
        action="store_true",
        help="run EVERY catalog key at sf0.1 (the r11+ standing "
        "per-round gate), ignoring the rotation",
    )
    ap.add_argument(
        "--rotation",
        type=int,
        default=SF01_ROTATION,
        help="uncovered keys to add to the sf0.1 pass (45/round "
        "default; pass a large value to drain coverage in one run)",
    )
    args = ap.parse_args()

    from llm_map_reduce_summarizer_spark.session import get_spark

    import __spark_entry__ as entrymod
    from oracle_utils import run_compare

    spark = get_spark("attest")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    keys = sorted(k for k in qs if k in osql)

    def one(key: str, sf: str):
        t0 = time.perf_counter()
        try:
            problems = run_compare(spark, sf, qs[key], osql[key])
        except Exception:
            problems = [f"exception:\n{traceback.format_exc()}"]
        return key, problems, round(time.perf_counter() - t0, 1)

    t_start = time.perf_counter()
    results: dict[str, dict] = {}
    failures: dict[str, list[str]] = {}
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for key, problems, sec in pool.map(
            lambda k: one(k, SF001), keys
        ):
            results[key] = {
                "status": "ok" if not problems else "fail",
                "sec": sec,
            }
            if problems:
                failures[key] = problems
                print(f"FAIL {key}: {problems}", flush=True)
    total = round(time.perf_counter() - t_start, 1)

    spot_keys = sf01_keys(keys, args.rotation, args.full_sf01)
    spot: dict[str, dict] = {}
    spot_ok = 0
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for key, problems, sec in pool.map(
            lambda k: one(k, SF01), spot_keys
        ):
            spot[key] = {
                "status": "ok" if not problems else "fail",
                "sec": sec,
            }
            spot_ok += not problems
            if problems:
                print(f"FAIL@sf0.1 {key}: {problems}", flush=True)

    out = {
        "round": args.round,
        "sf": 0.01,
        "keys": len(keys),
        "ok": len(keys) - len(failures),
        "failures": failures,
        "total_sec": total,
        "note": (
            "local run of the driver's exact Spark-vs-DuckDB compare "
            "(tests/oracle_utils.run_compare) over EVERY catalog key "
            "at sf0.01 — attests the never-driver-sampled backlog "
            "ahead of the 50-key/round rotation"
        ),
        "results": results,
        "sf0_1_spotcheck": {
            "note": (
                "headline/heavy hand-list + every statistics-heavy "
                "key (STATS_PATTERN name match) at sf0.1 — the scale "
                "where quantile-interpolation / sketch-bound value "
                "bugs actually surface"
            ),
            "keys": len(spot_keys),
            "ok": spot_ok,
            "results": spot,
        },
    }
    path = args.out or os.path.join(
        REPO, f"VERIFY_LOCAL_r{args.round:02d}.json"
    )
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"{path}: {out['ok']}/{out['keys']} at sf0.01, "
        f"{spot_ok}/{len(spot_keys)} at sf0.1, {total}s"
    )


if __name__ == "__main__":
    main()
