#!/usr/bin/env python
"""Scaling benchmark: headline suite at sf0.1 AND sf1 (10× replica).

VERDICT r7 item 4: one committed run at 10× the usual bench scale
turns "the plans look linear" into a measured per-query scaling
ratio. Runs bench.py (fresh interpreter per SF so JVM/codegen state
can't leak between scales — each run still self-warms at sf0.001),
then writes BENCH_LOCAL_r{N}.json with both runs plus the sf1/sf0.1
ratio per headline query. Data is 10× rows with identical per-row
values (tools/make_scaled_sf.py), so ratio ≈ 10 is linear; ratios
well above ~13 flag a superlinear stage.

Usage: python tools/run_scaling_bench.py --round 8 [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".benchdata", "sf1")


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus)
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    # bench.py prints ONE JSON line last
    line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    if not os.path.isdir(SF1):
        sys.exit(
            f"{SF1} missing — run tools/make_scaled_sf.py first"
        )

    r01 = run_bench(SF01, args.cpus)
    print(json.dumps(r01))
    r1 = run_bench(SF1, args.cpus)
    print(json.dumps(r1))

    scaling = {
        q: round(r1["queries"][q] / max(r01["queries"][q], 1e-9), 2)
        for q in r01["queries"]
    }
    out = {
        "runs": [r01, r1],
        "scaling_sf1_over_sf0_1": {
            "note": (
                "data is a 10x key-offset replica of sf0.1 "
                "(tools/make_scaled_sf.py) — identical per-row values, "
                "so ratio ~<=10 is linear-or-better; >~13 flags a "
                "superlinear stage (log factors + fixed overheads "
                "amortize, so most ratios land WELL below 10 at this "
                "toy absolute scale)"
            ),
            "ratios": scaling,
            "total_ratio": round(
                r1["value"] / max(r01["value"], 1e-9), 2
            ),
        },
    }
    path = os.path.join(REPO, f"BENCH_LOCAL_r{args.round:02d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}; total ratio "
          f"{out['scaling_sf1_over_sf0_1']['total_ratio']}")


if __name__ == "__main__":
    main()
