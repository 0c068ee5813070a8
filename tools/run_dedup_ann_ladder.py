#!/usr/bin/env python
"""Scaling ladder (two decades, three with --deep) for the dedup/ANN
family (VERDICT r8
item 4): the operators whose 100 TB story rests on bucket-bounded
candidate generation get a MEASURED 100x point, not just the 10x one.

Runs the family keys at sf0.1, 10x (.benchdata/sf1) and 100x
(.benchdata/sf10 — documents+embeddings replicas via
``make_scaled_sf.py --k 100 --tables documents,embeddings``; the other
tables are not read by these keys). One fresh interpreter per scale so
JVM/codegen state cannot leak between runs; each key self-warms at
sf0.001 first. Ratios land in BENCH_LOCAL_r{N}.json under
``dedup_ann_ladder`` (the file run_scaling_bench.py wrote).

``dedup_ngram_jaccard`` is deliberately ABSENT: its enforced
verification-set guard raises at 500k docs — at corpus scale the
family's path IS ``dedup_minhash_lsh``, which is measured here.

Usage: python tools/run_dedup_ann_ladder.py --round 9 [--cpus 32]
       (internal) --run-one DIR --cpus N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LADDER_KEYS = [
    "dedup_minhash_lsh",
    "emb_neardup",
    "knn_graph",
    "emb_dedup_apply",
    "corpus_semantic_dedup",
    # the r9 sample-bounded Lloyd: training is corpus-size-independent
    # now; the measured point proves it
    "emb_kmeans",
    # VERDICT r9 item 4: the one key with no measured 100x point (it
    # timed out at the sweep's 150s budget; its sibling emb_kmeans
    # finished at 113s). The ladder has no per-key watchdog, so this
    # records the true decade cost.
    "knn_ivf_lloyd",
]

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.path.join(REPO, ".benchdata", "sf1")),
    ("100x", os.path.join(REPO, ".benchdata", "sf10")),
]

# --deep adds a THIRD measured decade (5M docs / 2M vecs via
# ``make_scaled_sf.py --k 1000 --tables documents,embeddings``). Keys
# whose enforced verification-tier caps fire at this volume (the raise
# names its spark.llm_map_reduce_summarizer.* conf) are recorded as
# "contract_raise" rows rather than aborting the rung — at three
# decades the contracts SHOULD start firing; that is the measurement.
DEEP_SCALE = ("1000x", os.path.join(REPO, ".benchdata", "sf100"))

# partitions ∝ data at the scaled rungs (mirrors run_scale_sweep.py's
# r11 sizing note); paired with SPARK_GRAFT_DRIVER_MEM=64g set by the
# parent for these rungs.
SCALED_SHUFFLE_PARTITIONS = {"100x": 256, "1000x": 512}

_CONTRACT_MARK = "spark.llm_map_reduce_summarizer."


def run_one(sf_dir: str, label: str = "", keys: list[str] | None = None) -> None:
    sys.path.insert(0, REPO)
    from llm_map_reduce_summarizer_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("ladder")
    parts = SCALED_SHUFFLE_PARTITIONS.get(label)
    if parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    qs = entrymod.queries()
    timings: dict[str, float | str] = {}
    for key in keys or LADDER_KEYS:
        qs[key](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        t0 = time.perf_counter()
        try:
            # plan construction inside the try: several caps (e.g.
            # emb_neardup's n² pre-flight) fire eagerly at build time
            qs[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # pragma: no cover - scale specific
            msg = repr(exc)
            if _CONTRACT_MARK in msg and "ValueError" in msg:
                timings[key] = "contract_raise"
            else:
                timings[key] = "error:" + msg[-200:]
            print(f"RAISE {key}: {msg[-160:]}", file=sys.stderr, flush=True)
            continue
        timings[key] = round(time.perf_counter() - t0, 3)
    print("LADDER_JSON " + json.dumps(timings))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--run-one", default=None)
    ap.add_argument("--label", default="")
    ap.add_argument(
        "--deep",
        action="store_true",
        help="add the 1000x rung (.benchdata/sf100) as a third decade",
    )
    ap.add_argument(
        "--keys",
        default=None,
        help="comma-separated catalog keys overriding the default "
        "dedup/ANN family (e.g. a text-tier rung over the same "
        "documents replicas)",
    )
    ap.add_argument(
        "--section",
        default="dedup_ann_ladder",
        help="BENCH_LOCAL_r{N}.json section name for the results",
    )
    args = ap.parse_args()
    keys = args.keys.split(",") if args.keys else None

    if args.run_one:
        os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cpus))
        run_one(args.run_one, args.label, keys)
        return
    if args.round is None:
        sys.exit("--round is required")

    scales = SCALES + ([DEEP_SCALE] if args.deep else [])
    results: dict[str, dict[str, float | str]] = {}
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            sys.exit(f"{sf_dir} missing — run tools/make_scaled_sf.py")
        env = dict(os.environ)
        if label in SCALED_SHUFFLE_PARTITIONS:
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--run-one",
                sf_dir,
                "--label",
                label,
                "--cpus",
                str(args.cpus),
            ]
            + (["--keys", args.keys] if args.keys else []),
            capture_output=True,
            text=True,
            check=True,
            env=env,
        ).stdout
        line = [
            ln for ln in out.splitlines() if ln.startswith("LADDER_JSON ")
        ][-1]
        results[label] = json.loads(line[len("LADDER_JSON "):])
        print(label, json.dumps(results[label]), flush=True)

    def ratio(hi: str) -> dict[str, float | str]:
        r: dict[str, float | str] = {}
        for k in keys or LADDER_KEYS:
            top, base = results[hi][k], results["1x"][k]
            if isinstance(top, str) or isinstance(base, str):
                r[k] = top if isinstance(top, str) else "base_raised"
            else:
                r[k] = round(top / max(base, 1e-9), 2)
        return r

    section = {
        "note": (
            (
                "catalog keys at the sf0.1 scaling rungs "
                "(key-offset de-duplicated replicas); "
                if args.keys
                else "dedup/ANN family at 1x/10x/100x of sf0.1 "
                "(documents+embeddings key-offset de-duplicated "
                "replicas); "
            )
            + "ratio_100x ~<= 100 is linear-or-better."
            + (
                ""
                if args.keys
                else " dedup_ngram_jaccard is absent by design: its "
                "enforced verification-set guard raises at 500k docs."
            )
            + (
                " --deep adds a 1000x third decade (5M docs / 2M "
                "vecs); contract_raise rows are enforced "
                "verification-tier caps firing as documented."
                if args.deep
                else ""
            )
        ),
        "sec": results,
        "ratio_10x": ratio("10x"),
        "ratio_100x": ratio("100x"),
    }
    if args.deep:
        section["ratio_1000x"] = ratio("1000x")
    path = os.path.join(REPO, f"BENCH_LOCAL_r{args.round:02d}.json")
    data = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
    data[args.section] = section
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote {path} {args.section}; ratio_100x="
          f"{section['ratio_100x']}")


if __name__ == "__main__":
    main()
