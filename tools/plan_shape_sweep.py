#!/usr/bin/env python
"""Plan-shape census over the whole catalog: for every key, build the
DataFrame at --sf and record physical-plan node counts (parquet scans,
RDD scans, exchanges, python nodes, total), plus the build-phase wall
time (eager pre-flights included). Plan-only — nothing is executed
beyond what queries() itself materializes.

The census is the optimization round's measure-first artifact: keys
whose plans scan the same input many times (duplicated upstreams) or
carry outsized exchange counts surface mechanically instead of by
spot-reading 481 plans.

Usage: python tools/plan_shape_sweep.py [--sf DIR] [--out FILE] [key ...]
"""
import argparse
import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from llm_map_reduce_summarizer_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

NODE = re.compile(r"^\(\d+\) (\S+)", re.M)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/plan_shape_sweep.json")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plan_shape_sweep")
    qs = entrymod.queries()
    keys = args.keys or sorted(qs)
    rows = {}
    for i, k in enumerate(keys):
        t0 = time.perf_counter()
        try:
            df = qs[k](spark, args.sf)
            build_s = time.perf_counter() - t0
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            ops = NODE.findall(plan)
            rows[k] = {
                "build_s": round(build_s, 3),
                "nodes": len(ops),
                "scan_parquet": plan.count(") Scan parquet"),
                "scan_rdd": plan.count(") Scan ExistingRDD"),
                "exchange": sum(1 for o in ops if o == "Exchange"),
                "bcast_exchange": sum(1 for o in ops if o == "BroadcastExchange"),
                "py": sum(1 for o in ops if o in (
                    "ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas")),
                "smj": sum(1 for o in ops if o == "SortMergeJoin"),
                "cartesian": sum(1 for o in ops if o == "CartesianProduct"),
            }
        except Exception as e:  # noqa: BLE001
            rows[k] = {"error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(limit=1)
        if (i + 1) % 50 == 0:
            print(f"...{i + 1}/{len(keys)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    bad = {k: v for k, v in rows.items() if "error" in v}
    print(f"wrote {args.out}: {len(rows)} keys, {len(bad)} errors")
    for k, v in sorted(
        (kv for kv in rows.items() if "error" not in kv[1]),
        key=lambda kv: -(kv[1]["scan_parquet"] + kv[1]["scan_rdd"]),
    )[:25]:
        print(f"{k}: scans={v['scan_parquet']}+{v['scan_rdd']} "
              f"ex={v['exchange']} nodes={v['nodes']} build={v['build_s']}")
    if bad:
        print("ERRORS:", json.dumps(bad, indent=1))


if __name__ == "__main__":
    main()
