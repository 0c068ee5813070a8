#!/usr/bin/env python
"""Per-query time attribution: build phase vs execute phase.

For each key, times (a) the queries()[key](spark, sf_dir) CALL — which
runs every eager pre-flight (count() guards, localCheckpoint
materializes) — and (b) the noop save of the returned frame. The bench
times (a)+(b) as one number; optimization needs them separately
because materialize jobs never show in the final explain plan.

Usage: python tools/profile_query.py [--sf DIR] [--reps N] key [key ...]
Each key is warmed once at sf0.001 (same methodology as bench.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from llm_map_reduce_summarizer_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile_query")
    qs = entrymod.queries()
    for key in args.keys:
        fn = qs[key]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()  # warm codegen/JIT
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{key} build rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{key} exec rep{rep}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{key} rep{rep}: build {t1 - t0:7.3f}s  "
                f"exec {t2 - t1:7.3f}s  total {t2 - t0:7.3f}s",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
