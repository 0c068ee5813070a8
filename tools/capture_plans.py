#!/usr/bin/env python
"""Capture .explain('formatted') for a list of query keys into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r12).

Usage: python tools/capture_plans.py before|after [key ...]
Plan-only: builds each DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.1)
and writes its formatted physical plan; nothing is executed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from llm_map_reduce_summarizer_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

DEFAULT_KEYS = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_revenue_forecast", "q18_large_orders", "topk_per_group",
    "events_sessionize", "events_hourly", "pipeline_e2e",
    "reduce_hierarchical", "doc_quality", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "knn_bruteforce", "emb_neardup",
]

def main():
    tag = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    for k in keys:
        df = qs[k](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{k}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("wrote", k)

if __name__ == "__main__":
    main()
