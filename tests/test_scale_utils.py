"""Scale utilities: bucketed co-located joins and salted skew joins."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from llm_map_reduce_summarizer_spark.operators.joins import salted_join
from llm_map_reduce_summarizer_spark.sources.bucketed import save_bucketed
from llm_map_reduce_summarizer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    save_bucketed(
        orders, "orders_b", ["o_orderkey"], 4,
        os.path.join(str(tmp_path), "orders_b"),
    )
    save_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], 4,
        os.path.join(str(tmp_path), "lineitem_b"),
    )
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"), "o_orderkey"
        )
        # broadcast would hide the bucketing; force the merge path like
        # a fact-fact join at scale
        joined_sm = spark.table("lineitem_b").hint("merge").join(
            spark.table("orders_b").hint("merge"), "o_orderkey"
        )
        plan = _plan(joined_sm)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum(F.col("l_quantity") * F.col("o_totalprice"))).collect()
    b = salted.agg(F.sum(F.col("l_quantity") * F.col("o_totalprice"))).collect()
    assert abs(a[0][0] - b[0][0]) < 1e-6 * abs(a[0][0])
