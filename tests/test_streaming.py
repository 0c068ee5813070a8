"""Streaming-vs-batch parity (SURVEY.md §5.4): draining the events
parquet through the streaming plans must reproduce the batch results
exactly on static input."""

from __future__ import annotations

import pytest

from llm_map_reduce_summarizer_spark.plans.events import (
    events_hourly,
    events_sessionize,
)
from llm_map_reduce_summarizer_spark.plans.streams import (
    stream_hourly,
    stream_sessionize,
)
from .oracle_utils import compare_frames

SF = "/root/testdata/sf0.001"


def test_stream_hourly_matches_batch(spark):
    stream = stream_hourly(spark, SF).toPandas()
    batch = events_hourly(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_sessionize_matches_batch(spark):
    stream = stream_sessionize(spark, SF).toPandas()
    batch = events_sessionize(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_parquet_file_sink(spark, tmp_path):
    """availableNow drain into a parquet file sink; read-back equals
    the batch aggregation (append mode emits only watermark-closed
    windows, so compare against the batch result minus the last open
    hour)."""
    import os

    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        hourly_counts,
        read_events_stream,
    )

    ev = read_events_stream(spark, SF)
    out = os.path.join(str(tmp_path), "hourly_parquet")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = (
        hourly_counts(ev)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    batch = events_hourly(spark, SF)
    # append mode emits a window once the watermark (max event time -
    # 1h) passes its END: hour + 1h <= max_ts - 1h
    from llm_map_reduce_summarizer_spark.sources.tables import load_table

    max_ts = (
        load_table(spark, SF, "events").agg(F.max("ts")).collect()[0][0]
    )
    closed = batch.filter(
        F.col("hour") + F.expr("INTERVAL 2 HOURS") <= F.lit(max_ts)
    )
    assert back.count() == closed.count()
    assert compare_frames(back.toPandas(), closed.toPandas()) == []


def test_stream_asof_matches_batch(spark):
    from llm_map_reduce_summarizer_spark.plans.events import (
        events_asof_view,
    )
    from llm_map_reduce_summarizer_spark.plans.streams import (
        stream_asof_view,
    )

    stream = stream_asof_view(spark, SF).toPandas()
    batch = events_asof_view(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_asof_state_carries_across_batches(spark, tmp_path):
    """Feed events as two files/micro-batches split on time: a view in
    batch 1 must enrich a click arriving in batch 2 purely from carried
    state (the incremental property the single-file drain can't show)."""
    import os

    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        asof_enrich_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    us = 1_000_000
    rows = [
        # batch 1: user 1 view @10s, user 2 click with no prior view
        dict(event_id=1, ts=10 * us * 1000, user_id=1,
             event_type="view", value=5.0, props="{}"),
        dict(event_id=2, ts=11 * us * 1000, user_id=2,
             event_type="click", value=1.0, props="{}"),
    ]
    rows2 = [
        # batch 2: user 1 clicks twice; second click after a newer view
        dict(event_id=3, ts=20 * us * 1000, user_id=1,
             event_type="click", value=2.0, props="{}"),
        dict(event_id=4, ts=25 * us * 1000, user_id=1,
             event_type="view", value=7.0, props="{}"),
        dict(event_id=5, ts=30 * us * 1000, user_id=1,
             event_type="click", value=3.0, props="{}"),
    ]
    src = tmp_path / "events_stream"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 -> two micro-batches, in order
    pd.DataFrame(rows).to_parquet(src / "part-000.parquet")
    pd.DataFrame(rows2).to_parquet(src / "part-001.parquet")

    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    out = (
        run_available_now(asof_enrich_stream(raw), output_mode="update")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(out.index) == [2, 3, 5]
    # user 2's click: no view ever -> NULLs
    assert pd.isna(out.loc[2, "view_value"]) and pd.isna(out.loc[2, "view_ts_us"])
    # user 1's first click is enriched by the batch-1 view via state
    assert out.loc[3, "view_value"] == 5.0
    assert out.loc[3, "view_ts_us"] == 10 * us
    # and the later click sees the newer in-batch view
    assert out.loc[5, "view_value"] == 7.0
    assert out.loc[5, "view_ts_us"] == 25 * us


def test_stream_dedup_matches_batch_and_carries_state(spark, tmp_path):
    from llm_map_reduce_summarizer_spark.plans.documents import dedup_apply
    from llm_map_reduce_summarizer_spark.plans.streams import stream_dedup
    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        DOCS_SCHEMA,
        dedup_stream,
        run_available_now,
    )
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    # drain of the static corpus == batch keep-min-id dedup
    stream = stream_dedup(spark, SF).toPandas()
    batch = dedup_apply(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []

    # two micro-batches: a batch-2 copy of batch-1 content must drop
    # purely from carried state; new content still passes
    src = tmp_path / "docs_stream"
    src.mkdir()
    pd.DataFrame(
        [dict(doc_id=1, text="alpha beta", lang="en", source="s", n_chars=10)]
    ).to_parquet(src / "part-000.parquet")
    pd.DataFrame(
        [
            dict(doc_id=2, text="ALPHA   beta", lang="en", source="s",
                 n_chars=12),  # same normalized content -> dropped
            dict(doc_id=3, text="gamma", lang="en", source="s", n_chars=5),
        ]
    ).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = run_available_now(dedup_stream(raw), output_mode="update").toPandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_stream_dedup_incremental_matches_batch_core_and_split_invariant(
    spark,
):
    """The streamed drain equals the batch verdict core run on the full
    ingest slice, and the core itself is micro-batch-split invariant:
    screening three arbitrary sub-batches against the same index and
    unioning equals screening the whole slice at once (each doc's
    verdict depends only on (doc, index)) — the property that makes
    the foreachBatch intake correct for ANY trigger cadence."""
    from llm_map_reduce_summarizer_spark.operators.dedup import (
        dedup_reference_index,
        incremental_verdicts_against_index,
    )
    from llm_map_reduce_summarizer_spark.plans.documents import (
        INCR_BATCH_MOD,
        MINHASH_DF_CAP,
        MINHASH_THRESHOLD,
    )
    from llm_map_reduce_summarizer_spark.plans.streams import (
        stream_dedup_incremental,
    )
    from llm_map_reduce_summarizer_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    is_batch = (F.col("doc_id") % INCR_BATCH_MOD) == 0
    index = dedup_reference_index(
        docs.filter(~is_batch), df_cap=MINHASH_DF_CAP
    )
    whole = incremental_verdicts_against_index(
        docs.filter(is_batch), index, threshold=MINHASH_THRESHOLD
    ).toPandas()
    assert set(whole["verdict"]) >= {"dup_near", "keep"}

    streamed = stream_dedup_incremental(spark, SF).toPandas()
    assert compare_frames(streamed, whole) == []

    parts = [
        incremental_verdicts_against_index(
            docs.filter(is_batch & (F.col("doc_id") % 3 == r)),
            index,
            threshold=MINHASH_THRESHOLD,
        ).toPandas()
        for r in range(3)
    ]
    import pandas as pd

    unioned = pd.concat(parts, ignore_index=True)
    assert compare_frames(unioned, whole) == []


def test_stream_pack_fills_across_micro_batch_boundary(spark, tmp_path):
    """A pack that is part-filled when a micro-batch ends must keep
    filling from the next batch (carried state), and the drained
    result must equal the batch recurrence on the same rows."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        DOCS_SCHEMA,
        pack_stream,
        run_available_now,
    )

    def doc(i, n_words):
        return dict(
            doc_id=i,
            text=" ".join(["tok"] * n_words),
            lang="en",
            source="s",
            n_chars=4 * n_words,
        )

    src = tmp_path / "docs_pack"
    src.mkdir()
    # budget 10: batch 1 fills pack 0 to 9 tokens; batch 2's first doc
    # (4 tokens) must overflow into pack 1 purely from carried state
    pd.DataFrame([doc(1, 6), doc(2, 3)]).to_parquet(src / "part-000.parquet")
    pd.DataFrame([doc(3, 4), doc(4, 5)]).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = (
        run_available_now(pack_stream(raw, budget=10), output_mode="update")
        .toPandas()
        .set_index("doc_id")["pack_id"]
    )
    assert out[1] == 0 and out[2] == 0  # 6 + 3 <= 10
    assert out[3] == 1  # 9 + 4 > 10 -> next pack, across the boundary
    assert out[4] == 1  # 4 + 5 <= 10


def test_stream_value_histogram_accumulates_across_batches(spark, tmp_path):
    """Two micro-batches hitting the same (type, bucket) cell must
    produce ONE accumulated row in complete mode — counts summed,
    min/max widened across batches."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.plans.events import HIST_WIDTH
    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        run_available_now,
    )
    from pyspark.sql import functions as F

    us = 1_000_000
    lo = 0.25 * HIST_WIDTH
    hi = 0.75 * HIST_WIDTH
    rows = [
        dict(event_id=1, ts=10 * us * 1000, user_id=1,
             event_type="view", value=lo, props="{}"),
    ]
    rows2 = [
        dict(event_id=2, ts=20 * us * 1000, user_id=2,
             event_type="view", value=hi, props="{}"),
        dict(event_id=3, ts=21 * us * 1000, user_id=3,
             event_type="click", value=lo, props="{}"),
    ]
    src = tmp_path / "events_hist"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(src / "part-000.parquet")
    pd.DataFrame(rows2).to_parquet(src / "part-001.parquet")

    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    bucket = F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long")
    hist = (
        raw.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )
    out = (
        run_available_now(hist, output_mode="complete")
        .toPandas()
        .set_index(["event_type", "bucket"])
        .sort_index()
    )
    assert len(out) == 2
    view = out.loc[("view", 0)]
    assert view["n_events"] == 2  # both batches folded into one cell
    assert view["min_value"] == round(lo, 2)
    assert view["max_value"] == round(hi, 2)
    assert out.loc[("click", 0)]["n_events"] == 1


def test_stream_events_ts_schema_canary(spark):
    """Streaming twin of the batch schema-drift canary: the stream
    reader must surface ts as TimestampType (watermarks reject NTZ)
    and its first event time must equal the batch loader's — catching
    both the AnalysisException drift mode and the silent /1000
    value-corruption mode (streamed timestamps landing in 1970)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from llm_map_reduce_summarizer_spark.sources.tables import load_table
    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, SF)
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    ev.withWatermark("ts", "1 hour")  # analysis-time check

    streamed_min = run_available_now(
        ev.groupBy().agg(F.min("ts").alias("min_ts")), output_mode="complete"
    ).collect()[0]["min_ts"]
    batch_min = (
        load_table(spark, SF, "events").agg(F.min("ts")).collect()[0][0]
    )
    assert streamed_min == batch_min


def test_stream_round_half_up_matches_spark(spark):
    """_round2 must agree with F.round on .xx5 boundaries where
    Python's banker's rounding diverges."""
    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import _round2

    vals = [2.675, 2.665, 0.125, 0.135, 1.005, 2.5, -2.675, -0.125, 3.14159, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    expected = [
        r["r"] for r in df.select(F.round("v", 2).alias("r")).collect()
    ]
    got = [_round2(v) for v in vals]
    assert got == expected
    # the builtin would disagree on at least one of these
    assert any(round(v, 2) != e for v, e in zip(vals, expected))


def test_stream_folds_round_boundary_values(spark, tmp_path):
    """End-to-end .xx5 boundary through the stateful folds: a session
    whose value sums to 0.125 and a click/view pair at 0.125 must come
    out as 0.13 (Spark HALF_UP), not Python round()'s 0.12."""
    import pandas as pd
    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        asof_enrich_stream,
        run_available_now,
        sessionize_stream,
    )

    us = 1_000_000
    rows = [
        dict(event_id=1, ts=10 * us * 1000, user_id=1,
             event_type="view", value=0.125, props="{}"),
        # > 30 min later: forces a second single-event session
        dict(event_id=2, ts=(10 + 31 * 60) * us * 1000, user_id=1,
             event_type="click", value=0.125, props="{}"),
    ]
    src = tmp_path / "events_round"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(src / "part-000.parquet")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    sess = run_available_now(
        sessionize_stream(raw), output_mode="update"
    ).toPandas()
    # 0.125 + 0.125 = 0.25 exactly; sessions split at the 30-min gap,
    # so each single-event session carries 0.125 -> rounds to 0.13
    assert sorted(sess["session_value"]) == [0.13, 0.13]

    raw2 = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    asof = run_available_now(
        asof_enrich_stream(raw2), output_mode="update"
    ).toPandas()
    assert list(asof["click_value"]) == [0.13]
    assert list(asof["view_value"]) == [0.13]


def _sessionize_oracle(rows):
    """Independent pure-Python sessionization oracle: per-user 30-min
    gap rule over (ts, event_id) order; values are exact binary
    fractions in the generator so summation order can't matter."""
    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        SESSION_GAP_US,
        _round2,
    )

    sessions = {}
    cursor = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts_us"], r["event_id"])):
        u = r["user_id"]
        st = cursor.setdefault(u, {"sid": 0, "last": None})
        if st["last"] is None or r["ts_us"] - st["last"] > SESSION_GAP_US:
            st["sid"] += 1
            sessions[(u, st["sid"])] = dict(
                n=0, start=r["ts_us"], end=r["ts_us"], val=0.0
            )
        s = sessions[(u, st["sid"])]
        s["n"] += 1
        s["end"] = r["ts_us"]
        s["val"] += r["value"]
        st["last"] = r["ts_us"]
    return {
        (u, sid, s["n"], s["start"], s["end"], _round2(s["val"]),
         s["end"] - s["start"])
        for (u, sid), s in sessions.items()
    }


def _asof_oracle(rows):
    """Independent as-of oracle: each click gets the max-(ts, event_id)
    view with view.ts <= click.ts for the same user (view-before-click
    at equal timestamps, matching the fold's sort tiebreak)."""
    from llm_map_reduce_summarizer_spark.streaming.stream_ops import _round2

    out = set()
    for r in rows:
        if r["event_type"] != "click":
            continue
        views = [
            v for v in rows
            if v["user_id"] == r["user_id"]
            and v["event_type"] == "view"
            and v["ts_us"] <= r["ts_us"]
        ]
        if views:
            v = max(views, key=lambda v: (v["ts_us"], v["event_id"]))
            out.add((r["event_id"], r["user_id"], r["ts_us"],
                     _round2(r["value"]), _round2(v["value"]), v["ts_us"]))
        else:
            out.add((r["event_id"], r["user_id"], r["ts_us"],
                     _round2(r["value"]), None, None))
    return out


@pytest.mark.slow
def test_stream_parity_on_randomized_micro_batch_splits(spark, tmp_path_factory):
    """Property test (round-4 advice #8): for ANY time-contiguous split
    of an event log into 2-4 micro-batch files — with rows arbitrarily
    shuffled inside each file — sessionize_stream and asof_enrich_stream
    must reproduce the independent batch oracles exactly. The streaming
    contract requires per-user event-time order ACROSS micro-batches
    (the usual log-stream property), so splits are contiguous cuts of
    the time-sorted log; within a file order is free because the folds
    re-sort per batch."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        asof_enrich_stream,
        latest_sessions,
        run_available_now,
        sessionize_stream,
    )
    from pyspark.sql import functions as F

    raw_events = st.lists(
        st.tuples(
            st.integers(1, 4),                      # user_id
            st.integers(0, 3 * 3600),               # ts seconds in [0, 3h]
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 40),                     # value = q * 0.25 (exact)
        ),
        min_size=4,
        max_size=32,
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def run(data):
        tuples = data.draw(raw_events)
        rows = [
            dict(event_id=i, ts_us=t * 1_000_000, user_id=u,
                 event_type=e, value=q * 0.25)
            for i, (u, t, e, q) in enumerate(tuples)
        ]
        # split order must match the folds' in-batch sort so any
        # contiguous cut is a valid arrival order
        ordered = sorted(
            rows,
            key=lambda r: (r["ts_us"], r["event_type"] == "click",
                           r["event_id"]),
        )
        n_files = data.draw(st.integers(2, 4))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(1, max(1, len(ordered) - 1)),
                    min_size=n_files - 1,
                    max_size=n_files - 1,
                    unique=True,
                )
            )
        )
        chunks = []
        prev = 0
        for c in cuts + [len(ordered)]:
            chunk = ordered[prev:c]
            prev = c
            if chunk:
                # shuffled row order inside the file
                chunk = data.draw(st.permutations(chunk))
                chunks.append(chunk)

        src = tmp_path_factory.mktemp("rand_split")
        for i, chunk in enumerate(chunks):
            pdf = pd.DataFrame(chunk)
            pdf["ts"] = pdf["ts_us"] * 1000  # long nanos file
            pdf["props"] = "{}"
            pdf[["event_id", "ts", "user_id", "event_type", "value",
                 "props"]].to_parquet(src / f"part-{i:03d}.parquet")

        def read():
            return (
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .option("latestFirst", "false")
                .parquet(str(src))
                .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            )

        # the two drains are independent (uuid-named sinks, separate
        # checkpoints) — overlap them so each example pays one stream
        # latency, not two (suite wall-time, VERDICT r7 item 6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as drain_pool:
            f_sess = drain_pool.submit(
                lambda: latest_sessions(
                    run_available_now(
                        sessionize_stream(read()), output_mode="update"
                    )
                ).toPandas()
            )
            f_asof = drain_pool.submit(
                lambda: run_available_now(
                    asof_enrich_stream(read()), output_mode="update"
                ).toPandas()
            )
            sess = f_sess.result()
            asof = f_asof.result()
        got_sessions = {
            tuple(r)
            for r in sess[
                ["user_id", "session_id", "n_events", "start_us",
                 "end_us", "session_value", "duration_us"]
            ].itertuples(index=False)
        }
        assert got_sessions == _sessionize_oracle(rows)

        got_asof = {
            (int(r.event_id), int(r.user_id), int(r.ts_us),
             r.click_value,
             None if pd.isna(r.view_value) else r.view_value,
             None if pd.isna(r.view_ts_us) else int(r.view_ts_us))
            for r in asof.itertuples(index=False)
        }
        assert got_asof == _asof_oracle(rows)

    run()


def test_stream_dau_equals_batch_sketch(spark):
    """HLL register-max merge is order-independent, so the streamed
    sketch must equal the batch sketch BIT-FOR-BIT on static input —
    not just within error bounds. The catalog entries wrap the raw
    sketch in the exact-tier bound check, so the raw pin runs against
    stream_dau_sketch and an identical batch aggregation; the catalog
    shapes are compared too."""
    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.plans.events import (
        DAU_RSD,
        events_dau_approx,
    )
    from llm_map_reduce_summarizer_spark.plans.streams import (
        stream_dau,
        stream_dau_sketch,
    )
    from llm_map_reduce_summarizer_spark.sources.tables import load_table

    raw_stream = stream_dau_sketch(spark, SF).toPandas()
    raw_batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=DAU_RSD).alias(
                "dau_approx"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )
    assert len(raw_stream) > 0
    assert compare_frames(raw_stream, raw_batch) == []

    stream = stream_dau(spark, SF).toPandas()
    batch = events_dau_approx(spark, SF).toPandas()
    assert compare_frames(stream, batch) == []
    assert stream["sketch_within_3rsd"].all()


def test_stream_value_quantiles_invariant_and_exact_columns(spark):
    """The streamed quantile sketch must satisfy the rank-tolerance
    invariant on every type, and the entry's quantile columns must
    equal the exact batch tier's (they ARE the exact values; the
    sketch is certified by the boolean)."""
    from llm_map_reduce_summarizer_spark.plans.events import (
        events_value_quantiles,
    )
    from llm_map_reduce_summarizer_spark.plans.streams import (
        stream_value_quantiles,
    )

    got = (
        stream_value_quantiles(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    exact = (
        events_value_quantiles(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got["sketch_within_rank_tol"].all()
    for col in ("p25", "p5", "p9", "p99", "n_events"):
        assert (got[col] == exact[col]).all(), col


def test_stream_contamination_matches_batch(spark):
    """The streamed decontamination gate must equal the batch screen
    on a drain of the static corpus — same winning bench doc, same
    quantized ratio, same flag."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        corpus_contamination,
    )
    from llm_map_reduce_summarizer_spark.plans.streams import (
        stream_contamination,
    )

    stream = stream_contamination(spark, SF).toPandas()
    batch = corpus_contamination(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_domain_cap_binds_across_micro_batches(spark, tmp_path):
    """The admission counter must carry across micro-batch boundaries:
    a source that used its whole cap in batch 1 admits NOTHING from
    batch 2, and a two-batch split equals the single-batch drain."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        DOCS_SCHEMA,
        domain_cap_stream,
        run_available_now,
    )

    def doc(i, source):
        return dict(
            doc_id=i, text="x", lang="en", source=source, n_chars=1
        )

    src = tmp_path / "docs_cap"
    src.mkdir()
    # cap=2: source a fills its cap in batch 1; source b spans both
    pd.DataFrame(
        [doc(1, "a"), doc(2, "a"), doc(3, "b")]
    ).to_parquet(src / "part-000.parquet")
    pd.DataFrame(
        [doc(4, "a"), doc(5, "b"), doc(6, "b")]
    ).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = (
        run_available_now(domain_cap_stream(raw, cap=2), output_mode="update")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "kept"] and out.loc[2, "kept"]
    assert not out.loc[4, "kept"]  # a's cap consumed in batch 1
    assert out.loc[3, "kept"] and out.loc[5, "kept"]  # b: rk 1, 2
    assert not out.loc[6, "kept"]  # b's third arrival
    assert list(out.sort_index()["rk"]) == [1, 2, 1, 3, 2, 3]


def test_stream_reservoir_displacement_across_batches(spark, tmp_path):
    """A later micro-batch's smaller draw must DISPLACE an earlier
    reservoir member (state carries the bottom-k set, and the final
    emission reflects the displacement), and the drain must equal the
    batch bottom-k on the union of both files."""
    import hashlib

    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        DOCS_SCHEMA,
        run_available_now,
        sample_stream,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def doc(i):
        return dict(doc_id=i, text="x", lang="en", source="s", n_chars=1)

    ids_a, ids_b = [1, 2, 3, 4], [5, 6, 7, 8]
    src = tmp_path / "docs_res"
    src.mkdir()
    pd.DataFrame([doc(i) for i in ids_a]).to_parquet(src / "part-000.parquet")
    pd.DataFrame([doc(i) for i in ids_b]).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    k = 3
    drained = run_available_now(
        sample_stream(raw, k, n_shards=1), output_mode="update"
    )
    w = Window.partitionBy("shard")
    final = (
        drained.withColumn("mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("mx"))
        .toPandas()
    )
    draws = {
        i: hashlib.md5(f"usample|{i}".encode()).hexdigest()
        for i in ids_a + ids_b
    }
    expect = sorted(draws, key=lambda i: draws[i])[:k]
    assert sorted(final["doc_id"]) == sorted(expect)
    # the two-batch split must have displaced at least one member of
    # batch 1's reservoir (otherwise this test proves nothing)
    first_k = sorted(ids_a, key=lambda i: draws[i])[:k]
    assert set(first_k) != set(expect)


def test_stream_bot_gate_min_gap_spans_batch_boundary(spark, tmp_path):
    """The minimum inter-event gap must consider the pair that spans a
    micro-batch boundary (carried last_ts), and counters must equal
    the batch aggregation on the drained input."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        bot_counters_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = 1_700_000_000_000_000_000  # ns for the legacy long schema
    us = 1_000

    def ev(eid, ts_us):
        return dict(
            event_id=eid, ts=base + ts_us * 1000, user_id=1,
            event_type="view", value=0.0, props="{}",
        )

    src = tmp_path / "events_bot"
    src.mkdir()
    # in-batch gaps: 500; the boundary pair (1000 -> 1200) gives 200 —
    # the true minimum only exists ACROSS the file boundary
    pd.DataFrame([ev(1, 0), ev(2, 500), ev(3, 1000)]).to_parquet(
        src / "part-000.parquet"
    )
    pd.DataFrame([ev(4, 1200), ev(5, 1800)]).to_parquet(
        src / "part-001.parquet"
    )
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    drained = run_available_now(
        bot_counters_stream(raw), output_mode="update"
    )
    w = Window.partitionBy("user_id")
    latest = (
        drained.withColumn("mx", F.max("n_events").over(w))
        .filter(F.col("n_events") == F.col("mx"))
        .toPandas()
    )
    assert len(latest) == 1
    assert latest.iloc[0]["n_events"] == 5
    assert latest.iloc[0]["span_us"] == 1800
    assert latest.iloc[0]["min_gap_us"] == 200  # the boundary pair


def test_stream_funnel_stage_machine_spans_batch_boundary(spark, tmp_path):
    """The stage machine must honor strict ordering ACROSS micro-batch
    boundaries: a click arriving in a later batch still counts (state
    carries t_view), while a click at-or-before the first view never
    does; and the drained totals equal batch `events_funnel`."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        funnel_stages_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000_000  # ns for the legacy long schema

    def ev(eid, ts_us, uid, et):
        return dict(
            event_id=eid, ts=base + ts_us * 1000, user_id=uid,
            event_type=et, value=0.0, props="{}",
        )

    src = tmp_path / "events_funnel"
    src.mkdir()
    # user 1: view in batch 0, click+purchase in batch 1 -> full funnel
    # user 2: click at the SAME ts as its view (strict > rejects it)
    # user 3: purchase before any click -> stops at view
    pd.DataFrame(
        [ev(1, 100, 1, "view"), ev(2, 100, 2, "view"),
         ev(3, 100, 2, "click"), ev(4, 100, 3, "view")]
    ).to_parquet(src / "part-000.parquet")
    pd.DataFrame(
        [ev(5, 200, 1, "click"), ev(6, 300, 1, "purchase"),
         ev(7, 300, 3, "purchase")]
    ).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    drained = run_available_now(
        funnel_stages_stream(raw), output_mode="update"
    )
    final = (
        drained.groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert final.loc[1].notna().all()  # cross-batch funnel completes
    assert pd.isna(final.loc[2]["t_click"])  # same-ts click rejected
    assert pd.isna(final.loc[3]["t_purchase"])  # no click -> no purchase
    n_view = final["t_view"].notna().sum()
    n_click = final["t_click"].notna().sum()
    n_purch = final["t_purchase"].notna().sum()
    assert (n_view, n_click, n_purch) == (3, 1, 1)


@pytest.mark.slow
def test_stream_funnel_parity_on_randomized_splits(spark, tmp_path_factory):
    """Property test: for ANY contiguous micro-batch split of a
    time-sorted event log (rows shuffled within each file), the
    drained funnel stage times must equal the batch conditional-min
    cascade computed independently in Python."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        funnel_stages_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    raw_events = st.lists(
        st.tuples(
            st.integers(1, 3),                      # user_id
            st.integers(0, 600),                    # ts seconds
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=3,
        max_size=24,
    )

    def funnel_oracle(rows):
        out = {}
        users = {r["user_id"] for r in rows}
        for u in users:
            rs = [r for r in rows if r["user_id"] == u]
            views = [r["ts_us"] for r in rs if r["event_type"] == "view"]
            t_view = min(views) if views else None
            t_click = None
            if t_view is not None:
                clicks = [
                    r["ts_us"] for r in rs
                    if r["event_type"] == "click" and r["ts_us"] > t_view
                ]
                t_click = min(clicks) if clicks else None
            t_purchase = None
            if t_click is not None:
                ps = [
                    r["ts_us"] for r in rs
                    if r["event_type"] == "purchase"
                    and r["ts_us"] > t_click
                ]
                t_purchase = min(ps) if ps else None
            out[u] = (t_view, t_click, t_purchase)
        return out

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def run(data):
        tuples = data.draw(raw_events)
        rows = [
            dict(event_id=i, ts_us=t * 1_000_000, user_id=u,
                 event_type=e, value=0.0)
            for i, (u, t, e) in enumerate(tuples)
        ]
        ordered = sorted(rows, key=lambda r: (r["ts_us"], r["event_id"]))
        n_files = data.draw(st.integers(2, 3))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(1, max(1, len(ordered) - 1)),
                    min_size=n_files - 1,
                    max_size=n_files - 1,
                    unique=True,
                )
            )
        )
        chunks, prev = [], 0
        for c in cuts + [len(ordered)]:
            chunk = ordered[prev:c]
            prev = c
            if chunk:
                chunks.append(data.draw(st.permutations(chunk)))

        src = tmp_path_factory.mktemp("rand_funnel")
        for i, chunk in enumerate(chunks):
            pdf = pd.DataFrame(chunk)
            pdf["ts"] = pdf["ts_us"] * 1000  # long nanos file
            pdf["props"] = "{}"
            pdf[["event_id", "ts", "user_id", "event_type", "value",
                 "props"]].to_parquet(src / f"part-{i:03d}.parquet")

        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(str(src))
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
        drained = run_available_now(
            funnel_stages_stream(raw), output_mode="update"
        )
        final = (
            drained.groupBy("user_id")
            .agg(
                F.max("t_view").alias("t_view"),
                F.max("t_click").alias("t_click"),
                F.max("t_purchase").alias("t_purchase"),
            )
            .toPandas()
        )
        got = {
            int(r.user_id): tuple(
                None if pd.isna(v) else int(v)
                for v in (r.t_view, r.t_click, r.t_purchase)
            )
            for r in final.itertuples(index=False)
        }
        assert got == funnel_oracle(rows)

    run()


def test_stream_cohort_days_emit_once_across_batches(spark, tmp_path):
    """A user's repeat activity on the SAME day in a later micro-batch
    must not re-emit, while a NEW day must — and the cohort tag always
    carries the true first day."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        cohort_days_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    DAY_US = 86_400_000_000
    base_day = (1_700_000_000_000_000 // DAY_US) * DAY_US  # aligned us

    def ev(eid, day_off, uid):
        ts_us = base_day + day_off * DAY_US + eid  # distinct in-day ts
        return dict(
            event_id=eid, ts=ts_us * 1000, user_id=uid,
            event_type="view", value=0.0, props="{}",
        )

    src = tmp_path / "events_cohort"
    src.mkdir()
    # batch 0: user 1 active day 0 (twice); batch 1: same day again
    # (suppressed) + day 2 (new emit)
    pd.DataFrame([ev(1, 0, 1), ev(2, 0, 1)]).to_parquet(
        src / "part-000.parquet"
    )
    pd.DataFrame([ev(3, 0, 1), ev(4, 2, 1)]).to_parquet(
        src / "part-001.parquet"
    )
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    pairs = run_available_now(
        cohort_days_stream(raw), output_mode="append"
    ).toPandas()
    assert len(pairs) == 2  # day 0 once, day 2 once
    assert set(pairs["day_us"] - base_day) == {0, 2 * DAY_US}
    assert (pairs["cohort_day_us"] == base_day).all()


def test_stream_uptime_state_carries_across_batches(spark, tmp_path):
    """Two time-contiguous micro-batches: a gap that SPANS the batch
    boundary must count once and contribute min(gap, W) covered time
    purely from carried state; totals must equal the batch formula
    sum(min(gap, W)) + W."""
    import pandas as pd

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        run_available_now,
        uptime_stream,
    )
    from pyspark.sql import functions as F

    us = 1_000_000
    hour = 3600 * us
    rows = [
        dict(event_id=1, ts=0, user_id=1,
             event_type="view", value=0.0, props="{}"),
        dict(event_id=2, ts=(hour // 2) * 1000, user_id=1,
             event_type="click", value=0.0, props="{}"),
    ]
    rows2 = [
        # 3h after the last batch-1 beat: a cross-boundary DOWNTIME
        dict(event_id=3, ts=(hour // 2 + 3 * hour) * 1000, user_id=1,
             event_type="view", value=0.0, props="{}"),
    ]
    src = tmp_path / "events_stream"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(src / "part-000.parquet")
    pd.DataFrame(rows2).to_parquet(src / "part-001.parquet")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    out = run_available_now(
        uptime_stream(raw, hour), output_mode="update"
    ).toPandas()
    last = out.sort_values("n_beats").iloc[-1]
    assert last["n_beats"] == 3
    assert last["n_gaps"] == 1  # the 3h cross-boundary gap
    # covered = min(0.5h, 1h) + min(3h, 1h) + open-interval hour
    assert last["covered_us"] == hour // 2 + hour + hour
    assert last["first_us"] == 0
    assert last["last_us"] == hour // 2 + 3 * hour


@pytest.mark.slow
def test_stream_user_paths_parity_on_randomized_splits(spark, tmp_path_factory):
    """user_paths_stream must emit every (prev→next) transition exactly
    once for ANY contiguous micro-batch split of the time-sorted log,
    with rows shuffled inside each file — multiset parity against a
    pandas mirror of the batch lag semantics."""
    import collections

    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        run_available_now,
        user_paths_stream,
    )
    from pyspark.sql import functions as F

    raw_events = st.lists(
        st.tuples(
            st.integers(1, 4),
            st.integers(0, 3 * 3600),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=4,
        max_size=32,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def run(data):
        tuples = data.draw(raw_events)
        rows = [
            dict(event_id=i, ts_us=t * 1_000_000, user_id=u,
                 event_type=e, value=0.0)
            for i, (u, t, e) in enumerate(tuples)
        ]
        ordered = sorted(rows, key=lambda r: (r["ts_us"], r["event_id"]))
        n_files = data.draw(st.integers(2, 4))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(1, max(1, len(ordered) - 1)),
                    min_size=n_files - 1,
                    max_size=n_files - 1,
                    unique=True,
                )
            )
        )
        chunks, prev = [], 0
        for c in cuts + [len(ordered)]:
            chunk = ordered[prev:c]
            prev = c
            if chunk:
                chunks.append(data.draw(st.permutations(chunk)))

        src = tmp_path_factory.mktemp("paths_split")
        for i, chunk in enumerate(chunks):
            pdf = pd.DataFrame(chunk)
            pdf["ts"] = pdf["ts_us"] * 1000
            pdf["props"] = "{}"
            pdf[["event_id", "ts", "user_id", "event_type", "value",
                 "props"]].to_parquet(src / f"part-{i:03d}.parquet")

        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(str(src))
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
        got = collections.Counter(
            (r.src, r.dst)
            for r in run_available_now(
                user_paths_stream(stream), output_mode="update"
            ).collect()
        )
        expect = collections.Counter()
        by_user = {}
        for r in ordered:
            u = r["user_id"]
            if u in by_user:
                expect[(by_user[u], r["event_type"])] += 1
            by_user[u] = r["event_type"]
        assert got == expect

    run()


@pytest.mark.slow
def test_journey_pairs_split_invariant(spark, tmp_path_factory):
    """Property test: for ANY time-contiguous micro-batch split of an
    event log, the drained journey transitions (pairs + the END
    closure of non-converting users) equal a pure-python reference of
    the batch journey semantics — first-purchase truncation included."""
    from collections import Counter

    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        journey_pairs_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    raw_events = st.lists(
        st.tuples(
            st.integers(1, 3),                    # user_id
            st.integers(0, 3600),                 # ts seconds
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=3,
        max_size=24,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def run(data):
        tuples = data.draw(raw_events)
        rows = [
            dict(event_id=i, ts_us=t * 1_000_000, user_id=u,
                 event_type=e, value=0.0)
            for i, (u, t, e) in enumerate(tuples)
        ]
        ordered = sorted(rows, key=lambda r: (r["ts_us"], r["event_id"]))
        # pure-python reference of the batch journey semantics
        expect: Counter = Counter()
        by_user: dict = {}
        for r in ordered:
            by_user.setdefault(r["user_id"], []).append(r)
        for evs in by_user.values():
            last, conv = None, False
            for r in evs:
                if conv:
                    break
                src = last if last is not None else "START"
                expect[(src, r["event_type"])] += 1
                last = r["event_type"]
                conv = r["event_type"] == "purchase"
            if last is not None and not conv:
                expect[(last, "END")] += 1

        n_files = data.draw(st.integers(1, 3))
        cuts = sorted(
            set(
                data.draw(
                    st.lists(
                        st.integers(1, max(1, len(ordered) - 1)),
                        min_size=n_files - 1,
                        max_size=n_files - 1,
                    )
                )
            )
        )
        chunks, prev = [], 0
        for c in cuts + [len(ordered)]:
            if ordered[prev:c]:
                chunks.append(ordered[prev:c])
            prev = c

        src = tmp_path_factory.mktemp("journey_split")
        for i, chunk in enumerate(chunks):
            pdf = pd.DataFrame(chunk)
            pdf["ts"] = pdf["ts_us"] * 1000  # long nanos file
            pdf["props"] = "{}"
            pdf[["event_id", "ts", "user_id", "event_type", "value",
                 "props"]].to_parquet(src / f"part-{i:03d}.parquet")

        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(str(src))
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
        drained = run_available_now(
            journey_pairs_stream(stream), output_mode="update"
        ).toPandas()
        got: Counter = Counter()
        for _, r in drained[drained["kind"] == "pair"].iterrows():
            got[(r["src"], r["dst"])] += 1
        lasts = drained[drained["kind"] == "last"].sort_values(
            ["user_id", "ts_us", "event_id"]
        ).groupby("user_id").tail(1)
        for _, r in lasts.iterrows():
            if r["dst"] == "N":
                got[(r["src"], "END")] += 1
        assert got == expect

    run()
