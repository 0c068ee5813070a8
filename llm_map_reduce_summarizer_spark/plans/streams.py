"""Streaming queries (SURVEY.md §2.3 rows 28-29), driver-runnable.

Each callable drains the events parquet through a Structured Streaming
plan with an ``availableNow`` trigger and returns the sink table. On
static input the streaming results equal their batch twins, so BOTH
carry full SQL oracles (stronger than the rows-only check SURVEY
originally planned):

* ``stream_hourly``  — complete-mode windowed agg == batch hourly agg.
* ``stream_sessionize`` — latest update per (user, session) from the
  stateful operator == batch gaps-and-islands sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.stream_ops import (
    asof_enrich_stream,
    dedup_stream,
    hourly_counts,
    latest_sessions,
    read_documents_stream,
    read_events_stream,
    run_available_now,
    sessionize_stream,
    view_click_interval_join,
)
from .documents import ORACLE as _DOCS_ORACLE
from .documents import (
    DOMAIN_CAP,
    PREP_QUALITY_MIN,
    incr_dedup_oracle_sql,
    quality_gate_sql,
)
from .events import ORACLE as _EVENTS_ORACLE


def stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(hourly_counts(ev), output_mode="complete")


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    updates = run_available_now(sessionize_stream(ev), output_mode="update")
    return latest_sessions(updates)


def stream_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(
        view_click_interval_join(ev), output_mode="append"
    )


def stream_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming as-of enrichment; on the drained static input
    it equals batch ``events_asof_view``, so it shares that oracle."""
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(asof_enrich_stream(ev), output_mode="update")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time exact dedup; a drain of the static corpus equals
    the batch ``dedup_apply`` (keep min doc_id per content group), so
    it shares that oracle."""
    docs = read_documents_stream(spark, sf_dir)
    return run_available_now(dedup_stream(docs), output_mode="update")


def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time quality gate: the stateless streaming transform
    case — pure column expressions (quality score) applied per
    micro-batch with append semantics, no state at all. At 100 TB this
    is the shape of every filter/enrich stage in a streaming corpus
    intake: scan-speed, trivially parallel, nothing to checkpoint but
    source offsets.
    """
    from pyspark.sql import functions as F

    from .documents import quality_score_col

    docs = read_documents_stream(spark, sf_dir)
    gated = (
        docs.withColumn("quality_score", quality_score_col())
        .filter(F.col("quality_score") >= PREP_QUALITY_MIN)
        .select("doc_id", "lang", "source", "n_chars", "quality_score")
    )
    return run_available_now(gated, output_mode="append")


def stream_langid_injection_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming langid ground-truth monitor: the foreign-language
    probes plant and score AT INGEST (both stateless narrow maps),
    the verdicts accumulating into 5-strata × 2 cells — detection
    quality is continuously measured on the live intake, not just in
    offline evals. Drain == batch `langid_injection_eval`, whose
    oracle it shares."""
    from .documents import langid_eval_cells, langid_eval_from_cells

    docs = read_documents_stream(spark, sf_dir)
    snap = run_available_now(
        langid_eval_cells(docs), output_mode="complete"
    )
    return langid_eval_from_cells(snap)


def stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time PII redaction: the stateless streaming
    transform case — three JVM regex passes per arriving doc with
    append semantics, no state at all. Scrubbing AT ingest (before
    anything lands) is the shape privacy reviews actually require
    of a corpus intake; the drained static input equals the batch
    `doc_pii_scrub`, whose oracle it shares."""
    from .documents import pii_scrub_of

    docs = read_documents_stream(spark, sf_dir)
    return run_available_now(
        pii_scrub_of(docs), output_mode="append"
    )


def stream_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time token accounting: stateless per-doc token /
    word / char counters with append semantics (the billing and
    budget meters a streaming intake stamps on every doc before
    packing). Drain == batch `doc_tokens`, whose oracle it shares."""
    from .documents import doc_tokens_of

    docs = read_documents_stream(spark, sf_dir)
    return run_available_now(
        doc_tokens_of(docs), output_mode="append"
    )


def stream_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fixed-width value histogram per event type — the
    bounded-state monitoring agg: state is (type, bucket) cells, sized
    by the value range, never by stream length. On the drained static
    input it equals the batch ``events_value_histogram`` and shares
    its oracle.
    """
    from pyspark.sql import functions as F

    from .events import HIST_WIDTH

    ev = read_events_stream(spark, sf_dir)
    bucket = F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long")
    hist = (
        ev.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )
    return run_available_now(hist, output_mode="complete")


def stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-5 users by total value within each event type.

    The streaming half is a complete-mode (event_type, user_id)
    aggregation — state is one cell per active (type, user), hash-
    partitioned across executors, bounded by user count not stream
    length. The top-k ranking runs AFTER the drain on the sink
    snapshot (a batch window per event_type): ranking inside the
    stream would force complete-mode recomputation of every rank per
    trigger, while ranking the drained snapshot is one tiny window
    over k-ish candidates per type. On static input this equals the
    batch ``events_topk_users`` and shares its oracle.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = read_events_stream(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("user_value")
    )
    sink = run_available_now(per_user, output_mode="complete")
    w = Window.partitionBy("event_type").orderBy(
        F.col("user_value").desc(), F.col("user_id")
    )
    return sink.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).filter(F.col("rk") <= 5)


def stream_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming training-mix monitor: docs/tokens/token-share per
    (lang, source) stratum over the document intake — how a corpus
    operator watches mix drift DURING ingestion instead of auditing
    after the fact.

    The streaming half is a complete-mode (lang, source) aggregation —
    state is one cell per stratum, bounded by the mix's cardinality,
    never stream length. The share normalization runs post-drain on
    the stratum snapshot (a 1-row total crossJoin on ~100 rows);
    normalizing in-stream would need agg-of-agg, which streaming
    forbids in one query. Drain of static input equals the batch
    ``corpus_mix_report`` and shares its oracle.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize, token_count

    docs = read_documents_stream(spark, sf_dir)
    per = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
    )
    sink = run_available_now(per, output_mode="complete")
    total = sink.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return sink.crossJoin(F.broadcast(total)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        quantize(F.col("n_tokens") / F.col("corpus_tokens"), 6).alias(
            "token_share"
        ),
    )


def stream_dau_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw streamed HLL sketch per day (day, dau_approx, n_events) —
    the mergeable aggregate itself; the catalog entry wraps it in the
    exact-tier bound check. Bit-equal to the batch sketch on static
    input (register-max merge is order-independent; pinned in tests).
    """
    from pyspark.sql import functions as F

    from .events import DAU_RSD

    ev = read_events_stream(spark, sf_dir)
    dau = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.approx_count_distinct("user_id", rsd=DAU_RSD).alias("dau_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return run_available_now(dau, output_mode="complete")


def stream_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily-active-users via HyperLogLog++ — the sketch
    aggregate is WHY this works: exact count_distinct is unsupported
    in streaming (unbounded per-key distinct state), but HLL state is
    fixed-size and register-max merge is order-independent, so
    micro-batches fold in deterministically.

    VALUE-checked like the batch tier: the drained stream estimate
    (30-ish day rows) joins the exact batch DAU and the catalog emits
    the ``sketch_within_3rsd`` invariant — TRUE per day in the oracle
    — so a hash match certifies the STREAMED sketch hit its error
    bound. The post-drain join touches only day-count rows (the
    bounded sink table), never the stream itself.
    """
    from pyspark.sql import functions as F

    from ..sources.tables import load_table
    from .events import DAU_RSD

    drained = stream_dau_sketch(spark, sf_dir)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("dau"))
    )
    return drained.join(exact, "day").select(
        "day",
        "dau",
        "n_events",
        (
            F.abs(F.col("dau_approx") - F.col("dau"))
            <= 3 * DAU_RSD * F.col("dau")
        ).alias("sketch_within_3rsd"),
    )


def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-type value quantiles via the mergeable
    approx_percentile sketch — like ``stream_dau``, the sketch is WHY
    this works in streaming (an exact quantile needs the full sorted
    group; the sketch folds micro-batches in bounded memory).

    VALUE-checked with the batch tier's rank invariant: the drained
    sketch elements (one k-row table) join the exact batch quantiles,
    and each element's true rank must sit within n/accuracy + 1 of its
    target — TRUE per type in the oracle. Post-drain work touches only
    type-count rows plus one batch scan for the rank counts.
    """
    from pyspark.sql import functions as F

    from ..sources.tables import load_table
    from .events import _QUANTILES, QUANTILE_ACCURACY

    ev = read_events_stream(spark, sf_dir)
    sketch = ev.groupBy("event_type").agg(
        *[
            F.expr(
                f"approx_percentile(value, {q}, {QUANTILE_ACCURACY})"
            ).alias(f"a{i}")
            for i, q in enumerate(_QUANTILES)
        ],
        F.count(F.lit(1)).alias("n_events"),
    )
    drained = run_available_now(sketch, output_mode="complete")

    batch = load_table(spark, sf_dir, "events")
    exact = batch.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 4).alias(
                f"p{str(q).replace('0.', '')}"
            )
            for q in _QUANTILES
        ]
    )
    ranks = (
        batch.select("event_type", "value")
        .join(F.broadcast(drained), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.sum(
                    (F.col("value") < F.col(f"a{i}")).cast("long")
                ).alias(f"lt{i}")
                for i in range(len(_QUANTILES))
            ],
            *[
                F.sum(
                    (F.col("value") <= F.col(f"a{i}")).cast("long")
                ).alias(f"le{i}")
                for i in range(len(_QUANTILES))
            ],
        )
    )
    n = F.col("n_events").cast("double")
    tol = n / QUANTILE_ACCURACY + 1
    within = None
    for i, q in enumerate(_QUANTILES):
        ok = (F.col(f"lt{i}") <= q * n + tol) & (
            F.col(f"le{i}") >= q * n - tol
        )
        within = ok if within is None else (within & ok)
    return (
        drained.join(exact, "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            *[f"p{str(q).replace('0.', '')}" for q in _QUANTILES],
            "n_events",
            within.alias("sketch_within_rank_tol"),
        )
    )


def stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming benchmark-decontamination gate: score every arriving
    doc's max 3-gram overlap against the (static) benchmark suite AT
    INGEST — the streaming shape of ``corpus_contamination``.

    Streaming-safe by construction: the benchmark shingle→ids map is
    built batch-side once (the bench suite is fixed by definition) and
    broadcast; each doc's shingle ARRAY is computed by the same JVM
    expressions as the batch operator (no Python re-tokenization to
    drift); scoring is a STATELESS Arrow-batched lookup — zero
    streaming state, append mode, any number of micro-batches. The
    batch operator's counted-broadcast contract applies strictly here:
    a stream cannot shuffle-join per-doc aggregates without unbounded
    state, so an oversized bench suite raises instead of degrading.

    Drain of the static corpus equals the batch entry, so it shares
    its oracle.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import shingles_3gram, words
    from ..sources.tables import load_table
    from .documents import (
        CONTAM_BENCH_MAX_DOCS,
        CONTAM_MOD,
        CONTAM_THRESHOLD,
    )
    from ..operators.dedup import doc_shingles

    batch_docs = load_table(spark, sf_dir, "documents")
    n_bench_docs = (
        batch_docs.filter(F.col("doc_id") % CONTAM_MOD == 0)
        .select("doc_id")
        .count()
    )
    if n_bench_docs > CONTAM_BENCH_MAX_DOCS:
        raise ValueError(
            f"benchmark suite has {n_bench_docs} docs > "
            f"{CONTAM_BENCH_MAX_DOCS}: the streaming gate requires the "
            "broadcastable-bench contract (see docstring)"
        )
    bench_rows = (
        doc_shingles(batch_docs.filter(F.col("doc_id") % CONTAM_MOD == 0))
        .collect()
    )
    bench_map: dict = {}
    for r in bench_rows:
        bench_map.setdefault(r["s"], []).append(r["doc_id"])
    bc = spark.sparkContext.broadcast(bench_map)

    def _score(batches):
        import pandas as pd

        bm = bc.value
        for pdf in batches:
            out = []
            for doc_id, sh in zip(pdf["doc_id"], pdf["sh"]):
                sset = set(sh)
                counts: dict = {}
                for s in sset:
                    for b in bm.get(s, ()):
                        counts[b] = counts.get(b, 0) + 1
                if not counts:
                    continue
                n = len(sset)
                # max ratio, ties -> smallest bench_id (the batch
                # window's ORDER BY ratio DESC, bench_id)
                best_b, best_c = None, -1
                for b in sorted(counts):
                    if counts[b] > best_c:
                        best_b, best_c = b, counts[b]
                import math

                ratio = math.floor(best_c / n * 10000.0 + 0.5) / 10000.0
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "bench_id": int(best_b),
                        "overlap_ratio": ratio,
                        "contaminated": ratio >= CONTAM_THRESHOLD,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "bench_id",
                    "overlap_ratio",
                    "contaminated",
                ],
            )

    docs = read_documents_stream(spark, sf_dir)
    w = words(F.col("text"))
    shingled = (
        docs.filter(F.col("doc_id") % CONTAM_MOD != 0)
        .withColumn("w", w)
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.array_distinct(shingles_3gram(F.col("w"))).alias("sh"),
        )
    )
    scored = shingled.mapInPandas(
        _score,
        schema="doc_id long, bench_id long, overlap_ratio double, "
        "contaminated boolean",
    )
    return run_available_now(scored, output_mode="append")


def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming continual-ingest dedup: every arriving micro-batch is
    screened against the PRECOMPUTED existing-corpus index
    (stop-shingles, capped shingle table, LSH band buckets, digest
    set — the tables a production pipeline maintains alongside the
    corpus) via ``foreachBatch`` running the batch verdict core.

    Zero streaming state: each doc's verdict depends only on
    (doc, index), so results are invariant to the micro-batch split —
    asserted in tests. The per-batch sink writes under its own
    ``batch_id`` partition with dynamic overwrite (exactly-once: a
    retried batch replaces itself, never appends duplicates).

    Scale: per micro-batch the work is |delta| digest probes + |delta|
    band probes x bucket occupancy + verify on candidates — never
    proportional to the existing corpus; the index is built once.
    The stop-shingle list comes from the EXISTING corpus only (the
    boilerplate list is corpus-maintained), which is the one semantic
    difference from batch ``corpus_dedup_incremental``'s
    whole-union df cap — the oracle mirrors it.
    """
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from ..operators.dedup import (
        dedup_reference_index,
        incremental_verdicts_against_index,
    )
    from ..sources.tables import load_table
    from .documents import INCR_BATCH_MOD, MINHASH_DF_CAP, MINHASH_THRESHOLD

    docs_static = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % INCR_BATCH_MOD) == 0
    index = dedup_reference_index(
        docs_static.filter(~is_batch), df_cap=MINHASH_DF_CAP
    )

    run = uuid.uuid4().hex[:12]
    out_path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_incr_{run}"
    )
    ckpt = os.path.join(tempfile.gettempdir(), f"spark_graft_incr_ck_{run}")

    def _screen(bdf: DataFrame, batch_id: int) -> None:
        (
            incremental_verdicts_against_index(
                bdf, index, threshold=MINHASH_THRESHOLD
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_path)
        )

    q = (
        read_documents_stream(spark, sf_dir)
        .filter(is_batch)
        .writeStream.foreachBatch(_screen)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path).select("doc_id", "lang", "verdict")


def stream_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing at ingest (stream_ops.pack_stream):
    per-source open-pack state (two integers per stream) carries
    across micro-batches, so packs fill across batch boundaries
    exactly as the batch recurrence would. A drain of the static
    corpus equals batch ``corpus_pack``, whose oracle it shares."""
    from ..streaming.stream_ops import pack_stream
    from .documents import PACK_BUDGET_TOKENS

    docs = read_documents_stream(spark, sf_dir)
    return run_available_now(
        pack_stream(docs, PACK_BUDGET_TOKENS), output_mode="update"
    )


def stream_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters with TRULY bounded state: the count-min
    cells aggregate in complete mode holds d*w integers NO MATTER the
    key cardinality or stream length (contrast `stream_topk_users`,
    whose per-user state grows with the entity count). The top-k probe
    runs post-drain against the drained cell table (k-ish rows on the
    driver session — the established post-drain ranking pattern), with
    the exact audit column from the static table. Drain of the static
    corpus equals the batch `events_topk_cms`, whose oracle it shares.
    """
    from ..sources.tables import load_table
    from .events import cms_cells, cms_hashed, cms_topk_probe

    ev = read_events_stream(spark, sf_dir).select("user_id")
    cells = run_available_now(
        cms_cells(cms_hashed(ev)), output_mode="complete"
    )
    hashed = cms_hashed(
        load_table(spark, sf_dir, "events").select("user_id")
    )
    return cms_topk_probe(hashed, cells)



def stream_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-source admission cap — crawl governance AT INGEST
    (the arrival-order twin of batch ``corpus_domain_cap``'s
    draw-rank policy): the first CAP docs of each source stream are
    admitted, later arrivals marked dropped.

    State is ONE counter per domain — bounded by domain count, never
    stream length. For doc_id-contiguous arrival (the file-ingest
    order) the drain equals the first-cap-by-doc_id rule, so the op
    carries its own full SQL oracle.
    """
    from ..streaming.stream_ops import domain_cap_stream

    docs = read_documents_stream(spark, sf_dir)
    return run_available_now(
        domain_cap_stream(docs, DOMAIN_CAP), output_mode="update"
    )



def stream_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deterministic reservoir sample — the bottom-k sketch
    running AT INGEST: each shard's state is the k smallest seeded
    draws seen so far (k rows per shard, never stream length), and
    min-k is a SET property, so the drained sample is invariant to
    micro-batch splits and arrival order — bit-equal to batch
    ``corpus_sample_fixed``, whose oracle it shares.

    The post-drain step keeps each shard's final reservoir (max state
    seq) and merges the global k smallest — k x n_shards rows on the
    driver session, the established post-drain ranking pattern.
    """
    from ..streaming.stream_ops import sample_stream
    from .documents import FIXED_SAMPLE_K

    from pyspark.sql import functions as F

    docs = read_documents_stream(spark, sf_dir)
    from pyspark.sql.window import Window

    drained = run_available_now(
        sample_stream(docs, FIXED_SAMPLE_K), output_mode="update"
    )
    # final reservoir per shard = the max-seq emission (window, not a
    # self-join: the memory-sink view can't join itself)
    w = Window.partitionBy("shard")
    return (
        drained.withColumn("max_seq", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("max_seq"))
        .orderBy("sample_key")
        .limit(FIXED_SAMPLE_K)
        .select("doc_id", "lang", "source", "sample_key")
    )



def stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-event-per-entity snapshot — the SCD/upsert
    collapse running AT INGEST: complete-mode struct-max per user, so
    state is ONE struct per active entity (hash-partitioned, bounded
    by entity count, never stream length) and the max-merge is
    order-independent — the drain equals batch ``events_latest_state``
    for ANY micro-batching, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    picked = (
        ev.select(
            "user_id",
            F.struct(
                us.alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
                F.col("value").alias("value"),
            ).alias("st"),
        )
        .groupBy("user_id")
        .agg(F.max("st").alias("st"))
    )
    drained = run_available_now(picked, output_mode="complete")
    return drained.select(
        "user_id",
        F.col("st.event_id").alias("event_id"),
        F.col("st.ts_us").alias("ts_us"),
        F.col("st.event_type").alias("event_type"),
        F.col("st.value").alias("value"),
    )



def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming marketing attribution: the purchase×prior-view
    interval join runs AT INGEST (watermark-evicted state — the
    lookback window of views per user, never the stream), and the
    first/last/count collapse per purchase is a batch aggregation
    over the drained pair sink. Drain == batch `events_attribution`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import attribution_pairs_stream
    from ..sources.tables import load_table

    ev = read_events_stream(spark, sf_dir)
    pairs = run_available_now(
        attribution_pairs_stream(ev), output_mode="append"
    )
    touched = pairs.groupBy("purchase_id").agg(
        F.min(F.unix_micros("view_ts")).alias("first_view_ts_us"),
        F.max(F.unix_micros("view_ts")).alias("last_view_ts_us"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )
    buys = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id"),
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )
    return (
        buys.join(
            touched.withColumnRenamed("purchase_id", "event_id"),
            "event_id",
            "left",
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            "first_view_ts_us",
            "last_view_ts_us",
            F.coalesce("n_touches", F.lit(0)).cast("long").alias(
                "n_touches"
            ),
        )
    )



def stream_bot_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bot screen: per-user traffic counters accumulate AT
    INGEST with FOUR integers of state per user; the rate/threshold
    verdict applies to the latest emission per user post-drain. Drain
    == batch `events_bot_detection`, whose oracle it shares.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..functions.text import quantize
    from ..streaming.stream_ops import bot_counters_stream
    from .events import BOT_MIN_EVENTS, BOT_RATE_PER_MIN

    ev = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        bot_counters_stream(ev), output_mode="update"
    )
    # latest emission per user = the max-n update (counters only grow)
    w = Window.partitionBy("user_id")
    latest = drained.withColumn(
        "mx", F.max("n_events").over(w)
    ).filter(F.col("n_events") == F.col("mx"))
    rate = (
        F.col("n_events").cast("double")
        / (F.col("span_us").cast("double") / 60_000_000.0)
    )
    q_rate = quantize(
        F.when(F.col("span_us") > 0, rate).otherwise(F.lit(0.0)), 4
    )
    return latest.select(
        "user_id",
        "n_events",
        "span_us",
        "min_gap_us",
        q_rate.alias("events_per_min"),
        (
            (F.col("n_events") >= BOT_MIN_EVENTS)
            & (F.col("span_us") > 0)
            & (q_rate >= BOT_RATE_PER_MIN)
        ).alias("bot_suspect"),
    )


def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming strict view -> click -> purchase funnel: the per-user
    stage machine runs AT INGEST (three nullable longs of state per
    user — bounded by entities, never stream length); the post-drain
    collapse keeps each user's final stage times (emissions are
    monotone: fields only ever fill in) and counts stage survivors.
    Drain == batch `events_funnel`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import funnel_stages_stream

    ev = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        funnel_stages_stream(ev), output_mode="update"
    )
    final = drained.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return final.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


def stream_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cohort-retention triangle: per-user first-seen /
    new-active-day tracking runs AT INGEST (TWO longs of state per
    user; each new active day emits exactly once, append mode); the
    triangle rollup is a batch agg over the drained (user, day,
    cohort) pair sink. Drain == batch `events_cohort_retention`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize
    from ..streaming.stream_ops import cohort_days_stream

    DAY_US = 86_400_000_000
    ev = read_events_stream(spark, sf_dir)
    pairs = run_available_now(
        cohort_days_stream(ev), output_mode="append"
    )
    tri = pairs.groupBy(
        F.timestamp_micros(F.col("cohort_day_us")).alias("cohort_day"),
        ((F.col("day_us") - F.col("cohort_day_us")) / F.lit(DAY_US))
        .cast("long")
        .alias("day_offset"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    sizes = (
        pairs.filter(F.col("day_us") == F.col("cohort_day_us"))
        .groupBy(
            F.timestamp_micros(F.col("cohort_day_us")).alias("cohort_day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    )
    return tri.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        "n_active",
        quantize(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


def stream_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user cadence profile: inter-event gaps computed
    AT INGEST (ONE long of state per user — the last event time; the
    carried value stitches micro-batch boundary pairs), quantile
    rollup post-drain. Drain == batch `events_interarrival`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize
    from ..streaming.stream_ops import gaps_stream

    ev = read_events_stream(spark, sf_dir)
    gaps = run_available_now(gaps_stream(ev), output_mode="append")
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        quantize(F.expr("percentile(gap_us, 0.5)"), 4).alias("med_gap_us"),
        quantize(F.expr("percentile(gap_us, 0.9)"), 4).alias("p90_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


def stream_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Kaplan-Meier churn curve: per-user first/last active
    days accumulate AT INGEST (the cohort-day fold's TWO longs of
    state; its appended pairs carry exactly the (first, new day)
    observations), and the survival estimator runs post-drain on the
    per-user snapshot — a users-bounded table, never the stream.
    Drain == batch `events_survival`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize
    from ..streaming.stream_ops import cohort_days_stream

    ev = read_events_stream(spark, sf_dir)
    pairs = run_available_now(
        cohort_days_stream(ev), output_mode="append"
    )
    per_user = pairs.groupBy("user_id").agg(
        F.min("cohort_day_us").alias("fd_us"),
        F.max("day_us").alias("ld_us"),
    )
    DAY_US = 86_400_000_000
    mx = per_user.agg(F.max("ld_us").alias("maxd_us"))
    per = per_user.crossJoin(F.broadcast(mx)).select(
        ((F.col("ld_us") - F.col("fd_us")) / F.lit(DAY_US))
        .cast("long")
        .alias("t"),
        (F.col("ld_us") == F.col("maxd_us")).cast("long").alias("cens"),
    )
    offs = per.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum("cens").alias("n_censored"),
        (F.count(F.lit(1)) - F.sum("cens")).alias("n_churned"),
    )
    a = offs.select(F.col("t").alias("tt"))
    risk = (
        a.join(F.broadcast(offs), F.col("t") >= F.col("tt"))
        .groupBy("tt")
        .agg(F.sum("n_ending").alias("n_at_risk"))
    )
    base = offs.join(risk, offs.t == risk.tt).select(
        "t",
        "n_at_risk",
        "n_churned",
        "n_censored",
        quantize(
            F.col("n_churned").cast("double") / F.col("n_at_risk"), 9
        ).alias("hazard"),
    )
    f = 1 - F.col("hazard")
    terms = base.select(
        "t",
        f.alias("f"),
        F.when(f > 0, F.log(f)).otherwise(F.lit(0.0)).alias("lnf"),
    )
    prefix = (
        base.select(F.col("t").alias("pt"))
        .join(F.broadcast(terms), F.col("t") <= F.col("pt"))
        .groupBy("pt")
        .agg(F.min("f").alias("min_f"), F.sum("lnf").alias("sum_lnf"))
    )
    return base.join(prefix, base.t == prefix.pt).select(
        "t",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_churned"),
        F.col("n_censored").cast("long").alias("n_censored"),
        quantize(F.col("hazard"), 6).alias("hazard"),
        F.when(F.col("min_f") <= 0, F.lit(0.0))
        .otherwise(quantize(F.exp(F.col("sum_lnf")), 6))
        .alias("survival"),
    )


def stream_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EWMA control chart: the hourly count series
    accumulates AT INGEST (the same calendar-bounded tumbling-window
    state as `stream_hourly` — state = hours × types, never stream
    length), and the EWMA scoring runs post-drain on the
    hours-bounded snapshot via the exact batch computation
    (`events.ewma_from_hourly`). Drain == batch
    `events_ewma_control`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import ewma_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return ewma_from_hourly(hourly)


def stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM drift monitor: the per-type hourly count series
    accumulates AT INGEST (the same calendar-bounded tumbling-window
    state as `stream_hourly` — state = hours × types, never stream
    length), and the exact-integer closed-form CUSUM scan runs
    post-drain on the hours-bounded snapshot
    (`events.cusum_from_hourly`). Drain == batch `events_cusum`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import cusum_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n_events"),
    )
    return cusum_from_hourly(hourly)


def stream_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming traffic-peak detection: the per-type hourly series
    accumulates AT INGEST (the `stream_hourly` calendar-bounded
    tumbling-window state — state = hours × types, never stream
    length) and the strict-local-max + 2σ scan runs post-drain on
    the hours-bounded snapshot (`events.peaks_from_hourly`).
    Drain == batch `events_peak_hours`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import peaks_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n_events"),
    )
    return peaks_from_hourly(hourly)


def stream_hour_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hour-of-day concentration: the same ingest-time
    hourly state, re-binned post-drain to the 24-hour clock (hourly
    cells partition events exactly, so summing counts by hour-of-day
    equals the batch per-event histogram bit-for-bit) and summarized
    with the shared entropy/argmax scan. Drain == batch
    `events_hour_concentration`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import hour_concentration_from_hist

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hist = snap.groupBy(
        "event_type", F.hour("hour").cast("long").alias("hod")
    ).agg(F.sum("n_events").cast("long").alias("cnt"))
    return hour_concentration_from_hist(hist)


def stream_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming calendar-coverage audit: the per-type hourly count
    series accumulates AT INGEST (the `stream_hourly` calendar-bounded
    tumbling state) and the observed-vs-span + longest-silence scan
    runs post-drain on the hours-bounded snapshot
    (`events.coverage_from_hourly`). Drain == batch `events_coverage`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import coverage_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n"),
    )
    return coverage_from_hourly(hourly)


def stream_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming consensus anomaly screen: ONE hourly tumbling state
    feeds all three detectors post-drain (global 3σ, seasonal
    median/MAD, EWMA breach — `events.ensemble_from_hourly`, the
    one-scan composition the batch docstring prescribes for 100 TB).
    Drain == batch `events_anomaly_ensemble`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import ensemble_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return ensemble_from_hourly(hourly)


def stream_forecast_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming forecast scorecard: the one-row MAE/MAPE/bias
    rollup over `stream_forecast_hourly`'s drained backtest. Drain ==
    batch `events_forecast_scorecard`, whose oracle it shares.
    """
    from .events import scorecard_from_backtest

    return scorecard_from_backtest(stream_forecast_hourly(spark, sf_dir))


def stream_ab_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming experiment-design readout: the MDE scan over
    `stream_conversion_ztest`'s drained four-integer count table
    (per-user 2-minima state). Drain == batch `events_ab_design`,
    whose oracle it shares.
    """
    from .events import ab_design_from_counts

    return ab_design_from_counts(stream_conversion_ztest(spark, sf_dir))


def stream_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sample-ratio-mismatch gate: users dedup AT INGEST
    (one counter per user — mergeable) and the χ²(1) parity check
    runs post-drain. Drain == batch `events_ab_srm`, whose oracle it
    shares.
    """
    from pyspark.sql import functions as F

    from .events import srm_from_users

    ev = read_events_stream(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    snap = run_available_now(users, output_mode="complete")
    return srm_from_users(snap.select("user_id"))


def stream_funnel_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel confidence bounds: the Wilson scan over
    `stream_funnel`'s drained stage counts (per-user 3-scalar stage
    machine). Drain == batch `events_funnel_ci`, whose oracle it
    shares.
    """
    from .events import funnel_ci_from_counts

    return funnel_ci_from_counts(stream_funnel(spark, sf_dir))


def stream_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stage-latency profile: the funnel stage machine's
    per-user min-progression times (3 scalars of state) drain to the
    SAME times table as the batch conditional-min chain, and the
    shared percentile scan runs post-drain. Drain == batch
    `events_funnel_latency`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import funnel_stages_stream
    from .events import funnel_latency_from_times

    ev = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        funnel_stages_stream(ev), output_mode="update"
    )
    times = drained.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    ).filter(F.col("t_view").isNotNull())
    return funnel_latency_from_times(times)


def stream_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming two-way decomposition: the hourly tumbling state
    accumulates AT INGEST (type cells sum to the overall series
    post-drain — exact) and the day/hour-of-day additive fit runs on
    the hours-bounded snapshot (`events.decompose_from_hourly`).
    Drain == batch `events_seasonal_decompose`, whose oracle it
    shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import decompose_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return decompose_from_hourly(hourly)


def stream_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trailing-window anomaly screen: the per-(type, hour)
    tumbling state accumulates AT INGEST and the 24-hour trailing
    z-score runs post-drain on the bounded snapshot. Drain == batch
    `events_hourly_anomaly`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import trailing_anomaly_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    return trailing_anomaly_from_hourly(
        snap.select("event_type", "hour", "n_events")
    )


def stream_anomaly_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deseasonalized anomaly screen: decompose the drained
    hourly state with the shared two-way fit, then apply the
    median/MAD residual screen (`events.residual_screen_from_
    decomposed`). Drain == batch `events_anomaly_residual`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import (
        decompose_from_hourly,
        residual_screen_from_decomposed,
    )

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return residual_screen_from_decomposed(
        decompose_from_hourly(hourly)
    )


def stream_forecast_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming seasonal-naive backtest: (day, hour-of-day) count
    cells accumulate AT INGEST (calendar-bounded mergeable state) and
    the train/test split + hod-mean forecast run post-drain
    (`events.forecast_from_cells`). Drain == batch
    `events_forecast_hourly`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import forecast_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    snap = run_available_now(cells, output_mode="complete")
    return forecast_from_cells(snap)


def stream_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LOCF gap-fill: (type, hour) count+sum cells
    accumulate AT INGEST (both mergeable ⇒ split-invariant; mean =
    sv/n is exactly the batch avg) and the spine/carry-forward scan
    runs post-drain (`events.locf_from_cells`). Drain == batch
    `events_hourly_locf`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import locf_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("value").alias("sv"),
    )
    snap = run_available_now(cells, output_mode="complete")
    return locf_from_cells(snap)


def stream_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming linear-interpolation gap-fill: the same mergeable
    (type, hour) count+sum state, with the bracketing-window lerp
    post-drain (`events.interp_from_cells`). Drain == batch
    `events_hourly_interp`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import interp_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("value").alias("sv"),
    )
    snap = run_available_now(cells, output_mode="complete")
    return interp_from_cells(snap)


def stream_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semi-structured rollup: the per-type min/max/avg/
    count aggregates over the extracted JSON prop accumulate AT
    INGEST (state = one aggregate row per type — every component
    mergeable). Drain == batch `events_json_props`, whose oracle it
    shares.
    """
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    agg = ev.withColumn("k", k).groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return run_available_now(agg, output_mode="complete")


def stream_retention_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hour-over-hour retention: activity dedups to (hour,
    user) pair state AT INGEST (bounded by hourly actives × calendar,
    mergeable ⇒ split-invariant) and the cohort/next-hour scan runs
    post-drain. Drain == batch `events_retention_hourly`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import retention_from_pairs

    ev = read_events_stream(spark, sf_dir)
    hu = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(hu, output_mode="complete")
    return retention_from_pairs(snap.select("hour", "user_id"))


def stream_user_activity_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming entity-activity quantiles: per-user counters
    accumulate AT INGEST (the `stream_gini` entity-bounded state) and
    the exact percentile scan runs post-drain on the users-bounded
    snapshot. Drain == batch `events_user_activity_quantiles`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import activity_quantiles_from_counts

    ev = read_events_stream(spark, sf_dir)
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    snap = run_available_now(per, output_mode="complete")
    return activity_quantiles_from_counts(snap)


def stream_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming audience-overlap monitor: (type, user) pairs dedup
    AT INGEST (entity×types-bounded mergeable state) and the
    user-keyed Jaccard scan runs post-drain. Drain == batch
    `events_audience_overlap`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import audience_overlap_from_pairs

    ev = read_events_stream(spark, sf_dir)
    tu = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    snap = run_available_now(tu, output_mode="complete")
    return audience_overlap_from_pairs(
        snap.select("event_type", "user_id")
    )


def stream_churn_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming churn half-life: distilled post-drain from the
    streaming Kaplan-Meier curve (`stream_survival`'s 2-long
    first/last state) with the same conditional-min summary. Drain ==
    batch `events_churn_half_life`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize

    sv = stream_survival(spark, sf_dir)
    agg = sv.agg(
        F.count(F.lit(1)).cast("long").alias("n_offsets"),
        F.min(
            F.when(F.col("survival") <= 0.5, F.col("t"))
        ).alias("half_life_days"),
        quantize(F.max_by("survival", "t"), 6).alias(
            "terminal_survival"
        ),
    )
    return agg.select(
        "n_offsets",
        "half_life_days",
        "terminal_survival",
        F.col("half_life_days").isNotNull().alias("median_reached"),
    )


def stream_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming behavior-chain steady state: transitions emit
    exactly-once AT INGEST (`user_paths_stream`'s 3-scalar state) and
    the K²-bounded damped power iteration runs post-drain
    (`events.markov_from_pairs`). Drain == batch
    `events_markov_stationary`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import user_paths_stream
    from .events import markov_from_pairs

    ev = read_events_stream(spark, sf_dir)
    steps = run_available_now(
        user_paths_stream(ev), output_mode="update"
    )
    pairs = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    return markov_from_pairs(pairs)


def stream_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming absorption probabilities: same exactly-once
    transition emissions as `stream_markov_stationary`, with the
    K²-bounded minimal-fixed-point solve post-drain
    (`events.absorption_from_pairs`). Drain == batch
    `events_absorption`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import user_paths_stream
    from .events import absorption_from_pairs

    ev = read_events_stream(spark, sf_dir)
    steps = run_available_now(
        user_paths_stream(ev), output_mode="update"
    )
    pairs = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    return absorption_from_pairs(pairs)


def stream_dp_user_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming user-level-DP totals: the per-(user, type) count
    state accumulates at ingest (the `stream_dau` entity bound) and
    the clip + Laplace release runs post-drain via the exact batch
    computation (`events.dp_user_release_from_counts`). Drain ==
    batch `events_dp_user_total`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import dp_user_release_from_counts

    ev = read_events_stream(spark, sf_dir)
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    snap = run_available_now(per_user, output_mode="complete")
    return dp_user_release_from_counts(snap)


def stream_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming spectral seasonality scan: the hourly tumbling state
    accumulates AT INGEST (type cells sum to the overall series
    post-drain — exact) and the Fourier sums run on the
    hours-bounded snapshot (`events.periodogram_from_hourly`).
    Drain == batch `events_periodogram`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import periodogram_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return periodogram_from_hourly(hourly)


def stream_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming activity-inequality monitor: per-user event counts
    accumulate AT INGEST (one counter per active user — the
    `stream_dau` entity-bounded class, mergeable ⇒ split-invariant)
    and the exact counts-of-counts Gini evaluates post-drain
    (`events.gini_from_user_counts`). Drain == batch `events_gini`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import gini_from_user_counts

    ev = read_events_stream(spark, sf_dir)
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    snap = run_available_now(per, output_mode="complete")
    return gini_from_user_counts(snap)


def stream_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming acquisition split: activity dedups to (day, user)
    pair state AT INGEST (the `stream_growth_accounting` state) and
    the new-vs-returning scan runs post-drain. Drain == batch
    `events_new_vs_returning`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import new_vs_returning_from_pairs

    ev = read_events_stream(spark, sf_dir)
    pairs = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(pairs, output_mode="complete")
    return new_vs_returning_from_pairs(snap.select("day", "user_id"))


def stream_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hour-of-day seasonality profile: the per-(type,
    hour) tumbling state accumulates AT INGEST and the 24×types
    profile collapse runs post-drain. Drain == batch
    `events_hourly_profile`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import profile_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    return profile_from_hourly(
        snap.select("hour", "event_type", F.col("n_events").alias("n"))
    )


def stream_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming temporal-dependence monitor: the hourly tumbling
    state accumulates AT INGEST (type cells sum to the overall series
    post-drain — exact) and the lag-1/lag-24 ACF scan runs on the
    hours-bounded snapshot. Drain == batch `events_autocorr`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import autocorr_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return autocorr_from_hourly(hourly)


def stream_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM changepoint: daily counts accumulate AT INGEST
    (state = calendar days) and the peak-cumulative-deviation scan
    runs post-drain on the days-bounded snapshot
    (`events.changepoint_from_daily`). Drain == batch
    `events_changepoint`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import changepoint_from_daily

    ev = read_events_stream(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(daily, output_mode="complete")
    return changepoint_from_daily(snap)


def stream_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming behavioral entropy rate: transitions emit
    exactly-once AT INGEST off the 3-scalar per-user state
    (`stream_ops.user_paths_stream`) and the types²-bounded entropy
    scan runs post-drain on the counted pair sink. Drain == batch
    `events_transition_entropy`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import user_paths_stream
    from .events import transition_entropy_from_pairs

    ev = read_events_stream(spark, sf_dir)
    steps = run_available_now(
        user_paths_stream(ev), output_mode="update"
    )
    pairs = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return transition_entropy_from_pairs(pairs)


def stream_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Markov removal-effect attribution: journey
    transitions emit exactly-once AT INGEST off a 4-scalar per-user
    state (`stream_ops.journey_pairs_stream` — last pre-conversion
    event + converted flag; post-purchase events are skipped), and
    the drain closes NON-converting journeys with END from each
    user's latest 'last' row (the one fact only stream end decides)
    before the (types+2)²-bounded solver runs. Drain == batch
    `events_attribution_markov`, whose oracle it shares."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..streaming.stream_ops import journey_pairs_stream
    from .events import MK_END, attribution_markov_from_pairs

    ev = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        journey_pairs_stream(ev), output_mode="update"
    )
    pairs_part = drained.filter(F.col("kind") == "pair").select(
        "src", "dst"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    lasts = (
        drained.filter(F.col("kind") == "last")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("dst") == "N")
        .select("src", F.lit(MK_END).alias("dst"))
    )
    pairs = (
        pairs_part.unionByName(lasts)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return attribution_markov_from_pairs(pairs)


def stream_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming concurrency gauge: sessions form AT INGEST (the
    `stream_sessionize` per-user state) and the interval→hour overlap
    scan runs post-drain on the sessions-bounded snapshot
    (`events.concurrency_from_sessions`). Drain == batch
    `events_concurrency_curve`, whose oracle it shares.
    """
    from .events import concurrency_from_sessions

    return concurrency_from_sessions(stream_sessionize(spark, sf_dir))


def stream_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming adoption curve: per-user FIRST-seen day min-folds AT
    INGEST (state = one day per active user — entity-bounded and
    mergeable, so any micro-batch split drains identically) and the
    cumulative S-curve scan runs post-drain on the days-bounded
    snapshot. Drain == batch `events_adoption_curve`, whose oracle
    it shares.
    """
    from pyspark.sql import functions as F

    from .events import adoption_from_first_seen

    ev = read_events_stream(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    snap = run_available_now(first, output_mode="complete")
    return adoption_from_first_seen(snap)


def stream_incident_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incident detection: the per-type hourly series
    accumulates AT INGEST (the `stream_hourly` calendar-bounded
    tumbling state) and the below-half-median island scan — silent
    hours materialized from the calendar included — runs post-drain
    on the hours-bounded snapshot (`events.incidents_from_hourly`).
    Drain == batch `events_incident_table`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import incidents_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n"),
    )
    return incidents_from_hourly(hourly)


def stream_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming growth ledger: activity dedups to (day, user) pairs
    AT INGEST (state = active user-days — entity×calendar-bounded,
    mergeable counts so any micro-batch split drains identically);
    the new/retained/resurrected/churned scan runs post-drain on the
    bounded pair snapshot. Drain == batch `events_growth_accounting`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import growth_from_pairs

    ev = read_events_stream(spark, sf_dir)
    pairs = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(pairs, output_mode="complete")
    return growth_from_pairs(snap.select("day", "user_id"))


def stream_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming behavioral-transition mining: per-user last-event
    state (3 scalars per active user — never the history) emits each
    (prev_type → next_type) step exactly once AT INGEST
    (`stream_ops.user_paths_stream`); the corpus-wide pair count +
    top-20 runs post-drain on the emitted-steps sink. Drain == batch
    `events_user_paths`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import user_paths_stream
    from .events import PATHS_TOPK

    ev = read_events_stream(spark, sf_dir)
    steps = run_available_now(
        user_paths_stream(ev), output_mode="update"
    )
    pairs = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    return pairs.orderBy(
        F.col("n").desc(), F.col("src"), F.col("dst")
    ).limit(PATHS_TOPK)


def stream_type_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily mix-trend monitor: (day, type) counts
    accumulate AT INGEST (state = calendar days × types, never
    stream length; counts are mergeable so any micro-batch split
    drains identically) and the share scan runs post-drain on the
    bounded snapshot. Drain == batch `events_type_share_trend`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import type_share_from_cells

    ev = read_events_stream(spark, sf_dir)
    per = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    snap = run_available_now(per, output_mode="complete")
    return type_share_from_cells(snap)


def stream_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming behavioral-diversity monitor: (user, type) counts
    accumulate AT INGEST (state = active users × their types —
    entity-bounded, the `stream_dau` class) and the entropy scan
    runs post-drain. Drain == batch `events_user_entropy`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import user_entropy_from_cells

    ev = read_events_stream(spark, sf_dir)
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("f")
    )
    snap = run_available_now(ut, output_mode="complete")
    return user_entropy_from_cells(snap)


def stream_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming weekly-heatmap monitor: the ≤168 (dow, hod) cells
    accumulate AT INGEST (fixed-size state regardless of volume) and
    the margin/ratio scan runs post-drain. Drain == batch
    `events_dow_hour_heatmap`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import heatmap_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    snap = run_available_now(cells, output_mode="complete")
    return heatmap_from_cells(snap)


def stream_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming robust anomaly profile: the hourly count series
    accumulates AT INGEST (the same calendar-bounded tumbling-window
    state as `stream_hourly`; the per-type cells just sum to the
    overall series post-drain — exact), and the median/MAD screen
    runs on the hours-bounded snapshot via the exact batch
    computation (`events.mad_from_hourly`). Drain == batch
    `events_anomaly_mad`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import mad_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return mad_from_hourly(hourly)


def stream_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Theil–Sen trend: the hourly count series accumulates
    AT INGEST (the `stream_hourly` calendar-bounded tumbling state,
    type cells summed to the overall series post-drain — exact) and
    the median-of-pairwise-slopes evaluates on the hours-bounded
    snapshot via the exact batch computation
    (`events.sen_from_hourly`). Drain == batch `events_sen_slope`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import sen_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return sen_from_hourly(hourly)


def stream_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming k-anonymity monitor: the QI-cell counts accumulate
    AT INGEST (state = quasi-identifier domain — types × 24 hours ×
    value buckets — never stream length) and the 1-row risk summary
    evaluates post-drain, so an extract pipeline can gate release on
    the live risk share. Drain == batch `events_k_anonymity`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") / 10.0).cast("long").alias("vb"),
    ).agg(F.count(F.lit(1)).cast("long").alias("g"))
    snap = run_available_now(cells, output_mode="complete")
    from .events import k_anonymity_from_cells

    return k_anonymity_from_cells(snap)


def stream_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming l-diversity monitor: (QI, user) pair counts
    accumulate AT INGEST (state = active QI×user pairs — bounded by
    the QI domain times the user population, never stream length;
    pair counts are mergeable so ANY micro-batch split drains
    identically) and collapse post-drain to the per-cell
    distinct-user cells the shared summary reads. Drain == batch
    `events_l_diversity`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import l_diversity_from_cells

    ev = read_events_stream(spark, sf_dir)
    pairs = ev.groupBy(
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") / 10.0).cast("long").alias("vb"),
        "user_id",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(pairs, output_mode="complete")
    cells = snap.groupBy("event_type", "hod", "vb").agg(
        F.sum("n").cast("long").alias("g"),
        F.count(F.lit(1)).cast("long").alias("l"),
    )
    return l_diversity_from_cells(cells)


def stream_emb_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding-health monitor — the streaming tier's
    first VECTOR-table op: (dim, quantized-norm) cell counts
    accumulate AT INGEST (the value-grid state class, exact
    integers ⇒ split-invariant) and the one-row audit (incl. the
    exact weighted median) evaluates post-drain via the batch fold
    (`documents.emb_norm_audit_from_cells`). Drain == batch
    `emb_norm_audit`, whose oracle it shares."""
    from ..streaming.stream_ops import read_embeddings_stream
    from .documents import emb_norm_audit_from_cells, emb_norm_cells

    emb = read_embeddings_stream(spark, sf_dir)
    snap = run_available_now(
        emb_norm_cells(emb), output_mode="complete"
    )
    return emb_norm_audit_from_cells(snap)


def stream_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Wald IV estimator: per-user (signups, purchase
    cents) fold AT INGEST (the user-bounded mergeable state class)
    and the two-arm ratio evaluates post-drain via the exact batch
    computation (`events.iv_wald_from_users`). Drain == batch
    `events_iv_wald`, whose oracle it shares."""
    from .events import iv_user_cells, iv_wald_from_users

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(
        iv_user_cells(ev), output_mode="complete"
    )
    return iv_wald_from_users(snap)


def stream_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming interrupted-time-series: hourly counts accumulate
    AT INGEST (the calendar-bounded `stream_hourly` state class) and
    the segmented regression evaluates post-drain via the exact
    batch computation (`events.its_from_cells`). Drain == batch
    `events_interrupted_ts`, whose oracle it shares."""
    from .events import its_cells, its_from_cells

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(its_cells(ev), output_mode="complete")
    return its_from_cells(snap)


def stream_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming t-closeness monitor: the QI × value-bin cells
    accumulate AT INGEST (state = the QI domain × the value grid —
    a dimension product, never stream length) and the ordered-EMD
    audit evaluates post-drain via the exact batch computation
    (`events.t_closeness_from_cells`). Drain == batch
    `events_t_closeness`, whose oracle it shares."""
    from .events import t_closeness_cells, t_closeness_from_cells

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(
        t_closeness_cells(ev), output_mode="complete"
    )
    return t_closeness_from_cells(snap)


def stream_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candles: the per-(type, hour) struct-min/max
    state accumulates AT INGEST (state = calendar-bounded cells of
    five scalars — open/close ride min/max over (ts, id, value)
    structs, which are mergeable, so candles are exact under ANY
    micro-batch split) and the report projects post-drain. Drain ==
    batch `events_value_ohlc`, whose oracle it shares.
    """
    from ..streaming.stream_ops import read_events_stream
    from .events import ohlc_cells, ohlc_report

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(ohlc_cells(ev), output_mode="complete")
    return ohlc_report(snap)


def stream_uptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heartbeat uptime: a CUSTOM stateful fold
    (`applyInPandasWithState`, the sessionize tier — five integers
    per user) accumulates covered time incrementally; each emission
    carries the running totals with the open interval's +W, so the
    update-mode drain's latest row per user equals the batch
    integers exactly, and the share projects post-drain. Drain ==
    batch `events_uptime`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize
    from ..streaming.stream_ops import uptime_stream
    from .events import UPTIME_WINDOW_US

    ev = read_events_stream(spark, sf_dir)
    updates = run_available_now(
        uptime_stream(ev, UPTIME_WINDOW_US), output_mode="update"
    )
    latest = (
        updates.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "n_beats",
                    "n_gaps",
                    "covered_us",
                    "first_us",
                    "last_us",
                )
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_beats").alias("n_beats"),
            F.col("s.n_gaps").alias("n_gaps"),
            F.col("s.covered_us").alias("covered_us"),
            F.col("s.first_us").alias("first_us"),
            F.col("s.last_us").alias("last_us"),
        )
    )
    span = F.col("last_us") - F.col("first_us") + F.lit(
        UPTIME_WINDOW_US
    )
    return latest.select(
        "user_id",
        "n_beats",
        "n_gaps",
        "covered_us",
        span.cast("long").alias("span_us"),
        quantize(
            F.col("covered_us").cast("double") / span.cast("double"),
            6,
        ).alias("uptime_share"),
    )


def stream_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming time-weighted value: the custom stateful fold
    (`streaming.stream_ops.time_weighted_stream`) closes each hold
    interval as its successor arrives — exact integer μs × cents —
    and the drain's latest row per user feeds the same final division
    as the batch query. Drain == batch `events_time_weighted_value`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import quantize
    from ..streaming.stream_ops import time_weighted_stream

    ev = read_events_stream(spark, sf_dir)
    updates = run_available_now(
        time_weighted_stream(ev), output_mode="update"
    )
    latest = (
        updates.groupBy("user_id")
        .agg(
            F.max(
                F.struct("n_intervals", "total_us", "wsum")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_intervals").alias("n_intervals"),
            F.col("s.total_us").alias("total_us"),
            F.col("s.wsum").alias("wsum"),
        )
    )
    tw = F.col("wsum").cast("double") / F.col("total_us") / 100.0
    return latest.select(
        "user_id",
        "n_intervals",
        "total_us",
        F.when(F.col("total_us") > 0, quantize(tw, 4)).alias(
            "tw_avg_value"
        ),
    )


def stream_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming schema-on-read monitor for the props JSON: (key,
    value) occurrence cells accumulate AT INGEST (state bounded by
    the key × value DOMAIN, the content-bounded class) alongside a
    1-scalar row count, and the inference report evaluates post-drain
    via the batch helper (`events.json_schema_report`). Drain ==
    batch `events_json_schema`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import json_schema_cells, json_schema_report

    ev = read_events_stream(spark, sf_dir)
    cells = run_available_now(
        json_schema_cells(ev), output_mode="complete"
    )
    totals = run_available_now(
        read_events_stream(spark, sf_dir).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows")
        ),
        output_mode="complete",
    )
    return json_schema_report(cells, totals)


def stream_error_load_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming load-sensitivity triage: the (hour, errors,
    non-errors) cells accumulate AT INGEST (calendar-bounded tumbling
    state) and the exact-integer Pearson fold runs post-drain
    (`events.error_load_corr_from_hourly`). Drain == batch
    `events_error_load_corr`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import error_load_corr_from_hourly

    ev = read_events_stream(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "error", 0).otherwise(1)
        )
        .cast("long")
        .alias("y"),
    )
    snap = run_available_now(hourly, output_mode="complete")
    return error_load_corr_from_hourly(snap)


def stream_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Mann-Kendall trend monitor over the drained
    hours-bounded tumbling state (type cells summed to the overall
    series — exact). Drain == batch `events_mann_kendall`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import mk_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.groupBy("hour").agg(
        F.sum("n_events").cast("long").alias("n")
    )
    return mk_from_hourly(hourly)


def stream_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Fano-factor dispersion monitor per type over the
    same (type, hour) ingest state as `stream_hourly`. Drain ==
    batch `events_burstiness`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import hourly_counts
    from .events import burstiness_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(hourly_counts(ev), output_mode="complete")
    hourly = snap.select(
        "hour", "event_type", F.col("n_events").cast("long").alias("n")
    )
    return burstiness_from_hourly(hourly)


def stream_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLO burn-down: the daily (events, errors) series
    accumulates AT INGEST (one tumbling-day window agg — state =
    days × 2 longs, calendar-bounded, never stream length), and the
    cumulative burn computation runs post-drain on the days-bounded
    snapshot via the exact batch computation
    (`events.error_budget_from_daily`). Drain == batch
    `events_error_budget`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import error_budget_from_daily

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("int"))
            .cast("long")
            .alias("n_errors"),
        )
        .select(
            F.col("window.start").alias("day"), "n_events", "n_errors"
        )
    )
    daily = run_available_now(agg, output_mode="complete")
    return error_budget_from_daily(daily)


def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session-shape distribution: the incremental
    sessionizer's per-session state (n_events, duration_us) IS the
    per-session table — the drain collapses update rows to final
    states (sessions-bounded) and runs the exact batch rollup
    (`events.session_stats_from_per`). Drain == batch
    `events_session_stats`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import latest_sessions, sessionize_stream
    from .events import session_stats_from_per

    ev = read_events_stream(spark, sf_dir)
    updates = run_available_now(sessionize_stream(ev), output_mode="update")
    per = latest_sessions(updates).select(
        "n_events", F.col("duration_us").alias("dur_us")
    )
    return session_stats_from_per(per)


def stream_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DAU/WAU stickiness: the cohort-day ingest fold's
    appended pairs ARE the distinct (day, user) activity (each new
    active day emits exactly once), so the drain feeds the exact
    batch rollup (`events.stickiness_from_act`) with no extra state
    op. Drain == batch `events_stickiness`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..streaming.stream_ops import cohort_days_stream
    from .events import stickiness_from_act

    ev = read_events_stream(spark, sf_dir)
    pairs = run_available_now(
        cohort_days_stream(ev), output_mode="append"
    )
    act = pairs.select(
        F.timestamp_micros(F.col("day_us")).alias("day"), "user_id"
    ).distinct()
    return stickiness_from_act(act)


def stream_value_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Kruskal-Wallis: the (value-grid-cell, type) counts
    accumulate AT INGEST — a NEW bounded-state class: state is
    bounded by the VALUE GRID × types (the domain of the measure),
    not by stream length or user count — and the rank test runs
    post-drain on that bounded snapshot via the exact batch
    computation (`events.kruskal_from_cells`). Drain == batch
    `events_value_kruskal`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import kruskal_from_cells

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(
            F.floor(F.col("value") * 100 + 0.5)
            .cast("long")
            .alias("vq"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("ng"))
    )
    cell = run_available_now(agg, output_mode="complete")
    return kruskal_from_cells(cell)


def stream_value_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Brown-Forsythe: the identical value-grid-bounded
    (cell, type) ingest state as `stream_value_kruskal` — one
    bounded-state accumulation serves BOTH rank and variance tests —
    drained into the exact batch computation
    (`events.levene_from_cells`). Drain == batch
    `events_value_levene`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import levene_from_cells

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(
            F.floor(F.col("value") * 100 + 0.5)
            .cast("long")
            .alias("vq"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("ng"))
    )
    cell = run_available_now(agg, output_mode="complete")
    return levene_from_cells(cell)


def stream_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming event-study: the same calendar-bounded (treat, day)
    moment cells as `stream_sequential_msprt` accumulate at ingest,
    and the pre-period-centered gap trajectory evaluates post-drain
    (`events.parallel_trends_from_cells`). Drain == batch
    `events_parallel_trends`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import parallel_trends_from_cells

    ev = read_events_stream(spark, sf_dir)
    grid = ev.select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vq"),
    )
    cells = grid.groupBy("treat", "day_us").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("sv"),
        F.sum((F.col("vq") * F.col("vq")).cast("decimal(38,0)")).alias(
            "svv"
        ),
    )
    snap = run_available_now(cells, output_mode="complete")
    return parallel_trends_from_cells(snap)


def stream_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HRW shard routing: the assignment is a pure function
    of doc_id (S+1 md5 draws + one array argmax), so the streaming
    form is a STATELESS append transform — the `stream_quality_gate`
    shape, which is exactly why rendezvous routing works at intake
    time with nothing to checkpoint but offsets. Drain == batch
    `corpus_shard_rendezvous`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .documents import HRW_SHARDS, _hrw_key

    docs = read_documents_stream(spark, sf_dir)
    doc = F.col("doc_id")
    keys = [_hrw_key(doc, s) for s in range(HRW_SHARDS + 1)]
    best = F.array_max(
        F.array(
            *[
                F.struct(keys[s].alias("k"), F.lit(s).alias("s"))
                for s in range(HRW_SHARDS)
            ]
        )
    )
    routed = docs.select(
        "doc_id",
        best["s"].cast("long").alias("shard"),
        (keys[HRW_SHARDS] > best["k"]).alias("moves_on_scale_out"),
    )
    return run_available_now(routed, output_mode="append")


def stream_anomaly_injection_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of the detector ground-truth eval: the hourly
    count cells accumulate at ingest (the `stream_hourly` bound) and
    the deterministic injection + production ensemble + scoring all
    run post-drain — rerunning the eval on every drain is exactly how
    a monitoring stack keeps its detector SLA current. Drain == batch
    `events_anomaly_injection_eval`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import (
        INJECT_ADD,
        INJECT_EVERY,
        INJECT_MULT,
        ensemble_from_hourly,
    )
    from ..functions.text import quantize

    ev = read_events_stream(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    snap = run_available_now(hourly, output_mode="complete")
    hidx = (F.unix_micros("hour") / 3_600_000_000).cast("long")
    inj = (hidx % INJECT_EVERY) == 0
    injected = snap.select(
        "hour",
        F.when(inj, F.col("n") * INJECT_MULT + INJECT_ADD)
        .otherwise(F.col("n"))
        .cast("long")
        .alias("n"),
        inj.alias("inj"),
    )
    # drained-relation rule: rename the self-lineage join key
    flags = ensemble_from_hourly(injected.select("hour", "n")).select(
        F.col("hour").alias("f_hour"), "votes"
    )
    m = injected.select("hour", "inj").join(
        flags, F.col("f_hour") == F.col("hour"), "left"
    )
    votes = F.coalesce(F.col("votes"), F.lit(0))
    per = []
    for k in (1, 2, 3):
        det = votes >= k
        agg = m.agg(
            F.lit(k).cast("long").alias("min_votes"),
            F.sum(F.when(F.col("inj"), 1).otherwise(0))
            .cast("long")
            .alias("n_injected"),
            F.sum(F.when(F.col("inj") & det, 1).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(~F.col("inj") & det, 1).otherwise(0))
            .cast("long")
            .alias("fp"),
        )
        tp = F.col("tp").cast("double")
        prec = F.try_divide(tp, F.col("tp") + F.col("fp"))
        rec = F.try_divide(tp, F.col("n_injected"))
        per.append(
            agg.select(
                "min_votes",
                "n_injected",
                "tp",
                "fp",
                (F.col("n_injected") - F.col("tp"))
                .cast("long")
                .alias("fn"),
                quantize(prec, 6).alias("precision"),
                quantize(rec, 6).alias("recall"),
                quantize(
                    F.try_divide(2.0 * prec * rec, prec + rec), 6
                ).alias("f1"),
            )
        )
    out = per[0]
    for frame in per[1:]:
        out = out.unionByName(frame)
    return out


def stream_psi_injection_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming drift response curve: state is the per-distinct-value
    count table (bounded by the cent grid, the `stream_value_histogram`
    bound), and the planted-shift PSI curve recomputes post-drain from
    those counts with the IDENTICAL double expressions as batch.
    Drain == batch `events_psi_injection_eval`, whose oracle it
    shares.
    """
    from pyspark.sql import functions as F

    from .events import PSI_SHIFT_GRID
    from ..functions.text import quantize

    ev = read_events_stream(spark, sf_dir)
    vals = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    snap = run_available_now(vals, output_mode="complete")
    base = snap.groupBy(
        F.floor(F.col("value") / 10.0).cast("long").alias("bucket")
    ).agg(F.sum("cnt").cast("long").alias("n1"))
    per = []
    for shift in PSI_SHIFT_GRID:
        shifted = snap.groupBy(
            F.floor((F.col("value") + F.lit(shift)) / 10.0)
            .cast("long")
            .alias("bucket")
        ).agg(F.sum("cnt").cast("long").alias("n2"))
        cells = base.join(shifted, "bucket", "full_outer").select(
            "bucket",
            F.coalesce(F.col("n1"), F.lit(0)).alias("n1"),
            F.coalesce(F.col("n2"), F.lit(0)).alias("n2"),
        )
        tot = cells.agg(
            F.sum("n1").cast("long").alias("t1"),
            F.sum("n2").cast("long").alias("t2"),
            F.count(F.lit(1)).cast("long").alias("b"),
        )
        j = cells.crossJoin(F.broadcast(tot))
        p1 = (F.col("n1") + 1).cast("double") / (
            F.col("t1") + F.col("b")
        )
        p2 = (F.col("n2") + 1).cast("double") / (
            F.col("t2") + F.col("b")
        )
        contrib = (p2 - p1) * F.log(p2 / p1)
        per.append(
            j.agg(
                F.lit(shift).alias("shift_dollars"),
                quantize(F.sum(contrib), 6).alias("psi"),
            )
        )
    out = per[0]
    for frame in per[1:]:
        out = out.unionByName(frame)
    return out


def stream_sequential_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming always-valid sequential test: the (treat, day)
    moment cells accumulate at ingest (calendar-bounded) and the
    cumulative mSPRT trajectory evaluates post-drain via the exact
    batch computation (`events.msprt_from_cells`) — the natural home
    for an ALWAYS-VALID test is precisely a stream you peek at on
    every drain. Drain == batch `events_sequential_msprt`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import msprt_from_cells

    ev = read_events_stream(spark, sf_dir)
    grid = ev.select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vq"),
    )
    cells = grid.groupBy("treat", "day_us").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("sv"),
        F.sum((F.col("vq") * F.col("vq")).cast("decimal(38,0)")).alias(
            "svv"
        ),
    )
    snap = run_available_now(cells, output_mode="complete")
    return msprt_from_cells(snap)


def stream_dp_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DP median: the dollar-bin count state is bounded by
    the value range, and the exponential-mechanism release (keyed
    Gumbel draws over the drained bins) is a pure post-drain
    computation — rerunning it on every drain costs no extra privacy
    ONLY because the draw is keyed (a fresh-noise rerun would);
    the deterministic mechanism is what makes a streaming DP release
    coherent. Drain == batch `events_dp_median`, whose oracle it
    shares.
    """
    from pyspark.sql import functions as F

    from .events import DP_MEDIAN_EPS, DP_U_SCALE

    ev = read_events_stream(spark, sf_dir)
    bins = ev.groupBy(
        F.floor(F.col("value")).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_bin"))
    snap = run_available_now(bins, output_mode="complete")
    tot = snap.agg(F.sum("n_bin").cast("long").alias("n"))
    lower = snap.select(
        F.col("bin").alias("b2"), F.col("n_bin").alias("nb2")
    )
    ranked = (
        snap.join(F.broadcast(lower), F.col("b2") <= F.col("bin"))
        .groupBy("bin", "n_bin")
        .agg(F.sum("nb2").cast("long").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    util = -F.abs(2 * F.col("cum") - F.col("n"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dpm|"), F.col("bin").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(DP_U_SCALE)
    gumbel = -F.log(-F.log(u))
    score = F.lit(DP_MEDIAN_EPS / 4.0) * util + gumbel
    return ranked.withColumn("score", score).agg(
        F.expr("max_by(bin, struct(score, -bin))")
        .cast("long")
        .alias("dp_median_bin"),
        F.lit(DP_MEDIAN_EPS).alias("epsilon"),
    )


def stream_bootstrap_diff_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming Poisson-bootstrap CI: the per-user value total is the
    only state (the `stream_dau` entity bound) — replicate weights are
    a pure function of (user, replicate), so the whole bootstrap
    evaluates post-drain via the exact batch fan-out
    (`events.bootstrap_ci_from_users`). Drain == batch
    `events_bootstrap_diff_ci`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import bootstrap_ci_from_users

    ev = read_events_stream(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("decimal(38,0)"))
        .alias("yd")
    )
    snap = run_available_now(per_user, output_mode="complete")
    return bootstrap_ci_from_users(
        snap.select("user_id", F.col("yd").cast("double").alias("y"))
    )


def stream_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUPED: the per-(user, day) value cells accumulate at
    ingest (exact decimal cents — the `stream_growth_accounting`
    user-day state bound) and the pre/post split + six-moment fold
    run post-drain via the exact batch computation
    (`events.cuped_from_cells`). Drain == batch `events_cuped`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import cuped_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        (F.col("user_id") % 2 == 0).alias("treat"),
        F.col("user_id"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + 0.5).cast("decimal(38,0)")
        ).alias("sv")
    )
    snap = run_available_now(cells, output_mode="complete")
    return cuped_from_cells(snap)


def stream_dp_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DP vocabulary release: each arriving doc's top-k term
    votes are a STATELESS per-row extraction (docs arrive whole), the
    per-term vote counts accumulate as vocabulary-bounded mergeable
    state, and the noise + threshold release runs post-drain with the
    same deterministic draw. Drain == batch `corpus_dp_vocab`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import words as _words
    from .documents import DP_VOCAB_CLIP, DP_VOCAB_EPS, DP_VOCAB_THRESHOLD
    from .events import dp_noise_col

    docs = read_documents_stream(spark, sf_dir)
    # per-doc top-k by tf (ties by term): an aggregate over the doc's
    # own token array — no cross-row state, pure map
    votes = docs.select(
        F.explode(
            F.slice(
                F.expr(
                    """
                    transform(
                      array_sort(
                        transform(
                          array_distinct(split(lower(trim(text)), '\\\\s+')),
                          t -> struct(
                            -size(filter(split(lower(trim(text)), '\\\\s+'),
                                         x -> x = t)) AS neg,
                            t AS term)
                        )
                      ),
                      s -> s.term
                    )
                    """
                ),
                1,
                DP_VOCAB_CLIP,
            )
        ).alias("term")
    )
    counts = votes.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    snap = run_available_now(counts, output_mode="complete")
    noise = dp_noise_col(
        F.concat(F.lit("dpv|"), F.col("term")),
        eps=DP_VOCAB_EPS / DP_VOCAB_CLIP,
    )
    return (
        snap.select(
            "term",
            F.greatest(F.lit(0), F.col("df") + noise)
            .cast("long")
            .alias("dp_df"),
        )
        .filter(F.col("dp_df") >= DP_VOCAB_THRESHOLD)
    )


def stream_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Cochran–Mantel–Haenszel: the per-user state is TWO
    mergeable minima accumulated at ingest — first event ts and first
    PURCHASE ts (the `stream_conversion_ztest` state, reused verbatim)
    — and the stratified 2×2 fold evaluates post-drain via the exact
    batch computation (`events.cmh_from_users`). Drain == batch
    `events_cmh`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import cmh_from_users

    ev = read_events_stream(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    snap = run_available_now(per_user, output_mode="complete")
    return cmh_from_users(snap)


def stream_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Holt linear smoothing: the (event_type, hour) count
    cells accumulate at ingest (calendar-bounded mergeable state) and
    the level/trend recurrence runs post-drain via the exact batch
    computation (`events.holt_from_cells`). Drain == batch
    `events_holt_linear`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import holt_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    snap = run_available_now(cells, output_mode="complete")
    return holt_from_cells(snap)


def stream_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Theta-method forecast: the (event_type, hour) count
    cells accumulate at ingest (calendar-bounded mergeable state) and
    the trend-decompose + SES recurrence runs post-drain via the
    exact batch computation (`events.theta_from_cells`). Drain ==
    batch `events_theta_forecast`, whose oracle it shares."""
    from .events import holt_cells, theta_from_cells

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(holt_cells(ev), output_mode="complete")
    return theta_from_cells(snap)


def stream_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MTTR/MTBF rollup: tumbling hourly cells accumulate
    at ingest (the `stream_incident_table` state) and the incident
    scan + reliability fold run post-drain via the exact batch
    computations. Drain == batch `events_mttr`, whose oracle it
    shares."""
    from .events import hourly_type_counts, mttr_from_hourly

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(
        hourly_type_counts(ev), output_mode="complete"
    )
    return mttr_from_hourly(snap)


def stream_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Holt–Winters: the same (event_type, hour) count cells
    as `stream_holt_linear` accumulate at ingest, with the seasonal
    fit running post-drain (`events.hw_from_cells`). Drain == batch
    `events_holt_winters`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import hw_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    snap = run_available_now(cells, output_mode="complete")
    return hw_from_cells(snap)


def stream_forecast_model_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming model selection: the (event_type, hour) count cells
    accumulate at ingest and the four-model held-out backtest runs
    post-drain (`events.model_compare_from_cells`) — re-ranking the
    forecasters on every drain is how a capacity plan keeps its model
    choice current. Drain == batch `events_forecast_model_compare`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import model_compare_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    snap = run_available_now(cells, output_mode="complete")
    return model_compare_from_cells(snap)


def stream_dp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming differentially-private hourly release: the count
    state is the plain (hour, event_type) cell table — bounded by
    calendar × types, mergeable across micro-batches — and the
    Laplace noise is a pure function of the cell key, so the release
    applies post-drain via the exact batch computation
    (`events.dp_release_from_cells`). Drain == batch
    `events_dp_hourly`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import dp_release_from_cells

    ev = read_events_stream(spark, sf_dir)
    cells = (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    snap = run_available_now(cells, output_mode="complete")
    return dp_release_from_cells(snap)


def stream_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming diff-in-diffs: the (treat, hour) moment cells
    (exact decimal n/Σv/Σv² on the cent grid) accumulate AT INGEST —
    state bounded by calendar-hours × 2 arms — and the 2×2 estimator
    (period split at the drained hour-range midpoint) evaluates
    post-drain via the exact batch computation
    (`events.did_from_cells`). Drain == batch
    `events_diff_in_diff`, whose oracle it shares.
    """
    from .events import did_cells, did_from_cells

    ev = read_events_stream(spark, sf_dir)
    snap = run_available_now(did_cells(ev), output_mode="complete")
    return did_from_cells(snap)


def stream_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Welch t-test: the six regression moments (n, Σv,
    Σv² per group) accumulate AT INGEST in ONE global streaming
    aggregate — O(1) state regardless of stream length, the textbook
    mergeable-statistic shape — and the test evaluates post-drain via
    the exact batch computation (`events.welch_from_stats`). Drain ==
    batch `events_ab_welch`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import welch_from_stats

    ev = read_events_stream(spark, sf_dir)
    grid = ev.filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        (F.col("event_type") == "purchase").alias("is_a"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vq"),
    )
    one_a = F.when(F.col("is_a"), 1).otherwise(0)
    one_b = F.when(F.col("is_a"), 0).otherwise(1)
    agg = grid.agg(
        F.sum(one_a).cast("long").alias("n_a"),
        F.sum(one_b).cast("long").alias("n_b"),
        F.sum((one_a * F.col("vq")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sv_a"),
        F.sum((one_b * F.col("vq")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sv_b"),
        F.sum((one_a * F.col("vq") * F.col("vq")).cast("decimal(38,0)"))
        .cast("double")
        .alias("svv_a"),
        F.sum((one_b * F.col("vq") * F.col("vq")).cast("decimal(38,0)"))
        .cast("double")
        .alias("svv_b"),
    )
    stats = run_available_now(agg, output_mode="complete")
    return welch_from_stats(stats)


def stream_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming two-proportion z-test on fast activation: the
    per-user state is TWO mergeable minima accumulated AT INGEST —
    first event ts and first PURCHASE ts (state = users × 2
    timestamps, never stream length, the `stream_dau` bound) — and
    "any purchase within 24 h of the first event" is exactly "the
    EARLIEST purchase is within 24 h", so the conversion bit falls
    out of the drained minima; the four-integer-count z-test then
    evaluates via the exact batch computation
    (`events.conversion_ztest_from_users`). Drain == batch
    `events_conversion_ztest`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .events import conversion_ztest_from_users

    ev = read_events_stream(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    snap = run_available_now(per_user, output_mode="complete")
    bits = snap.select(
        "user_id",
        F.when(
            F.col("first_purchase").isNotNull()
            & F.expr("first_purchase < first_ts + INTERVAL 24 HOURS"),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    )
    return conversion_ztest_from_users(bits)


def stream_cross_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming held-out LM quality scoring: the (source, is_train,
    term) token counts accumulate AT INGEST — state bounded by the
    corpus VOCABULARY × strata (the content domain, like the
    value-grid class; never stream length) — and the add-one unigram
    cross-entropy evaluates post-drain via the exact batch
    computation (`documents.cross_perplexity_from_cells`). Drain ==
    batch `corpus_cross_perplexity`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import DRAW_MOD, KNUTH, words
    from .documents import SPLIT_TRAIN, cross_perplexity_from_cells

    docs = read_documents_stream(spark, sf_dir)
    draw = ((F.col("doc_id") * KNUTH) % DRAW_MOD) / float(DRAW_MOD)
    cells = (
        docs.select(
            "source",
            (draw < SPLIT_TRAIN).alias("is_train"),
            F.explode(words(F.col("text"))).alias("term"),
        )
        .groupBy("source", "is_train", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    snap = run_available_now(cells, output_mode="complete")
    return cross_perplexity_from_cells(snap)


def stream_dsir_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR importance model: the hashed n-gram feature
    counts accumulate AT INGEST per (source, bucket) — state bounded
    by sources × the FIXED ``DSIR_BUCKETS`` feature space, never
    stream length — and the smoothed log-likelihood-ratio model
    evaluates post-drain via the exact batch computation
    (`documents.dsir_model_from_cells`). Drain == batch
    `corpus_dsir_model`, whose oracle it shares."""
    from pyspark.sql import functions as F

    from .documents import dsir_featurize, dsir_model_from_cells

    docs = read_documents_stream(spark, sf_dir)
    cells = (
        dsir_featurize(docs)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    snap = run_available_now(cells, output_mode="complete")
    return dsir_model_from_cells(snap)


def stream_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Kneser–Ney bigram LM: the (w1, w2) pair counts
    accumulate AT INGEST (the `stream_ngrams_topk` vocabulary-bounded
    mergeable count-state class) and the discount/continuation
    smoothing evaluates post-drain via the exact batch computation
    (`documents.kn_from_pair_counts`). Drain == batch
    `corpus_kn_bigram_lm`, whose oracle it shares."""
    from .documents import kn_bigram_counts, kn_from_pair_counts

    docs = read_documents_stream(spark, sf_dir)
    snap = run_available_now(
        kn_bigram_counts(docs), output_mode="complete"
    )
    return kn_from_pair_counts(snap)


def stream_bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BPE merge census: (term, tf) occurrence counts
    accumulate AT INGEST (the vocabulary-bounded count-state class)
    and the pair explode / symbol totals evaluate post-drain via the
    exact batch computation
    (`documents.bpe_census_from_term_counts`). Drain == batch
    `corpus_bpe_pair_census`, whose oracle it shares."""
    from .documents import bpe_census_from_term_counts, term_counts

    docs = read_documents_stream(spark, sf_dir)
    snap = run_available_now(
        term_counts(docs), output_mode="complete"
    )
    return bpe_census_from_term_counts(snap)


def stream_charclass_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming character-class hygiene monitor: the five per-doc
    counter expressions are a stateless ingest map collapsing into a
    languages-bounded mergeable-sum aggregation (state = langs × 6
    integers), and the share report evaluates post-drain via the
    exact batch computation (`documents.charclass_report`). Drain ==
    batch `doc_charclass_mix`, whose oracle it shares.
    """
    from .documents import charclass_cells, charclass_report

    docs = read_documents_stream(spark, sf_dir)
    snap = run_available_now(
        charclass_cells(docs), output_mode="complete"
    )
    return charclass_report(snap)


def stream_quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming confounder audit: the per-lang correlation moments
    (n, Σx, Σy, Σxy, Σx², Σy²) accumulate AT INGEST — state =
    langs × 6 numbers, the strata-bounded mergeable-moments shape —
    and the per-lang + ALL Pearson rows evaluate post-drain via the
    exact batch computation (`documents.corr_from_moments`). Drain ==
    batch `corpus_quality_length_corr`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .documents import (
        corr_from_moments,
        corr_moment_aggs,
        quality_score_col,
    )

    docs = read_documents_stream(spark, sf_dir)
    base = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.round(quality_score_col() * 10000).cast("long").alias("y"),
    )
    agg = base.groupBy("lang").agg(*corr_moment_aggs())
    g = run_available_now(agg, output_mode="complete")
    return corr_from_moments(g)


def stream_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stratification audit: the lang × source contingency
    cells accumulate AT INGEST (state = the DIMS-bounded L×S cell
    grid — a dimension product, never stream length) and the
    chi²/Cramér's V evaluate post-drain via the exact batch
    computation (`documents.chi2_from_obs`). Drain == batch
    `corpus_chi2_independence`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from .documents import chi2_from_obs

    docs = read_documents_stream(spark, sf_dir)
    agg = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    obs = run_available_now(agg, output_mode="complete")
    return chi2_from_obs(obs)


def stream_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming doc-length histogram: per-bucket count/min/max cells
    accumulate AT INGEST (state bounded by the length range over the
    bucket width — all three aggregates mergeable ⇒ split-invariant)
    and the bucket projection runs post-drain. Drain == batch
    `corpus_token_histogram`, whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import token_count
    from .documents import TOKEN_HIST_WIDTH, token_hist_report

    docs = read_documents_stream(spark, sf_dir)
    n = token_count(F.col("text")).cast("long")
    cells = docs.select(
        F.floor(n / F.lit(TOKEN_HIST_WIDTH)).cast("long").alias("bucket"),
        n.alias("n_tokens"),
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
    snap = run_available_now(cells, output_mode="complete")
    return token_hist_report(snap)


def stream_ngrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vocabulary sweep: per-shingle document frequencies
    accumulate AT INGEST (within-doc dedup is map-side in
    `doc_shingles`, so the state is the distinct-shingle count table —
    vocab-bounded, mergeable) and the window-free top-K rank scan
    runs post-drain. Drain == batch `corpus_ngrams_topk`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import doc_shingles
    from .documents import ngrams_topk_from_counts

    docs = read_documents_stream(spark, sf_dir)
    counts = doc_shingles(docs).groupBy("s").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    snap = run_available_now(counts, output_mode="complete")
    return ngrams_topk_from_counts(snap)


def stream_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming richness monitor: (source, term) frequencies
    accumulate AT INGEST (vocab×strata-bounded mergeable counts, the
    `stream_cross_perplexity` state class) and the length-invariant
    K/D rollup runs post-drain. Drain == batch `corpus_yule_k`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import words
    from .documents import yule_from_vocab

    docs = read_documents_stream(spark, sf_dir)
    vocab = docs.select(
        "source", F.explode(words(F.col("text"))).alias("term")
    ).groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    snap = run_available_now(vocab, output_mode="complete")
    return yule_from_vocab(snap)


def stream_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hapax profile: (lang, term) frequencies accumulate
    AT INGEST (vocab×langs-bounded mergeable counts) and the hapax
    rollup runs post-drain. Drain == batch `corpus_hapax`, whose
    oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import words
    from .documents import hapax_from_vocab

    docs = read_documents_stream(spark, sf_dir)
    lt = docs.select(
        "lang", F.explode(words(F.col("text"))).alias("term")
    ).groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    snap = run_available_now(lt, output_mode="complete")
    return hapax_from_vocab(snap)


def stream_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token-mass Gini: per-doc token counts are a
    stateless map at ingest and collapse into the counts-of-counts
    histogram (state bounded by MAX DOC LENGTH, never stream length);
    the exact Gini evaluates post-drain via the batch computation
    (`documents.gini_from_hist`). Drain == batch `corpus_token_gini`,
    whose oracle it shares.
    """
    from pyspark.sql import functions as F

    from ..functions.text import token_count
    from .documents import gini_from_hist

    docs = read_documents_stream(spark, sf_dir)
    agg = docs.select(
        token_count(F.col("text")).cast("long").alias("n_tokens")
    ).groupBy("n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    hist = run_available_now(agg, output_mode="complete")
    return gini_from_hist(hist)


QUERIES = {
    "stream_dp_hourly": stream_dp_hourly,
    "stream_diff_in_diff": stream_diff_in_diff,
    "stream_cmh": stream_cmh,
    "stream_holt_linear": stream_holt_linear,
    "stream_theta_forecast": stream_theta_forecast,
    "stream_mttr": stream_mttr,
    "stream_holt_winters": stream_holt_winters,
    "stream_forecast_model_compare": stream_forecast_model_compare,
    "stream_absorption": stream_absorption,
    "stream_dp_user_total": stream_dp_user_total,
    "stream_cuped": stream_cuped,
    "stream_dp_vocab": stream_dp_vocab,
    "stream_sequential_msprt": stream_sequential_msprt,
    "stream_anomaly_injection_eval": stream_anomaly_injection_eval,
    "stream_psi_injection_eval": stream_psi_injection_eval,
    "stream_shard_rendezvous": stream_shard_rendezvous,
    "stream_parallel_trends": stream_parallel_trends,
    "stream_dp_median": stream_dp_median,
    "stream_bootstrap_diff_ci": stream_bootstrap_diff_ci,
    "stream_token_histogram": stream_token_histogram,
    "stream_ngrams_topk": stream_ngrams_topk,
    "stream_yule_k": stream_yule_k,
    "stream_hapax": stream_hapax,
    "stream_token_gini": stream_token_gini,
    "stream_chi2_independence": stream_chi2_independence,
    "stream_quality_length_corr": stream_quality_length_corr,
    "stream_cross_perplexity": stream_cross_perplexity,
    "stream_dsir_model": stream_dsir_model,
    "stream_kn_bigram_lm": stream_kn_bigram_lm,
    "stream_bpe_pair_census": stream_bpe_pair_census,
    "stream_charclass_mix": stream_charclass_mix,
    "stream_ab_welch": stream_ab_welch,
    "stream_conversion_ztest": stream_conversion_ztest,
    "stream_value_kruskal": stream_value_kruskal,
    "stream_value_levene": stream_value_levene,
    "stream_stickiness": stream_stickiness,
    "stream_session_stats": stream_session_stats,
    "stream_error_budget": stream_error_budget,
    "stream_ewma_control": stream_ewma_control,
    "stream_anomaly_ensemble": stream_anomaly_ensemble,
    "stream_forecast_scorecard": stream_forecast_scorecard,
    "stream_ab_design": stream_ab_design,
    "stream_ab_srm": stream_ab_srm,
    "stream_funnel_ci": stream_funnel_ci,
    "stream_funnel_latency": stream_funnel_latency,
    "stream_seasonal_decompose": stream_seasonal_decompose,
    "stream_hourly_anomaly": stream_hourly_anomaly,
    "stream_anomaly_residual": stream_anomaly_residual,
    "stream_forecast_hourly": stream_forecast_hourly,
    "stream_hourly_locf": stream_hourly_locf,
    "stream_hourly_interp": stream_hourly_interp,
    "stream_json_props": stream_json_props,
    "stream_retention_hourly": stream_retention_hourly,
    "stream_user_activity_quantiles":
        stream_user_activity_quantiles,
    "stream_audience_overlap": stream_audience_overlap,
    "stream_churn_half_life": stream_churn_half_life,
    "stream_markov_stationary": stream_markov_stationary,
    "stream_periodogram": stream_periodogram,
    "stream_gini": stream_gini,
    "stream_new_vs_returning": stream_new_vs_returning,
    "stream_hourly_profile": stream_hourly_profile,
    "stream_autocorr": stream_autocorr,
    "stream_changepoint": stream_changepoint,
    "stream_transition_entropy": stream_transition_entropy,
    "stream_attribution_markov": stream_attribution_markov,
    "stream_concurrency_curve": stream_concurrency_curve,
    "stream_adoption_curve": stream_adoption_curve,
    "stream_incident_table": stream_incident_table,
    "stream_growth_accounting": stream_growth_accounting,
    "stream_user_paths": stream_user_paths,
    "stream_type_share_trend": stream_type_share_trend,
    "stream_user_entropy": stream_user_entropy,
    "stream_dow_hour_heatmap": stream_dow_hour_heatmap,
    "stream_l_diversity": stream_l_diversity,
    "stream_t_closeness": stream_t_closeness,
    "stream_iv_wald": stream_iv_wald,
    "stream_emb_norm_audit": stream_emb_norm_audit,
    "stream_interrupted_ts": stream_interrupted_ts,
    "stream_coverage": stream_coverage,
    "stream_peak_hours": stream_peak_hours,
    "stream_hour_concentration": stream_hour_concentration,
    "stream_cusum": stream_cusum,
    "stream_anomaly_mad": stream_anomaly_mad,
    "stream_k_anonymity": stream_k_anonymity,
    "stream_sen_slope": stream_sen_slope,
    "stream_value_ohlc": stream_value_ohlc,
    "stream_uptime": stream_uptime,
    "stream_time_weighted_value": stream_time_weighted_value,
    "stream_json_schema": stream_json_schema,
    "stream_error_load_corr": stream_error_load_corr,
    "stream_mann_kendall": stream_mann_kendall,
    "stream_burstiness": stream_burstiness,
    "stream_hourly": stream_hourly,
    "stream_sessionize": stream_sessionize,
    "stream_view_click_join": stream_view_click_join,
    "stream_asof_view": stream_asof_view,
    "stream_dedup": stream_dedup,
    "stream_quality_gate": stream_quality_gate,
    "stream_pii_scrub": stream_pii_scrub,
    "stream_doc_tokens": stream_doc_tokens,
    "stream_langid_injection_eval": stream_langid_injection_eval,
    "stream_value_histogram": stream_value_histogram,
    "stream_topk_users": stream_topk_users,
    "stream_mix_report": stream_mix_report,
    "stream_dau": stream_dau,
    "stream_value_quantiles": stream_value_quantiles,
    "stream_contamination": stream_contamination,
    "stream_dedup_incremental": stream_dedup_incremental,
    "stream_domain_cap": stream_domain_cap,
    "stream_sample_fixed": stream_sample_fixed,
    "stream_latest_state": stream_latest_state,
    "stream_attribution": stream_attribution,
    "stream_bot_gate": stream_bot_gate,
    "stream_pack": stream_pack,
    "stream_topk_cms": stream_topk_cms,
    "stream_funnel": stream_funnel,
    "stream_cohort_retention": stream_cohort_retention,
    "stream_interarrival": stream_interarrival,
    "stream_survival": stream_survival,
}

ORACLE = {
    "stream_dp_hourly": _EVENTS_ORACLE["events_dp_hourly"],
    "stream_diff_in_diff": _EVENTS_ORACLE["events_diff_in_diff"],
    "stream_cmh": _EVENTS_ORACLE["events_cmh"],
    "stream_holt_linear": _EVENTS_ORACLE["events_holt_linear"],
    "stream_theta_forecast": _EVENTS_ORACLE["events_theta_forecast"],
    "stream_mttr": _EVENTS_ORACLE["events_mttr"],
    "stream_holt_winters": _EVENTS_ORACLE["events_holt_winters"],
    "stream_forecast_model_compare":
        _EVENTS_ORACLE["events_forecast_model_compare"],
    "stream_absorption": _EVENTS_ORACLE["events_absorption"],
    "stream_dp_user_total": _EVENTS_ORACLE["events_dp_user_total"],
    "stream_cuped": _EVENTS_ORACLE["events_cuped"],
    "stream_dp_vocab": _DOCS_ORACLE["corpus_dp_vocab"],
    "stream_sequential_msprt":
        _EVENTS_ORACLE["events_sequential_msprt"],
    "stream_anomaly_injection_eval":
        _EVENTS_ORACLE["events_anomaly_injection_eval"],
    "stream_psi_injection_eval":
        _EVENTS_ORACLE["events_psi_injection_eval"],
    "stream_shard_rendezvous":
        _DOCS_ORACLE["corpus_shard_rendezvous"],
    "stream_parallel_trends":
        _EVENTS_ORACLE["events_parallel_trends"],
    "stream_dp_median": _EVENTS_ORACLE["events_dp_median"],
    "stream_bootstrap_diff_ci":
        _EVENTS_ORACLE["events_bootstrap_diff_ci"],
    "stream_ewma_control": _EVENTS_ORACLE["events_ewma_control"],
    "stream_anomaly_ensemble":
        _EVENTS_ORACLE["events_anomaly_ensemble"],
    "stream_forecast_scorecard":
        _EVENTS_ORACLE["events_forecast_scorecard"],
    "stream_ab_design": _EVENTS_ORACLE["events_ab_design"],
    "stream_ab_srm": _EVENTS_ORACLE["events_ab_srm"],
    "stream_funnel_ci": _EVENTS_ORACLE["events_funnel_ci"],
    "stream_funnel_latency":
        _EVENTS_ORACLE["events_funnel_latency"],
    "stream_seasonal_decompose":
        _EVENTS_ORACLE["events_seasonal_decompose"],
    "stream_hourly_anomaly":
        _EVENTS_ORACLE["events_hourly_anomaly"],
    "stream_anomaly_residual":
        _EVENTS_ORACLE["events_anomaly_residual"],
    "stream_forecast_hourly":
        _EVENTS_ORACLE["events_forecast_hourly"],
    "stream_hourly_locf":
        _EVENTS_ORACLE["events_hourly_locf"],
    "stream_hourly_interp":
        _EVENTS_ORACLE["events_hourly_interp"],
    "stream_json_props":
        _EVENTS_ORACLE["events_json_props"],
    "stream_retention_hourly":
        _EVENTS_ORACLE["events_retention_hourly"],
    "stream_user_activity_quantiles":
        _EVENTS_ORACLE["events_user_activity_quantiles"],
    "stream_audience_overlap":
        _EVENTS_ORACLE["events_audience_overlap"],
    "stream_churn_half_life":
        _EVENTS_ORACLE["events_churn_half_life"],
    "stream_markov_stationary":
        _EVENTS_ORACLE["events_markov_stationary"],
    "stream_periodogram":
        _EVENTS_ORACLE["events_periodogram"],
    "stream_gini": _EVENTS_ORACLE["events_gini"],
    "stream_new_vs_returning":
        _EVENTS_ORACLE["events_new_vs_returning"],
    "stream_hourly_profile":
        _EVENTS_ORACLE["events_hourly_profile"],
    "stream_autocorr": _EVENTS_ORACLE["events_autocorr"],
    "stream_changepoint": _EVENTS_ORACLE["events_changepoint"],
    "stream_transition_entropy":
        _EVENTS_ORACLE["events_transition_entropy"],
    "stream_attribution_markov":
        _EVENTS_ORACLE["events_attribution_markov"],
    "stream_concurrency_curve":
        _EVENTS_ORACLE["events_concurrency_curve"],
    "stream_adoption_curve":
        _EVENTS_ORACLE["events_adoption_curve"],
    "stream_incident_table":
        _EVENTS_ORACLE["events_incident_table"],
    "stream_growth_accounting":
        _EVENTS_ORACLE["events_growth_accounting"],
    "stream_user_paths": _EVENTS_ORACLE["events_user_paths"],
    "stream_type_share_trend":
        _EVENTS_ORACLE["events_type_share_trend"],
    "stream_user_entropy": _EVENTS_ORACLE["events_user_entropy"],
    "stream_dow_hour_heatmap":
        _EVENTS_ORACLE["events_dow_hour_heatmap"],
    "stream_l_diversity": _EVENTS_ORACLE["events_l_diversity"],
    "stream_t_closeness": _EVENTS_ORACLE["events_t_closeness"],
    "stream_iv_wald": _EVENTS_ORACLE["events_iv_wald"],
    "stream_emb_norm_audit": _DOCS_ORACLE["emb_norm_audit"],
    "stream_interrupted_ts": _EVENTS_ORACLE["events_interrupted_ts"],
    "stream_coverage": _EVENTS_ORACLE["events_coverage"],
    "stream_peak_hours": _EVENTS_ORACLE["events_peak_hours"],
    "stream_hour_concentration":
        _EVENTS_ORACLE["events_hour_concentration"],
    "stream_cusum": _EVENTS_ORACLE["events_cusum"],
    "stream_anomaly_mad": _EVENTS_ORACLE["events_anomaly_mad"],
    "stream_k_anonymity": _EVENTS_ORACLE["events_k_anonymity"],
    "stream_sen_slope": _EVENTS_ORACLE["events_sen_slope"],
    "stream_value_ohlc": _EVENTS_ORACLE["events_value_ohlc"],
    "stream_uptime": _EVENTS_ORACLE["events_uptime"],
    "stream_time_weighted_value": _EVENTS_ORACLE["events_time_weighted_value"],
    "stream_json_schema": _EVENTS_ORACLE["events_json_schema"],
    "stream_error_load_corr": _EVENTS_ORACLE["events_error_load_corr"],
    "stream_mann_kendall": _EVENTS_ORACLE["events_mann_kendall"],
    "stream_burstiness": _EVENTS_ORACLE["events_burstiness"],
    "stream_error_budget": _EVENTS_ORACLE["events_error_budget"],
    "stream_session_stats": _EVENTS_ORACLE["events_session_stats"],
    "stream_stickiness": _EVENTS_ORACLE["events_stickiness"],
    "stream_value_kruskal": _EVENTS_ORACLE["events_value_kruskal"],
    "stream_value_levene": _EVENTS_ORACLE["events_value_levene"],
    "stream_ab_welch": _EVENTS_ORACLE["events_ab_welch"],
    "stream_conversion_ztest": _EVENTS_ORACLE["events_conversion_ztest"],
    "stream_quality_length_corr": _DOCS_ORACLE["corpus_quality_length_corr"],
    "stream_cross_perplexity": _DOCS_ORACLE["corpus_cross_perplexity"],
    "stream_dsir_model": _DOCS_ORACLE["corpus_dsir_model"],
    "stream_kn_bigram_lm": _DOCS_ORACLE["corpus_kn_bigram_lm"],
    "stream_bpe_pair_census": _DOCS_ORACLE["corpus_bpe_pair_census"],
    "stream_token_histogram":
        _DOCS_ORACLE["corpus_token_histogram"],
    "stream_ngrams_topk": _DOCS_ORACLE["corpus_ngrams_topk"],
    "stream_yule_k": _DOCS_ORACLE["corpus_yule_k"],
    "stream_hapax": _DOCS_ORACLE["corpus_hapax"],
    "stream_charclass_mix": _DOCS_ORACLE["doc_charclass_mix"],
    "stream_chi2_independence": _DOCS_ORACLE["corpus_chi2_independence"],
    "stream_token_gini": _DOCS_ORACLE["corpus_token_gini"],
    "stream_hourly": _EVENTS_ORACLE["events_hourly"],
    "stream_sessionize": _EVENTS_ORACLE["events_sessionize"],
    "stream_asof_view": _EVENTS_ORACLE["events_asof_view"],
    "stream_dedup": _DOCS_ORACLE["dedup_apply"],
    "stream_quality_gate": quality_gate_sql(PREP_QUALITY_MIN),
    "stream_pii_scrub": _DOCS_ORACLE["doc_pii_scrub"],
    "stream_doc_tokens": _DOCS_ORACLE["doc_tokens"],
    "stream_langid_injection_eval":
        _DOCS_ORACLE["langid_injection_eval"],
    "stream_value_histogram": _EVENTS_ORACLE["events_value_histogram"],
    "stream_topk_users": _EVENTS_ORACLE["events_topk_users"],
    "stream_mix_report": _DOCS_ORACLE["corpus_mix_report"],
    # same invariant oracle as the batch sketch tier: TRUE per day
    "stream_dau": _EVENTS_ORACLE["events_dau_approx"],
    "stream_value_quantiles": _EVENTS_ORACLE["events_value_quantiles_approx"],
    "stream_contamination": _DOCS_ORACLE["corpus_contamination"],
    # the streaming variant's one semantic difference from the batch
    # entry is the df-cap population (existing corpus only)
    "stream_dedup_incremental": incr_dedup_oracle_sql("existing"),
    "stream_sample_fixed": _DOCS_ORACLE["corpus_sample_fixed"],
    "stream_latest_state": _DOCS_ORACLE["events_latest_state"],
    "stream_attribution": _EVENTS_ORACLE["events_attribution"],
    "stream_bot_gate": _EVENTS_ORACLE["events_bot_detection"],
    # static drain of the stage machine == the batch conditional-min
    # cascade, so the streaming funnel shares its full oracle
    "stream_funnel": _EVENTS_ORACLE["events_funnel"],
    # each new (user, active day) emits exactly once at ingest, so the
    # drained pair sink rebuilds the batch triangle bit-for-bit
    "stream_cohort_retention": _EVENTS_ORACLE["events_cohort_retention"],
    # each gap emits exactly once at ingest; drained set == batch lag
    "stream_interarrival": _EVENTS_ORACLE["events_interarrival"],
    # per-user first/last from the drained cohort pairs == batch
    # lifetimes, so the post-drain KM shares the batch oracle
    "stream_survival": _EVENTS_ORACLE["events_survival"],
    "stream_domain_cap": f"""
        SELECT doc_id, source, rk, (rk <= {DOMAIN_CAP}) AS kept FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source ORDER BY doc_id
                 ) AS rk
          FROM documents
        )
    """,
    # single-batch drain of the static corpus == batch greedy packing
    "stream_pack": _DOCS_ORACLE["corpus_pack"],
    # cell-sum mergeability makes the drained sketch equal the batch
    # sketch regardless of micro-batching
    "stream_topk_cms": _EVENTS_ORACLE["events_topk_cms"],
    # on static input the drained stream-stream inner join equals the
    # batch interval join, so it gets a full SQL oracle
    "stream_view_click_join": """
        SELECT c.user_id AS user_id,
               v.event_id AS view_id,
               c.event_id AS click_id,
               epoch_us(v.ts) AS view_us,
               epoch_us(c.ts) AS click_us
        FROM events c
        JOIN events v
          ON c.user_id = v.user_id
         AND v.event_type = 'view'
         AND c.event_type = 'click'
         AND epoch_us(v.ts) <= epoch_us(c.ts)
         AND epoch_us(v.ts) >= epoch_us(c.ts) - 3600000000
    """,
}
