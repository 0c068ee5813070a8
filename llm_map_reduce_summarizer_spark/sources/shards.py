"""Training-shard sink: deterministic sharded parquet writer.

The write-side complement of ``plans.documents.corpus_shuffle_shards``:
every row gets a shard and a within-shard position that are pure
functions of (seed, id), the writer emits ONE file per shard in that
order, and a manifest records per-shard row counts. Two runs — on any
cluster size — produce byte-identical training order.

Scale shape: shard assignment is a map-side hash (no shuffle to
decide placement); the only exchange is the repartition ON the shard
id, and the sort runs within shard partitions
(repartition + sortWithinPartitions — never a global orderBy). Shard
count scales with the corpus so each sort partition stays file-sized
(~100k shards at 100 TB).

The manifest is written driver-side (one row per shard — bounded by
design); on a cluster the same path works against any Hadoop-API
filesystem via the JVM, but a plain local write keeps this
dependency-free for the sandbox.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import knuth_shard, shuffle_sort_key

MANIFEST_NAME = "_training_manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (one directory per shard, one file per shard, rows in the
    seeded shuffle order) and return the manifest dict."""
    keyed = df.withColumn(
        "shard", knuth_shard(F.col(id_col), n_shards)
    ).withColumn("sort_key", shuffle_sort_key(F.col(id_col), seed))
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", id_col)
        .drop("sort_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    counts = {
        int(r["shard"]): int(r["n"])
        for r in keyed.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": sum(counts.values()),
        "rows_per_shard": {str(k): counts[k] for k in sorted(counts)},
    }
    with open(os.path.join(path, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read the sharded corpus back; ``shard`` returns as a partition
    column, file order within a shard is the training order."""
    return spark.read.parquet(path)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME), encoding="utf-8") as f:
        return json.load(f)


def write_shard_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> dict[int, int]:
    """Idempotently land ONE micro-batch under its ``batch_id``
    partitions (dynamic overwrite — a retry replaces, never appends)
    and return the batch's per-shard row counts."""
    keyed = batch_df.withColumn(
        "shard", knuth_shard(F.col(id_col), n_shards)
    ).withColumn("batch_id", F.lit(int(batch_id)))
    (
        keyed.repartition("shard")
        .write.partitionBy("shard", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    return {
        int(r["shard"]): int(r["n"])
        for r in keyed.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def stream_to_training_shards(
    stream_df: DataFrame,
    path: str,
    n_shards: int,
    checkpoint: str,
    id_col: str = "doc_id",
):
    """Continuous-intake variant of the shard sink: drain a streaming
    DataFrame into the same deterministic shard layout via
    ``foreachBatch``.

    Shard assignment is the identical map-side Knuth hash, so a row
    lands in the same shard whether it arrived in batch or on the
    stream — shards stay stable for incremental corpus growth. What
    streaming intake can NOT give is the seeded epoch ORDER inside a
    shard (micro-batches land as they arrive); run
    ``write_training_shards`` over the accumulated shard afterwards
    (or at epoch boundaries) for byte-identical training order.

    EXACTLY-ONCE, not at-least-once: each micro-batch writes under its
    own ``batch_id=N`` partition with dynamic partition overwrite, so
    a batch retried after a mid-write failure REPLACES its own
    partitions instead of appending duplicate rows. Per-shard counts
    accumulate incrementally from each batch (keyed by batch_id, so a
    retry also overwrites its count contribution) — the manifest never
    needs a full read-back of the accumulated corpus, which at scale
    would be a whole-corpus scan per intake drain.

    Scale: each micro-batch repartitions only its own rows on the
    shard id; state is just source offsets in the checkpoint plus one
    count dict per drained batch (shards x batches integers).
    """
    batch_counts: dict[int, dict[int, int]] = {}

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_counts[int(batch_id)] = write_shard_batch(
            batch_df, batch_id, path, n_shards, id_col
        )

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    counts: dict[int, int] = {}
    for per_shard in batch_counts.values():
        for shard, n in per_shard.items():
            counts[shard] = counts.get(shard, 0) + n
    manifest = {
        "seed": None,  # streaming intake has no epoch order (see doc)
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": sum(counts.values()),
        "rows_per_shard": {str(k): counts[k] for k in sorted(counts)},
    }
    with open(os.path.join(path, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
