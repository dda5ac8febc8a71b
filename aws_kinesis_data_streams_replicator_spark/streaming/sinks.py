"""foreachBatch sinks: replication append + keyed checkpoint upsert.

Delivery contract (SURVEY §2 op 9, §2.1): Structured Streaming's
``checkpointLocation`` WAL replays whole micro-batches after failure —
the Spark analog of Lambda's retry-from-failed-sequence-number.  Both
sinks therefore must tolerate replays:

* replication sink — append-only ⇒ at-least-once, exactly like the
  reference's PutRecord retries (README accepts target-stream dups);
  downstream readers dedup on (streamName, sequenceNumber).
* checkpoint sink — **idempotent keyed upsert** taking the per-stream
  MAX commit timestamp merged with the existing table: replaying an old
  batch can never move a checkpoint backwards (monotone, matching
  last-writer-wins-in-sequence-order of Handler.java:85).

The checkpoint "table" is a tiny parquet key-value table (one row per
stream) — the DynamoDB Global Table stand-in.  At scale this would be
Delta/Iceberg MERGE or an actual DynamoDB writer; the upsert semantics
are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_COLS = ("streamName", "lastReplicatedCommitTimestamp")


def append_replicated(batch_df: DataFrame, out_dir: str) -> None:
    """Replication sink: per-shard order preserved by sorting within
    partitions on sequenceNumber before the write (op 6)."""
    (
        batch_df.sortWithinPartitions("sequenceNumber")
        .write.mode("append")
        .parquet(out_dir)
    )


def replicated_exactly_once(batch_df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Exactly-once variant for idempotent-capable targets: each
    micro-batch overwrites its own ``batch_id=N`` partition, so a WAL
    replay rewrites the identical data instead of appending duplicates.
    (The reference's Kinesis target can't do this — PutRecord is
    append-only, hence its documented at-least-once; a file/table target
    can, and this is the standard foreachBatch idempotency pattern.)"""
    (
        batch_df.sortWithinPartitions("sequenceNumber")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
    )


_PTR = "CURRENT"


def _current_version_dir(table_dir: str) -> str | None:
    ptr = os.path.join(table_dir, _PTR)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        v = f.read().strip()
    vdir = os.path.join(table_dir, v)
    return vdir if os.path.isdir(vdir) else None


def read_checkpoint_table(spark: SparkSession, table_dir: str) -> DataFrame:
    vdir = _current_version_dir(table_dir)
    if vdir is not None:
        return spark.read.parquet(vdir)
    return spark.createDataFrame(
        [], schema="streamName string, lastReplicatedCommitTimestamp string"
    )


def upsert_checkpoint(batch_checkpoint: DataFrame, table_dir: str) -> None:
    """Idempotent monotone upsert: new value = max(existing, incoming).

    Durability: versioned directories + an atomically-replaced pointer
    file (``os.replace`` is atomic on POSIX).  A crash at ANY step
    leaves the previous version intact and readable — there is no window
    where the table is missing (a naive delete-then-rename swap has
    one).  Old versions beyond the last two are garbage-collected.
    At scale this becomes Delta/Iceberg MERGE (same log-plus-snapshot
    idea) or a DynamoDB conditional write.
    """
    spark = batch_checkpoint.sparkSession
    existing = read_checkpoint_table(spark, table_dir)
    merged = (
        batch_checkpoint.select(*CHECKPOINT_COLS)
        .unionByName(existing.select(*CHECKPOINT_COLS))
        .groupBy("streamName")
        .agg(F.max("lastReplicatedCommitTimestamp").alias("lastReplicatedCommitTimestamp"))
    )
    os.makedirs(table_dir, exist_ok=True)
    cur = _current_version_dir(table_dir)
    next_v = 0 if cur is None else int(os.path.basename(cur).lstrip("v")) + 1
    vdir = os.path.join(table_dir, f"v{next_v}")
    merged.coalesce(1).write.mode("overwrite").parquet(vdir)
    ptr_tmp = os.path.join(table_dir, _PTR + ".tmp")
    with open(ptr_tmp, "w") as f:
        f.write(f"v{next_v}")
    os.replace(ptr_tmp, os.path.join(table_dir, _PTR))  # atomic commit
    # GC: keep current + previous
    import shutil

    for name in os.listdir(table_dir):
        if name.startswith("v") and name not in (f"v{next_v}", f"v{next_v - 1}"):
            shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)
