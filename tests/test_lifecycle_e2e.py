"""The composed physical-layout LIFECYCLE, end to end through real
streams and real parquet (the r9-verdict ask-5 restart leg; the
oracle-checked value half is plans/queries.py files_lifecycle):

    streaming ingest → Hilbert-ordered small-file writes per
    micro-batch → file-inventory stream → incremental compaction
    maintenance (WAL-checkpointed) → rewrite of closed bins →
    min-max pruning advisor pricing small files vs compacted bins

What must hold: every generation directory is written curve-ordered
(per-file hv ranges disjoint within a generation); the maintenance
stream folds the inventory exactly as the batch planner would; a WAL
restart with no new data reprocesses nothing and renumbers nothing;
the rewrite conserves every row; and the advisor sees fewer files
with conserved rows after compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.layout import (
    execute_compaction_filelist,
    layout_pruning_stats,
    with_hilbert,
    write_hilbert_ordered,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_compaction_maintenance,
)


def _batch(spark, seed: int, n: int = 600):
    # deterministic (x, y) in [0, 256) with a payload column
    return spark.sql(
        f"SELECT CAST((id * 37 + {seed}) % 256 AS BIGINT) AS x, "
        f"CAST((id * 91 + {seed} * 7) % 256 AS BIGINT) AS y, "
        f"id + {seed} * 1000000 AS payload "
        f"FROM range({n})"
    )


def _hv(df):
    return with_hilbert(df, "x", "y", out="hv", bits=8)


def test_lifecycle_ingest_compact_prune_with_wal_restart(spark, tmp_path):
    stage = str(tmp_path / "stage")
    table = str(tmp_path / "table")
    inv_dir = str(tmp_path / "inventory")
    work = str(tmp_path / "work")
    wal_ingest = str(tmp_path / "wal_ingest")
    wal_maint = str(tmp_path / "wal_maint")

    # ---- stage two ingest epochs as raw drop files ----
    _batch(spark, 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "b1")
    )

    def ingest(batch_df, batch_id):
        gen = f"{table}/gen={batch_id}"
        write_hilbert_ordered(batch_df, gen, "x", "y", n_files=4, bits=8)
        # real file inventory from what was actually written: one row
        # per physical file, keyed by its curve position (min hv —
        # unique within a generation because the write range-partitions
        # on hv; the epoch suffix makes it unique across generations)
        back = _hv(spark.read.parquet(gen))
        files = back.groupBy(
            F.col("_metadata.file_path").alias("path")
        ).agg(
            F.min("hv").alias("_mh"),
            (F.count(F.lit(1)) * 100).cast("long").alias("size_bytes"),
        )
        files.select(
            (F.col("_mh") * 1000 + F.lit(batch_id))
            .cast("long")
            .alias("file_key"),
            "size_bytes",
            "path",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{inv_dir}/epoch={batch_id}"
        )

    def run_ingest():
        stream = (
            spark.readStream.schema("x BIGINT, y BIGINT, payload BIGINT")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/*")
        )
        q = (
            stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", wal_ingest)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    def run_maint():
        stream = (
            spark.readStream.schema(
                "file_key BIGINT, size_bytes BIGINT, path STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(inv_dir + "/*")
        )
        q = streaming_compaction_maintenance(
            stream,
            work,
            target_bytes=25_000,
            checkpoint_dir=wal_maint,
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_ingest()
    run_maint()

    # epoch 1: 600 rows × 100 B over 4 files ⇒ 2 bins of ~25 kB close,
    # the tail stays open (exact split depends on file row counts —
    # assert the invariants, not the constants)
    bins1 = spark.read.parquet(f"{work}/bins").collect()
    assert len(bins1) >= 1
    assert sorted(r["bin"] for r in bins1) == list(range(len(bins1)))

    # ---- second ingest epoch, then incremental maintenance ----
    _batch(spark, 2).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "b2")
    )
    run_ingest()
    run_maint()
    bins2 = sorted(
        spark.read.parquet(f"{work}/bins").collect(), key=lambda r: r["bin"]
    )
    assert len(bins2) > len(bins1)
    assert [r["bin"] for r in bins2] == list(range(len(bins2)))

    # ---- WAL restart with no new data: nothing replays, nothing moves ----
    run_ingest()
    run_maint()
    again = sorted(
        spark.read.parquet(f"{work}/bins").collect(), key=lambda r: r["bin"]
    )
    assert [
        (r["bin"], r["n_files"], r["total_bytes"]) for r in again
    ] == [(r["bin"], r["n_files"], r["total_bytes"]) for r in bins2]

    # ---- rewrite the closed bins (exact FILE membership — epoch bins
    # may overlap in key range, so the work list goes by file) and
    # price both generations ----
    all_rows = spark.read.parquet(table + "/gen=*").withColumn(
        "fpath", F.col("_metadata.file_path")
    )
    file_bins = spark.read.parquet(f"{work}/files/*")
    # per-file keys: join rows to their file's inventory key
    keyed = all_rows.join(
        file_bins.select("path", "file_key").withColumnRenamed(
            "path", "_p"
        ),
        all_rows["fpath"] == F.col("_p"),
        "left",
    ).drop("_p")
    out = str(tmp_path / "compacted")
    execute_compaction_filelist(
        spark.read.parquet(table + "/gen=*"), file_bins, "file_key", out
    )
    compacted = spark.read.parquet(out)

    total_rows = 1200
    n_closed_rows = compacted.count()
    # rows in CLOSED files are rewritten exactly once; the open tail's
    # files are left in place
    n_expected = keyed.where(F.col("file_key").isNotNull()).count()
    assert 0 < n_closed_rows < total_rows
    assert n_closed_rows == n_expected
    assert compacted.select("payload").distinct().count() == n_closed_rows

    # advisor: the compacted generation must cover the same rows with
    # fewer files, and account for every row it was given
    small = keyed.join(
        compacted.select("payload").withColumn("_in", F.lit(1)),
        "payload",
        "left",
    ).where(F.col("_in").isNotNull())
    stats = layout_pruning_stats(
        small.join(
            compacted.select("payload", F.col("bin").alias("cbin")),
            "payload",
        ),
        assignments=[
            ("small", "x", F.crc32(F.col("fpath")), F.col("x")),
            ("compacted", "x", F.col("cbin"), F.col("x")),
        ],
        domains=["x"],
        include_rows=True,
    ).collect()
    by_layout = {r["layout"]: r for r in stats}
    assert by_layout["small"]["n_rows"] == n_closed_rows
    assert by_layout["compacted"]["n_rows"] == n_closed_rows
    assert (
        by_layout["compacted"]["n_files"] < by_layout["small"]["n_files"]
    )
