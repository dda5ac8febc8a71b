"""Streaming domain-importance gate (streaming/job.py
streaming_importance_gate): train-once model + per-micro-batch scoring
must be value-identical to the fused batch operator, neutral on unseen
vocabulary, and WAL-restartable (stateless gate, offsets only)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.text import (
    importance_count_model,
    importance_weights,
    score_against_importance_model,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_importance_gate,
)

MED = "patient dose clinical trial symptom therapy diagnosis"
LAW = "court plaintiff statute verdict counsel appeal motion"


def _corpus(spark):
    rows = (
        [(i, MED, "med") for i in range(40)]
        + [(i, LAW, "law") for i in range(40, 80)]
        + [(i, MED + " " + LAW, "mix") for i in range(80, 100)]
    )
    values = ", ".join(f"({i}, '{t}', '{d}')" for i, t, d in rows)
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(doc_id, text, domain)"
    )


def test_split_model_matches_fused_operator(spark):
    docs = _corpus(spark)
    fused = {
        r["doc_id"]: (r["n_tokens"], r["sum_ratio_bp"], r["avg_ratio_bp"])
        for r in importance_weights(docs, F.col("domain") == "med").collect()
    }
    model = importance_count_model(docs, F.col("domain") == "med")
    split = {
        r["doc_id"]: (r["n_tokens"], r["sum_ratio_bp"], r["avg_ratio_bp"])
        for r in score_against_importance_model(docs, model).collect()
    }
    assert fused == split


def test_unseen_vocabulary_scores_neutral(spark):
    docs = _corpus(spark)
    model = importance_count_model(docs, F.col("domain") == "med")
    # tokens chosen so their md5 buckets (60, 14, 100, 203) avoid all
    # 14 trained buckets — genuinely unseen, not collision-scored
    novel = spark.sql(
        "SELECT * FROM VALUES (999, 'zqx jjk pqr xxy') AS t(doc_id, text)"
    )
    (row,) = score_against_importance_model(novel, model).collect()
    # every token lands in an untrained bucket: exactly neutral
    assert row["avg_ratio_bp"] == 10000 and row["sum_ratio_bp"] == 40000


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(f"SELECT * FROM VALUES {rows_sql} AS t(doc_id, text)")
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_gate_keeps_target_drops_offdomain_e2e(spark, tmp_path):
    model = importance_count_model(_corpus(spark), F.col("domain") == "med")
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    _write_file(
        spark, f"(1, '{MED}'), (2, '{LAW}')", stage, "b1.parquet"
    )
    _write_file(spark, f"(3, '{MED} {LAW}')", stage, "b2.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def sink(batch_df, batch_id):
        streaming_importance_gate(batch_df, model).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["keep"] and rows[1]["avg_ratio_bp"] > 12000
    assert not rows[2]["keep"] and rows[2]["avg_ratio_bp"] < 8000
    # the 50/50 mixed doc's token distribution is ~the corpus marginal,
    # so it scores essentially neutral (integer floors land it a hair
    # under the line) — and a relaxed threshold keeps it
    assert 9900 <= rows[3]["avg_ratio_bp"] <= 10100 and not rows[3]["keep"]
    batch = spark.sql(f"SELECT * FROM VALUES (3, '{MED} {LAW}') AS t(doc_id, text)")
    (relaxed,) = streaming_importance_gate(
        batch, model, keep_threshold_bp=9500
    ).collect()
    assert relaxed["keep"]

    # WAL restart with no new files reprocesses nothing
    n_before = len(spark.read.parquet(out).collect())
    q2 = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert len(spark.read.parquet(out).collect()) == n_before
