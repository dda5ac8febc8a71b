"""DSIR-style hashed importance weighting (operators/text.py
importance_weights): on a corpus where the target domain has a
distinct vocabulary, target-vocabulary documents must score above
10000 bp and off-domain documents below."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.text import (
    importance_weights,
)


def _corpus(spark):
    # 40 medical docs (target) + 40 legal docs, disjoint vocabularies,
    # plus 20 mixed docs drawing from both
    rows = []
    med = "patient dose clinical trial symptom therapy diagnosis"
    law = "court plaintiff statute verdict counsel appeal motion"
    for i in range(40):
        rows.append((i, med, "med"))
    for i in range(40, 80):
        rows.append((i, law, "law"))
    for i in range(80, 100):
        rows.append((i, med + " " + law, "mix"))
    values = ", ".join(f"({i}, '{t}', '{d}')" for i, t, d in rows)
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(doc_id, text, domain)"
    )


def test_target_vocabulary_scores_above_baseline(spark):
    docs = _corpus(spark)
    w = importance_weights(docs, F.col("domain") == "med")
    scored = {
        r["doc_id"]: r["avg_ratio_bp"]
        for r in w.join(docs, "doc_id").collect()
    }
    med = [scored[i] for i in range(40)]
    law = [scored[i] for i in range(40, 80)]
    mix = [scored[i] for i in range(80, 100)]
    # pure-target docs well above 10000, off-domain well below, and the
    # mixed docs strictly between
    assert min(med) > 12000
    assert max(law) < 8000
    assert max(law) < min(mix) <= max(mix) < min(med)


def test_weights_are_per_token_averages(spark):
    docs = _corpus(spark)
    w = importance_weights(docs, F.col("domain") == "med").collect()
    for r in w:
        assert r["avg_ratio_bp"] == r["sum_ratio_bp"] // r["n_tokens"]
        assert r["n_tokens"] in (7, 14)
