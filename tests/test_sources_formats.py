"""JSON/CSV/ORC envelope wire formats: byte-faithful round trips feeding
the same replication pipeline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import envelope_from_events
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.sources import formats


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_wire_roundtrip_preserves_pipeline_output(spark, sf_dir, tmp_path, fmt):
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(300)
    path = str(tmp_path / f"wire_{fmt}")
    getattr(formats, f"write_envelope_{fmt}")(env, path)
    back = getattr(formats, f"read_envelope_{fmt}")(spark, path)

    cfg = spark.sql(
        "SELECT * FROM VALUES ('kds-click','us-east-1'), ('kds-view','US-EAST-1') "
        "AS t(streamName, activeRegion)"
    )
    want = replication.checkpoint(
        replication.gate_active_region(replication.with_decoded(env), cfg, "us-east-1")
    ).collect()
    got = replication.checkpoint(
        replication.gate_active_region(replication.with_decoded(back), cfg, "us-east-1")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # byte-faithfulness of the payload itself
    a = {r.sequenceNumber: bytes(r.data) for r in env.collect()}
    b = {r.sequenceNumber: bytes(r.data) for r in back.collect()}
    assert a == b
