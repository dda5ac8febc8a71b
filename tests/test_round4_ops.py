"""Round-4 operators: triangles, co-occurrence, BPE pairs, Gram matrix,
snapshot diff, conversion stats — hand-computed small cases (the oracle
parity suite covers the fixture-scale equivalence)."""

from __future__ import annotations

import numpy as np
import pytest

from aws_kinesis_data_streams_replicator_spark.operators.graph import (
    triangle_counts,
)
from aws_kinesis_data_streams_replicator_spark.operators.similarity import (
    gram_matrix,
)
from aws_kinesis_data_streams_replicator_spark.operators.stats import (
    cooccurrence_pairs,
)
from aws_kinesis_data_streams_replicator_spark.operators.text import (
    bpe_pair_counts,
)


def test_triangle_counts_hand_graph(spark):
    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    # Node 1,2 → 2 triangles each; 3,4 → 1 each.  Edges given in mixed
    # orientation and with a duplicate + self-loop to exercise cleanup.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 2), (1, 4), (4, 2), (5, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r.id: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_no_triangles(spark):
    # a path graph has wedges but no closed triangle
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_counts(edges).count() == 0


def test_cooccurrence_pairs_support_and_ordering(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "b"), (2, "a"), (3, "a"), (3, "c")],
        "g long, item string",
    )
    rows = {
        (r.item_a, r.item_b): r.n_groups
        for r in cooccurrence_pairs(df, "g", "item", min_support=2).collect()
    }
    # (a,b) in groups 1 and 2 (dup item rows collapse); (a,c) support 1 → out
    assert rows == {("a", "b"): 2}


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab x")], "doc_id long, text string"
    )
    rows = {
        (r.sym_a, r.sym_b): r.n_pairs for r in bpe_pair_counts(docs).collect()
    }
    # vocabulary: ab×3, abc×1, x×1 → pair (a,b) = 3+1, (b,c) = 1;
    # single-char word x contributes nothing
    assert rows == {("a", "b"): 4, ("b", "c"): 1}


def test_gram_matrix_matches_numpy(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    got = {(r.i, r.j): r.sum_prod for r in gram_matrix(emb).collect()}
    x = np.array(
        [r.embedding for r in emb.collect()], dtype=np.float64
    )
    q = np.floor(np.abs(x) * 1_000_000 + 0.5).astype(np.int64) * np.where(
        x >= 0, 1, -1
    )  # HALF_UP, matching F.round
    g = q.T @ q
    for (i, j), v in got.items():
        assert v == g[i - 1, j - 1], (i, j)
    assert len(got) == 64 * 65 // 2


def test_snapshot_diff_classifies_changes(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        QUERIES,
    )

    out = QUERIES["cdc_snapshot_diff"](spark, sf_dir)
    rows = out.collect()
    assert rows, "snapshot diff empty"
    for r in rows:
        if r.state_t1 is None:
            assert r.change == "insert"
        elif r.state_t1 != r.state_t2:
            assert r.change == "update"
        else:
            assert r.change == "unchanged"


def test_conversion_stats_bounds(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        QUERIES,
    )

    for r in QUERIES["evt_conversion_time_stats"](spark, sf_dir).collect():
        assert r.n_converted <= r.n_signup_users
        if r.n_converted:
            assert 0 <= r.min_conv_sec <= r.max_conv_sec
            assert r.min_conv_sec <= r.sum_conv_sec


def test_reconcile_active_streams_complete(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        QUERIES,
    )

    rows = {
        r.streamName: r
        for r in QUERIES["kr_replication_reconcile"](spark, sf_dir).collect()
    }
    # active streams fully replicated with byte-identical payloads;
    # inactive/unconfigured streams replicate nothing
    for name in ("kds-click", "kds-view"):
        r = rows[name]
        assert r.status == "complete"
        assert r.n_replicated == r.n_source == r.n_payload_match
    for name in ("kds-purchase", "kds-signup", "kds-error"):
        r = rows[name]
        assert r.status == "inactive"
        assert r.n_replicated == 0


def test_kinesis_connector_contract():
    from aws_kinesis_data_streams_replicator_spark.streaming.source import (
        kinesis_connector_options,
    )

    opts = kinesis_connector_options("kinesis://kds-click?region=us-east-1")
    assert opts == {
        "streamName": "kds-click",
        "startingposition": "LATEST",          # template.yaml:111
        "maxFetchRecordsPerShard": "8000",     # template.yaml:110
        "region": "us-east-1",
    }
    assert "region" not in kinesis_connector_options("kinesis://s")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kinesis_connector_options("kinesis://?region=us-east-1")


def test_kinesis_connector_efo_contract():
    """The reference's event source is a dedicated EFO consumer's
    ConsumerARN (template.yaml:114,126-130: AWS::Kinesis::StreamConsumer
    named after the stack), so the production mapping must emit the
    spark-sql-kinesis EFO option pair, not shared-throughput polling —
    pinned exactly so the stub can't drift from the reference config."""
    from aws_kinesis_data_streams_replicator_spark.streaming.source import (
        kinesis_connector_options,
    )

    opts = kinesis_connector_options(
        "kinesis://kds-click?region=us-east-1&consumer=replicator-stack"
    )
    assert opts == {
        "streamName": "kds-click",
        "startingposition": "LATEST",          # template.yaml:118
        "maxFetchRecordsPerShard": "8000",     # template.yaml:110
        "region": "us-east-1",
        "consumerType": "EFO",                 # ConsumerARN event source
        "consumerName": "replicator-stack",    # template.yaml:130
    }
    # no consumer param -> no EFO keys (polling fallback stays valid)
    assert "consumerType" not in kinesis_connector_options("kinesis://s")


def test_grid_distance_join_planted_pairs(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.joins import (
        grid_distance_join,
    )

    # pairs straddling a cell boundary (499,499)-(501,501), an exact-
    # radius pair, a just-outside pair, and a far singleton
    pts = spark.createDataFrame(
        [
            (1, 499, 499),
            (2, 501, 501),
            (3, 2000, 2000),
            (4, 2500, 2000),
            (5, 3000, 9000),
            (6, 3000, 9501),
            (7, 90000, 90000),
        ],
        "id long, x long, y long",
    )
    got = {
        (r.id_a, r.id_b): r.dist_sq
        for r in grid_distance_join(pts, radius=500).collect()
    }
    assert got == {(1, 2): 8, (3, 4): 250000}


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_distance_join_matches_bruteforce(spark, seed):
    import hashlib
    from itertools import combinations

    pts = [
        (
            i,
            int(hashlib.md5(f"{seed}-{i}".encode()).hexdigest()[:4], 16) % 3000,
            int(hashlib.md5(f"{seed}-{i}".encode()).hexdigest()[4:8], 16) % 3000,
        )
        for i in range(120)
    ]
    expected = {
        (a[0], b[0]): (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
        for a, b in combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 500 * 500
    }
    from aws_kinesis_data_streams_replicator_spark.operators.joins import (
        grid_distance_join,
    )

    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r.id_a, r.id_b): r.dist_sq
        for r in grid_distance_join(df, radius=500).collect()
    }
    assert got == expected


def test_grid_distance_join_hot_cell_cap(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.joins import (
        grid_distance_join,
    )

    # 40 points piled into one cell (a hotspot) + one isolated pair
    pts = [(i, 100 + i, 100) for i in range(40)] + [(100, 5000, 5000), (101, 5010, 5000)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    exact = grid_distance_join(df, radius=500).count()
    capped_df = grid_distance_join(df, radius=500, max_cell_size=5)
    capped = capped_df.count()
    # the hotspot contributes C(40,2)=780 exact pairs but at most
    # C(5,2)=10 capped ones; the isolated pair survives (its cell is
    # under the cap) — the cap bounds work without touching cold cells
    assert exact == 780 + 1
    assert capped == 10 + 1
    got = {(r.id_a, r.id_b) for r in capped_df.collect()}
    assert (100, 101) in got
