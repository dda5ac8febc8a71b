"""Parity artifacts must be self-consistent: ``n_pass``/``n_total``
derived from the ``queries`` entries actually present.

Round-6 post-mortem: PARITY_SF1_r06.json was built by appending entries
from separate sessions without regenerating the summary counts, so it
shipped saying 37/37 while holding 49 entries.  The writer now derives
counts from the merged entries (tools/parity.py::write_artifact); this
test pins both the writer behavior and every committed artifact of the
current round series."""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts written before the write_artifact fix (round ≤ 6) are
# historical records — the r6 one is KNOWN stale (37 vs 49) and kept
# as-is for the audit trail.  Everything from r07 on must be clean.
_GRANDFATHERED = {"PARITY_SF1_r06.json"}


def _artifacts():
    return sorted(
        p for p in glob.glob(os.path.join(REPO, "PARITY*.json"))
        if os.path.basename(p) not in _GRANDFATHERED
    )


@pytest.mark.parametrize("path", _artifacts(), ids=os.path.basename)
def test_committed_artifact_counts_are_self_consistent(path):
    with open(path) as fh:
        art = json.load(fh)
    queries = art["queries"]
    assert art["n_total"] == len(queries), path
    assert art["n_pass"] == sum(1 for v in queries.values() if v["ok"]), path


def test_write_artifact_derives_counts_on_merge(tmp_path):
    from tools.parity import write_artifact

    p = str(tmp_path / "art.json")
    write_artifact(p, "/sf", {"a": {"ok": True, "msg": "OK", "sec": 0.1}}, merge=False)
    out = write_artifact(
        p,
        "/sf",
        {"b": {"ok": False, "msg": "bad", "sec": 0.2},
         "a": {"ok": True, "msg": "OK", "sec": 0.1}},
        merge=True,
    )
    assert out["n_total"] == 2
    assert out["n_pass"] == 1
    on_disk = json.load(open(p))
    assert on_disk["n_total"] == 2 and on_disk["n_pass"] == 1


def test_write_artifact_rejects_cross_sf_merge(tmp_path):
    from tools.parity import write_artifact

    p = str(tmp_path / "art.json")
    write_artifact(p, "/sf_a", {"a": {"ok": True, "msg": "OK", "sec": 0.1}}, merge=False)
    with pytest.raises(SystemExit):
        write_artifact(p, "/sf_b", {"b": {"ok": True, "msg": "OK", "sec": 0.1}}, merge=True)


def test_plan_fingerprints_cover_registry():
    """fingerprints ∪ excluded == registry, with the exclusion list and
    its reason carried INSIDE the artifact — a new registration can
    never silently fall out of the plan gate, and the artifact explains
    its own gaps (round-7 verdict ask)."""
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        PLAN_BUILD_RUNS_JOBS,
        QUERIES,
    )

    with open(os.path.join(REPO, "PLAN_FINGERPRINTS.json")) as fh:
        art = json.load(fh)
    assert set(art["excluded"]) == set(PLAN_BUILD_RUNS_JOBS)
    assert art["excluded_reason"]
    covered = set(art["fingerprints"]) | set(art["excluded"])
    assert covered == set(QUERIES), (
        f"missing from fingerprint gate: {sorted(set(QUERIES) - covered)}; "
        f"stale entries: {sorted(covered - set(QUERIES))} — regenerate "
        "with `python tools/plan_fingerprints.py`"
    )
