"""Plan audit: dump the executed physical plan of headline queries with
the scale-relevant facts extracted (scan pushdown, join strategies,
shuffle count, codegen coverage).

Usage:  python tools/plan_audit.py [sf_dir] [query ...] > PLANS.md

The per-query plan-shape CONTRACTS live in tests (test_plans.py,
test_plan_lint.py); this tool produces the human-readable audit trail
of what Catalyst actually chose, for review after every operator
change."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES
from aws_kinesis_data_streams_replicator_spark.session import get_spark

HEADLINE = [
    "kr_replicated_records",
    "tpch_q9_product_profit",
    "doc_ngram_jaccard_pairs",
    "emb_semantic_dedup",
    "emb_ann_pq_topk",
    "evt_range_count_5m",
    "evt_asof_join_signup",
    "pipeline_corpus_curation",
    "doc_hybrid_rrf",
    "tpch_q21_waiting_supplier",
    "graph_triangle_count",
    "emb_dim_covariance",
    # round-5 rewrites: expand-free scorecard, window-rewritten cohort
    # triangle, fused-frame winnowing — audited to show the per-entity
    # broadcast exchanges are gone
    "tpch_supplier_scorecard",
    "evt_cohort_ltv_triangle",
    "doc_winnowing_fingerprints",
    # late-round-6 additions: the composed curation plan (slowest batch
    # query at 5.5 s — audited so the three-family composition shows
    # its join strategies) and the char-gram coverage explode
    "pipeline_corpus_curation_v5",
    "doc_chargram_dup_coverage",
    # round-7 additions: the new linkage family (one blocked equi-join
    # + scalar broadcasts) and the sketch join-size estimator (two
    # bounded cell-table grids joined on ≤4096 cells)
    "dq_record_linkage",
    "agg_join_size_estimate",
    # round-8 additions: the heaviest global-window rewrite (3 chained
    # distributed ntiles — audited to show no single-partition window
    # survives), the z-order pruning advisor (explode + two hash aggs
    # + 1-row scalar crosses), and the bigram LM scorer (two count
    # joins, no windows)
    "evt_user_rfm_segments",
    "files_zorder_pruning",
    "text_bigram_lm_score",
    # late-round-8 additions: the multimodal curation composition
    # (phash dedup + importance gate + token pricing) and the
    # compaction planner over the distributed prefix sum
    "pipeline_corpus_curation_v6",
    "files_compaction_plan",
    # late-round-9 additions: the holdout-safe chunked publication
    # composition (one LSH pair build feeding two rules + the shared
    # chunker), the Bloom skipping advisor (bounded bit-table joins),
    # the MMR rerank (TakeOrdered shortlist + pinned rounds), the
    # skyline on the distributed exclusive prefix-max, and the
    # Hilbert-vs-Morton advisor (pure projection curve indexes)
    "pipeline_corpus_curation_v7",
    "files_bloom_pruning",
    "emb_mmr_diversified_topk",
    "part_skyline_pareto_front",
    "files_hilbert_pruning",
    # round-10 additions: the composed physical-layout lifecycle
    # (hilbert index → two-epoch incremental compaction fold → span
    # advisor with row conservation) and the RAG publication pipeline
    # (three dedup/leak gates → chunker → coreset-IVF shortlist → MMR
    # rerank × the manifest scalars)
    "files_lifecycle",
    "pipeline_corpus_curation_v8",
    # late round-10: the bucketed interval-overlap join (theta → cell
    # equi-join) and the equi-depth sliding-quantile rollup (events
    # touched once per leg, windows hour-partitioned)
    "evt_incident_session_overlap",
    "evt_sliding_value_quantiles",
    # round-11 additions: the bounded log-bucket histogram quantile
    # rollup (streaming twin in stateful.py) and the CDC corpus-refresh
    # composition (band-index probe → CC fold → publication diff)
    "evt_sliding_loghist_quantiles",
    "cdc_corpus_refresh_delta",
    # round-12 additions: the multi-query BM25 ranking eval (one
    # corpus pass for all queries, matched-docs-only ranking windows),
    # the post-publication audit (gate rebuild + semi-join invariant
    # checks + mixture drift), the salted skew join (single forced
    # ShuffledHashJoin on (key, salt)), and the k-center topic-balance
    # report (bounded 8×|sources| mixture grid)
    "doc_retrieval_ranking_eval",
    "pipeline_publication_audit",
    "join_salted_skew_rollup",
    "emb_cluster_mixture_report",
]

# Compositions whose plans truncate at localCheckpoint boundaries (the
# pre-checkpoint legs show up as "Scan ExistingRDD" in the final plan,
# hiding their joins/shuffles from the audit).  For these, every
# checkpointed stage is captured via a localCheckpoint hook and audited
# separately — the r10 verdict's checkpointed-composition blind spot.
STAGED = [
    "pipeline_corpus_curation_v8",
    "files_lifecycle",
    "cdc_corpus_refresh_delta",
]


class checkpoint_recorder:
    """Context manager that records every DataFrame passed through
    DataFrame.localCheckpoint (eager or lazy) together with a
    caller-site label, without changing behavior."""

    def __init__(self) -> None:
        self.stages: list[tuple[str, object]] = []

    def __enter__(self):
        import traceback

        # patch the CLASSIC class: instances resolve localCheckpoint
        # there, so patching the pyspark.sql.DataFrame parent is a no-op
        from pyspark.sql.classic.dataframe import DataFrame as _DF

        self._df_cls = _DF
        self._orig = _DF.localCheckpoint
        rec = self

        def recording(self, eager=True):  # noqa: ANN001
            label = "?"
            for fr in reversed(traceback.extract_stack()[:-1]):
                if "aws_kinesis_data_streams_replicator_spark" in fr.filename:
                    label = (
                        f"{os.path.basename(fr.filename)}:{fr.lineno} "
                        f"in {fr.name}"
                    )
                    break
            rec.stages.append((label, self))
            return rec._orig(self, eager=eager)

        _DF.localCheckpoint = recording
        return self

    def __exit__(self, *exc):
        self._df_cls.localCheckpoint = self._orig
        return False


def facts(plan: str) -> dict:
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # per-scan, not plan-global: a multi-table plan with one pushed
        # scan plus a pushdown-less dim scan still has real pushdown
        "scans_with_pushed_filters": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
        "scans_without_pushed_filters": plan.count("PushedFilters: []"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark()
    print(f"# Plan audit — sf_dir={sf_dir}\n")
    print(
        "Auto-generated by `tools/plan_audit.py`; regenerate after any\n"
        "operator change.  Contracts asserted in CI: `tests/test_plans.py`,\n"
        "`tests/test_plan_lint.py` (no CartesianProduct anywhere; "
        "BroadcastNestedLoopJoin only on allowlisted bounded build sides).\n"
    )
    for name in names:
        rec = checkpoint_recorder()
        if name in STAGED:
            with rec:
                df = QUERIES[name](spark, sf_dir)
                df.collect()
        else:
            df = QUERIES[name](spark, sf_dir)
            # execute THIS dataframe (count() would wrap it in a
            # different QueryExecution) so the audited plan is the
            # AQE-final one with codegen stage markers
            df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the adaptive plan string appends the pre-AQE "Initial Plan" —
        # audit only the final one or every count doubles
        plan = plan.split("+- == Initial Plan ==")[0]
        f = facts(plan)
        print(f"## {name}\n")
        print(
            f"- joins: {f['broadcast_hash_joins']} broadcast-hash, "
            f"{f['shuffled_hash_joins']} shuffled-hash, "
            f"{f['sort_merge_joins']} sort-merge, "
            f"{f['broadcast_nested_loop']} broadcast-nested-loop, "
            f"{f['cartesian']} cartesian"
        )
        print(
            f"- shuffles: {f['shuffles']} · codegen stages: "
            f"{f['codegen_stages']} · parquet scans with/without pushed "
            f"filters: {f['scans_with_pushed_filters']}/"
            f"{f['scans_without_pushed_filters']}"
        )
        print("\n```")
        # first 40 lines of the plan tree keep the audit readable; the
        # full tree is one --verbose away for anyone digging
        lines = plan.splitlines()
        print("\n".join(lines[:40]))
        if len(lines) > 40:
            print(f"... ({len(lines) - 40} more lines)")
        print("```\n")
        if name in STAGED and rec.stages:
            print(
                f"Per-checkpoint stage breakdown ({len(rec.stages)} "
                "stages; the final plan above sees these legs only as "
                "Scan ExistingRDD):\n"
            )
            agg = {"cartesian": 0, "shuffles": 0}
            for i, (label, sdf) in enumerate(rec.stages, 1):
                splan = sdf._jdf.queryExecution().executedPlan().toString()
                splan = splan.split("+- == Initial Plan ==")[0]
                sf = facts(splan)
                agg["cartesian"] += sf["cartesian"]
                agg["shuffles"] += sf["shuffles"]
                print(
                    f"- stage {i} ({label}): "
                    f"{sf['broadcast_hash_joins']} bhj, "
                    f"{sf['shuffled_hash_joins']} shj, "
                    f"{sf['sort_merge_joins']} smj, "
                    f"{sf['broadcast_nested_loop']} bnlj, "
                    f"{sf['cartesian']} cartesian, "
                    f"{sf['shuffles']} shuffles, "
                    f"{sf['codegen_stages']} codegen"
                )
            print(
                f"\nAll stages combined: {agg['cartesian']} cartesian, "
                f"{agg['shuffles']} shuffles (lint: "
                "tests/test_plan_lint.py asserts 0 cartesian per stage)\n"
            )


if __name__ == "__main__":
    main()
