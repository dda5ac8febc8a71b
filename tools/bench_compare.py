"""Noise-aware round-over-round bench comparison.

Compares two BENCH_FULL-style payloads and separates SIGNAL from the
two noise sources this rig actually exhibits (NOTES_bench_r06.md):

* whole-session shifts (machine state, session residue) — estimated as
  the median per-query ratio over queries SLOWER than a floor, and
  divided out before judging individual queries;
* per-query positional jitter — judged against a flag threshold AFTER
  the session normalization, so a uniform 10% shift flags nothing and
  a single 1.5x outlier still does.

Usage:  python tools/bench_compare.py OLD.json NEW.json [--floor 0.3]
        [--flag 1.35]

Exit 0 always (reporting tool, not a gate — the gates are the plan
fingerprints and the streaming floor).
"""

from __future__ import annotations

import argparse
import json
import statistics


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore queries faster than this (s) in OLD")
    ap.add_argument("--flag", type=float, default=1.35,
                    help="flag normalized ratios beyond this (and 1/this)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq = {k: v for k, v in old["queries"].items()
          if not k.startswith("streaming") and v > 0}
    nq = {k: v for k, v in new["queries"].items()
          if not k.startswith("streaming") and v > 0}
    common = [k for k in nq if k in oq and oq[k] >= args.floor]
    if not common:
        print("no comparable queries")
        return
    ratios = {k: nq[k] / oq[k] for k in common}
    session = statistics.median(ratios.values())
    print(f"{len(common)} comparable queries (old >= {args.floor}s)")
    print(f"session shift (median ratio): {session:.3f} — divided out below")
    for which, d in (("old", old), ("new", new)):
        env = d.get("env_start")
        if env:
            print(f"{which} env: loadavg={env.get('loadavg')} "
                  f"uptime={env.get('uptime_sec')}s")
    flagged = {
        k: r / session for k, r in ratios.items()
        if r / session > args.flag or r / session < 1 / args.flag
    }
    # Same-plan gate (r8 VERDICT ask 5): when BOTH payloads carry
    # normalized plan digests, a flagged query whose digest CHANGED is
    # an intentional/structural plan change — report it separately so
    # only fingerprint-identical plans are read as drift or regression.
    oph, nph = old.get("plan_hashes", {}), new.get("plan_hashes", {})
    have_hashes = bool(oph) and bool(nph)

    def plan_changed(k: str) -> bool:
        return (
            have_hashes
            and k in oph
            and k in nph
            and oph[k] != nph[k]
        )

    if flagged:
        same = {k: r for k, r in flagged.items() if not plan_changed(k)}
        changed = {k: r for k, r in flagged.items() if plan_changed(k)}
        if same:
            hdr = ("IDENTICAL plan" if have_hashes
                   else "plan identity unknown (no hashes in payloads)")
            print(f"\n{len(same)} queries beyond ±{args.flag}x after "
                  f"normalization with {hdr} — noise or real data-path "
                  "regression:")
            for k, r in sorted(same.items(), key=lambda kv: -kv[1]):
                print(f"  {r:5.2f}x  {k:40s} {oq[k]:7.3f}s -> {nq[k]:7.3f}s")
        if changed:
            print(f"\n{len(changed)} flagged queries whose PLAN CHANGED "
                  "between rounds (expected cost moves, verify "
                  "intent in the round's commits):")
            for k, r in sorted(changed.items(), key=lambda kv: -kv[1]):
                print(f"  {r:5.2f}x  {k:40s} {oq[k]:7.3f}s -> {nq[k]:7.3f}s")
    else:
        print(f"no queries beyond ±{args.flag}x after normalization")

    ov = old.get("streaming_metric_version", 1)
    nv = new.get("streaming_metric_version", 1)
    if ov != nv:
        print(
            f"\nWARNING: streaming metric version changed v{ov} -> v{nv}; "
            "rec/s numbers below are NOT comparable across versions "
            "(see STREAM_METRIC_DEFINITION in bench.py)"
        )
    for field in ("streaming_records_per_sec", "streaming_eos_records_per_sec"):
        if field in old and field in new:
            o, n = old[field], new[field]
            spread = new.get(field.replace("records_per_sec", "rps_spread"))
            extra = f" (run spread ±{spread:.0%})" if isinstance(
                spread, float) and spread >= 0 else ""
            print(f"{field}: {o:,.0f} -> {n:,.0f} rec/s{extra}")


if __name__ == "__main__":
    main()
