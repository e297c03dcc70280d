#!/usr/bin/env python3
"""Assert a committed bench artifact IS what its description claims
(VERDICT r15 #1 / ADVICE r15 #1): round 15 shipped BENCH_full_local.json
described as "the sf0.1 min-of-3 sweep, 254 queries" while the file on
disk was the 183-key sf~1-perturbed probe that ran afterwards in the
same cwd — graft.Bench rewrote the path. Two guards now exist: Bench
itself redirects filtered / non-default-SF runs to
BENCH_full_scratch.json (or SPARK_GRAFT_BENCH_FULL_OUT), and this check
runs in the sweep script BEFORE the snapshot commit so a clobbered or
stale file fails loudly instead of shipping.

Usage: check_bench_artifact.py <artifact.json> <expected_sf_dir>
           <expected_n_queries> [expected_min_runs]
Exits non-zero with a diagnostic on any mismatch.
"""
import json
import sys


def main():
    path, want_sf, want_n = sys.argv[1:4]
    want_runs = int(sys.argv[4]) if len(sys.argv) > 4 else None
    d = json.load(open(path))
    errs = []
    if d.get("sf") != want_sf:
        errs.append(f"sf is {d.get('sf')!r}, expected {want_sf!r}")
    if d.get("n_queries") != int(want_n):
        errs.append(f"n_queries is {d.get('n_queries')}, expected {want_n}")
    if d.get("n_errors", 0) != 0:
        errs.append(f"n_errors is {d.get('n_errors')}: {d.get('errors')}")
    if want_runs is not None and d.get("runs_completed", 0) < want_runs:
        errs.append(f"runs_completed is {d.get('runs_completed')}, "
                    f"expected >= {want_runs}")
    if errs:
        print(f"BENCH ARTIFACT CHECK FAILED for {path}:")
        for e in errs:
            print(f"  - {e}")
        sys.exit(1)
    print(f"{path}: sf={d['sf']} n_queries={d['n_queries']} "
          f"runs_completed={d.get('runs_completed')} n_errors=0 — OK")


if __name__ == "__main__":
    main()
