#!/usr/bin/env python3
"""Assemble SCALING_r{N}.json from three Bench runs (sf0.001/0.01/0.1).

Usage: scaling_assemble.py out.json bench_sf0.001.txt bench_sf0.01.txt bench_sf0.1.txt

Reads each bench output, takes the FULL per-query dict (since r7 the
line tagged "metric":"per_query"; earlier formats: the line that carries
a full "queries" dict and no "partial_top5" flag), and emits per-query
warm times at each SF plus the sf0.01→sf0.1 ratio, flagging queries
whose ratio exceeds 3x (the honest data-linear growers) per VERDICT r4
item 5.
"""
import json
import re
import sys


def load_full_line(path):
    full = None
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = re.sub(r"^\[info\] ", "", line.strip())
            if '"metric"' not in line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("metric") == "per_query":
                full = d          # r7+ format: explicit tag
            elif d.get("partial_top5") or "queries" not in d:
                continue          # headline lines (old and new shapes)
            elif full is None or full.get("metric") != "per_query":
                full = d
    if full is None:
        raise SystemExit(f"no full bench line in {path}")
    return full


def main():
    out, *paths = sys.argv[1:]
    runs = [load_full_line(p) for p in paths]
    sfs = [r["sf"].rstrip("/").split("/")[-1] for r in runs]
    queries = sorted(set().union(*[r["queries"].keys() for r in runs]))
    per_q = {}
    flagged = {}
    for q in queries:
        row = {sf: r["queries"].get(q) for sf, r in zip(sfs, runs)}
        a, b = row.get(sfs[-2]), row.get(sfs[-1])
        ratio = round(b / a, 3) if a and b else None
        row["ratio_" + sfs[-2] + "_to_" + sfs[-1]] = ratio
        per_q[q] = row
        if ratio is not None and ratio > 3.0:
            flagged[q] = ratio
    doc = {
        "sfs": sfs,
        "totals": {sf: r["total"] for sf, r in zip(sfs, runs)},
        "cold_totals": {sf: r["cold_total"] for sf, r in zip(sfs, runs)},
        "n_errors": {sf: r["n_errors"] for sf, r in zip(sfs, runs)},
        "n_queries": {sf: len(r["queries"]) for sf, r in zip(sfs, runs)},
        "flagged_over_3x": dict(sorted(flagged.items(), key=lambda kv: -kv[1])),
        "queries": per_q,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f"wrote {out}: totals={doc['totals']} flagged>3x={list(flagged)}")


if __name__ == "__main__":
    main()
