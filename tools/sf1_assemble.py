#!/usr/bin/env python3
"""Assemble SCALING_r{N}_sf1.json from the committed sf0.1 sweep and
the TWO sf~1 probe runs (VERDICT r13 #1/#2): the exact-copy
construction (the r13 duplication stress — a pessimistic bound for the
dedup candidate stages) and the perturbed-replica construction
(organic growth: replicas are neither exact nor near dups, so LSH
buckets grow ~linearly like real 10x data). Both constructions run the
same key set, which since r14 includes the mm_* family (payload-byte-
proportional work — historically the steepest 3-SF growers).

Usage: sf1_assemble.py out.json <sf0.1_full_bench.json> \
          <bench_sf1_exact.txt> <bench_sf1_perturbed.txt> \
          [--keyset-desc TEXT] [--prior-base SCALING_rP.json]

--keyset-desc (ADVICE r15 #2): the provenance text for runs.key_set is
  a CLI argument supplied by the probe script for the round being
  measured — the r15 artifact shipped a hard-coded r14 description.
--prior-base (VERDICT r15 #6): point at the PREVIOUS round's committed
  SCALING_r{P}.json to emit window-normalized ratios alongside the raw
  ones: the raw ratio divides this round's sf~1 time by this round's
  sf0.1 base, so a fast base WINDOW inflates every ratio uniformly;
  the normalized ratio multiplies by the base-window factor W =
  median_q(base_now[q] / base_prior[q]), separating structural growers
  (flagged_over_3x_window_normalized) from queries pushed over the raw
  bar purely by the base window (listed under window_only_flags).
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
                full = d
    if full is None:
        raise SystemExit(f"no per_query bench line in {path}")
    return full


# Documented-flag registry (VERDICT r16 #6): every KNOWN >3x key on the
# 10x step, with its by-construction bound or linear-range argument.
# Keys listed here move from flagged_over_3x into the
# flagged_documented section (ratios preserved, note attached);
# flagged_over_3x itself then contains ONLY undocumented entries —
# anything new that appears there is an action item, not background.
STRESS_NOTE = ("deliberately-UNCAPPED stress twin: exact-copy "
               "replication makes every shared band/fingerprint bucket "
               "grow with copy count, so candidate PAIRS grow "
               "quadratically BY CONSTRUCTION - this gate exists to "
               "measure that uncapped slope; the named production twin "
               "bounds candidates at cap^2 x #buckets (or probes a "
               "staged artifact) and stays under ~3x")
LINEAR_NOTE = ("linear-range: a 3-4.5x wall ratio on a 10x data step "
               "at fixed core count is at-or-below per-byte linear "
               "scaling (the 3x bar flags would-be structural growers; "
               "these rows' plans are partial-agg/join shapes with no "
               "pair fan-out)")
DOCUMENTED_FLAGS = {
    "mm_overlap_dedup": f"{STRESS_NOTE}; production twin: mm_overlap_dedup_capped",
    "mm_phash_dedup": f"{STRESS_NOTE}; production twins: mm_phash_dedup_capped / _unicode / _incremental (stop-bucket cap, persisted band index)",
    "mm_frame_dedup": ("exact-duplication stress on the frame-fingerprint "
                       "election: the operator is ONE partial-agg min-struct "
                       "election (no pair fan-out - linear by construction); "
                       "the >3x is replicated-fingerprint group skew under "
                       "the 10x exact-copy stress, not candidate growth"),
    "dedup_simhash": f"{STRESS_NOTE}; production path: banded+verified LSH with caps (dedup_embedding_lsh_capped) and the staged pair lineage",
    "dedup_lsh_verified": f"{STRESS_NOTE}; production path: staged pair lineage (dedup_components_lineage) / cascade banded probe",
    "dedup_minhash_lsh": f"{STRESS_NOTE}; candidate-COUNT observability row over the uncapped LSH stage",
    "dedup_embedding_lsh": f"{STRESS_NOTE}; production twin: dedup_embedding_lsh_capped",
    "dedup_components": ("recompute twin consuming the uncapped verify "
                         "(stress class above); staged production twin: "
                         "dedup_components_lineage"),
    "dedup_components_incremental": ("consumes the uncapped verify for its "
                                     "snapshot labeling at probe time in this "
                                     "harness; production reads last night's "
                                     "persisted labels - per-night cost is "
                                     "bounded by the crawl delta"),
    "mm_overlap_dedup_capped": ("capped production twin steady at ~3.3x on "
                                "this construction since r14: candidates are "
                                "bounded at cap^2 x #buckets; the residual "
                                "ratio is the linear frame expansion"),
    "sim_ivf_topk": ("in-memory twin of the persisted-index gate "
                     "(sim_ivf_index_topk stays <3x): nlist grows ~sqrt(n), "
                     "so assignment cost/row grows ~sqrt(10) on the step - "
                     "bounded by the IvfMaxNlist=256 cap"),
    "sim_ivf_pq_topk": ("same sqrt(n) nlist argument as sim_ivf_topk; "
                        "persisted-index twin sim_ivf_pq_index_topk stays <3x"),
    "sim_knn_graph": ("kNN over LSH candidates: bucket growth under "
                      "replication; staged/banded twins "
                      "(sim_knn_graph_incremental) probe persisted artifacts"),
    "q_gap_fill": LINEAR_NOTE + "; output rows grow with event density (gap fill emits per-gap rows)",
    "q12_priority_mix": LINEAR_NOTE,
    "q21_late_suppliers": LINEAR_NOTE,
    "q8_market_share": LINEAR_NOTE,
    "text_lang_topk_native": LINEAR_NOTE,
    "dedup_semantic_apply": LINEAR_NOTE,
    "dedup_substring": LINEAR_NOTE,
}


def _flag_order(kv):
    """Numeric flags sort descending; string flags (zero-base notes)
    sort after them."""
    return (0, -kv[1]) if isinstance(kv[1], (int, float)) else (1, 0)


def main():
    args = sys.argv[1:]
    keyset_desc = None
    prior_base_path = None
    if "--keyset-desc" in args:
        i = args.index("--keyset-desc")
        keyset_desc = args[i + 1]
        del args[i:i + 2]
    if "--prior-base" in args:
        i = args.index("--prior-base")
        prior_base_path = args[i + 1]
        del args[i:i + 2]
    out, base_path, exact_path, pert_path = args[:4]
    base = json.load(open(base_path)) if base_path.endswith(".json") \
        else load_full_line(base_path)
    exact = load_full_line(exact_path)
    pert = load_full_line(pert_path)
    keys = sorted(set(exact["queries"]) | set(pert["queries"]))
    per_q = {}
    ratios_e, ratios_p = [], []
    flagged_e, flagged_p = {}, {}
    for q in keys:
        b = base["queries"].get(q)
        e = exact["queries"].get(q)
        p = pert["queries"].get(q)
        # explicit None checks (ADVICE r14 #4): truthiness silently
        # dropped a legitimate 0.0 timing from ratios/flagging instead
        # of reporting it; a 0 base now flags loudly instead of
        # dividing by zero
        row = {"sf0.1": b, "sf1_exact": e, "sf1_perturbed": p}
        if b is not None and e is not None:
            if b == 0:
                flagged_e[q] = f"zero sf0.1 base (sf1 {e}s) - no ratio"
            else:
                row["ratio_exact"] = round(e / b, 3)
                ratios_e.append(row["ratio_exact"])
                if row["ratio_exact"] > 3.0:
                    flagged_e[q] = row["ratio_exact"]
        if b is not None and p is not None:
            if b == 0:
                flagged_p[q] = f"zero sf0.1 base (sf1 {p}s) - no ratio"
            else:
                row["ratio_perturbed"] = round(p / b, 3)
                ratios_p.append(row["ratio_perturbed"])
                if row["ratio_perturbed"] > 3.0:
                    flagged_p[q] = row["ratio_perturbed"]
        per_q[q] = row

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return round((xs[n // 2] + xs[(n - 1) // 2]) / 2, 3) if xs else None

    # window normalization (VERDICT r15 #6): W = this base window vs
    # the prior committed base, median over shared keys
    window = None
    if prior_base_path:
        prior = json.load(open(prior_base_path))
        prior_q = {q: row.get("sf0.1") for q, row in
                   prior.get("queries", {}).items()}
        factors = [base["queries"][q] / prior_q[q]
                   for q in base["queries"]
                   if prior_q.get(q) and base["queries"][q] is not None
                   and base["queries"][q] > 0]
        W = med([round(f, 6) for f in factors])
        def norm_flags(flagged):
            structural, window_only = {}, {}
            for q, r in flagged.items():
                if not isinstance(r, (int, float)):
                    structural[q] = r  # zero-base notes pass through
                    continue
                rn = round(r * W, 3)
                (structural if rn > 3.0 else window_only)[q] = \
                    {"raw": r, "window_normalized": rn}
            return structural, window_only
        # normalize only the UNDOCUMENTED flags — documented stress /
        # linear-range entries carry their own bound note and are no
        # longer flags (VERDICT r16 #6)
        se, we = norm_flags({q: r for q, r in flagged_e.items()
                             if q not in DOCUMENTED_FLAGS})
        sp, wp = norm_flags({q: r for q, r in flagged_p.items()
                             if q not in DOCUMENTED_FLAGS})
        window = {
            "prior_base": prior_base_path,
            "base_window_factor_vs_prior": W,
            "n_shared_keys": len(factors),
            "note": "normalized ratio = raw ratio x W; W < 1 means "
                    "this round's sf0.1 base landed in a faster "
                    "window than the prior committed sweep, which "
                    "inflates every raw sf~1 ratio uniformly",
            "flagged_over_3x_window_normalized": {"exact": se,
                                                  "perturbed": sp},
            "window_only_flags": {"exact": we, "perturbed": wp},
        }

    doc = {
        "construction": {
            "tool": "tools/upscale_replicate.py",
            "source": "/root/testdata/sf0.1",
            "copies": 10,
            "modes": {
                "exact": "replicas are EXACT copies under offset keys "
                         "(the r13 construction) - a 10x duplication "
                         "STRESS for the dedup/near-dup candidate "
                         "stages: copies share every band bucket, so "
                         "candidate PAIRS grow quadratically in copy "
                         "count. A pessimistic BOUND, kept as the "
                         "cascade's stress case.",
                "perturbed": "ORGANIC construction (VERDICT r13 #1): "
                             "replica k inserts token 'r<k>' after "
                             "every 3rd word (cross-copy shingle "
                             "Jaccard ~0.17 - below the 0.7 near-dup "
                             "bar and mostly below LSH collision "
                             "range) and circularly shifts embeddings "
                             "by k dims (cross-copy cosine ~0; "
                             "planted-pair cosines invariant within "
                             "each copy, so near-dup DENSITY is "
                             "preserved without cross-copy collapse). "
                             "LSH buckets grow ~linearly, as organic "
                             "10x data would. n_chars recomputed; "
                             "multimodal payloads derive from text so "
                             "mm_* inherits the construction.",
            },
            "id_spaces": "documents/embeddings offsets are the table "
                         "cardinality rounded to a multiple of 10, "
                         "keeping ids DENSE (0..n-1) and nightly-batch "
                         "mod-10 residues intact; the vec_id<10 query "
                         "slice stays 10 queries. TPC-H join keys keep "
                         "power-of-10 offsets (no policy reads their "
                         "residues). TPC-H tables and events are "
                         "identical between modes.",
            "caveat": "a measurement harness, not test data: "
                      "correctness gates never read these trees; the "
                      "oracle never ran on them (rows-only).",
        },
        "runs": {
            "sf0.1_base": base_path,
            "key_set": keyset_desc or "(probe script passed no "
                       "--keyset-desc; see the round's SURVEY section "
                       "for provenance)",
        },
        "n_queries": {"exact": len(exact["queries"]),
                      "perturbed": len(pert["queries"])},
        "n_errors": {"exact": exact["n_errors"],
                     "perturbed": pert["n_errors"]},
        "errors": {"exact": exact.get("errors", {}),
                   "perturbed": pert.get("errors", {})},
        "totals": {
            "sf1_exact_warm": exact["total"],
            "sf1_exact_cold": exact["cold_total"],
            "sf1_perturbed_warm": pert["total"],
            "sf1_perturbed_cold": pert["cold_total"],
        },
        "median_ratio_sf0.1_to_sf1": {"exact": med(ratios_e),
                                      "perturbed": med(ratios_p)},
        # flagged_over_3x = UNDOCUMENTED entries only (VERDICT r16 #6):
        # a key here has no registered by-construction bound and is an
        # action item. Documented stress twins / linear-range rows keep
        # their ratios under flagged_documented with the bound note.
        "flagged_over_3x": {
            "exact": dict(sorted(((q, r) for q, r in flagged_e.items()
                                  if q not in DOCUMENTED_FLAGS),
                                 key=_flag_order)),
            "perturbed": dict(sorted(((q, r) for q, r in flagged_p.items()
                                      if q not in DOCUMENTED_FLAGS),
                                     key=_flag_order))},
        "flagged_documented": {
            "exact": {q: {"ratio": r, "why": DOCUMENTED_FLAGS[q]}
                      for q, r in sorted(flagged_e.items(), key=_flag_order)
                      if q in DOCUMENTED_FLAGS},
            "perturbed": {q: {"ratio": r, "why": DOCUMENTED_FLAGS[q]}
                          for q, r in sorted(flagged_p.items(),
                                             key=_flag_order)
                          if q in DOCUMENTED_FLAGS}},
        "window_normalization": window,
        "queries": per_q,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: exact {len(exact['queries'])} queries "
          f"({exact['n_errors']} errors), perturbed "
          f"{len(pert['queries'])} ({pert['n_errors']} errors)")


if __name__ == "__main__":
    main()
