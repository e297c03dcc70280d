#!/bin/bash
# sf~1 scaling probes, both constructions (trees reused from the r13/r14
# builds — the sf0.1 source is unchanged). Runs AFTER the 3-SF sweep so
# the sf0.1 base in /tmp/bench_full_sf0.1.json is the final committed
# sweep. Each probe writes its own full artifact via
# SPARK_GRAFT_BENCH_FULL_OUT — BENCH_full_local.json is never touched
# (the r15 clobber class). Provenance and the prior committed base are
# passed to the assembler explicitly (ADVICE r15 #2, VERDICT r15 #6).
# Usage: tools/sf1_probe_r17.sh <keys-file> <keyset-desc>
set -e
cd /root/repo
KEYS_FILE=${1:?usage: sf1_probe_r17.sh <keys-file> <keyset-desc>}
KEYSET_DESC=${2:?usage: sf1_probe_r17.sh <keys-file> <keyset-desc>}
SNAP=${GRAFT_CLASSES:-/tmp/graft_classes_sweep}
KEYS=$(cat "$KEYS_FILE")
for mode in exact perturbed; do
  if GRAFT_CLASSES="$SNAP" SPARK_GRAFT_SF_DIR=/root/sf1_$mode \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WALL=100000 \
      SPARK_GRAFT_BENCH_ONLY="$KEYS" \
      SPARK_GRAFT_BENCH_FULL_OUT=/tmp/bench_full_sf1_${mode}_r17.json \
      tools/bench_java.sh \
      > /tmp/bench_sf1_${mode}_r17.txt 2>&1; then
    echo "sf1_$mode rc=0"
  else
    echo "sf1_$mode FAILED (see /tmp/bench_sf1_${mode}_r17.txt)"; exit 1
  fi
done
python3 tools/sf1_assemble.py SCALING_r17_sf1.json \
  /tmp/bench_full_sf0.1.json \
  /tmp/bench_sf1_exact_r17.txt /tmp/bench_sf1_perturbed_r17.txt \
  --keyset-desc "$KEYSET_DESC" \
  --prior-base SCALING_r16.json
echo sf1-probes-done
