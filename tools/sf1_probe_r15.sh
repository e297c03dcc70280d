#!/bin/bash
# sf~1 scaling probes, both constructions (reused trees from the r14
# build — the sf0.1 source is unchanged). Runs AFTER the 3-SF sweep so
# the sf0.1 base in /tmp/bench_sf0.1.txt is the final committed sweep.
set -e
cd /root/repo
SNAP=${GRAFT_CLASSES:-/tmp/graft_classes_sweep}
KEYS=$(cat /tmp/sf1_keys_r15.txt)
for mode in exact perturbed; do
  if GRAFT_CLASSES="$SNAP" SPARK_GRAFT_SF_DIR=/root/sf1_$mode \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WALL=100000 \
      SPARK_GRAFT_BENCH_ONLY="$KEYS" tools/bench_java.sh \
      > /tmp/bench_sf1_${mode}_r15.txt 2>&1; then
    echo "sf1_$mode rc=0"
  else
    echo "sf1_$mode FAILED (see /tmp/bench_sf1_${mode}_r15.txt)"; exit 1
  fi
done
python3 tools/sf1_assemble.py SCALING_r15_sf1.json /tmp/bench_sf0.1.txt \
  /tmp/bench_sf1_exact_r15.txt /tmp/bench_sf1_perturbed_r15.txt
echo sf1-probes-done
