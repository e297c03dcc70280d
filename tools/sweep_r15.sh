#!/bin/bash
# Round-end artifact sweep: full Bench at three SFs, then assemble the
# scaling artifact. The sf0.1 run is LAST so BENCH_full_local.json (which
# graft.Bench rewrites on every run) ends up holding the chronologically
# last full sf0.1 sweep — the commit-latest policy of SURVEY §6. Runs
# through tools/bench_java.sh against a snapshotted classes dir so the
# sweep neither holds the sbt lock nor races a recompile.
# SPARK_GRAFT_BENCH_WALL is raised so COMMITTED sweeps keep the
# min-of-3 semantics every artifact since r9 uses (the adaptive wall
# default exists for the driver's budget-constrained window; SURVEY §6
# discloses both).
set -e
cd /root/repo
SNAP=${GRAFT_CLASSES:-/tmp/graft_classes_sweep}
rm -rf "$SNAP"
cp -a target/scala-2.13/classes "$SNAP"
for sf in 0.001 0.01 0.1; do
  if GRAFT_CLASSES="$SNAP" SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WALL=100000 tools/bench_java.sh \
      > /tmp/bench_sf$sf.txt 2>&1; then
    echo "sf$sf rc=0"
  else
    echo "sf$sf FAILED (see /tmp/bench_sf$sf.txt)"; exit 1
  fi
done
python3 tools/scaling_assemble.py SCALING_r15.json \
  /tmp/bench_sf0.001.txt /tmp/bench_sf0.01.txt /tmp/bench_sf0.1.txt
echo sweep-done
