#!/bin/bash
# Round-end artifact sweep: full Bench at three SFs, then assemble the
# scaling artifact. Since r17 every run writes its OWN full artifact
# via SPARK_GRAFT_BENCH_FULL_OUT (nothing in the sweep touches
# BENCH_full_local.json as a side effect) and the committed
# BENCH_full_local.json is produced by an explicit COPY of the sf0.1
# run's file, then ASSERTED (tools/check_bench_artifact.py) to carry
# the sweep tree's sf, the full bench key count, min-of-3 semantics,
# and zero errors BEFORE any commit — the VERDICT r15 #1 clobber
# (the sf~1 probe overwriting the committed sweep snapshot) is now
# structurally impossible. Runs through tools/bench_java.sh against a
# snapshotted classes dir so the sweep neither holds the sbt lock nor
# races a recompile. SPARK_GRAFT_BENCH_WALL is raised so COMMITTED
# sweeps keep the min-of-3 semantics every artifact since r9 uses.
# Usage: tools/sweep_r17.sh <expected_n_bench_queries>
set -e
cd /root/repo
EXPECT_N=${1:?usage: sweep_r17.sh <expected_n_bench_queries>}
SNAP=${GRAFT_CLASSES:-/tmp/graft_classes_sweep}
rm -rf "$SNAP"
cp -a target/scala-2.13/classes "$SNAP"
for sf in 0.001 0.01 0.1; do
  if GRAFT_CLASSES="$SNAP" SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WALL=100000 \
      SPARK_GRAFT_BENCH_FULL_OUT=/tmp/bench_full_sf$sf.json \
      tools/bench_java.sh \
      > /tmp/bench_sf$sf.txt 2>&1; then
    echo "sf$sf rc=0"
  else
    echo "sf$sf FAILED (see /tmp/bench_sf$sf.txt)"; exit 1
  fi
  python3 tools/check_bench_artifact.py /tmp/bench_full_sf$sf.json \
    /root/testdata/sf$sf "$EXPECT_N" 3
done
cp /tmp/bench_full_sf0.1.json BENCH_full_local.json
# IMMUTABLE round-named copy: the driver's independent bench rewrites
# BENCH_full_local.json after the snapshot commit (by design — it is
# "the latest full default-tree run"), so SURVEY's sweep figures point
# at this name, which graft.Bench never writes.
cp /tmp/bench_full_sf0.1.json BENCH_full_r17_sweep.json
python3 tools/check_bench_artifact.py BENCH_full_local.json \
  /root/testdata/sf0.1 "$EXPECT_N" 3
python3 tools/check_bench_artifact.py BENCH_full_r17_sweep.json \
  /root/testdata/sf0.1 "$EXPECT_N" 3
python3 tools/scaling_assemble.py SCALING_r17.json \
  /tmp/bench_sf0.001.txt /tmp/bench_sf0.01.txt /tmp/bench_sf0.1.txt
echo sweep-done
