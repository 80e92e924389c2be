#!/bin/bash
# Round-15 ACTUAL close (supersedes the plan in r15_close.sh, which was
# written before the bucketed-verify measurement found the ENOSPC +
# page-cache story — see PERF.md round 15):
#  (a) closing 3-rep full-surface medians at sf0.1
#      -> BENCH_MEDIANS_sf0.1.json
#  (b) determinism sweep: two Verify runs at sf0.01, diff parquet bytes
#      -> DETERMINISM_r15.txt
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

CAMP=/root/repo/target/r15close
log "clone at HEAD -> $CAMP"
rm -rf $CAMP
git clone -q /root/repo $CAMP
cd $CAMP || exit 1
sbt -batch compile > /root/repo/target/r15close_compile.log 2>&1 \
  || { echo "FAIL close compile"; exit 1; }

log "(a) closing medians: 3-rep full surface at sf0.1"
SPARK_GRAFT_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > /root/repo/target/r15_close_bench.log 2>&1 \
  || { echo "FAIL bench"; tail -5 /root/repo/target/r15_close_bench.log; exit 1; }
grep -oE '\{"metric".*' /root/repo/target/r15_close_bench.log | tail -1 \
  > /root/repo/target/r15_close_bench_line.json
# keep the raw bench.json schema (metric/value/queries/per_rep) — the
# round-over-round drift comparisons consume it as-is
cp /root/repo/target/r15close/target/bench.json /root/repo/BENCH_MEDIANS_sf0.1.json
python3 -c "import json; d=json.load(open('/root/repo/BENCH_MEDIANS_sf0.1.json')); print(d['value'], d['unit'], len(d['queries']), 'queries,', d['n_errors'], 'errors')"

log "(b) determinism: two Verify runs at sf0.01 + byte diff"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/det_a" \
  > /root/repo/target/r15_det_a.log 2>&1 || { echo "FAIL det A"; exit 1; }
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/det_b" \
  > /root/repo/target/r15_det_b.log 2>&1 || { echo "FAIL det B"; exit 1; }
python3 /root/repo/tools/determinism.py /root/repo/target/det_a /root/repo/target/det_b \
  > /root/repo/DETERMINISM_r15.txt 2>&1
tail -3 /root/repo/DETERMINISM_r15.txt
log "CLOSE DONE"
