#!/bin/bash
# Round-11e: (a) two-run determinism sweep on the grown 195-query
# surface (verdict #8 — last swept at 186); (b) closing 3-rep medians
# refresh at sf0.1 on the final round-11 code.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "determinism sweep: Verify x2 at sf0.01"
rm -rf target/det_a target/det_b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_a" \
  > target/r11e_det_a.log 2>&1 || { echo "FAIL det_a"; exit 1; }
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_b" \
  > target/r11e_det_b.log 2>&1 || { echo "FAIL det_b"; exit 1; }
python3 tools/determinism.py target/det_a target/det_b \
  > target/r11e_determinism.txt 2>&1
tail -5 target/r11e_determinism.txt

log "closing medians: full bench at sf0.1 (3 reps)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > target/r11e_bench_sf01.log 2>&1 \
  || { echo "FAIL bench"; exit 1; }
cp target/bench.json BENCH_MEDIANS_sf0.1.json
python3 -c "
import json; d=json.load(open('BENCH_MEDIANS_sf0.1.json'))
print('total', round(d['value'],1), 'queries', len(d['queries']), 'errors', d['n_errors'])"
log "DONE"
