#!/bin/bash
# Round-10e: FULL-SURFACE second decade. The committed sf10x evidence
# covers 13 queries (pair family + CC family + the three VERDICT-7
# singles) because target/sf10x carries documents only. This generates
# ALL tables at sf10x (100 key-shifted copies of sf0.1, ~1.7 GB) into
# a separate dir and runs the complete 186-query bench there, giving
# every family a measured second decade. lo side = the r10d sf1x
# full-surface run (same HEAD for all query code).
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

check_sf(){
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

[ -f target/r10d_bench_sf1x_final.json ] || { echo "FAIL no sf1x lo side"; exit 1; }

if [ ! -d target/sf10x_full/lineitem.parquet ]; then
  log "genscale sf10x_full (ALL tables, 100 copies of sf0.1)"
  SPARK_DRIVER_MEM=64g sbt -batch \
    "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x_full 100" \
    > target/r10e_gen_sf10x_full.log 2>&1 || { echo "FAIL gen_sf10x_full"; exit 1; }
fi

# The four brute-force exact-twin recall gates are excluded: their
# all-pairs shuffle is quadratic by construction (they verify recall,
# they are not the scale path) and q_dedup_lsh_recall's spill filled the
# disk on the first attempt at 500k docs (SPILL_OUT_OF_MEMORY: No space
# left on device, target/r10e_bench_sf10x_full.log of 2026-08-14 15:09).
SKIP=q_dedup_lsh_recall,q_dedup_containment_recall,q_dedup_topm_recall,q_pq_recall

log "bench sf10x_full full surface minus recall gates (3 reps, 96g)"
df -h / | tail -1
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf10x_full SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SKIP=$SKIP \
  sbt -batch "runMain graft.Bench" > target/r10e_bench_sf10x_full.log 2>&1 \
  || { echo "FAIL bench_sf10x_full"; exit 1; }
df -h / | tail -1
check_sf target/bench.json sf10x_full
cp target/bench.json target/r10e_bench_sf10x_full.json

log "scaling sf1x -> sf10x (full surface)"
python3 tools/scaling.py target/r10d_bench_sf1x_final.json \
  target/r10e_bench_sf10x_full.json BENCH_SCALING_sf10x_full.json \
  sf1x sf10x 10 > target/r10e_scaling_sf10x_full.txt 2>&1
cat target/r10e_scaling_sf10x_full.txt
log "DONE"
