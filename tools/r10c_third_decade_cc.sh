#!/bin/bash
# Round-10 third decade, CC-backed family: sf10x -> sf100x (5M docs)
# for the four CC-backed queries whose heaviest join is the banded
# LSH inverted index / single-key fingerprint shuffle — NOT the
# n-gram pair-verification shuffle that blocks the pair family on
# single-box disk (BENCH_SCALING_sf100x.json). q_pretrain_full is
# excluded: its containment leg is the blocked shuffle.
# lo side = target/r10c_bench_sf10x_cc.json (5-rep, final closing
# code); hi side = 3-rep sf100x measured here. Output goes to a
# SEPARATE artifact (BENCH_SCALING_sf100x_cc.json) so the pair-family
# disk-ceiling record in BENCH_SCALING_sf100x.json stays intact.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
CCQ=q_dedup_canonical,q_dedup_components,q_dedup_pipeline,q_pretrain_pipeline

check_sf(){
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

[ -d target/sf100x/documents.parquet ] || { echo "FAIL no sf100x documents"; exit 1; }
[ -f target/r10c_bench_sf10x_cc.json ] || { echo "FAIL no sf10x lo side"; exit 1; }

log "bench CC family sf100x (3 reps, 96g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf100x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_ONLY=$CCQ \
  sbt -batch "runMain graft.Bench" > target/r10c_bench_sf100x_cc.log 2>&1 \
  || { echo "FAIL bench_sf100x_cc"; exit 1; }
check_sf target/bench.json sf100x
cp target/bench.json target/r10c_bench_sf100x_cc.json

log "scaling sf10x -> sf100x (CC family)"
python3 tools/scaling.py target/r10c_bench_sf10x_cc.json \
  target/r10c_bench_sf100x_cc.json BENCH_SCALING_sf100x_cc.json \
  sf10x sf100x 10 > target/r10c_scaling_sf100x_cc.txt 2>&1
cat target/r10c_scaling_sf100x_cc.txt
log "DONE"
