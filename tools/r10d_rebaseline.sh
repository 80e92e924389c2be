#!/bin/bash
# Round-10d closing re-baseline on the final code (CC third-decade
# commit + PageRank node-universe persist): refresh the sf0.1 medians
# and the full-surface first decade so the committed artifacts measure
# the shipped HEAD. Same protocol as r10b steps 1-2.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

check_sf(){
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "bench sf0.1 full surface (3 reps)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > target/r10d_bench_sf0.1.log 2>&1 \
  || { echo "FAIL bench_sf0.1"; exit 1; }
check_sf target/bench.json sf0.1
cp target/bench.json target/r10d_bench_sf0.1_final.json

if [ ! -d target/sf1x/documents.parquet ]; then
  log "genscale sf1x (ALL tables, 10 copies)"
  SPARK_DRIVER_MEM=32g sbt -batch \
    "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10" \
    > target/r10d_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }
fi

log "bench sf1x full surface (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > target/r10d_bench_sf1x.log 2>&1 \
  || { echo "FAIL bench_sf1x"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r10d_bench_sf1x_final.json

log "scaling sf0.1 -> sf1x (full surface)"
python3 tools/scaling.py target/r10d_bench_sf0.1_final.json \
  target/r10d_bench_sf1x_final.json BENCH_SCALING_sf1x.json \
  sf0.1 sf1x 10 > target/r10d_scaling_sf1x.txt 2>&1
cat target/r10d_scaling_sf1x.txt

log "medians artifact (same shape as the full bench artifact)"
cp target/r10d_bench_sf0.1_final.json BENCH_MEDIANS_sf0.1.json
python3 -c "
import json
d = json.load(open('BENCH_MEDIANS_sf0.1.json'))
print('BENCH_MEDIANS_sf0.1.json:', round(d['value'], 1), 's,',
      len(d['queries']), 'queries,', d['n_errors'], 'errors')"
log "DONE"
