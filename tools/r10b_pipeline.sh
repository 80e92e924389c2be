#!/bin/bash
# Round-10b: measurements on the adaptive-CC code, strictly sequential.
#  1. re-baseline sf0.1 medians (the CC dispatch moves ~6 queries);
#  2. regenerate sf1x and refresh the full-surface first decade so the
#     committed exponents measure the shipped code (CC queries' sf1x
#     side also takes the union-find leg — both sides must move);
#  3. build the documents-only sf10x lo side and run the sf100x third
#     decade for the pair family (scripted in r10_third_decade.sh but
#     never executed; pair family has no CC stage, so the committed
#     second decade remains valid as-is).
# Artifact hygiene: rm bench.json before each run, fail on bench error,
# check artifact provenance before cp.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PAIRQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring

check_sf(){ # $1 = artifact, $2 = expected sf dir fragment
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "bench sf0.1 full surface (3 reps) — adaptive-CC re-baseline"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > target/r10b_bench_sf0.1.log 2>&1 \
  || { echo "FAIL bench_sf0.1"; exit 1; }
check_sf target/bench.json sf0.1
cp target/bench.json target/r10b_bench_sf0.1_final.json

log "genscale sf1x (ALL tables, 10 copies)"
SPARK_DRIVER_MEM=32g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10" \
  > target/r10b_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }

log "bench sf1x full surface (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > target/r10b_bench_sf1x.log 2>&1 \
  || { echo "FAIL bench_sf1x"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r10b_bench_sf1x_final.json

log "scaling sf0.1 -> sf1x (full surface)"
python3 tools/scaling.py target/r10b_bench_sf0.1_final.json \
  target/r10b_bench_sf1x_final.json BENCH_SCALING_sf1x.json \
  sf0.1 sf1x 10 > target/r10b_scaling_sf1x.txt 2>&1
cat target/r10b_scaling_sf1x.txt

log "genscale sf10x (documents only, 100 copies)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x 100 documents" \
  > target/r10b_gen_sf10x.log 2>&1 || { echo "FAIL gen_sf10x"; exit 1; }

log "bench pair family sf10x (5 reps, 64g) — third-decade lo side"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r10b_bench_sf10x_pair.log 2>&1 \
  || { echo "FAIL bench_sf10x_pair"; exit 1; }
check_sf target/bench.json sf10x
cp target/bench.json target/r10_bench_sf10x_ext2.json

log "genscale sf100x (documents only, 10 copies of sf10x)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale target/sf10x target/sf100x 10 documents" \
  > target/r10b_gen_sf100x.log 2>&1 || { echo "FAIL gen_sf100x"; exit 1; }

log "bench pair family sf100x (3 reps, 96g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf100x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r10b_bench_sf100x.log 2>&1 \
  || { echo "FAIL bench_sf100x"; exit 1; }
check_sf target/bench.json sf100x
cp target/bench.json target/r10_bench_sf100x_pair.json

log "scaling sf10x -> sf100x (pair family)"
python3 tools/scaling.py target/r10_bench_sf10x_ext2.json \
  target/r10_bench_sf100x_pair.json BENCH_SCALING_sf100x.json \
  sf10x sf100x 10 > target/r10b_scaling_sf100x.txt 2>&1
cat target/r10b_scaling_sf100x.txt
log "DONE"
