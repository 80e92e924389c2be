#!/bin/bash
# Round-10 perf pipeline, strictly sequential (one sbt at a time).
# Goals (VERDICT r9 tasks 1, 2, 3, 7):
#  1. re-baseline sf0.1 medians on the round-10 code (adaptive jaccard
#     dispatch, CC stepped checkpoint, pretrain shingle reuse);
#  2. regenerate sf1x and re-measure the FULL 186-query first decade —
#     the committed pair-family exponents predate the rare-postings
#     join, and 3 queries had no exponent at all;
#  3. 5-REP second decade for the pair family PLUS the three highest
#     first-decade queries (resample gap-fill, repair ladder, schema
#     merge), with a matching 5-rep sf1x side, to settle containment's
#     noisy exponent (median 1.00 vs minima 0.64 in r9).
# Artifact hygiene: rm bench.json before each run, fail on bench error,
# check artifact provenance before cp.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
# pair family + the three high-exponent non-pair queries
EXTQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring,q_resample_gap_fill,q_repair_ladder,q_s10_schema_merge

check_sf(){ # $1 = artifact, $2 = expected sf dir fragment
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "bench sf0.1 full surface (3 reps) — round-10 re-baseline"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > target/r10_bench_sf0.1.log 2>&1 \
  || { echo "FAIL bench_sf0.1"; exit 1; }
check_sf target/bench.json sf0.1
cp target/bench.json target/r10_bench_sf0.1_final.json

log "genscale sf1x (ALL tables, 10 copies)"
SPARK_DRIVER_MEM=32g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10" \
  > target/r10_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }

log "bench sf1x full surface (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > target/r10_bench_sf1x.log 2>&1 \
  || { echo "FAIL bench_sf1x"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r10_bench_sf1x_final.json

log "scaling sf0.1 -> sf1x (full 186-query surface)"
python3 tools/scaling.py target/r10_bench_sf0.1_final.json \
  target/r10_bench_sf1x_final.json BENCH_SCALING_sf1x.json \
  sf0.1 sf1x 10 > target/r10_scaling_sf1x.txt 2>&1
cat target/r10_scaling_sf1x.txt

log "bench sf1x EXT set (5 reps, 64g) — clean lo side for the second decade"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$EXTQ \
  sbt -batch "runMain graft.Bench" > target/r10_bench_sf1x_ext.log 2>&1 \
  || { echo "FAIL bench_sf1x_ext"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r10_bench_sf1x_ext.json

log "genscale sf10x (documents+events+orders+customer+dims, 100 copies)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x 100 documents,events,orders,customer,region,nation,supplier,part" \
  > target/r10_gen_sf10x.log 2>&1 || { echo "FAIL gen_sf10x"; exit 1; }

log "bench sf10x EXT set (5 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$EXTQ \
  sbt -batch "runMain graft.Bench" > target/r10_bench_sf10x.log 2>&1 \
  || { echo "FAIL bench_sf10x"; exit 1; }
check_sf target/bench.json sf10x
cp target/bench.json target/r10_bench_sf10x_ext.json

log "scaling sf1x -> sf10x (EXT set, 5-rep both sides)"
python3 tools/scaling.py target/r10_bench_sf1x_ext.json \
  target/r10_bench_sf10x_ext.json BENCH_SCALING_sf10x.json \
  sf1x sf10x 10 > target/r10_scaling_sf10x.txt 2>&1
cat target/r10_scaling_sf10x.txt
log "DONE"
