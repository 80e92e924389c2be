#!/bin/bash
# Round-9 perf pipeline, strictly sequential (one sbt at a time):
#  1. re-baseline sf0.1 medians on the REGENERATED fixtures (the r8
#     medians predate the Aug 13 19:04 fixture churn, so r8's
#     per-query deltas were confounded by data content — verdict task 4);
#  2. regenerate the full sf1x decade corpus from the new sf0.1 seed and
#     re-measure the 183-query scaling decade (verdict task 5);
#  3. regenerate the documents-only sf10x corpus and measure the
#     pair-family second decade (verdict task 8).
# Bench-artifact hygiene per ADVICE r8: rm bench.json before each run,
# fail the script on bench error, check artifact provenance before cp.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PAIRQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring

check_sf(){ # $1 = artifact, $2 = expected sf dir fragment
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "bench sf0.1 full surface (3 reps) — re-baseline on new fixtures"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > target/r9_bench_sf0.1.log 2>&1 \
  || { echo "FAIL bench_sf0.1"; exit 1; }
check_sf target/bench.json sf0.1
cp target/bench.json target/r9_bench_sf0.1_final.json

log "genscale sf1x (ALL tables, 10 copies)"
SPARK_DRIVER_MEM=32g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10" \
  > target/r9_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }

log "bench sf1x full surface (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > target/r9_bench_sf1x.log 2>&1 \
  || { echo "FAIL bench_sf1x"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r9_bench_sf1x_final.json

log "scaling sf0.1 -> sf1x (full surface)"
python3 tools/scaling.py target/r9_bench_sf0.1_final.json \
  target/r9_bench_sf1x_final.json BENCH_SCALING_sf1x.json \
  sf0.1 sf1x 10 > target/r9_scaling_sf1x.txt 2>&1
cat target/r9_scaling_sf1x.txt

log "genscale sf10x (documents only, 100 copies)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x 100 documents" \
  > target/r9_gen_sf10x.log 2>&1 || { echo "FAIL gen_sf10x"; exit 1; }

log "bench pair family sf10x (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r9_bench_sf10x.log 2>&1 \
  || { echo "FAIL bench_sf10x"; exit 1; }
check_sf target/bench.json sf10x
cp target/bench.json target/r9_bench_sf10x_pair.json

log "scaling sf1x -> sf10x (pair family)"
python3 tools/scaling.py target/r9_bench_sf1x_final.json \
  target/r9_bench_sf10x_pair.json BENCH_SCALING_sf10x.json \
  sf1x sf10x 10 > target/r9_scaling_sf10x.txt 2>&1
cat target/r9_scaling_sf10x.txt
log "DONE"
