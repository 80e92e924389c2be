#!/bin/bash
# Round-8 second decade (verdict item 4): the session restart wiped
# target/, losing the sf1x/sf10x corpora before the sf10x pair-family
# bench ran. The pair queries read ONLY the documents table, so both
# corpora regenerate documents-only, and BOTH sides of the decade are
# re-benched fresh in this session — comparing a fresh sf10x run against
# the earlier session's sf1x artifact would fold the documented ±15 %
# cross-artifact box drift into the exponents.
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PAIRQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring

log "genscale sf1x (documents only, 10 copies)"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10 documents" \
  > target/r8b_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }

log "genscale sf10x (documents only, 100 copies)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x 100 documents" \
  > target/r8b_gen_sf10x.log 2>&1 || { echo "FAIL gen_sf10x"; exit 1; }

log "bench pair family sf1x (3 reps, 64g)"
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r8b_bench_sf1x.log 2>&1
cp target/bench.json target/r8b_bench_sf1x_pair.json

log "bench pair family sf10x (3 reps, 64g)"
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r8b_bench_sf10x.log 2>&1
cp target/bench.json target/r8b_bench_sf10x_pair.json

log "scaling artifact"
python3 tools/scaling.py target/r8b_bench_sf1x_pair.json \
  target/r8b_bench_sf10x_pair.json BENCH_SCALING_sf10x.json \
  sf1x sf10x 10 > target/r8b_scaling_sf10x.txt 2>&1
cat target/r8b_scaling_sf10x.txt
log "DONE"
