#!/bin/bash
# Round-8 pipeline resume: the 12:33 sf1x bench was killed at ~12:57 by the
# driver session dying; gates + sf0.1 bench already completed. Re-runs the
# three remaining steps, strictly sequential (one sbt at a time).
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }

log "bench sf1x full surface (3 reps, 64g)"
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" > target/r8_bench_sf1x.log 2>&1
cp target/bench.json target/r8_bench_sf1x_final.json

log "bench sf10x pair-family subset (3 reps, 64g)"
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring \
  sbt -batch "runMain graft.Bench" > target/r8_bench_sf10x.log 2>&1
cp target/bench.json target/r8_bench_sf10x_final.json

log "scaling artifacts"
python3 tools/scaling.py target/r8_bench_sf0.1_final.json target/r8_bench_sf1x_final.json BENCH_SCALING_sf1x.json sf0.1 sf1x 10 > target/r8_scaling_sf1x.txt 2>&1
python3 tools/scaling.py target/r8_bench_sf1x_final.json target/r8_bench_sf10x_final.json BENCH_SCALING_sf10x.json sf1x sf10x 10 > target/r8_scaling_sf10x.txt 2>&1
log "DONE"
