#!/bin/bash
# Round-8 consolidation pipeline: gates then benches, strictly sequential
# (one sbt at a time; see round protocol).
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }

log "verify sf0.01 run A"
rm -rf target/verify target/det_a target/det_b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify" > target/r8_verify_a.log 2>&1 || { echo "FAIL verify_a"; exit 1; }
cp -r target/verify target/det_a

log "compare sf0.01"
python3 tools/compare.py /root/testdata/sf0.01 target/verify > target/r8_compare_sf001.txt 2>&1

log "verify sf0.01 run B (determinism)"
rm -rf target/verify
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify" > target/r8_verify_b.log 2>&1 || { echo "FAIL verify_b"; exit 1; }
cp -r target/verify target/det_b

log "determinism sweep"
python3 tools/determinism.py target/det_a target/det_b > target/r8_determinism.txt 2>&1

log "verify sf0.1"
rm -rf target/verify_sf01
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 target/verify_sf01" > target/r8_verify_sf01.log 2>&1 || { echo "FAIL verify_sf01"; exit 1; }
python3 tools/compare.py /root/testdata/sf0.1 target/verify_sf01 > target/r8_compare_sf01.txt 2>&1

log "bench sf0.1 (3 reps)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 \
  sbt -batch "runMain graft.Bench" > target/r8_bench_sf0.1.log 2>&1
cp target/bench.json target/r8_bench_sf0.1_final.json

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
