#!/bin/bash
# Round-12 final closer, take 2: the surface grew 198 -> 199
# (q_quality_distilled) after the first closing pass, so the
# determinism sweep and the medians snapshot re-run on the true final
# code (commit b9c7959). target/det_a is already the fresh post-final
# Verify (r12_det_a2.log, 199/199 oracle-green); only det_b and the
# medians re-run. The streaming dedicated-session pin
# (BENCH_STREAM_DEDICATED_r12.json) stands: no streaming code changed
# after it was measured.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "determinism: Verify run B at sf0.01"
rm -rf target/det_b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_b" \
  > target/r12_det_b2.log 2>&1 || { echo "FAIL det_b"; exit 1; }
python3 tools/determinism.py target/det_a target/det_b \
  > target/r12_determinism2.txt 2>&1
tail -3 target/r12_determinism2.txt
cp target/r12_determinism2.txt DETERMINISM_r12.txt

log "closing medians: full bench at sf0.1 (3 reps, 199 queries)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > target/r12_bench_sf01_final.log 2>&1 \
  || { echo "FAIL bench"; exit 1; }
cp target/bench.json BENCH_MEDIANS_sf0.1.json
python3 -c "
import json; d=json.load(open('BENCH_MEDIANS_sf0.1.json'))
print('total', round(d['value'],1), 'queries', len(d['queries']), 'errors', d['n_errors'])
for q in ('q_quality_distilled','q_pretrain_full','q_pretrain_capped','q_stream_state_reader','q_stream_transform_state','q_dedup_ngram_jaccard','q_dedup_containment','q_dedup_prefix_capped'):
    print(q, round(d['queries'].get(q, -1), 2))"
log "DONE"
