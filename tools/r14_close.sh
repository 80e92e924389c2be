#!/bin/bash
# Round-14 closer (verdict r13 #5 — the r12 #7/#8 protocol, now
# scripted as one unit so it cannot be half-run again). In order:
#  (a) two-run determinism sweep on the final code at sf0.01
#      -> DETERMINISM_r14.txt (committed)
#  (b) fresh 3-rep full-surface sf0.1 medians on the final code
#      -> BENCH_MEDIANS_sf0.1.json (committed) and the same artifact
#      verbatim as BENCH_r14_full.json — the parseable per-query
#      round artifact (the driver's BENCH_r{N}.json is a truncated
#      log tail; this is the machine-readable twin).
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "a: determinism sweep: Verify x2 at sf0.01"
rm -rf target/det_a target/det_b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_a" \
  > target/r14_det_a.log 2>&1 || { echo "FAIL det_a"; exit 1; }
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_b" \
  > target/r14_det_b.log 2>&1 || { echo "FAIL det_b"; exit 1; }
python3 tools/determinism.py target/det_a target/det_b \
  > target/r14_determinism.txt 2>&1
tail -3 target/r14_determinism.txt
cp target/r14_determinism.txt DETERMINISM_r14.txt

log "b: closing medians: full bench at sf0.1 (3 reps)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > target/r14_bench_sf01.log 2>&1 \
  || { echo "FAIL bench"; exit 1; }
cp target/bench.json BENCH_MEDIANS_sf0.1.json
cp target/bench.json BENCH_r14_full.json
python3 -c "
import json; d=json.load(open('BENCH_MEDIANS_sf0.1.json'))
print('total', round(d['value'],1), 'queries', len(d['queries']), 'errors', d['n_errors'])
for q in ('q_flagship_curation','q_quality_distilled','q_text_pmi_capped',
          'q_s5_outbound_sampled','q_s16_doc_sampled','q_pretrain_capped',
          'q_stream_outer_join','q_stream_stream_join'):
    print(q, round(d['queries'].get(q, -1), 2))"
log "DONE"
