#!/bin/bash
# Round-12 closer (verdict r11 #1 + #7): the evidence round 11 wrote
# but never executed, plus the streaming bench-position pin.
#  (a) two-run determinism sweep on the grown 198-query surface at
#      sf0.01 (last swept at 186, round 10);
#  (b) streaming family FIRST, in a dedicated same-shape subset session
#      (5 reps, the BENCH_STREAM_DECADE shape) so its medians can be
#      compared to that artifact within the documented drift box —
#      this adjudicates the 2.19x/2.00x q_stream_state_reader /
#      q_stream_transform_state readings from the r11 closing bench;
#  (c) fresh 3-rep full-surface sf0.1 medians on the final round-12
#      code -> BENCH_MEDIANS_sf0.1.json (adjudicates the
#      q_pretrain_full 1.24x and q_dedup_ngram_jaccard 1.33x drifts).
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "a: determinism sweep: Verify x2 at sf0.01"
rm -rf target/det_a target/det_b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_a" \
  > target/r12_det_a.log 2>&1 || { echo "FAIL det_a"; exit 1; }
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/det_b" \
  > target/r12_det_b.log 2>&1 || { echo "FAIL det_b"; exit 1; }
python3 tools/determinism.py target/det_a target/det_b \
  > target/r12_determinism.txt 2>&1
tail -5 target/r12_determinism.txt

log "b: streaming family first, dedicated subset session (5 reps)"
STREAMQ=q_stream_dedup,q_stream_events_hourly,q_stream_foreachbatch_sink,q_stream_merge_sink,q_stream_outer_join,q_stream_sessionize,q_stream_state_reader,q_stream_static_join,q_stream_stream_join,q_stream_transform_state
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=5 \
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_ONLY=$STREAMQ \
  sbt -batch "runMain graft.Bench" > target/r12_bench_stream.log 2>&1 \
  || { echo "FAIL stream bench"; exit 1; }
cp target/bench.json target/r12_bench_stream_final.json
python3 - <<'PY'
import json
d = json.load(open('target/r12_bench_stream_final.json'))
ref = json.load(open('BENCH_STREAM_DECADE.json'))['queries']
out = {"protocol": ("Streaming family measured FIRST in a dedicated "
  "same-shape subset session (5-rep subset Bench at sf0.1, the "
  "BENCH_STREAM_DECADE shape) within the round-12 closing protocol — "
  "the full-surface artifact's streaming totals swing +-50% with "
  "bench position / box state on untouched code (r11: 36.5 -> 55.7 s), "
  "so the comparable number is this dedicated-session median vs the "
  "decade artifact's, not the full-surface total."), "queries": {}}
for q, t in d['queries'].items():
    r = ref.get(q, {}).get('sf0.1_median')
    out['queries'][q] = {"dedicated_median": t, "stream_decade_median": r,
      "ratio": round(t / r, 2) if r else None}
json.dump(out, open('BENCH_STREAM_DEDICATED_r12.json','w'), indent=2)
print(json.dumps({q: v['ratio'] for q, v in out['queries'].items()}))
PY

log "c: closing medians: full bench at sf0.1 (3 reps)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > target/r12_bench_sf01.log 2>&1 \
  || { echo "FAIL bench"; exit 1; }
cp target/bench.json BENCH_MEDIANS_sf0.1.json
python3 -c "
import json; d=json.load(open('BENCH_MEDIANS_sf0.1.json'))
print('total', round(d['value'],1), 'queries', len(d['queries']), 'errors', d['n_errors'])
for q in ('q_stream_state_reader','q_stream_transform_state','q_pretrain_full','q_dedup_ngram_jaccard','q_outbound_flat','q_outbound_push','q_pretrain_capped','q_text_pmi_capped','q_dedup_semantic'):
    print(q, d['queries'].get(q))"
log "DONE"
