#!/bin/bash
# Round-14 leg (f) rerun: the first attempt pointed the third rung at
# sf10x_docs, which has no embeddings table (the curation flagship's
# SemDeDup stage reads it) — FileNotFoundException at rep 1. sf10x_de
# carries documents (500k) + embeddings (200k, the GenScale hybrid
# fixture); the embeddings-coverage ratio (0.4 vec/doc) matches the
# sf1x fixture shape, so the decade compares like with like.
# Runs in the EXISTING r14camp clone (same code as the campaign).
set -u
cd /root/repo/target/r14camp || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "(f) flagship curation decade ladder (5 reps, dirs interleaved)"
SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench /root/testdata/sf0.1 /root/repo/target/sf1x /root/repo/target/sf10x_de" \
  > /root/repo/target/r14f_flagship2.log 2>&1 \
  || { echo "FAIL flagship legbench"; tail -5 /root/repo/target/r14f_flagship2.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r14f_flagship2.log | tail -1 \
  > /root/repo/target/r14f_flagship.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r14f_flagship.json'))
q = 'q_flagship_curation'
dirs = ['/root/testdata/sf0.1', '/root/repo/target/sf1x', '/root/repo/target/sf10x_de']
tags = ['sf0.1_5k', 'sf1x_50k', 'sf10x_500k']
out = {"protocol": ("q_flagship_curation decade ladder (verdict r13 #4): LegBench "
  "5 reps, dirs interleaved per rep, over 5k/50k/500k documents (third rung "
  "sf10x_de: the 500k-doc fixture WITH an embeddings table — 200k vecs, the "
  "same 0.4 vec/doc coverage shape as sf1x). The composed curation flagship: "
  "capped containment -> span gate -> LSH/CC -> SemDeDup (two-level-capable "
  "assignment) -> distilled gate (train-on-sample, score-corpus) -> hash "
  "packing, with localCheckpoint lineage cuts at the composition seams. Timing "
  "wraps construction + action, so the eager checkpoint stages and trainGate's "
  "20 bounded collect rounds are all inside the measured window. Exponent = "
  "log10(t_hi/t_lo) per decade; stage-wise ceiling = max of the component "
  "exponents (capped pairs ~0.6 at this span, distill 0.59, sem ~0.5, "
  "packing ~0.3)."), "medians": {}, "per_rep": {}}
for dir_, tag in zip(dirs, tags):
    out["medians"][tag] = d["medians"][f"{dir_}#{q}"]
    out["per_rep"][tag] = d["per_rep"][f"{dir_}#{q}"]
m = out["medians"]
out["exponent_first_decade"] = round(math.log10(m['sf1x_50k']/m['sf0.1_5k']), 3)
out["exponent_second_decade"] = round(math.log10(m['sf10x_500k']/m['sf1x_50k']), 3)
json.dump(out, open('/root/repo/BENCH_FLAGSHIP_DECADE.json','w'), indent=2)
print(json.dumps({k: v for k, v in out.items() if k.startswith('exponent') or k == 'medians'}))
PY
log "LEG F DONE"
