#!/bin/bash
# Round-11g: SemDeDup scale-mode decades (constant cluster size, k ∝ n)
# with the fit_assign / pairs cost components measured separately —
# see SemLegBench's scaladoc for why the split is the honest number.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

[ -d target/sf1x/embeddings.parquet ] || { echo "FAIL no sf1x embeddings"; exit 1; }
[ -d target/sf10x_de/embeddings.parquet ] || { echo "FAIL no sf10x_de"; exit 1; }

log "SemLegBench (5 reps, interleaved, 3 legs)"
SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.SemLegBench /root/testdata/sf0.1 target/sf1x target/sf10x_de" \
  > target/r11g_semleg.log 2>&1 || { echo "FAIL semleg"; tail -5 target/r11g_semleg.log; exit 1; }
grep -oE '\{"metric":"sem_leg_medians".*' target/r11g_semleg.log | tail -1 \
  > target/r11g_semleg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r11g_semleg.json'))
legs = ['/root/testdata/sf0.1', 'target/sf1x', 'target/sf10x_de']
out = {"protocol": ("SemDeDup scale mode: cluster size held at ~625 (k = n/625), "
  "codebook fit on a bounded 4096-vector sample, tau=0.35; SemLegBench 5 reps, "
  "dirs interleaved per rep. Components reported separately: fit_assign is the "
  "n*k exact nearest-centroid pass (the superlinear term when k grows with n; "
  "mitigated at 1e9+ vectors by two-level/ANN assignment, see scaladoc), pairs "
  "is the within-cluster cosine self-join (the linear term the sharding buys)."),
  "components": {}}
for comp in ("fit_assign", "pairs"):
    ms = [d["medians"][f"{l}#{comp}"] for l in legs]
    mn = [d["medians_min"][f"{l}#{comp}"] for l in legs]
    out["components"][comp] = {
      "sf0.1_median": ms[0], "sf1x_median": ms[1], "sf10x_median": ms[2],
      "exponent_d1_median": round(math.log10(ms[1]/ms[0]), 3),
      "exponent_d2_median": round(math.log10(ms[2]/ms[1]), 3),
      "exponent_d1_min": round(math.log10(mn[1]/mn[0]), 3),
      "exponent_d2_min": round(math.log10(mn[2]/mn[1]), 3),
      "per_rep": {l: d["per_rep"][f"{l}#{comp}"] for l in legs}}
json.dump(out, open('BENCH_SEM_DECADE.json','w'), indent=2)
print(json.dumps({k: (v["exponent_d1_median"], v["exponent_d2_median"])
                  for k, v in out["components"].items()}))
PY
log "DONE"
