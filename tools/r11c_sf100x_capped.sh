#!/bin/bash
# Round-11c: third decade for the pair family UNDER THE CAP (verdict #2).
# Uncapped, containment/prefix exceed single-box spill disk at 5M docs
# (BENCH_SCALING_sf100x.json, measured); the capped mode IS the 100 TB
# operating mode, so the decade is measured with
# SPARK_GRAFT_PAIR_BUDGET=16 active on BOTH sides (sf10x and sf100x),
# dirs interleaved within each rep (PairLegBench), plus the capped
# prefix mode's measured recall against the exact twin at sf10x.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
[ -d target/sf10x_docs/documents.parquet ] || { echo "FAIL no sf10x_docs"; exit 1; }

if [ ! -d target/sf100x_docs/documents.parquet ]; then
  log "genscale sf100x documents-only (10 copies of sf10x_docs)"
  SPARK_DRIVER_MEM=64g sbt -batch \
    "runMain graft.GenScale target/sf10x_docs target/sf100x_docs 10 documents" \
    > target/r11c_gen_sf100x.log 2>&1 || { echo "FAIL gen"; exit 1; }
fi
df -h / | tail -1

log "PairLegBench capped decade (5 reps, budget 16/doc, interleaved)"
SPARK_GRAFT_REPS=5 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_PAIR_RECALL=target/sf10x_docs \
  sbt -batch "runMain graft.PairLegBench target/sf10x_docs target/sf100x_docs" \
  > target/r11c_pairleg.log 2>&1 || { echo "FAIL pairleg"; tail -5 target/r11c_pairleg.log; exit 1; }
df -h / | tail -1
grep -oE '\{"metric":"pair_leg_medians".*' target/r11c_pairleg.log | tail -1 \
  > target/r11c_pairleg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r11c_pairleg.json'))
lo, hi = 'target/sf10x_docs', 'target/sf100x_docs'
out = {"protocol": ("Third decade (sf10x 500k docs -> sf100x 5M docs, documents-only "
  "GenScale chain) for the pair family in its CAPPED operating mode: "
  "pairBudgetPerDoc=16 active on BOTH sides, PairLegBench 5 reps with dirs "
  "interleaved per rep; exponent = log10(hi/lo). The capped prefix mode's "
  "recall vs the exact twin is measured at sf10x."),
  "budget_per_doc": d["budget_per_doc"],
  "prefix_recall_sf10x": d.get("prefix_recall"),
  "legs": {}}
for leg in ("containment_capped", "prefix_capped"):
    lm, hm = d["medians"][f"{lo}#{leg}"], d["medians"][f"{hi}#{leg}"]
    ln, hn = d["medians_min"][f"{lo}#{leg}"], d["medians_min"][f"{hi}#{leg}"]
    out["legs"][leg] = {
      "sf10x_median": lm, "sf100x_median": hm,
      "exponent_median_based": round(math.log10(hm/lm), 3),
      "exponent_min_based": round(math.log10(hn/ln), 3),
      "per_rep_sf10x": d["per_rep"][f"{lo}#{leg}"],
      "per_rep_sf100x": d["per_rep"][f"{hi}#{leg}"]}
json.dump(out, open('BENCH_SCALING_sf100x_capped.json','w'), indent=2)
print(json.dumps({k: (v["exponent_median_based"], v["exponent_min_based"])
                  for k, v in out["legs"].items()}))
print("prefix recall @sf10x:", d.get("prefix_recall"))
PY
log "DONE"
