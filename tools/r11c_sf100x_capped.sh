#!/bin/bash
# Round-11c: third-decade trend for the pair family UNDER THE CAP
# (verdict #2). Two sf100x attempts are now MEASURED infeasible on this
# box: uncapped (round 10, BENCH_SCALING_sf100x.json basis note) and
# capped (this round, 02:14 run: "No space left on device" during the
# sf100x containment leg after 19 min — the capped verify stage still
# carries ~10.3 GB transient shuffle per 500k docs, linear, so 5M docs
# needs ~103 GB vs 78 GB free). The third-decade TREND is therefore
# measured over sf10x -> sf50x (500k -> 2.5M docs, peak ~52 GB, fits)
# and normalized per decade: exponent = log10(hi/lo) / log10(5).
# PairLegBench interleaves dirs within each rep; budget 16/doc on BOTH
# sides; the capped prefix mode's recall vs the exact twin is measured
# at sf10x.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
[ -d target/sf10x_docs/documents.parquet ] || { echo "FAIL no sf10x_docs"; exit 1; }

if [ ! -d target/sf50x_docs/documents.parquet ]; then
  log "genscale sf50x documents-only (5 copies of sf10x_docs)"
  SPARK_DRIVER_MEM=64g sbt -batch \
    "runMain graft.GenScale target/sf10x_docs target/sf50x_docs 5 documents" \
    > target/r11c_gen_sf50x.log 2>&1 || { echo "FAIL gen"; exit 1; }
fi
df -h / | tail -1

log "PairLegBench capped sf10x->sf50x (3 reps, budget 16/doc, interleaved)"
SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_PAIR_RECALL=target/sf10x_docs \
  sbt -batch "runMain graft.PairLegBench target/sf10x_docs target/sf50x_docs" \
  > target/r11c_pairleg.log 2>&1 || { echo "FAIL pairleg"; tail -5 target/r11c_pairleg.log; exit 1; }
df -h / | tail -1
grep -oE '\{"metric":"pair_leg_medians".*' target/r11c_pairleg.log | tail -1 \
  > target/r11c_pairleg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r11c_pairleg.json'))
lo, hi = 'target/sf10x_docs', 'target/sf50x_docs'
span = math.log10(5)  # sf10x -> sf50x is 0.699 of a decade
out = {"protocol": ("Third-decade trend (sf10x 500k docs -> sf50x 2.5M docs, "
  "documents-only GenScale chain) for the pair family in its CAPPED operating "
  "mode: pairBudgetPerDoc=16 active on BOTH sides, PairLegBench 3 reps with "
  "dirs interleaved per rep; exponents are normalized PER DECADE: "
  "log10(hi/lo)/log10(5). A full sf100x leg is disk-infeasible on this box "
  "even capped (measured twice: uncapped round 10; capped this round — "
  "ENOSPC at ~103 GB projected transient vs 78 GB free). The capped prefix "
  "mode's recall vs the exact twin is measured at sf10x."),
  "budget_per_doc": d["budget_per_doc"],
  "prefix_recall_sf10x": d.get("prefix_recall"),
  "legs": {}}
for leg in ("containment_capped", "prefix_capped"):
    lm, hm = d["medians"][f"{lo}#{leg}"], d["medians"][f"{hi}#{leg}"]
    ln, hn = d["medians_min"][f"{lo}#{leg}"], d["medians_min"][f"{hi}#{leg}"]
    out["legs"][leg] = {
      "sf10x_median": lm, "sf50x_median": hm,
      "exponent_per_decade_median": round(math.log10(hm/lm) / span, 3),
      "exponent_per_decade_min": round(math.log10(hn/ln) / span, 3),
      "per_rep_sf10x": d["per_rep"][f"{lo}#{leg}"],
      "per_rep_sf50x": d["per_rep"][f"{hi}#{leg}"]}
json.dump(out, open('BENCH_SCALING_CAPPED_3RD.json','w'), indent=2)
print(json.dumps({k: (v["exponent_per_decade_median"], v["exponent_per_decade_min"])
                  for k, v in out["legs"].items()}))
print("prefix recall @sf10x:", d.get("prefix_recall"))
PY
log "DONE"
