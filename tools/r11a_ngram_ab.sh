#!/bin/bash
# Round-11a: clean second decade for q_dedup_ngram_jaccard (verdict #1).
# 5-rep interleaved A/B via LegBench: sf1x and sf10x legs alternate
# WITHIN each rep so both sides of the decade share box conditions —
# the method that settled containment (CcLegBench, commit ad4749b).
# Done-criterion: median- and min-based exponents within 0.1, both <= 0.92.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
[ -d target/sf1x/documents.parquet ] || { echo "FAIL no sf1x"; exit 1; }
[ -d target/sf10x_chain/documents.parquet ] || { echo "FAIL no sf10x_docs"; exit 1; }

log "LegBench ngram A/B (5 reps, interleaved sf1x/sf10x)"
SPARK_GRAFT_ONLY=q_dedup_ngram_jaccard SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench target/sf1x target/sf10x_chain" \
  > target/r11a_ngram_ab.log 2>&1 || { echo "FAIL legbench"; exit 1; }
grep -oE '\{"metric":"leg_medians".*' target/r11a_ngram_ab.log | tail -1 \
  > target/r11a_ngram_ab.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r11a_ngram_ab.json'))
lo_m = d['medians']['target/sf1x#q_dedup_ngram_jaccard']
hi_m = d['medians']['target/sf10x_chain#q_dedup_ngram_jaccard']
lo_n = d['medians_min']['target/sf1x#q_dedup_ngram_jaccard']
hi_n = d['medians_min']['target/sf10x_chain#q_dedup_ngram_jaccard']
em = math.log10(hi_m/lo_m)
en = math.log10(hi_n/lo_n)
out = {
  "protocol": ("Round-11 clean A/B for q_dedup_ngram_jaccard's second decade: "
    "LegBench 5 reps, sf1x and sf10x legs interleaved WITHIN each rep "
    "(shared box conditions; the CcLegBench method of commit ad4749b). "
    "exponent = log10(hi/lo)"),
  "medians": {"sf1x": lo_m, "sf10x": hi_m},
  "minima": {"sf1x": lo_n, "sf10x": hi_n},
  "exponent_median_based": round(em, 3),
  "exponent_min_based": round(en, 3),
  "per_rep": d["per_rep"],
}
json.dump(out, open('BENCH_NGRAM_AB_sf10x.json', 'w'), indent=2)
print("median-based exponent", round(em,3), " min-based", round(en,3))
PY
log "DONE"
