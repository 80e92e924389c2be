#!/bin/bash
# Round-11d: bm25/pmi/vocab decade on a REALISTIC-vocabulary corpus
# (verdict #3). GenZipf synthesizes Heaps-law vocabulary + Zipf token
# draws (the driver fixture's ~30-word vocabulary makes every query
# term match every document, so its bm25 exponent is a fixture-shape
# artifact). One decade 50k -> 500k docs, LegBench 5 reps interleaved.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

for pair in "zipf50k:50000" "zipf500k:500000"; do
  tag=${pair%%:*}; n=${pair#*:}
  if [ ! -d target/$tag/documents.parquet ]; then
    log "genzipf $tag ($n docs)"
    SPARK_DRIVER_MEM=32g sbt -batch "runMain graft.GenZipf target/$tag $n" \
      > target/r11d_gen_$tag.log 2>&1 || { echo "FAIL gen $tag"; exit 1; }
  fi
done

log "LegBench bm25/pmi/vocab on the zipf decade (5 reps, interleaved)"
SPARK_GRAFT_ONLY=q_text_bm25,q_text_pmi,q_text_vocab_stats SPARK_GRAFT_REPS=5 \
  SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench target/zipf50k target/zipf500k" \
  > target/r11d_zipf.log 2>&1 || { echo "FAIL legbench"; tail -5 target/r11d_zipf.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' target/r11d_zipf.log | tail -1 \
  > target/r11d_zipf.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r11d_zipf.json'))
out = {"protocol": ("bm25/pmi/vocab decade on a realistic-vocabulary corpus: "
  "GenZipf (Heaps-law vocab V=8*T^0.55, Zipf token ranks r=floor(V^u)) at 50k "
  "and 500k docs; LegBench 5 reps, dirs interleaved per rep; exponent = "
  "log10(hi/lo). Retires the degenerate-vocab caveat on the driver fixture's "
  "text-stat exponents."),
  "queries": {}}
for q in ("q_text_bm25", "q_text_pmi", "q_text_vocab_stats"):
    lm, hm = d["medians"][f"target/zipf50k#{q}"], d["medians"][f"target/zipf500k#{q}"]
    ln, hn = d["medians_min"][f"target/zipf50k#{q}"], d["medians_min"][f"target/zipf500k#{q}"]
    out["queries"][q] = {
      "zipf50k_median": lm, "zipf500k_median": hm,
      "exponent_median_based": round(math.log10(hm/lm), 3),
      "exponent_min_based": round(math.log10(hn/ln), 3),
      "per_rep_50k": d["per_rep"][f"target/zipf50k#{q}"],
      "per_rep_500k": d["per_rep"][f"target/zipf500k#{q}"]}
json.dump(out, open('BENCH_ZIPF_DECADE.json','w'), indent=2)
print(json.dumps({k: (v["exponent_median_based"], v["exponent_min_based"])
                  for k, v in out["queries"].items()}))
PY
log "DONE"
