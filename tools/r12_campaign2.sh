#!/bin/bash
# Round-12 campaign 2: re-measure the pair family on the
# broadcast-verify code (commit c4b648d) and fold both modes into the
# capped third-decade artifact, then refresh the new-query decades.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

log "C2: PairLegBench capped sf10x->sf20x, broadcast-verify code (3 reps)"
SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PairLegBench target/sf10x_docs target/sf20x_docs" \
  > target/r12_pairleg2.log 2>&1 || { echo "FAIL pairleg2"; tail -5 target/r12_pairleg2.log; exit 1; }
grep -oE '\{"metric":"pair_leg_medians".*' target/r12_pairleg2.log | tail -1 \
  > target/r12_pairleg2.json
python3 - <<'PY'
import json, math
new = json.load(open('target/r12_pairleg2.json'))
old = json.load(open('BENCH_SCALING_CAPPED_3RD.json'))
lo, hi = 'target/sf10x_docs', 'target/sf20x_docs'
span = math.log10(2)
out = {"protocol": ("Third-decade trend for the pair family in its CAPPED "
  "operating mode (pairBudgetPerDoc=16 on BOTH sides; PairLegBench 3 reps, "
  "dirs interleaved per rep; exponents normalized PER DECADE: "
  "log10(hi/lo)/log10(2)). Measured over sf10x -> sf20x (500k -> 1M docs) "
  "because BOTH larger-span attempts are measured disk-infeasible on this "
  "box: uncapped sf100x (round 10) and CAPPED sf50x (round 11 — rep-1 sf50x "
  "containment leg died ENOSPC after the sf10x legs completed; log "
  "target/r11c_pairleg.log). TWO modes are reported: smj_verify is the "
  "round-11 code (verify = two sort-merge joins), whose 2.2-2.5/decade wall "
  "exponents were adjudicated superlinear-in-EXECUTION not in work — every "
  "work witness is linear (adjudication block) and PairStageProbe pins the "
  "wall to the verify stage's external sort writing ~36 GB of spill at 1M "
  "docs (write-bandwidth-bound; heap +56% and 5x shuffle partitions moved "
  "it <10%). broadcast_verify is the shipped round-12 code: the hash-set "
  "side broadcasts under a fenced 1.5 GB size estimate, both verify joins "
  "become map-only, and the spill disappears."),
  "budget_per_doc": new["budget_per_doc"],
  "span_docs": "500k -> 1M (log10(2) of a decade)",
  "adjudication": {
    "work_witnesses_ratio_sf20x_over_sf10x": {
      "output_pairs": round(51553 / 25288, 2),
      "distinct_candidates": round(65924944 / 37611591, 2),
      "generation_mass_under_cap": round(68701084 / 39340942, 2),
      "duckdb_single_thread_candidate_stage": round(51.3 / 24.0, 2)},
    "pair_stage_probe": {
      "verify_smj_secs": {"sf10x": 19.0, "sf20x": 136.8},
      "verify_broadcast_secs": {"sf10x": 9.8, "sf20x": 85.3},
      "disk_gb_written_whole_probe": {"sf10x": 9.8, "sf20x": 53.8},
      "null_results": "heap 64g->100g: 179->185 s; shuffle partitions 32->160: 179->161 s; threads 32->128: worse (oversubscription)"}},
  "modes": {"smj_verify_r11_code": old["legs"], "broadcast_verify": {}}}
for leg in ("containment_capped", "prefix_capped"):
    lm, hm = new["medians"][f"{lo}#{leg}"], new["medians"][f"{hi}#{leg}"]
    ln, hn = new["medians_min"][f"{lo}#{leg}"], new["medians_min"][f"{hi}#{leg}"]
    out["modes"]["broadcast_verify"][leg] = {
      "sf10x_median": lm, "sf20x_median": hm,
      "exponent_per_decade_median": round(math.log10(hm/lm) / span, 3),
      "exponent_per_decade_min": round(math.log10(hn/ln) / span, 3),
      "per_rep_sf10x": new["per_rep"][f"{lo}#{leg}"],
      "per_rep_sf20x": new["per_rep"][f"{hi}#{leg}"]}
json.dump(out, open('BENCH_SCALING_CAPPED_3RD.json','w'), indent=2)
print(json.dumps({k: (v["exponent_per_decade_median"], v["exponent_per_decade_min"])
                  for k, v in out["modes"]["broadcast_verify"].items()}))
PY

log "D2: new-query decades sf0.1 -> sf1x on final code (5 reps)"
NEWQ=q_dedup_prefix_capped,q_dedup_prefix_capped_recall,q_curation_dsir,q_mix_temperature,q_dedup_semantic,q_multimodal_pipeline,q_pretrain_capped,q_text_pmi_capped
for pair in "sf0.1:/root/testdata/sf0.1:16g" "sf1x:target/sf1x:48g"; do
  tag=${pair%%:*}; rest=${pair#*:}; dir=${rest%%:*}; mem=${rest##*:}
  log "D2: bench $tag subset (5 reps)"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_ONLY=$NEWQ \
    sbt -batch "runMain graft.Bench" > target/r12_bench2_$tag.log 2>&1 \
    || { echo "FAIL bench2_$tag"; exit 1; }
  cp target/bench.json target/r12_bench2_${tag}_final.json
done
python3 tools/scaling.py target/r12_bench2_sf0.1_final.json \
  target/r12_bench2_sf1x_final.json BENCH_SCALING_NEWQ_r12.json \
  sf0.1 sf1x 10
python3 -c "
import json; d=json.load(open('BENCH_SCALING_NEWQ_r12.json'))
print(json.dumps(d['log10_exponent'], indent=1))"
log "campaign2 DONE; chaining the round closer"
bash tools/r12_close.sh
