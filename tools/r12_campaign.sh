#!/bin/bash
# Round-12 measurement campaign (verdict r11 #2, #5, #6, #8), run on the
# post-milestone-1 code (commit a7a41fa):
#  A: SemLegBench decade re-measure — fit_assign now routes through the
#     exact two-level assignment; the artifact must show the n·k term's
#     exponent drop (verdict #5 done-criterion).
#  B: PmiLegBench on the Zipf corpora — the vocabulary-BOUNDED PMI mode
#     (topV=4096) whose uncapped twin measured 1.02 min-protocol in r11
#     (verdict #6 done-criterion: ≤0.9 on both protocols).
#  C: the capped pair family's third-decade trend on what FITS: the
#     sf10x->sf50x capped run was attempted in r11 and itself died with
#     ENOSPC during rep-1 sf50x containment (target/r11c_pairleg.log,
#     sf10x legs completed 73.6/39.0 s) — so the trend is measured
#     sf10x->sf20x (500k -> 1M docs, ~2x21 GB peak, fits 78 GB free),
#     normalized per decade by log10(2) (verdict #2).
#  D: sf0.1->sf1x decades for the six r11 queries + the two r12 queries
#     (verdict #8 + the q_pretrain_capped decade point from #4).
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

if [ ! -d target/sf100x_de/embeddings.parquet ]; then
  log "A: genscale sf100x_de embeddings-only (10 copies of sf10x_de, 2M vectors)"
  SPARK_DRIVER_MEM=64g sbt -batch \
    "runMain graft.GenScale target/sf10x_de target/sf100x_de 10 embeddings" \
    > target/r12_gen_sf100xde.log 2>&1 || { echo "FAIL gen sf100x_de"; exit 1; }
fi

log "A: SemLegBench A/B (3 reps, interleaved, 4 dirs incl 2M-vector leg)"
SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.SemLegBench /root/testdata/sf0.1 target/sf1x target/sf10x_de target/sf100x_de" \
  > target/r12_semleg.log 2>&1 || { echo "FAIL semleg"; tail -5 target/r12_semleg.log; exit 1; }
grep -oE '\{"metric":"sem_leg_medians".*' target/r12_semleg.log | tail -1 \
  > target/r12_semleg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r12_semleg.json'))
prev = json.load(open('BENCH_SEM_DECADE.json'))
legs = ['/root/testdata/sf0.1', 'target/sf1x', 'target/sf10x_de',
        'target/sf100x_de']
names = ['sf0.1', 'sf1x', 'sf10x', 'sf100x']
out = {"protocol": ("SemDeDup scale mode: cluster size held at ~625 "
  "(k = n/625), codebook fit on a max(4096, k)-vector sample, tau=0.35; "
  "SemLegBench 3 reps, dirs interleaved per rep, now including a 2M-vector "
  "sf100x_de leg (embeddings-only GenScale; k_trained < k there because "
  "copy-offset vec_ids are sparse above the copy-0 block — reported "
  "per-rep). Since round 12 the assignment is measured as an A/B on the "
  "same trained centroids: assign_flat (n*k evals) vs assign_twolevel "
  "(exact triangle-inequality group pruning over ceil(sqrt(k)) "
  "super-clusters, output provably identical — Round12Spec); fit_assign "
  "composes fit + whichever side the SHIPPED adaptive dispatch "
  "(n*k <= 4e8 -> flat) takes, comparable to the round-11 rows. pairs is "
  "the within-cluster cosine self-join (the linear term the sharding "
  "buys). round11_flat_assign preserves the pre-A/B readings."),
  "components": {}, "round11_flat_assign": prev.get("round11_flat_assign",
    prev.get("components"))}
for comp in ("fit", "assign_flat", "assign_twolevel", "fit_assign", "pairs"):
    rows = {}
    for l, nm in zip(legs, names):
        key = f"{l}#{comp}"
        if key in d["medians"]:
            rows[nm] = {"median": d["medians"][key],
                        "min": d["medians_min"][key],
                        "per_rep": d["per_rep"][key]}
    ordered = [nm for nm in names if nm in rows]
    exps = {}
    for a, b in zip(ordered, ordered[1:]):
        exps[f"exponent_{a}_to_{b}_median"] = round(
            math.log10(rows[b]["median"] / rows[a]["median"]), 3)
        exps[f"exponent_{a}_to_{b}_min"] = round(
            math.log10(rows[b]["min"] / rows[a]["min"]), 3)
    out["components"][comp] = {"legs": rows, **exps}
ab = {}
for nm in names:
    f_ = out["components"]["assign_flat"]["legs"].get(nm)
    t_ = out["components"].get("assign_twolevel", {}).get("legs", {}).get(nm)
    if f_ and t_:
        ab[nm] = {"flat_median": f_["median"], "twolevel_median": t_["median"],
                  "speedup_flat_over_twolevel": round(f_["median"] / t_["median"], 2)}
out["assign_ab"] = ab
json.dump(out, open('BENCH_SEM_DECADE.json','w'), indent=2)
print(json.dumps(ab))
PY

log "B: PmiLegBench zipf decade (5 reps, topV=4096)"
SPARK_GRAFT_REPS=5 SPARK_GRAFT_PMI_TOPV=4096 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PmiLegBench target/zipf50k target/zipf500k" \
  > target/r12_pmileg.log 2>&1 || { echo "FAIL pmileg"; tail -5 target/r12_pmileg.log; exit 1; }
grep -oE '\{"metric":"pmi_leg_medians".*' target/r12_pmileg.log | tail -1 \
  > target/r12_pmileg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r12_pmileg.json'))
lo, hi = 'target/zipf50k', 'target/zipf500k'
out = {"protocol": ("Vocabulary-BOUNDED PMI (TextAnalysis.pmi topV=4096, the "
  "histogram-derived df-level cap the q_text_pmi_capped gate pins at V=16) on "
  "the realistic Heaps/Zipf corpora of BENCH_ZIPF_DECADE.json; PmiLegBench 5 "
  "reps, dirs interleaved per rep; exponent = log10(hi/lo). The uncapped twin "
  "measured 0.854 median / 1.021 min in round 11 — the cap bounds the "
  "distinct-pair aggregation state at C(V,2) so the vocabulary^2 term is "
  "removed by construction."),
  "top_v": d["top_v"],
  "zipf50k_median": d["medians"][lo], "zipf500k_median": d["medians"][hi],
  "exponent_median_based": round(math.log10(d["medians"][hi]/d["medians"][lo]), 3),
  "exponent_min_based": round(math.log10(d["medians_min"][hi]/d["medians_min"][lo]), 3),
  "per_rep_50k": d["per_rep"][lo], "per_rep_500k": d["per_rep"][hi],
  "uncapped_round11": {"exponent_median_based": 0.854, "exponent_min_based": 1.021}}
json.dump(out, open('BENCH_PMI_CAPPED_ZIPF.json','w'), indent=2)
print(json.dumps({"pmi_capped": (out["exponent_median_based"], out["exponent_min_based"])}))
PY

if [ ! -d target/sf20x_docs/documents.parquet ]; then
  log "C: genscale sf20x documents-only (2 copies of sf10x_docs)"
  SPARK_DRIVER_MEM=64g sbt -batch \
    "runMain graft.GenScale target/sf10x_docs target/sf20x_docs 2 documents" \
    > target/r12_gen_sf20x.log 2>&1 || { echo "FAIL gen"; exit 1; }
fi
df -h / | tail -1

log "C: PairLegBench capped sf10x->sf20x (3 reps, budget 16/doc, interleaved)"
SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PairLegBench target/sf10x_docs target/sf20x_docs" \
  > target/r12_pairleg.log 2>&1 || { echo "FAIL pairleg"; tail -5 target/r12_pairleg.log; exit 1; }
df -h / | tail -1
grep -oE '\{"metric":"pair_leg_medians".*' target/r12_pairleg.log | tail -1 \
  > target/r12_pairleg.json
python3 - <<'PY'
import json, math
d = json.load(open('target/r12_pairleg.json'))
lo, hi = 'target/sf10x_docs', 'target/sf20x_docs'
span = math.log10(2)
out = {"protocol": ("Third-decade trend for the pair family in its CAPPED "
  "operating mode (pairBudgetPerDoc=16 on BOTH sides; PairLegBench 3 reps, "
  "dirs interleaved per rep; exponents normalized PER DECADE: "
  "log10(hi/lo)/log10(2)). Measured over sf10x -> sf20x (500k -> 1M docs) "
  "because BOTH larger-span attempts are measured disk-infeasible on this "
  "box: uncapped sf100x (round 10) and CAPPED sf50x (round 11 — rep-1 sf50x "
  "containment leg died ENOSPC after the sf10x legs completed at 73.6/39.0 s; "
  "log target/r11c_pairleg.log). The cap bounds candidate COUNT to 16*n_docs, "
  "but the verify stage's per-candidate shingle-set payload is ~10.3 GB "
  "transient per 500k docs and the sort-merge spill roughly doubles it — "
  "~100+ GB projected at 2.5M docs vs 78 GB free. On a cluster that payload "
  "is executor-local and parallelizes away."),
  "budget_per_doc": d["budget_per_doc"],
  "span_docs": "500k -> 1M (log10(2) of a decade)",
  "legs": {}}
for leg in ("containment_capped", "prefix_capped"):
    lm, hm = d["medians"][f"{lo}#{leg}"], d["medians"][f"{hi}#{leg}"]
    ln, hn = d["medians_min"][f"{lo}#{leg}"], d["medians_min"][f"{hi}#{leg}"]
    out["legs"][leg] = {
      "sf10x_median": lm, "sf20x_median": hm,
      "exponent_per_decade_median": round(math.log10(hm/lm) / span, 3),
      "exponent_per_decade_min": round(math.log10(hn/ln) / span, 3),
      "per_rep_sf10x": d["per_rep"][f"{lo}#{leg}"],
      "per_rep_sf20x": d["per_rep"][f"{hi}#{leg}"]}
json.dump(out, open('BENCH_SCALING_CAPPED_3RD.json','w'), indent=2)
print(json.dumps({k: (v["exponent_per_decade_median"], v["exponent_per_decade_min"])
                  for k, v in out["legs"].items()}))
PY

log "D: new-query decades sf0.1 -> sf1x (5 reps)"
NEWQ=q_dedup_prefix_capped,q_dedup_prefix_capped_recall,q_curation_dsir,q_mix_temperature,q_dedup_semantic,q_multimodal_pipeline,q_pretrain_capped,q_text_pmi_capped
for pair in "sf0.1:/root/testdata/sf0.1:16g" "sf1x:target/sf1x:48g"; do
  tag=${pair%%:*}; rest=${pair#*:}; dir=${rest%%:*}; mem=${rest##*:}
  log "D: bench $tag subset (5 reps)"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_ONLY=$NEWQ \
    sbt -batch "runMain graft.Bench" > target/r12_bench_$tag.log 2>&1 \
    || { echo "FAIL bench_$tag"; exit 1; }
  cp target/bench.json target/r12_bench_${tag}_final.json
done
python3 tools/scaling.py target/r12_bench_sf0.1_final.json \
  target/r12_bench_sf1x_final.json BENCH_SCALING_NEWQ_r12.json \
  sf0.1 sf1x 10
python3 -c "
import json; d=json.load(open('BENCH_SCALING_NEWQ_r12.json'))
print(json.dumps(d['log10_exponent'], indent=1))"
log "DONE"
