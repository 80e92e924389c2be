#!/bin/bash
# Round-15 measurement campaign (verdict r14 mandates #1, #2, #4, #6).
# Runs in a CLONE of the repo at HEAD (target/r15camp) so concurrent
# source edits in the working tree can't recompile mid-campaign:
#  (b) incremental-LSH cost split, now with the BUCKETED stored index
#      (the Dedup scaladoc claim, plan-asserted in Round15Spec):
#      IncLegBench parquet-vs-bucketed forms at 5k/50k/500k docs
#      -> BENCH_INCREMENTAL_SPLIT.json
#  (d) natural-vocabulary text leg: BM25 + boilerplate on Zipf/Heaps
#      corpora (GenZipf) vs the saturating-vocab fixture at matched doc
#      counts -> BENCH_TEXT_ZIPF.json
#  (a) capped-pair wide span sf10x -> sf50x (500k -> 2.5M docs) on the
#      new BUCKETED verify path (SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0)
#      -> BENCH_SCALING_CAPPED_3RD_WIDE.json (regenerated; keeps the
#      r14 broadcast-path numbers inline for comparison)
#  (c) flagship 4th rung re-rung at 5 reps (sf10x_de vs sf20x_de)
#      -> BENCH_FLAGSHIP_DECADE.json third_span refresh
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

CAMP=/root/repo/target/r15camp
log "clone at HEAD -> $CAMP"
rm -rf $CAMP
git clone -q /root/repo $CAMP
cd $CAMP || exit 1
sbt -batch compile > /root/repo/target/r15camp_compile.log 2>&1 \
  || { echo "FAIL campaign compile"; exit 1; }

log "(b) incremental split: parquet vs bucketed stored index (5 reps)"
SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.IncLegBench /root/testdata/sf0.1 /root/repo/target/sf1x /root/repo/target/sf10x_de" \
  > /root/repo/target/r15b_incleg.log 2>&1 \
  || { echo "FAIL incleg"; tail -5 /root/repo/target/r15b_incleg.log; exit 1; }
grep -oE '\{"metric":"inc_leg_medians".*' /root/repo/target/r15b_incleg.log | tail -1 \
  > /root/repo/target/r15b_incleg.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r15b_incleg.json'))
dirs = ['/root/testdata/sf0.1', '/root/repo/target/sf1x', '/root/repo/target/sf10x_de']
tags = ['sf0.1_5k', 'sf1x_50k', 'sf10x_500k']
out = {"protocol": ("Incremental LSH dedup, cost split (IncLegBench, 5 reps, dirs "
  "and index forms interleaved within each rep): the corpus band index "
  "(doc_id % 4 != 0) is built and staged ONCE per corpus in TWO forms -- plain "
  "parquet and the bucketed sink on the corpus-leg join key (band_idx, "
  "band_val), one file per bucket, per-bucket sorted -- the ingest-time cost, "
  "amortized over every later increment. The recurring leg times "
  "incrementalLshDedup(new batch, STORED index) per form: production pays only "
  "the batch leg per increment, plus an index append for the kept docs. The "
  "bucketed form's corpus leg joins with NO corpus-side exchange and no sort "
  "(plan-asserted in Round15Spec); only the day-sized batch's bands shuffle to "
  "the index's bucket layout."), "index_build": {}, "batch_medians": {},
  "batch_medians_min": {}, "batch_per_rep": {}}
for dir_, tag in zip(dirs, tags):
    for form in ('parquet', 'bucketed'):
        k = f"{dir_}#{form}"
        out["index_build"][f"{tag}#{form}"] = d["index_build"][k]
        out["batch_medians"][f"{tag}#{form}"] = d["medians"][k]
        out["batch_medians_min"][f"{tag}#{form}"] = d["medians_min"][k]
        out["batch_per_rep"][f"{tag}#{form}"] = d["per_rep"][k]
for form in ('parquet', 'bucketed'):
    m = out["batch_medians"]
    out[f"batch_exponent_first_decade_{form}"] = round(
        math.log10(m[f'sf1x_50k#{form}'] / m[f'sf0.1_5k#{form}']), 3)
    out[f"batch_exponent_second_decade_{form}"] = round(
        math.log10(m[f'sf10x_500k#{form}'] / m[f'sf1x_50k#{form}']), 3)
out["vs_in_query"] = ("At 500k docs the stored-index batch leg vs the in-query "
  "form (8.83 s, BENCH_SCALING_NEWQ_r14.json): the index build is the "
  "difference, paid once at ingest. The bucketed form additionally removes the "
  "corpus-side exchange+sort from every increment -- the ratio "
  "bucketed/parquet at each rung prices exactly that.")
json.dump(out, open('/root/repo/BENCH_INCREMENTAL_SPLIT.json', 'w'), indent=2)
print(json.dumps({k: v for k, v in out.items() if 'exponent' in k}))
print(json.dumps(out["batch_medians"]))
PY

log "(d) Zipf natural-vocabulary text leg (GenZipf 5k + 50k, 5 reps)"
sbt -batch "runMain graft.GenZipf target/zipf5k 5000" \
  > /root/repo/target/r15d_gen.log 2>&1 || { echo "FAIL genzipf5k"; exit 1; }
sbt -batch "runMain graft.GenZipf target/zipf50k 50000" \
  >> /root/repo/target/r15d_gen.log 2>&1 || { echo "FAIL genzipf50k"; exit 1; }
SPARK_GRAFT_ONLY=q_text_bm25,q_text_boilerplate SPARK_GRAFT_REPS=5 \
  SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.LegBench /root/testdata/sf0.1 $CAMP/target/zipf5k $CAMP/target/zipf50k" \
  > /root/repo/target/r15d_zipf.log 2>&1 \
  || { echo "FAIL zipf leg"; tail -5 /root/repo/target/r15d_zipf.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r15d_zipf.log | tail -1 \
  > /root/repo/target/r15d_zipf.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r15d_zipf.json'))
camp = '/root/repo/target/r15camp'
dirs = {'fixture_sf0.1_5k': '/root/testdata/sf0.1',
        'zipf_5k': f'{camp}/target/zipf5k',
        'zipf_50k': f'{camp}/target/zipf50k'}
out = {"protocol": ("Natural-vocabulary bench leg for the fixture-shape-bound "
  "text queries (verdict r14 #6): q_text_bm25 and q_text_boilerplate timed on "
  "the driver fixture (sf0.1, 5k docs, ~30-token saturating vocabulary where "
  "every term matches every doc) vs GenZipf corpora (Zipf rank law + Heaps "
  "vocabulary growth, deterministic xxhash64 token draws) at 5k and 50k docs. "
  "LegBench 5 reps, dirs interleaved. The zipf_5k/fixture ratio prices the "
  "fixture-shape artifact at matched doc count; zipf_50k/zipf_5k is the "
  "natural-vocab scaling decade."), "medians": {}, "medians_min": {},
  "per_rep": {}}
for q in ('q_text_bm25', 'q_text_boilerplate'):
    for tag, dir_ in dirs.items():
        k = f'{dir_}#{q}'
        out["medians"][f'{tag}#{q}'] = d["medians"][k]
        out["medians_min"][f'{tag}#{q}'] = d["medians_min"][k]
        out["per_rep"][f'{tag}#{q}'] = d["per_rep"][k]
    m = out["medians"]
    out[f'{q}_zipf_over_fixture_5k'] = round(
        m[f'zipf_5k#{q}'] / m[f'fixture_sf0.1_5k#{q}'], 3)
    out[f'{q}_zipf_decade_exponent'] = round(
        math.log10(m[f'zipf_50k#{q}'] / m[f'zipf_5k#{q}']), 3)
json.dump(out, open('/root/repo/BENCH_TEXT_ZIPF.json', 'w'), indent=2)
print(json.dumps({k: v for k, v in out.items()
                  if 'ratio' in k or 'exponent' in k or 'over' in k}))
PY

log "(a) capped-pair wide span on the BUCKETED verify path (3 reps)"
df -h / | tail -1
SPARK_GRAFT_LEGS=containment_capped,prefix_capped SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_PAIR_BUDGET=16 \
  SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 \
  sbt -batch "runMain graft.PairLegBench /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs" \
  > /root/repo/target/r15a_pairleg.log 2>&1
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "pairleg exited $RC — adjudicate from the log tail:"
  tail -20 /root/repo/target/r15a_pairleg.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r15a_pairleg.log | tail -1 \
    > /root/repo/target/r15a_pairleg.json
  python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r15a_pairleg.json'))
lo, hi = '/root/repo/target/sf10x_docs', '/root/repo/target/sf50x_docs'
span = math.log10(5)
out = {"protocol": ("Capped-pair wide span sf10x -> sf50x (500k -> 2.5M docs, "
  "log10(5)=0.70 of a decade) RE-MEASURED on the round-15 BUCKETED verify "
  "path (verdict r14 #1): SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 pins the "
  "dispatch to the bucketed-sink form -- the per-doc hash-set frame is staged "
  "once through Bucketing.stageBucketed (one hash shuffle at write, one file "
  "per bucket, per-bucket sorted) and BOTH verify joins read it with no "
  "exchange and no sort (plan-asserted in Round15Spec). This is the no-"
  "broadcast-ceiling path a 100 TB corpus must run (the 1.5 GB broadcast "
  "fence clears ~5M docs; beyond it the old fallback was the SMJ whose "
  "external sort was write-bandwidth-bound -- 53.8 GB spill at 1M docs, "
  "PERF.md round 12). PairLegBench 3 reps, dirs interleaved, budget 16/doc. "
  "Exponents normalized PER DECADE: log10(t_hi/t_lo)/log10(5). Min protocol "
  "included per the PERF.md pair-family drift note."),
  "span_docs": "500k -> 2.5M", "budget_per_doc": 16, "verify_path": "bucketed",
  "legs": {},
  "r14_broadcast_path_reference": {
    "containment_capped": {"sf10x_median": 30.025, "sf50x_median": 207.382,
      "exponent_per_decade_median": 1.201, "exponent_per_decade_min": 1.167},
    "prefix_capped": {"sf10x_median": 93.893, "sf50x_median": 213.283,
      "exponent_per_decade_median": 0.51, "exponent_per_decade_min": 0.923}}}
for leg in ('containment_capped', 'prefix_capped'):
    lm, hm = d['medians'][f'{lo}#{leg}'], d['medians'][f'{hi}#{leg}']
    ln, hn = d['medians_min'][f'{lo}#{leg}'], d['medians_min'][f'{hi}#{leg}']
    out['legs'][leg] = {
      "sf10x_median": lm, "sf50x_median": hm,
      "exponent_per_decade_median": round(math.log10(hm/lm)/span, 3),
      "exponent_per_decade_min": round(math.log10(hn/ln)/span, 3),
      "per_rep_sf10x": d['per_rep'][f'{lo}#{leg}'],
      "per_rep_sf50x": d['per_rep'][f'{hi}#{leg}']}
json.dump(out, open('/root/repo/BENCH_SCALING_CAPPED_3RD_WIDE.json', 'w'), indent=2)
print(json.dumps({l: (v['exponent_per_decade_median'], v['exponent_per_decade_min'])
                  for l, v in out['legs'].items()}))
PY
fi

log "(c) flagship 4th rung re-rung: sf10x_de vs sf20x_de (5 reps)"
SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench /root/repo/target/sf10x_de /root/repo/target/sf20x_de" \
  > /root/repo/target/r15c_flagship.log 2>&1 \
  || { echo "FAIL flagship legbench"; tail -5 /root/repo/target/r15c_flagship.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r15c_flagship.log | tail -1 \
  > /root/repo/target/r15c_flagship.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r15c_flagship.json'))
q = 'q_flagship_curation'
lo, hi = '/root/repo/target/sf10x_de', '/root/repo/target/sf20x_de'
span = math.log10(2)
base = json.load(open('/root/repo/BENCH_FLAGSHIP_DECADE.json'))
lm, hm = d['medians'][f'{lo}#{q}'], d['medians'][f'{hi}#{q}']
ln, hn = d['medians_min'][f'{lo}#{q}'], d['medians_min'][f'{hi}#{q}']
base['third_span_500k_to_1M'] = {
  "protocol": ("Fourth rung RE-RUNG round 15 at 5 reps interleaved (verdict "
    "r14 #4 -- the r14 reading used 3 reps against the documented 3-5x sf10x "
    "rep spread): sf10x_de (500k docs / 200k vecs) vs sf20x_de (1M docs / "
    "400k vecs), exponents normalized per decade over the log10(2) span, min "
    "protocol included. Code state: round-15 bucketed-verify dispatch in the "
    "library; at these sizes the hash-set estimate (<=0.5 GB) stays under "
    "the 1.5 GB fence so the flagship's containment stage runs the same "
    "broadcast-verify plan as r14 -- this rung isolates rep-count, not the "
    "dispatch change."),
  "sf10x_median": lm, "sf20x_median": hm,
  "sf10x_min": ln, "sf20x_min": hn,
  "exponent_per_decade_median": round(math.log10(hm/lm)/span, 3),
  "exponent_per_decade_min": round(math.log10(hn/ln)/span, 3),
  "per_rep_sf10x": d['per_rep'][f'{lo}#{q}'],
  "per_rep_sf20x": d['per_rep'][f'{hi}#{q}'],
  "r14_3rep_reference": {"exponent_per_decade_median": 1.175,
    "exponent_per_decade_min": 1.073}}
json.dump(base, open('/root/repo/BENCH_FLAGSHIP_DECADE.json', 'w'), indent=2)
print(json.dumps(base['third_span_500k_to_1M'], default=str)[:400])
PY
log "CAMPAIGN DONE"
