#!/bin/bash
# Round-13 measurement campaign (verdict r12 mandates #1a, #3, #4, #6).
# Runs in a CLONE of the repo at HEAD (target/r13camp) so concurrent
# source edits in the working tree can't recompile mid-campaign:
#  (a) q_quality_distilled decade ladder sf0.1 -> sf1x -> sf10x_docs
#      (the one operator without scaling evidence; expect
#      job-overhead-dominated near-0 first exponent, corpus-linear
#      second) -> BENCH_DISTILL_DECADE.json
#  (b) banded+capped PMI on the Zipf corpora (df-band 0.5 added this
#      round) -> BENCH_PMI_CAPPED_ZIPF.json (r12 topV-only numbers kept
#      inside for the A/B)
#  (d) streaming family state-store A/B: default HDFS provider vs
#      RocksDB at sf0.1 AND sf1x -> BENCH_STREAM_ROCKSDB_AB.json
#  (c) capped-pair third decade at the WIDER span sf10x -> sf50x
#      (500k -> 2.5M docs, log10(5) = 0.70 of a decade, 3.5x the r12
#      span) on the broadcast-verify path; runs LAST with df guards so
#      an ENOSPC is an adjudicated fixture answer, not a campaign kill
#      -> BENCH_SCALING_CAPPED_3RD_WIDE.json
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

CAMP=/root/repo/target/r13camp
log "clone at HEAD -> $CAMP"
rm -rf $CAMP
git clone -q /root/repo $CAMP
cd $CAMP || exit 1
sbt -batch compile > /root/repo/target/r13camp_compile.log 2>&1 \
  || { echo "FAIL campaign compile"; exit 1; }

log "(a) distilled decade ladder (5 reps, dirs interleaved)"
SPARK_GRAFT_ONLY=q_quality_distilled SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench /root/testdata/sf0.1 /root/repo/target/sf1x /root/repo/target/sf10x_docs" \
  > /root/repo/target/r13a_distill.log 2>&1 \
  || { echo "FAIL distill legbench"; tail -5 /root/repo/target/r13a_distill.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r13a_distill.log | tail -1 \
  > /root/repo/target/r13a_distill.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r13a_distill.json'))
q = 'q_quality_distilled'
dirs = ['/root/testdata/sf0.1', '/root/repo/target/sf1x', '/root/repo/target/sf10x_docs']
tags = ['sf0.1_5k', 'sf1x_50k', 'sf10x_500k']
out = {"protocol": ("q_quality_distilled decade ladder (verdict r12 #1a): LegBench "
  "5 reps, dirs interleaved per rep, over 5k/50k/500k documents. The round-13 "
  "code shape: features cached hash-partitioned by doc_id with the label folded "
  "in; each of 20 GD rounds is one map-only broadcast join + one dim-sized "
  "gradient reduce. Exponent = log10(t_hi/t_lo) per decade."), "medians": {}, "per_rep": {}}
for dir_, tag in zip(dirs, tags):
    out["medians"][tag] = d["medians"][f"{dir_}#{q}"]
    out["per_rep"][tag] = d["per_rep"][f"{dir_}#{q}"]
m = out["medians"]
out["exponent_first_decade"] = round(math.log10(m['sf1x_50k']/m['sf0.1_5k']), 3)
out["exponent_second_decade"] = round(math.log10(m['sf10x_500k']/m['sf1x_50k']), 3)
json.dump(out, open('/root/repo/BENCH_DISTILL_DECADE.json','w'), indent=2)
print(json.dumps({k: v for k, v in out.items() if k.startswith('exponent') or k == 'medians'}))
PY

log "(b) banded+capped PMI zipf decade (5 reps)"
SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PmiLegBench /root/repo/target/zipf50k /root/repo/target/zipf500k" \
  > /root/repo/target/r13b_pmi.log 2>&1 \
  || { echo "FAIL pmi legbench"; tail -5 /root/repo/target/r13b_pmi.log; exit 1; }
grep -oE '\{"metric":"pmi_leg_medians".*' /root/repo/target/r13b_pmi.log | tail -1 \
  > /root/repo/target/r13b_pmi.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r13b_pmi.json'))
old = json.load(open('/root/repo/BENCH_PMI_CAPPED_ZIPF.json'))
lo, hi = '/root/repo/target/zipf50k', '/root/repo/target/zipf500k'
lm, hm = d['medians'][lo], d['medians'][hi]
ln, hn = d['medians_min'][lo], d['medians_min'][hi]
out = {"protocol": ("Vocabulary-capped PMI (topV=4096) WITH the round-13 df-band "
  "prefilter (maxDfFrac=0.5: tokens in >half of all docs are dropped before "
  "pairing — they carry ~0 PMI but dominate the per-doc pair explode) on the "
  "GenZipf Heaps/Zipf corpora, 50k vs 500k docs; PmiLegBench 5 reps, dirs "
  "interleaved. Exponent = log10(hi/lo). The r12 topV-only numbers are kept "
  "under r12_topv_only for the A/B."),
  "top_v": 4096, "max_df_frac": 0.5,
  "zipf50k_median": lm, "zipf500k_median": hm,
  "exponent_median_based": round(math.log10(hm/lm), 3),
  "exponent_min_based": round(math.log10(hn/ln), 3),
  "per_rep_50k": d['per_rep'][lo], "per_rep_500k": d['per_rep'][hi],
  "r12_topv_only": old}
json.dump(out, open('/root/repo/BENCH_PMI_CAPPED_ZIPF.json','w'), indent=2)
print(json.dumps({"banded_exp_median": out["exponent_median_based"],
                  "banded_exp_min": out["exponent_min_based"]}))
PY

log "(d) streaming state-store A/B (5 reps x 2 providers x 2 sfs)"
STREAMQ=$(grep -oE 'Q\("q_stream_[a-z0-9_]+"' src/main/scala/graft/queries/*.scala | grep -oE 'q_stream_[a-z0-9_]+' | sort -u | paste -sd,)
echo "streaming queries: $STREAMQ"
ROCKS=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
for run in "sf0.1:/root/testdata/sf0.1:default:" "sf0.1:/root/testdata/sf0.1:rocksdb:$ROCKS" \
           "sf1x:/root/repo/target/sf1x:default:" "sf1x:/root/repo/target/sf1x:rocksdb:$ROCKS"; do
  tag=$(echo "$run" | cut -d: -f1); dir=$(echo "$run" | cut -d: -f2)
  prov=$(echo "$run" | cut -d: -f3); cls=$(echo "$run" | cut -d: -f4)
  log "  stream bench $tag/$prov"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_ONLY=$STREAMQ SPARK_GRAFT_STATE_PROVIDER=$cls \
    sbt -batch "runMain graft.Bench" \
    > /root/repo/target/r13d_stream_${tag}_${prov}.log 2>&1 \
    || { echo "FAIL stream $tag/$prov"; exit 1; }
  cp target/bench.json /root/repo/target/r13d_stream_${tag}_${prov}.json
done
python3 - <<'PY'
import json
runs = {}
for tag in ('sf0.1', 'sf1x'):
    for prov in ('default', 'rocksdb'):
        runs[(tag, prov)] = json.load(open(f'/root/repo/target/r13d_stream_{tag}_{prov}.json'))
out = {"protocol": ("Streaming family state-store A/B (verdict r12 #6): the 10 "
  "q_stream_* queries, 5-rep dedicated subset Bench sessions (the "
  "BENCH_STREAM_DECADE shape), default HDFSBackedStateStoreProvider vs "
  "RocksDBStateStoreProvider (set session-wide via SPARK_GRAFT_STATE_PROVIDER), "
  "at sf0.1 and sf1x. transformWithState forces RocksDB for itself in both "
  "modes (Spark 4 requires it)."), "queries": {}, "totals": {}, "errors": {}}
for tag in ('sf0.1', 'sf1x'):
    out["totals"][tag] = {p: runs[(tag, p)]["value"] for p in ('default', 'rocksdb')}
    out["errors"][tag] = {p: runs[(tag, p)].get("errors", {}) for p in ('default', 'rocksdb')}
qs = runs[('sf0.1', 'default')]["queries"].keys()
for q in qs:
    out["queries"][q] = {}
    for tag in ('sf0.1', 'sf1x'):
        d = runs[(tag, 'default')]["queries"].get(q)
        r = runs[(tag, 'rocksdb')]["queries"].get(q)
        out["queries"][q][tag] = {"default": d, "rocksdb": r,
          "ratio_rocks_over_default": round(r/d, 2) if d and r else None}
json.dump(out, open('/root/repo/BENCH_STREAM_ROCKSDB_AB.json','w'), indent=2)
print(json.dumps(out["totals"]))
PY

log "(c) capped-pair third decade, WIDER span sf10x -> sf50x (3 reps)"
df -h / | tail -1
SPARK_GRAFT_LEGS=containment_capped,prefix_capped SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_PAIR_BUDGET=16 \
  sbt -batch "runMain graft.PairLegBench /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs" \
  > /root/repo/target/r13c_pairleg.log 2>&1
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "pairleg exited $RC — adjudicate from the log tail:"
  tail -20 /root/repo/target/r13c_pairleg.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r13c_pairleg.log | tail -1 \
    > /root/repo/target/r13c_pairleg.json
  python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r13c_pairleg.json'))
lo, hi = '/root/repo/target/sf10x_docs', '/root/repo/target/sf50x_docs'
span = math.log10(5)
out = {"protocol": ("Capped-pair third decade at the WIDER span (verdict r12 #3): "
  "sf10x -> sf50x (500k -> 2.5M docs, log10(5)=0.70 of a decade, 3.5x the r12 "
  "500k->1M span) on the round-12 broadcast-verify path (hash-set side "
  "broadcasts under the fenced 1.5GB estimate; no SMJ spill). "
  "PairLegBench 3 reps, dirs interleaved, budget 16/doc. Exponents normalized "
  "PER DECADE: log10(t_hi/t_lo)/log10(5). Min-based protocol included per the "
  "PERF.md pair-family drift note."), "span_docs": "500k -> 2.5M",
  "budget_per_doc": 16, "legs": {}}
for leg in ('containment_capped', 'prefix_capped'):
    lm, hm = d['medians'][f'{lo}#{leg}'], d['medians'][f'{hi}#{leg}']
    ln, hn = d['medians_min'][f'{lo}#{leg}'], d['medians_min'][f'{hi}#{leg}']
    out['legs'][leg] = {
      "sf10x_median": lm, "sf50x_median": hm,
      "exponent_per_decade_median": round(math.log10(hm/lm)/span, 3),
      "exponent_per_decade_min": round(math.log10(hn/ln)/span, 3),
      "per_rep_sf10x": d['per_rep'][f'{lo}#{leg}'],
      "per_rep_sf50x": d['per_rep'][f'{hi}#{leg}']}
json.dump(out, open('/root/repo/BENCH_SCALING_CAPPED_3RD_WIDE.json','w'), indent=2)
print(json.dumps({l: (v['exponent_per_decade_median'], v['exponent_per_decade_min'])
                  for l, v in out['legs'].items()}))
PY
fi
log "CAMPAIGN DONE"
