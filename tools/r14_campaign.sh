#!/bin/bash
# Round-14 measurement campaign (verdict r13 mandates #2, #3, #4).
# Runs in a CLONE of the repo at HEAD (target/r14camp) so concurrent
# source edits in the working tree can't recompile mid-campaign:
#  (d) streaming family state-store A/B, RE-RUN with the fixed
#      empty-env-var handling (GraftSession now ignores an empty
#      SPARK_GRAFT_STATE_PROVIDER instead of classForName("")):
#      default HDFS provider vs RocksDB at sf0.1 AND sf1x, 5 reps
#      -> BENCH_STREAM_ROCKSDB_AB.json
#  (c) capped-pair third decade at the WIDER span sf10x -> sf50x
#      (500k -> 2.5M docs, log10(5) = 0.70 of a decade) on the
#      broadcast-verify path -> BENCH_SCALING_CAPPED_3RD_WIDE.json
#      (second-round mandate; df guards so ENOSPC is adjudicated)
#  (f) q_flagship_curation decade ladder sf0.1 -> sf1x -> sf10x_docs
#      (the largest bench line; per-stage exponents known, composed
#      one is not) -> BENCH_FLAGSHIP_DECADE.json
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

CAMP=/root/repo/target/r14camp
log "clone at HEAD -> $CAMP"
rm -rf $CAMP
git clone -q /root/repo $CAMP
cd $CAMP || exit 1
sbt -batch compile > /root/repo/target/r14camp_compile.log 2>&1 \
  || { echo "FAIL campaign compile"; exit 1; }

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
    > /root/repo/target/r14d_stream_${tag}_${prov}.log 2>&1 \
    || { echo "FAIL stream $tag/$prov"; tail -5 /root/repo/target/r14d_stream_${tag}_${prov}.log; exit 1; }
  cp target/bench.json /root/repo/target/r14d_stream_${tag}_${prov}.json
done
python3 - <<'PY'
import json
runs = {}
for tag in ('sf0.1', 'sf1x'):
    for prov in ('default', 'rocksdb'):
        runs[(tag, prov)] = json.load(open(f'/root/repo/target/r14d_stream_{tag}_{prov}.json'))
out = {"protocol": ("Streaming family state-store A/B (verdict r12 #6, completed "
  "round 14 after the r13 empty-env-var bug invalidated the default legs): the 10 "
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
  > /root/repo/target/r14c_pairleg.log 2>&1
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "pairleg exited $RC — adjudicate from the log tail:"
  tail -20 /root/repo/target/r14c_pairleg.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r14c_pairleg.log | tail -1 \
    > /root/repo/target/r14c_pairleg.json
  python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r14c_pairleg.json'))
lo, hi = '/root/repo/target/sf10x_docs', '/root/repo/target/sf50x_docs'
span = math.log10(5)
out = {"protocol": ("Capped-pair third decade at the WIDER span (verdict r12 #3, "
  "run round 14): sf10x -> sf50x (500k -> 2.5M docs, log10(5)=0.70 of a decade, "
  "3.5x the r12 500k->1M span) on the round-12 broadcast-verify path (hash-set "
  "side broadcasts under the fenced 1.5GB estimate; no SMJ spill). "
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

log "(f) flagship curation decade ladder (5 reps, dirs interleaved)"
# third rung is sf10x_de, NOT sf10x_docs: the curation flagship's
# SemDeDup stage reads the embeddings table, which only the _de
# fixture carries at the 500k-doc scale
SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.LegBench /root/testdata/sf0.1 /root/repo/target/sf1x /root/repo/target/sf10x_de" \
  > /root/repo/target/r14f_flagship.log 2>&1 \
  || { echo "FAIL flagship legbench"; tail -5 /root/repo/target/r14f_flagship.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r14f_flagship.log | tail -1 \
  > /root/repo/target/r14f_flagship.json
python3 - <<'PY'
import json, math
d = json.load(open('/root/repo/target/r14f_flagship.json'))
q = 'q_flagship_curation'
dirs = ['/root/testdata/sf0.1', '/root/repo/target/sf1x', '/root/repo/target/sf10x_de']
tags = ['sf0.1_5k', 'sf1x_50k', 'sf10x_500k']
out = {"protocol": ("q_flagship_curation decade ladder (verdict r13 #4): LegBench "
  "5 reps, dirs interleaved per rep, over 5k/50k/500k documents. The composed "
  "curation flagship: capped containment -> span gate -> LSH/CC -> SemDeDup "
  "(two-level-capable assignment) -> distilled gate (train-on-sample, "
  "score-corpus) -> hash packing, with localCheckpoint lineage cuts at the "
  "composition seams. Timing wraps construction + action, so the eager "
  "checkpoint stages and trainGate's 20 bounded collect rounds are all inside "
  "the measured window. Exponent = log10(t_hi/t_lo) per decade; stage-wise "
  "ceiling = max of the component exponents (capped pairs ~0.6, distill 0.59, "
  "sem ~0.5, packing ~0.3)."), "medians": {}, "per_rep": {}}
for dir_, tag in zip(dirs, tags):
    out["medians"][tag] = d["medians"][f"{dir_}#{q}"]
    out["per_rep"][tag] = d["per_rep"][f"{dir_}#{q}"]
m = out["medians"]
out["exponent_first_decade"] = round(math.log10(m['sf1x_50k']/m['sf0.1_5k']), 3)
out["exponent_second_decade"] = round(math.log10(m['sf10x_500k']/m['sf1x_50k']), 3)
json.dump(out, open('/root/repo/BENCH_FLAGSHIP_DECADE.json','w'), indent=2)
print(json.dumps({k: v for k, v in out.items() if k.startswith('exponent') or k == 'medians'}))
PY
log "CAMPAIGN DONE"
