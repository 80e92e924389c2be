#!/bin/bash
# Round-15 closing measurements (the two legs the first campaign run
# didn't reach before the bucketed-SMJ probe-sort problem was found and
# fixed — see PERF.md round 15):
#  (a) capped-pair wide span sf10x -> sf50x on the FIXED bucketed
#      verify path (SHJ build on the bucket layout + merge-count
#      intersections), SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0
#      -> BENCH_SCALING_CAPPED_3RD_WIDE.json
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

log "(a) capped-pair wide span on the FIXED bucketed verify path (3 reps)"
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
  "dispatch to the bucketed-sink form -- the per-doc SORTED hash-array frame "
  "is staged once through Bucketing.stageBucketed (one hash shuffle at "
  "write, one file per bucket) and BOTH verify joins consume it as SHUFFLED "
  "HASH joins building on the bucket layout: no exchange on the staged side, "
  "no sort ANYWHERE in the verify joins (SHJ needs only distribution -- the "
  "first, SMJ-shaped bucketed cut re-sorted the probe sides, and join 2's "
  "probe is the wide candidate-x-array intermediate: 370 s at 500k docs, "
  "~60 GB transient at 2.5M; plan-asserted in Round15Spec). Intersections "
  "are counted by the codegen'd intersect_count_i64 merge walk over the "
  "sorted arrays (round 15) rather than size(array_intersect). This is the "
  "no-broadcast-ceiling path a 100 TB corpus must run (the 1.5 GB broadcast "
  "fence clears ~5M docs; the library default still broadcasts below it -- "
  "fastest at these rungs). PairLegBench 3 reps, dirs interleaved, budget "
  "16/doc. Exponents normalized PER DECADE: log10(t_hi/t_lo)/log10(5). Min "
  "protocol included per the PERF.md pair-family drift note (same-boot "
  "broadcast-path anchor, r14 code, r14 protocol shape at sf10x: "
  "containment per-rep 98.7/36.5/59.8 -- the family's documented 3-5x rep "
  "spread; cross-boot absolute comparisons to the r14 block below carry "
  "that noise)."),
  "span_docs": "500k -> 2.5M", "budget_per_doc": 16,
  "verify_path": "bucketed_shj_merge_count",
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
    "protocol included. Code state: round-15 verify stage (sorted hash "
    "arrays + intersect_count_i64 merge walk; SHJ bucketed dispatch above "
    "the fence). At these sizes the hash-set estimate (<=0.5 GB) stays under "
    "the 1.5 GB fence so the flagship's containment stage runs the broadcast "
    "verify plan, now with merge-count intersections."),
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
log "CLOSE DONE"
