#!/bin/bash
# Round-15 leg (a) ONLY (leg (c) of r15_close.sh already landed in
# BENCH_FLAGSHIP_DECADE.json): capped-pair wide span sf10x -> sf50x on
# the FIXED bucketed verify path (SHJ build on the bucket layout +
# intersect_count_i64 merge-count), SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0
# -> BENCH_SCALING_CAPPED_3RD_WIDE.json (regenerated; r14
# broadcast-path numbers kept inline for comparison).
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
  exit 1
fi
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
log "(a) DONE"
