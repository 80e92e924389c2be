#!/bin/bash
# Round-16 campaign, part 2 (rescoped after part 1's stage (a) measured
# the bucketed dispatch at ~470 s/flagship-rep — a 5-rep bucketed
# flagship ladder alone would eat the round's remaining wall budget):
#  (b) flagship 4th rung, BUCKETED dispatch, 3 reps (verdict #5 asked
#      5; 3 is what fits the box's wall budget at these absolutes —
#      per-rep values are committed so the spread is visible)
#  (c1) capped-pair wide span sf10x -> sf50x, 5 reps, BROADCAST pinned
#       (4e9 — the sf50x hash-set estimate is ~2.7 GB, above the
#       library's 1.5 GB default fence), event-logged per rep
#  (c2) capped containment, BUCKETED pinned, sf10x + sf50x, 2 reps,
#       event-logged — the r15-infeasible sf50x bucketed rung, now
#       runnable on the halved intermediate (BENCH_VERIFY_I32.json)
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
export PATH=/root/miniconda/bin:$PATH
CAMP=/root/repo/target/r16camp   # part 1's HEAD clone, already compiled

log "(b) flagship 4th rung, BUCKETED dispatch (3 reps)"
(cd $CAMP && SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 \
  sbt -batch "runMain graft.LegBench /root/repo/target/sf10x_de /root/repo/target/sf20x_de" \
  > /root/repo/target/r16b_flagship.log 2>&1) \
  || { echo "FAIL flagship legbench"; tail -5 /root/repo/target/r16b_flagship.log; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r16b_flagship.log | tail -1 \
  > /root/repo/target/r16b_flagship.json
head -c 400 /root/repo/target/r16b_flagship.json; echo

log "(c1) wide span 5 reps, dispatch=BROADCAST (pinned 4e9), event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped,prefix_capped SPARK_GRAFT_REPS=5 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_PAIR_BUDGET=16 \
  SPARK_GRAFT_VERIFY_BROADCAST_BYTES=4e9 \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.PairLegBench /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs" \
  > /root/repo/target/r16c_broadcast.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "broadcast pairleg exited $RC:"; tail -10 /root/repo/target/r16c_broadcast.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r16c_broadcast.log | tail -1 \
    > /root/repo/target/r16c_broadcast.json
  python3 tools/attr_reps.py /root/repo/target/r16c_broadcast.log $CAMP/target/eventlog \
    --json /root/repo/target/r16c_broadcast_attr.json
fi

log "(c2) bucketed containment sf10x + sf50x, 2 reps, event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped SPARK_GRAFT_REPS=2 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_PAIR_BUDGET=16 \
  SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.PairLegBench /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs" \
  > /root/repo/target/r16c_bucketed.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "bucketed pairleg exited $RC:"; tail -10 /root/repo/target/r16c_bucketed.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r16c_bucketed.log | tail -1 \
    > /root/repo/target/r16c_bucketed.json
  python3 tools/attr_reps.py /root/repo/target/r16c_bucketed.log $CAMP/target/eventlog \
    --json /root/repo/target/r16c_bucketed_attr.json
fi
log "CAMPAIGN2 DONE"
