#!/bin/bash
# Round-16 measurement campaign (r15 verdict #2, #4, #5):
#  (a) verify-intermediate reduction, old (r15 close) vs new (HEAD,
#      32-bit screen + 64-bit confirm): PairVerifyDiag at 500k docs,
#      bucketed dispatch, event-logged; per-stage shuffle bytes parsed
#      by tools/eventlog_stages.py -> BENCH_VERIFY_I32.json
#  (b) flagship 4th rung on the BUCKETED dispatch (5 reps,
#      SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0)
#      -> BENCH_FLAGSHIP_DECADE.json new block
#  (c) capped-pair wide span sf10x -> sf50x, 5 reps, BOTH dispatches
#      pinned (broadcast=4e9 / bucketed=0), event-logged per rep for
#      variance attribution (tools/attr_reps.py)
#      -> BENCH_SCALING_CAPPED_WIDE_r16.json
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32

CAMP=/root/repo/target/r16camp
OLDC=/root/repo/target/r16old
PRE=${PRE_COMMIT:-b2bda26}

log "clone HEAD -> $CAMP ; clone $PRE -> $OLDC"
rm -rf $CAMP $OLDC
git clone -q /root/repo $CAMP
git clone -q /root/repo $OLDC && git -C $OLDC checkout -q $PRE
(cd $CAMP && sbt -batch compile > /root/repo/target/r16camp_compile.log 2>&1) \
  || { echo "FAIL camp compile"; exit 1; }
(cd $OLDC && sbt -batch compile > /root/repo/target/r16old_compile.log 2>&1) \
  || { echo "FAIL old compile"; exit 1; }

log "(a) intermediate: OLD single-phase bucketed verify @ sf10x_docs"
rm -rf /root/repo/target/eventlog; mkdir -p /root/repo/target/eventlog
(cd $OLDC && SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PairVerifyDiag /root/repo/target/sf10x_docs" \
  > /root/repo/target/r16a_old.log 2>&1) || { echo "FAIL old diag"; tail -5 /root/repo/target/r16a_old.log; exit 1; }
# old code hardcodes /root/repo/target/eventlog
python3 tools/eventlog_stages.py /root/repo/target/eventlog --top 8 \
  --json /root/repo/target/r16a_old_stages.json | tail -12

log "(a) intermediate: NEW two-phase bucketed verify @ sf10x_docs"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.PairVerifyDiag /root/repo/target/sf10x_docs" \
  > /root/repo/target/r16a_new.log 2>&1) || { echo "FAIL new diag"; tail -5 /root/repo/target/r16a_new.log; exit 1; }
python3 tools/eventlog_stages.py $CAMP/target/eventlog --top 8 \
  --json /root/repo/target/r16a_new_stages.json | tail -12
grep -hoE '\{"diag".*' /root/repo/target/r16a_old.log /root/repo/target/r16a_new.log

log "(b) flagship 4th rung, BUCKETED dispatch (5 reps)"
(cd $CAMP && SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=5 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 \
  sbt -batch "runMain graft.LegBench /root/repo/target/sf10x_de /root/repo/target/sf20x_de" \
  > /root/repo/target/r16b_flagship.log 2>&1) \
  || { echo "FAIL flagship legbench"; tail -5 /root/repo/target/r16b_flagship.log; exit 1; }
grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r16b_flagship.log | tail -1 \
  > /root/repo/target/r16b_flagship.json
echo "flagship bucketed medians:"; cat /root/repo/target/r16b_flagship.json | head -c 400; echo

log "(c) wide span 5 reps, dispatch=BUCKETED (pinned 0), event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped,prefix_capped SPARK_GRAFT_REPS=5 \
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

log "(c) wide span 5 reps, dispatch=BROADCAST (pinned 4e9), event-logged"
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

log "CAMPAIGN DONE"
