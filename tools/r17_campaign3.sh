#!/bin/bash
# Round-17 campaign, part 3 — the sf100x octave, after part 2's (f)
# measured the single-phase 64-bit broadcast INFEASIBLE at 64 g heap
# (SparkException "Not enough memory to build and broadcast", rep 1,
# 4e9 leg; the default/two-phase leg completed 437 s — log:
# target/r17f_ab100x.log). At 5M docs the bucketed dispatch is also
# off-box (~2x sf50x's ~51 GB wide intermediate > ~78 GB free), so the
# two-phase 32-bit broadcast is the only dispatch that runs at sf100x
# on this box — the octave claim in its strongest form.
#  (i) retry the A/B at 100 g heap (the box has 125 G): if the b64
#      build fits there, we get the controlled 2-rep A/B; if it OOMs
#      again, the committed reading for b64 at sf100x is "infeasible
#      at any reasonable single-JVM sizing" and the default-leg reps
#      stand alone.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
CAMP=/root/repo/target/r17camp

log "(i) sf100x A/B retry at 100g heap: fences default vs 4e9, 2 reps, event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped SPARK_GRAFT_FENCES=default,4e9 \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=100g \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench pair /root/repo/target/sf100x_docs" \
  > /root/repo/target/r17i_ab100x_100g.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "A/B retry exited $RC:"; tail -6 /root/repo/target/r17i_ab100x_100g.log
  grep -oE '\{"leg_rep"[^}]*}' /root/repo/target/r17i_ab100x_100g.log || true
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r17i_ab100x_100g.log | tail -1 \
    > /root/repo/target/r17i_ab100x_100g.json
  python3 tools/attr_reps.py /root/repo/target/r17i_ab100x_100g.log $CAMP/target/eventlog \
    --json /root/repo/target/r17i_ab100x_100g_attr.json
fi
log "CAMPAIGN3 DONE"
