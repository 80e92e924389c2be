#!/bin/bash
# Round-17 campaign, part 2 — the REAL middle-octave A/B.
#
# Part 1's pairstage probe at sf50x printed the dispatch's OWN size
# arithmetic on the actual corpus: est32 = 0.64 GB, est64 = 1.16 GB.
# r16's protocol prose claimed "~2.7 GB" for the sf50x 64-bit hash-set
# build — an extrapolation never checked against the dispatch's
# estimate; the measured value sits UNDER the 1.5 GB default fence, so
# at 2.5M docs the default dispatch already broadcasts the 64-bit frame
# and part 1's default-vs-4e9 A/B is an A/A (same dispatch both legs —
# kept as same-dispatch rep-noise calibration). The octave where the
# two-phase 32-bit broadcast engages on DEFAULT settings is
# est64 > 1.5e9 > est32: ~3.3M to ~6.5M docs at this corpus's ~52
# hashed shingles/doc. sf100x (5M docs) lands mid-octave:
# est64 ~2.3 GB, est32 ~1.3 GB.
#  (e) gen sf100x_docs (5M docs, documents only)
#  (f) A/B at sf100x: SPARK_GRAFT_FENCES=default,4e9 — default takes
#      the two-phase 32-bit broadcast (screen on half-size sets +
#      64-bit confirm on survivors), 4e9 takes the r16 single-phase
#      64-bit broadcast. 3 reps interleaved, event-logged, per-rep
#      attribution. Identical rows expected on every rep.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
CAMP=/root/repo/target/r17camp

log "(e) gen sf100x_docs"
if [ ! -d /root/repo/target/sf100x_docs ]; then
  (cd $CAMP && SPARK_DRIVER_MEM=48g sbt -batch \
    "runMain graft.GenScale /root/repo/target/sf10x_docs /root/repo/target/sf100x_docs 10 documents" \
    >> /root/repo/target/r17_gen.log 2>&1) \
    || { echo "FAIL gen sf100x"; tail -5 /root/repo/target/r17_gen.log; exit 1; }
fi
du -sh /root/repo/target/sf100x_docs

log "(f) middle-octave A/B at sf100x: fences default vs 4e9, 3 reps, event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped SPARK_GRAFT_FENCES=default,4e9 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench pair /root/repo/target/sf100x_docs" \
  > /root/repo/target/r17f_ab100x.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "A/B exited $RC:"; tail -10 /root/repo/target/r17f_ab100x.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r17f_ab100x.log | tail -1 \
    > /root/repo/target/r17f_ab100x.json
  python3 tools/attr_reps.py /root/repo/target/r17f_ab100x.log $CAMP/target/eventlog \
    --json /root/repo/target/r17f_ab100x_attr.json
fi
log "(g) same-corpus dispatch A/B at sf50x: fence 0.9e9 (-> two-phase b32) vs 4e9 (-> single-phase b64), 3 reps"
# The one-shot probe read b32-two-phase 2.1x FASTER than b64 even below
# the fence (51.8 vs 111.2 s) — but single shots on this box are
# order/cache-confounded. est32=0.64 GB < 0.9e9 < est64=1.16 GB, so the
# 0.9e9 leg takes the two-phase broadcast on the SAME corpus the 4e9
# leg broadcasts 64-bit. If the interleaved reps confirm, the fence
# default deserves revisiting in a future round (prefer the two-phase
# once the 64-bit build clears some absolute size).
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped SPARK_GRAFT_FENCES=0.9e9,4e9 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench pair /root/repo/target/sf50x_docs" \
  > /root/repo/target/r17g_ab50x_dispatch.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "dispatch A/B exited $RC:"; tail -10 /root/repo/target/r17g_ab50x_dispatch.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r17g_ab50x_dispatch.log | tail -1 \
    > /root/repo/target/r17g_ab50x_dispatch.json
  python3 tools/attr_reps.py /root/repo/target/r17g_ab50x_dispatch.log $CAMP/target/eventlog \
    --json /root/repo/target/r17g_ab50x_dispatch_attr.json
fi
log "(h) flagship 1M -> 2.5M on the SHIPPED adaptive dispatch, 3 reps, event-logged"
# Part 1's (c) pinned the bucketed dispatch (fence 0) and died ENOSPC
# on the first sf50x_de rep: the 7-stage composition stacks the
# bucketed containment's ~51 GB wide intermediate (r16) on top of the
# other stages' shuffles and checkpoint blocks inside one job chain —
# over the box's ~79 GB transient budget. That ENOSPC is itself the
# committed reading for the pinned-bucketed rung (target/
# r17c_flagship.log). The SHIPPED dispatch at this size broadcasts
# (est64 = 1.16 GB < 1.5 GB fence), so the deployment-realistic rung
# is the default-fence one measured here.
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench query /root/repo/target/sf20x_de /root/repo/target/sf50x_de" \
  > /root/repo/target/r17h_flagship_default.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "flagship default exited $RC:"; tail -10 /root/repo/target/r17h_flagship_default.log
else
  grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r17h_flagship_default.log | tail -1 \
    > /root/repo/target/r17h_flagship_default.json
  python3 tools/attr_reps.py /root/repo/target/r17h_flagship_default.log $CAMP/target/eventlog \
    --json /root/repo/target/r17h_flagship_default_attr.json \
    --sizes sf20x_de=1000000,sf50x_de=2500000
fi
log "CAMPAIGN2 DONE"
