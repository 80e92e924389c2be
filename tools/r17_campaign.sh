#!/bin/bash
# Round-17 measurement campaign (r16 verdict #2/#3/#4 + #1's re-measure):
#  (0) regenerate the scale fixtures (fresh box: target/ was empty) —
#      sf10x_docs (500k docs), sf50x_docs (2.5M), sf10x_de/sf20x_de/
#      sf50x_de (docs+embeddings ladder rungs; 50x = 2.5M docs / 1M vecs)
#  (a) pairstage probe at sf50x_docs: production-stage timings + the
#      dispatch's OWN size estimates (est32/est64) proving where the
#      default 1.5 GB fence lands at 2.5M docs, + the verify under all
#      three dispatches one-shot
#  (b) the middle-octave A/B (verdict #2): containment_capped at
#      sf50x_docs, SPARK_GRAFT_FENCES=default,4e9 crossed and
#      interleaved within each of 3 reps, event-logged -> per-rep
#      attribution. default -> two-phase 32-bit broadcast (est32 ~1.4 GB
#      < 1.5 GB fence); 4e9 -> the r16 single-phase 64-bit broadcast
#      that needed the raised fence. Identical rows expected per rep.
#  (c) flagship-curation ladder 5th rung (verdict #3): 1M -> 2.5M docs
#      on the BUCKETED dispatch (fence 0), 3 reps interleaved,
#      event-logged -> attribution rows + wall & bytes exponents
#  (d) q_text_quality / q_corpus_drift 7-rep same-boot re-measure at
#      sf0.1 (verdict #1)
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
CAMP=/root/repo/target/r17camp

if [ ! -d $CAMP ]; then
  log "clone HEAD -> $CAMP + compile"
  git clone -q /root/repo $CAMP
  (cd $CAMP && sbt -batch compile > /root/repo/target/r17camp_compile.log 2>&1) \
    || { echo "FAIL camp compile"; tail -5 /root/repo/target/r17camp_compile.log; exit 1; }
fi

gen(){ # gen <src> <out> <copies> <tables>
  if [ -d "$2" ]; then echo "have $2"; return 0; fi
  (cd $CAMP && SPARK_DRIVER_MEM=48g sbt -batch \
    "runMain graft.GenScale $1 $2 $3 $4" \
    >> /root/repo/target/r17_gen.log 2>&1) \
    || { echo "FAIL gen $2"; tail -5 /root/repo/target/r17_gen.log; exit 1; }
  du -sh "$2"
}
log "(0) fixtures"
gen /root/testdata/sf0.1 /root/repo/target/sf10x_docs 100 documents
gen /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs 5 documents
gen /root/testdata/sf0.1 /root/repo/target/sf10x_de 100 documents,embeddings
gen /root/repo/target/sf10x_de /root/repo/target/sf20x_de 2 documents,embeddings
gen /root/repo/target/sf10x_de /root/repo/target/sf50x_de 5 documents,embeddings

log "(a) pairstage probe at sf50x_docs (production stages + estimates + 3-dispatch verify)"
(cd $CAMP && SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.LegBench pairstage /root/repo/target/sf50x_docs 16" \
  > /root/repo/target/r17a_pairstage.log 2>&1) \
  || { echo "FAIL pairstage"; tail -8 /root/repo/target/r17a_pairstage.log; }
grep -E '"probe_stage"|"probe_info"' /root/repo/target/r17a_pairstage.log \
  | tee /root/repo/target/r17a_pairstage.jsonl
df -h / | tail -1

log "(b) middle-octave A/B at sf50x: fences default vs 4e9, 3 reps, event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_LEGS=containment_capped SPARK_GRAFT_FENCES=default,4e9 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_PAIR_BUDGET=16 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench pair /root/repo/target/sf50x_docs" \
  > /root/repo/target/r17b_ab.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "A/B exited $RC:"; tail -10 /root/repo/target/r17b_ab.log
else
  grep -oE '\{"metric":"pair_leg_medians".*' /root/repo/target/r17b_ab.log | tail -1 \
    > /root/repo/target/r17b_ab.json
  python3 tools/attr_reps.py /root/repo/target/r17b_ab.log $CAMP/target/eventlog \
    --json /root/repo/target/r17b_ab_attr.json
fi

log "(c) flagship 1M -> 2.5M on bucketed dispatch, 3 reps, event-logged"
rm -rf $CAMP/target/eventlog
(cd $CAMP && SPARK_GRAFT_ONLY=q_flagship_curation SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_BROADCAST_BYTES=0 \
  SPARK_GRAFT_EVENTLOG_DIR=target/eventlog \
  sbt -batch "runMain graft.LegBench query /root/repo/target/sf20x_de /root/repo/target/sf50x_de" \
  > /root/repo/target/r17c_flagship.log 2>&1)
RC=$?
df -h / | tail -1
if [ $RC -ne 0 ]; then
  echo "flagship exited $RC:"; tail -10 /root/repo/target/r17c_flagship.log
else
  grep -oE '\{"metric":"leg_medians".*' /root/repo/target/r17c_flagship.log | tail -1 \
    > /root/repo/target/r17c_flagship.json
  python3 tools/attr_reps.py /root/repo/target/r17c_flagship.log $CAMP/target/eventlog \
    --json /root/repo/target/r17c_flagship_attr.json \
    --sizes sf20x_de=1000000,sf50x_de=2500000
fi

log "(d) q_text_quality / q_corpus_drift 7-rep re-measure at sf0.1"
(cd $CAMP && SPARK_GRAFT_ONLY=q_text_quality,q_corpus_drift SPARK_GRAFT_REPS=7 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Bench" \
  > /root/repo/target/r17d_remeasure.log 2>&1) \
  || { echo "FAIL remeasure"; tail -5 /root/repo/target/r17d_remeasure.log; }
cp $CAMP/target/bench.json /root/repo/target/r17d_remeasure.json
head -c 400 /root/repo/target/r17d_remeasure.json; echo
log "CAMPAIGN DONE"
