#!/bin/bash
# Round-11f: sf0.1 gate + decades for the five queries added this round
# (q_dedup_prefix_capped, q_dedup_prefix_capped_recall, q_curation_dsir,
# q_mix_temperature, q_dedup_semantic).
#  (a) subset Verify + compare at sf0.1 (the cap BITES at sf0.1 — cap 6
#      < max prefix-df 10 — so the capped semantics are hash-checked
#      where they actually lose pairs);
#  (b) same-shape 5-rep subset decades sf0.1 -> sf1x and sf1x -> sf10x
#      (documents-only dir) for the three scale-path queries.
# The recall gate is a self-audit (runs the exact twin on purpose —
# skipped at scale, same as the other recall gates); q_dedup_semantic's
# fixed k=8 is the oracle fixture — its scale mode (cluster size held
# constant) is measured by SemLegBench in r11g. The full-surface sf0.01
# Verify + specs ran separately this session (r11_fullverify /
# r11_specs2 logs) and again in r11e's determinism sweep.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
NEWQ=q_dedup_prefix_capped,q_dedup_prefix_capped_recall,q_curation_dsir,q_mix_temperature,q_dedup_semantic

log "subset Verify at sf0.1"
rm -rf target/verify_r11f_01
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 target/verify_r11f_01 $NEWQ" \
  > target/r11f_verify01.log 2>&1 || { echo "FAIL verify01"; exit 1; }
python3 tools/compare.py /root/testdata/sf0.1 target/verify_r11f_01 \
  > target/r11f_compare01.txt 2>&1
tail -3 target/r11f_compare01.txt

[ -d target/sf1x/documents.parquet ] || { echo "FAIL no sf1x"; exit 1; }
[ -d target/sf10x_docs/documents.parquet ] || { echo "FAIL no sf10x_docs"; exit 1; }

DECQ=q_dedup_prefix_capped,q_curation_dsir,q_mix_temperature
for pair in "sf0.1:/root/testdata/sf0.1:8g" "sf1x:target/sf1x:32g" "sf10x:target/sf10x_docs:64g"; do
  tag=${pair%%:*}; rest=${pair#*:}; dir=${rest%%:*}; mem=${rest##*:}
  log "bench $tag subset (5 reps)"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_ONLY=$DECQ \
    sbt -batch "runMain graft.Bench" > target/r11f_bench_$tag.log 2>&1 \
    || { echo "FAIL bench_$tag"; exit 1; }
  cp target/bench.json target/r11f_bench_${tag}_final.json
done

log "scaling decades"
python3 tools/scaling.py target/r11f_bench_sf0.1_final.json \
  target/r11f_bench_sf1x_final.json target/r11f_scaling_sf1x.json \
  sf0.1 sf1x 10
python3 tools/scaling.py target/r11f_bench_sf1x_final.json \
  target/r11f_bench_sf10x_final.json target/r11f_scaling_sf10x.json \
  sf1x sf10x 10
log "DONE"
