#!/bin/bash
# Round-10g: scaling decades for the two queries added after the r10d/e
# decade refreshes (q_dedup_span_remove, q_text_bm25). Subset runs are
# JIT-cold (SKILL.md), so exponents come from SAME-SHAPE subset pairs:
# the identical SPARK_GRAFT_ONLY set, 5 reps, at sf0.1 / sf1x / a
# documents-only sf10x. Run AFTER r10d (needs target/sf1x).
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
ONLY=q_dedup_span_remove,q_text_bm25

[ -d target/sf1x/documents.parquet ] || { echo "FAIL no sf1x (run r10d)"; exit 1; }

if [ ! -d target/sf10x_docs/documents.parquet ]; then
  log "genscale sf10x documents-only (100 copies of sf0.1)"
  SPARK_DRIVER_MEM=32g sbt -batch \
    "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x_docs 100 documents" \
    > target/r10g_gen_sf10x_docs.log 2>&1 || { echo "FAIL gen"; exit 1; }
fi

for pair in "sf0.1:/root/testdata/sf0.1:8g" "sf1x:target/sf1x:32g" "sf10x:target/sf10x_docs:64g"; do
  tag=${pair%%:*}; rest=${pair#*:}; dir=${rest%%:*}; mem=${rest##*:}
  log "bench $tag subset (5 reps)"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_ONLY=$ONLY \
    sbt -batch "runMain graft.Bench" > target/r10g_bench_$tag.log 2>&1 \
    || { echo "FAIL bench_$tag"; exit 1; }
  cp target/bench.json target/r10g_bench_${tag}_final.json
done

log "scaling decades"
python3 tools/scaling.py target/r10g_bench_sf0.1_final.json \
  target/r10g_bench_sf1x_final.json target/r10g_scaling_sf1x_new.json \
  sf0.1 sf1x 10
python3 tools/scaling.py target/r10g_bench_sf1x_final.json \
  target/r10g_bench_sf10x_final.json target/r10g_scaling_sf10x_new.json \
  sf1x sf10x 10
log "DONE"
