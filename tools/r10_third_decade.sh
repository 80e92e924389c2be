#!/bin/bash
# Round-10 third decade: documents-only sf100x (5M docs, 1000x the
# sf0.1 fixture) spot check for the pair family. GenScale CHAINS from
# the sf10x output (10 more key-shifted, text-rewritten copies) — the
# per-copy transforms compose: within-copy pair structure is preserved
# at every level, cross-copy trigram overlap collapses, vocabulary
# keeps ~halving-sharing per level like a growing real corpus.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PAIRQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring

check_sf(){
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "genscale sf100x (documents only, 10 copies of sf10x)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale target/sf10x target/sf100x 10 documents" \
  > target/r10_gen_sf100x.log 2>&1 || { echo "FAIL gen_sf100x"; exit 1; }

log "bench pair family sf100x (3 reps, 96g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf100x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r10_bench_sf100x.log 2>&1 \
  || { echo "FAIL bench_sf100x"; exit 1; }
check_sf target/bench.json sf100x
cp target/bench.json target/r10_bench_sf100x_pair.json

log "scaling sf10x -> sf100x (pair family)"
python3 tools/scaling.py target/r10_bench_sf10x_ext2.json \
  target/r10_bench_sf100x_pair.json BENCH_SCALING_sf100x.json \
  sf10x sf100x 10 > target/r10_scaling_sf100x.txt 2>&1
cat target/r10_scaling_sf100x.txt
log "DONE"
