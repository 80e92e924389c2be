#!/bin/bash
# Second decade for the pair-heavy text families (carried from r7/r8
# verdicts): regenerate sf1x and sf10x documents-only corpora and bench
# the pair family on BOTH in the same session — comparing a fresh sf10x
# run against an earlier session's sf1x artifact would fold the
# documented ±15 % cross-artifact box drift into the exponents.
#
# Hardened per ADVICE r8:
#  - mkdir -p target (bash redirects don't create directories);
#  - rm -f target/bench.json before each bench and fail the script on a
#    bench error — Bench only writes bench.json on success, so a failed
#    run would otherwise silently copy the PREVIOUS sf's artifact and
#    scaling.py would emit bogus ~0 exponents from two identical files;
#  - verify each copied artifact's "sf" field names the expected dir.
set -u
cd /root/repo || exit 1
mkdir -p target
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PAIRQ=q_dedup_containment,q_dedup_containment_exact,q_dedup_ngram_jaccard,q_dedup_prefix_jaccard,q_dedup_substring

check_sf(){ # $1 = artifact, $2 = expected sf dir fragment
  grep -q "\"sf\"[^,}]*$2" "$1" || { echo "FAIL artifact $1 is not from $2"; exit 1; }
}

log "genscale sf1x (documents only, 10 copies)"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf1x 10 documents" \
  > target/r9_gen_sf1x.log 2>&1 || { echo "FAIL gen_sf1x"; exit 1; }

log "genscale sf10x (documents only, 100 copies)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.GenScale /root/testdata/sf0.1 target/sf10x 100 documents" \
  > target/r9_gen_sf10x.log 2>&1 || { echo "FAIL gen_sf10x"; exit 1; }

log "bench pair family sf1x (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf1x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r9_bench_sf1x.log 2>&1 \
  || { echo "FAIL bench_sf1x"; exit 1; }
check_sf target/bench.json sf1x
cp target/bench.json target/r9_bench_sf1x_pair.json

log "bench pair family sf10x (3 reps, 64g)"
rm -f target/bench.json
SPARK_GRAFT_SF_DIR=target/sf10x SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_ONLY=$PAIRQ \
  sbt -batch "runMain graft.Bench" > target/r9_bench_sf10x.log 2>&1 \
  || { echo "FAIL bench_sf10x"; exit 1; }
check_sf target/bench.json sf10x
cp target/bench.json target/r9_bench_sf10x_pair.json

log "scaling artifact"
python3 tools/scaling.py target/r9_bench_sf1x_pair.json \
  target/r9_bench_sf10x_pair.json BENCH_SCALING_sf10x.json \
  sf1x sf10x 10 > target/r9_scaling_sf10x.txt 2>&1
cat target/r9_scaling_sf10x.txt
log "DONE"
