#!/bin/bash
# Regenerate the scale fixtures under /root/repo/target (the target dir
# was wiped between rounds; recipes match the r10g/r10j/r11c/r14 rungs):
#   sf1x       = GenScale sf0.1 x10, all tables     (50k docs)
#   sf10x_docs = GenScale sf0.1 x100, documents     (500k docs)
#   sf50x_docs = GenScale sf10x_docs x5, documents  (2.5M docs)
#   sf10x_de   = GenScale sf0.1 x100, documents+embeddings (500k/200k)
#   sf20x_de   = GenScale sf10x_de x2, documents+embeddings (1M/400k)
# Runs in a CLONE so the working tree stays free for sbt test.
set -u
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
CAMP=/root/repo/target/r15fix
rm -rf $CAMP
git clone -q /root/repo $CAMP
cd $CAMP || exit 1
sbt -batch compile > /root/repo/target/r15fix_compile.log 2>&1 \
  || { echo "FAIL fixture-clone compile"; exit 1; }
log "sf1x (all tables, 10x)"
sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 /root/repo/target/sf1x 10" \
  > /root/repo/target/r15fix_sf1x.log 2>&1 || { echo "FAIL sf1x"; exit 1; }
log "sf10x_docs (documents, 100x)"
sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 /root/repo/target/sf10x_docs 100 documents" \
  > /root/repo/target/r15fix_sf10x_docs.log 2>&1 || { echo "FAIL sf10x_docs"; exit 1; }
log "sf50x_docs (documents, 5x chain from sf10x_docs)"
sbt -batch "runMain graft.GenScale /root/repo/target/sf10x_docs /root/repo/target/sf50x_docs 5 documents" \
  > /root/repo/target/r15fix_sf50x_docs.log 2>&1 || { echo "FAIL sf50x_docs"; exit 1; }
log "sf10x_de (documents+embeddings, 100x)"
sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 /root/repo/target/sf10x_de 100 documents,embeddings" \
  > /root/repo/target/r15fix_sf10x_de.log 2>&1 || { echo "FAIL sf10x_de"; exit 1; }
log "sf20x_de (documents+embeddings, 2x chain from sf10x_de)"
sbt -batch "runMain graft.GenScale /root/repo/target/sf10x_de /root/repo/target/sf20x_de 2 documents,embeddings" \
  > /root/repo/target/r15fix_sf20x_de.log 2>&1 || { echo "FAIL sf20x_de"; exit 1; }
log "FIXTURES DONE"
