#!/bin/bash
# Round-16 close — the DRIFT-PROOF protocol (r15 verdict #1, now
# recorded in BASELINE.md): every close runs the full bench twice in
# the SAME BOOT — once on the previous round's close commit, once on
# HEAD — and commits both per-query maps plus ratios as
# BENCH_ANCHOR_r16.json. Raw cross-round totals are drift-confounded
# (the box moved 1.3-1.4x inside round 15 alone); the anchor artifact
# is the machine-checkable rebuttal.
#  (a) paired same-boot bench: PRE ($PRE_COMMIT, default r15 close)
#      then HEAD, 3 reps each, full surface at sf0.1
#      -> BENCH_ANCHOR_r16.json + BENCH_MEDIANS_sf0.1.json (HEAD copy)
#  (b) determinism sweep: two Verify runs at sf0.01, byte diff
#      -> DETERMINISM_r16.txt
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
PRE=${PRE_COMMIT:-b2bda26}

NEWC=/root/repo/target/r16close
OLDC=/root/repo/target/r16preclose
log "clone HEAD -> $NEWC ; clone $PRE -> $OLDC"
rm -rf $NEWC $OLDC
git clone -q /root/repo $NEWC
git clone -q /root/repo $OLDC && git -C $OLDC checkout -q $PRE
(cd $NEWC && sbt -batch compile > /root/repo/target/r16close_compile.log 2>&1) \
  || { echo "FAIL head compile"; exit 1; }
(cd $OLDC && sbt -batch compile > /root/repo/target/r16pre_compile.log 2>&1) \
  || { echo "FAIL pre compile"; exit 1; }

log "(a1) anchor bench: PRE ($PRE) full surface, 3 reps, sf0.1"
(cd $OLDC && SPARK_GRAFT_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.Bench" \
  > /root/repo/target/r16_close_bench_pre.log 2>&1) \
  || { echo "FAIL pre bench"; tail -5 /root/repo/target/r16_close_bench_pre.log; exit 1; }

log "(a2) anchor bench: HEAD full surface, 3 reps, sf0.1"
(cd $NEWC && SPARK_GRAFT_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.Bench" \
  > /root/repo/target/r16_close_bench_head.log 2>&1) \
  || { echo "FAIL head bench"; tail -5 /root/repo/target/r16_close_bench_head.log; exit 1; }

cp $NEWC/target/bench.json /root/repo/BENCH_MEDIANS_sf0.1.json
python3 - "$PRE" <<'PY'
import json, statistics, subprocess, sys
pre_commit = sys.argv[1]
head = json.load(open('/root/repo/target/r16close/target/bench.json'))
pre = json.load(open('/root/repo/target/r16preclose/target/bench.json'))
hq, pq = head['queries'], pre['queries']
common = sorted(k for k in hq if k in pq and hq[k] and pq[k])
ratios = {k: round(hq[k] / pq[k], 4) for k in common}
out = {
  "protocol": ("SAME-BOOT paired anchor (BASELINE.md): the previous round's "
    "close commit and HEAD, each a full-surface 3-rep median bench at sf0.1 "
    "in its own clean clone, run back-to-back in one session. The suite "
    "median ratio is the round's performance delta; raw BENCH_r{N} vs "
    "BENCH_r{N-1} totals are drift-confounded and rebutted by this artifact."),
  "pre_commit": pre_commit,
  "head_commit": subprocess.check_output(
    ['git', '-C', '/root/repo', 'rev-parse', '--short', 'HEAD']).decode().strip(),
  "pre_total_s": round(pre['value'], 1), "head_total_s": round(head['value'], 1),
  "n_common": len(common),
  "suite_median_ratio": round(statistics.median(ratios.values()), 4),
  "suite_total_ratio": round(sum(hq[k] for k in common) / sum(pq[k] for k in common), 4),
  "pre_n_errors": pre['n_errors'], "head_n_errors": head['n_errors'],
  "per_query": {k: {"pre": round(pq[k], 3), "head": round(hq[k], 3),
                    "ratio": ratios[k]} for k in common},
  "head_only": sorted(k for k in hq if k not in pq),
  "pre_only": sorted(k for k in pq if k not in hq),
}
json.dump(out, open('/root/repo/BENCH_ANCHOR_r16.json', 'w'), indent=1)
worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
print(json.dumps({"pre_total": out["pre_total_s"], "head_total": out["head_total_s"],
  "suite_median_ratio": out["suite_median_ratio"],
  "suite_total_ratio": out["suite_total_ratio"], "worst5": worst}))
PY

log "(b) determinism: two Verify runs at sf0.01 + byte diff"
(cd $NEWC && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/det_a" \
  > /root/repo/target/r16_det_a.log 2>&1) || { echo "FAIL det A"; exit 1; }
(cd $NEWC && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/det_b" \
  > /root/repo/target/r16_det_b.log 2>&1) || { echo "FAIL det B"; exit 1; }
python3 /root/repo/tools/determinism.py /root/repo/target/det_a /root/repo/target/det_b \
  > /root/repo/DETERMINISM_r16.txt 2>&1
tail -3 /root/repo/DETERMINISM_r16.txt
log "CLOSE DONE"
