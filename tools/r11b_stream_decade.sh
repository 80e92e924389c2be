#!/bin/bash
# Round-11b: the streaming family's first measured decade (verdict #4).
# Three same-shape 5-rep subset Bench sessions — a near-zero replay
# CONTROL (16 events; zero would hit mergeSink's no-batch guard and
# measure an error path, not the floor), sf0.1, and sf1x — then the
# per-query MARGINAL cost (median minus control median) and its
# sf0.1 -> sf1x exponent. Separates the AvailableNow replay/state-store
# floor (a protocol constant that amortizes at scale) from the per-row
# cost that actually scales.
set -u
cd /root/repo || exit 1
log(){ echo "=== $(date +%T) $1 ==="; }
export SPARK_GRAFT_CPUS=32
STREAMQ=$(grep -oE 'Q\("q_stream_[a-z0-9_]+"' src/main/scala/graft/queries/*.scala | grep -oE 'q_stream_[a-z0-9_]+' | sort -u | paste -sd,)
echo "streaming queries: $STREAMQ"
[ -d target/sf1x/events.parquet ] || { echo "FAIL no sf1x"; exit 1; }

# control fixture: 16 events rows, schema byte-preserved via pyarrow;
# all other tables symlinked to sf0.1
if [ ! -e target/sf_ctrl/events.parquet ]; then
  log "build near-zero control fixture"
  mkdir -p target/sf_ctrl
  python3 - <<'PY'
import pyarrow.parquet as pq
t = pq.read_table('/root/testdata/sf0.1/events.parquet')
pq.write_table(t.slice(0, 16), 'target/sf_ctrl/events.parquet')
PY
  for t in customer orders lineitem nation region supplier part documents embeddings; do
    ln -sf /root/testdata/sf0.1/$t.parquet target/sf_ctrl/$t.parquet
  done
fi

for pair in "ctrl:target/sf_ctrl:8g" "sf0.1:/root/testdata/sf0.1:16g" "sf1x:target/sf1x:48g"; do
  tag=${pair%%:*}; rest=${pair#*:}; dir=${rest%%:*}; mem=${rest##*:}
  log "bench streaming family @ $tag (5 reps)"
  rm -f target/bench.json
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_REPS=5 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_ONLY=$STREAMQ \
    sbt -batch "runMain graft.Bench" > target/r11b_bench_$tag.log 2>&1 \
    || { echo "FAIL bench_$tag"; exit 1; }
  cp target/bench.json target/r11b_bench_${tag}_final.json
done

log "compose BENCH_STREAM_DECADE.json"
python3 - <<'PY'
import json, math, statistics
def med(xs): return statistics.median(xs) if xs else None
ctrl = json.load(open('target/r11b_bench_ctrl_final.json'))['per_rep']
lo   = json.load(open('target/r11b_bench_sf0.1_final.json'))['per_rep']
hi   = json.load(open('target/r11b_bench_sf1x_final.json'))['per_rep']
out = {"protocol": ("Streaming family decade with a near-zero replay control: "
  "5-rep subset Bench sessions at 16-event control / sf0.1 / sf1x (same shape, "
  "same warm-up pass); floor = control median (AvailableNow replay + state-store "
  "init, a protocol constant); marginal = median - floor; exponent = "
  "log10(marginal_sf1x / marginal_sf0.1). Marginals below 0.3 s are inside "
  "box noise and reported as 'floor_bound' instead of an exponent."),
  "queries": {}}
for q in sorted(lo):
    f, l, h = med(ctrl.get(q, [])), med(lo[q]), med(hi[q])
    ml, mh = l - f, h - f
    e = {"floor_sec": round(f,3), "sf0.1_median": round(l,3), "sf1x_median": round(h,3),
         "marginal_sf0.1": round(ml,3), "marginal_sf1x": round(mh,3)}
    if ml > 0.3 and mh > 0:
        e["marginal_exponent"] = round(math.log10(mh/ml), 3)
    else:
        e["verdict"] = "floor_bound"
    out["queries"][q] = e
exps = [v["marginal_exponent"] for v in out["queries"].values() if "marginal_exponent" in v]
out["summary"] = {"n_queries": len(out["queries"]),
  "n_floor_bound": sum(1 for v in out["queries"].values() if v.get("verdict") == "floor_bound"),
  "max_marginal_exponent": max(exps) if exps else None,
  "median_marginal_exponent": round(med(exps),3) if exps else None}
json.dump(out, open('BENCH_STREAM_DECADE.json','w'), indent=2)
print(json.dumps(out["summary"]))
for q,v in out["queries"].items(): print(q, v)
PY
log "DONE"
