#!/usr/bin/env python3
"""Assemble round-18's committed artifacts from the campaign legs'
logs/medians (everything PARSED — no transcriptions; the r17 assembler's
hard-coded readings are the documented anti-pattern).

Inputs (target/):
  r18_widestage.log                pairstage probe on the widened corpus
  r18_autodispatch.{json,log}      pair A/B: fence default vs 0
  r18_autodispatch_attr.json       per-rep attribution
  r18_flagstage.{json,log}         flagship stage family at 1M / 2.5M
  r18_flagstage_attr.json
  r18_warm.json / r18_cold.json    query-family warm-up A/B
Outputs (repo root): BENCH_AUTODISPATCH_r18.json,
  BENCH_FLAGSHIP_STAGES_r18.json, BENCH_WARMUP_AB_r18.json

Each stage is skipped (with a note) if its inputs are missing, so the
assembler can run incrementally as legs land.
"""
import json, os, re, sys
from math import log10

T = "/root/repo/target"
R = "/root/repo"


def jline(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def rep_lines(log_path, family):
    out = []
    for line in open(log_path, errors="replace"):
        m = re.search(r'\{"leg_rep":.*\}', line)
        if not m:
            continue
        try:
            d = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if d.get("family") == family:
            out.append(d)
    return out


def probe_lines(log_path):
    stages, infos = [], []
    for line in open(log_path, errors="replace"):
        m = re.search(r'\{"probe_(stage|info)":.*\}', line)
        if not m:
            continue
        d = json.loads(m.group(0))
        (stages if "probe_stage" in d else infos).append(d)
    return stages, infos


def autodispatch():
    log = f"{T}/r18_widestage.log"
    if not os.path.exists(log):
        return print("skip autodispatch: no widestage log")
    stages, infos = probe_lines(log)
    est = next((d for d in infos if d.get("probe_info") == "estimates"), None)
    out = {
        "protocol": (
            "Auto bucketed-dispatch handoff at the DEFAULT fence (r17 "
            "verdict #2). Corpus: target/sfwide_docs — GenScale widen=8 "
            "over sf10x_docs x2 (1M docs, ~8x postings/doc), synthesized "
            "so the dispatch's own est32 exceeds the library-default "
            "1.5 GB fence on a corpus whose bucketed transient fits this "
            "box. pairstage probe supplies the dispatch's own size "
            "arithmetic and per-stage walls; the A/B interleaves fence="
            "default (the AUTO comparison selects bucketed: est32 > "
            "1.5e9) against fence=0 (bucketed PINNED) within each rep — "
            "identical rows per rep proves the handoff; Round18Spec pins "
            "the boundary comparison and plan shape at est32 +/- 1."),
        "pairstage": {
            "estimates": est,
            "est32_over_default_fence":
                round(est["est32"] / 1.5e9, 3) if est else None,
            "stages": {d["probe_stage"]: d["secs"] for d in stages},
            "info": [d for d in infos if d.get("probe_info") != "estimates"],
        },
    }
    ab_json = f"{T}/r18_autodispatch.json"
    if os.path.exists(ab_json) and os.path.getsize(ab_json) > 0:
        med = jline(ab_json)
        reps = rep_lines(f"{T}/r18_autodispatch.log", "pair")
        rows = {}
        for d in reps:
            rows.setdefault(d["leg"], []).append(d["rows"])
        legs = sorted(rows)
        out["ab"] = {
            "medians": med.get("medians"),
            "medians_min": med.get("medians_min"),
            "per_rep": med.get("per_rep"),
            "rows_per_rep": rows,
            "rows_identical_across_legs":
                len({tuple(v) for v in rows.values()}) == 1 and len(legs) >= 2,
        }
    if os.path.exists(f"{T}/r18_autodispatch_attr.json"):
        out["ab_attribution"] = json.load(
            open(f"{T}/r18_autodispatch_attr.json"))
    json.dump(out, open(f"{R}/BENCH_AUTODISPATCH_r18.json", "w"), indent=1)
    print("wrote BENCH_AUTODISPATCH_r18.json",
          {"est32": est and est["est32"],
           "rows_identical": out.get("ab", {}).get(
               "rows_identical_across_legs")})


def flagstage():
    med_path = f"{T}/r18_flagstage.json"
    if not (os.path.exists(med_path) and os.path.getsize(med_path) > 0):
        return print("skip flagstage: no medians")
    med = jline(med_path)
    medians = med["medians"]
    dirs = sorted({k.split("#")[0] for k in medians})
    stages = sorted({k.split("#")[1] for k in medians})
    if len(dirs) != 2:
        return print(f"skip flagstage: expected 2 dirs, got {dirs}")
    lo, hi = sorted(dirs, key=lambda d: medians.get(f"{d}#total", 0.0))
    decade = log10(2.5)  # 1M -> 2.5M docs
    table = {}
    for s in stages:
        tlo, thi = medians.get(f"{lo}#{s}"), medians.get(f"{hi}#{s}")
        if not tlo or not thi:
            continue
        table[s] = {
            "lo_med_s": tlo, "hi_med_s": thi,
            "ratio": round(thi / tlo, 3),
            "exponent_per_decade": round(log10(thi / tlo) / decade, 3),
            "hi_share": None,  # filled below
        }
    hi_total = sum(v["hi_med_s"] for s, v in table.items() if s != "total")
    for s, v in table.items():
        if s != "total":
            v["hi_share"] = round(v["hi_med_s"] / hi_total, 3)
    # the steepening driver: the stage with the largest contribution to
    # the hi-side EXCESS over linear scaling (hi - ratio_linear*lo)
    excess = {s: v["hi_med_s"] - 2.5 * v["lo_med_s"]
              for s, v in table.items() if s != "total"}
    out = {
        "protocol": (
            "Stage-wise attribution of the flagship curation composition "
            "at the fifth-rung decade (r17 verdict #3: wall exponent "
            "steepened 0.499 -> 0.92/decade between spans). LegBench "
            "'flagship' family: the PRODUCTION Flagship.curationPipeline "
            "run with a materializing StageProbe — per-seam persist + "
            "count + delta clock, so each stage's wall includes "
            "everything since the previous seam. Shipped adaptive "
            "dispatch, interleaved reps, medians. Attribution-mode "
            "caveat: seams are materialized, so 'total' reads above the "
            "query family's unprobed end-to-end; per-stage SHARES and "
            "exponents are the object here, not absolute walls."),
        "dirs": {"lo": lo, "hi": hi}, "docs": {"lo": 1000000, "hi": 2500000},
        "per_stage": table,
        "excess_over_linear_s": {k: round(v, 1) for k, v in excess.items()},
        "steepening_stage": max(excess, key=excess.get) if excess else None,
        "per_rep": med.get("per_rep"),
    }
    json.dump(out, open(f"{R}/BENCH_FLAGSHIP_STAGES_r18.json", "w"), indent=1)
    print("wrote BENCH_FLAGSHIP_STAGES_r18.json; steepening_stage =",
          out["steepening_stage"])


def warmup():
    w, c = f"{T}/r18_warm.json", f"{T}/r18_cold.json"
    if not (os.path.exists(w) and os.path.exists(c)):
        return print("skip warmup: legs missing")
    warm, cold = jline(w), jline(c)
    anchor_path = f"{R}/BENCH_ANCHOR_r18.json"
    full = {}
    if os.path.exists(anchor_path):
        full = {k: v["head"] for k, v in
                json.load(open(anchor_path))["per_query"].items()}
    qs = sorted({k.split("#")[1] for k in warm["medians"]})
    table = {}
    for q in qs:
        key = next(k for k in warm["medians"] if k.endswith("#" + q))
        wm, cm = warm["medians"][key], cold["medians"][key]
        fs = full.get(q)
        table[q] = {
            "subset_warm_med_s": wm, "subset_cold_med_s": cm,
            "full_surface_head_med_s": fs,
            "warm_over_full": round(wm / fs, 3) if fs else None,
            "cold_over_full": round(cm / fs, 3) if fs else None,
            "warm_per_rep": warm["per_rep"][key],
            "cold_per_rep": cold["per_rep"][key],
        }
    out = {
        "protocol": (
            "Warm-up A/B for subset bench mode (r17 verdict #4). Three "
            "untouched queries, 5 timed reps each at sf0.1, run twice in "
            "back-to-back sessions: default (one untimed warm-up pass "
            "before the timed reps) vs SPARK_GRAFT_WARMUP=0 (the "
            "historical JIT-cold protocol). full_surface_head is the "
            "same query's median from this round's close anchor (same "
            "code, same box session window). Done-criterion: warm subset "
            "medians within the same-boot noise band of full-surface "
            "medians; cold medians reproduce the documented 2-5x "
            "inflation."),
        "per_query": table,
    }
    json.dump(out, open(f"{R}/BENCH_WARMUP_AB_r18.json", "w"), indent=1)
    print("wrote BENCH_WARMUP_AB_r18.json",
          {q: (v["warm_over_full"], v["cold_over_full"])
           for q, v in table.items()})


if __name__ == "__main__":
    which = sys.argv[1:] or ["autodispatch", "flagstage", "warmup"]
    for w in which:
        {"autodispatch": autodispatch, "flagstage": flagstage,
         "warmup": warmup}[w]()
