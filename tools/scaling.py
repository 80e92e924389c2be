#!/usr/bin/env python3
"""Build a measured-scaling-decade artifact from two Bench runs.

Usage:
  python3 tools/scaling.py <lo_bench.json> <hi_bench.json> <out.json> \
      [lo_label] [hi_label] [scale_ratio]

Reads the complete on-disk Bench artifacts (medians + per-rep times),
joins on query name, and writes ratio + log10 exponent per query plus a
per-family rollup (median exponent over the family's queries). Queries
with no successful rep on either side are listed under "skipped".
"""
import sys, json, math, statistics

FAMILY_RULES = [
    ("streaming",   lambda q: q.startswith("q_stream_")),
    ("graph",       lambda q: q.startswith("q_graph_")),
    ("merge_cdc",   lambda q: q.startswith(("q_merge_", "q_scd2", "q_ivm", "q_snapshot"))),
    ("dedup",       lambda q: q.startswith("q_dedup_")),
    ("ann",         lambda q: q.startswith(("q_knn_", "q_pq_", "q_emb_", "q_kmeans"))),
    ("pipelines",   lambda q: q.startswith(("q_pretrain", "q_outbound", "q_flagship",
                                            "q_user360", "q_curation_pipeline"))),
    ("decontam",    lambda q: q.startswith("q_decontaminate")),
    ("text",        lambda q: q.startswith(("q_text_", "q_corpus", "q_token_histogram",
                                            "q_chunk"))),
    ("curation",    lambda q: q.startswith(("q_mix_", "q_sample_", "q_quality_",
                                            "q_pack_", "q_split", "q_source_cap"))),
    ("events_time", lambda q: q.startswith(("q_events_", "q_cohort", "q_funnel",
                                            "q_resample", "q_range_join", "q_asof"))),
    ("window",      lambda q: q.startswith(("q_window_", "q_w1", "q_w2", "q_lateral",
                                            "q_topk"))),
    ("agg",         lambda q: q.startswith(("q_agg_", "q_a1", "q_a3", "q_profile",
                                            "q_sketch", "q_token"))),
    ("join",        lambda q: q.startswith(("q_j", "q_skew", "q_bucketed", "q_typed",
                                            "q_sub_"))),
    ("source_sink", lambda q: q.startswith(("q_s", "q_zorder", "q_skip"))),
    ("relational",  lambda q: True),
]

def family(q):
    for name, rule in FAMILY_RULES:
        if rule(q):
            return name
    return "relational"

def median(xs):
    return statistics.median(xs) if xs else None

def main():
    lo_path, hi_path, out_path = sys.argv[1:4]
    lo_label = sys.argv[4] if len(sys.argv) > 4 else "lo"
    hi_label = sys.argv[5] if len(sys.argv) > 5 else "hi"
    ratio = float(sys.argv[6]) if len(sys.argv) > 6 else 10.0
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    lo_rep, hi_rep = lo["per_rep"], hi["per_rep"]
    common = sorted(set(lo_rep) & set(hi_rep))
    ratios, exps, exps_min, skipped = {}, {}, {}, []
    for q in common:
        ml, mh = median(lo_rep[q]), median(hi_rep[q])
        if not ml or not mh:
            skipped.append(q)
            continue
        r = mh / ml
        ratios[q] = round(r, 3)
        exps[q] = round(math.log10(r) / math.log10(ratio), 3)
        # min-based twin: on load-drifting boxes per-rep minima are the
        # steadier estimator (PERF.md rounds 9-10); medians stay headline
        exps_min[q] = round(
            math.log10(min(hi_rep[q]) / min(lo_rep[q])) / math.log10(ratio), 3)
    fams = {}
    for q, e in exps.items():
        fams.setdefault(family(q), []).append(e)
    fam_rollup = {f: {"n": len(es), "median_exponent": round(median(es), 3),
                      "max_exponent": round(max(es), 3)}
                  for f, es in sorted(fams.items())}
    out = {
        "protocol": (f"3-rep medians per query, rep-major; {lo_label} vs "
                     f"{hi_label} (GenScale synthetic, x{ratio:g} per decade); "
                     "exponent = log10(time ratio) / log10(scale ratio)"),
        "n_queries": len(exps),
        "skipped": skipped,
        "families": fam_rollup,
        "log10_exponent": exps,
        "log10_exponent_min": exps_min,
        f"ratio_{ratio:g}x": ratios,
        lo_label: {"total": lo.get("value"), "per_rep": {q: lo_rep[q] for q in common}},
        hi_label: {"total": hi.get("value"), "per_rep": {q: hi_rep[q] for q in common}},
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=False)
    print(f"wrote {out_path}: {len(exps)} queries, families:")
    for f, v in fam_rollup.items():
        print(f"  {f:12s} n={v['n']:3d} median={v['median_exponent']:+.3f} "
              f"max={v['max_exponent']:+.3f}")

if __name__ == "__main__":
    main()
