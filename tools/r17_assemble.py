#!/usr/bin/env python3
"""Assemble round-17's committed artifacts from the campaign logs:

 - BENCH_VERIFY_B32_r17.json: the two-phase BROADCAST verify (middle
   octave) adjudication — the pairstage probe's production-stage table
   and dispatch estimates at sf50x, the sf50x default-vs-4e9 A/A
   (same-dispatch noise calibration + the estimate-correction witness),
   the sf100x default-vs-4e9 A/B (the octave where the default fence
   actually takes the two-phase path), and the same-corpus sf50x
   b32-vs-b64 dispatch A/B.
 - BENCH_FLAGSHIP_DECADE.json: appends the fifth rung (1M -> 2.5M docs,
   bucketed dispatch) with per-rep attribution rows and wall+bytes
   exponents.

Inputs are the target/r17*.log/json files r17_campaign{,2}.sh leave
behind; reruns are idempotent.
"""
import json, re, os
from statistics import median

T = "/root/repo/target"


def jline(path, key):
    """Last JSON object on any line of `path` containing `key`."""
    out = None
    for line in open(path, errors="replace"):
        if key in line:
            m = re.search(r'\{.*\}', line)
            if m:
                try:
                    out = json.loads(m.group(0))
                except json.JSONDecodeError:
                    pass
    return out


def probe_rows(path):
    rows = []
    for line in open(path, errors="replace"):
        m = re.search(r'\{"probe_(stage|info)".*\}', line)
        if m:
            rows.append(json.loads(m.group(0)))
    return rows


def leg_summary(metrics_json, attr_json):
    m = json.load(open(metrics_json)) if metrics_json.endswith(".json") \
        else jline(metrics_json, '"metric"')
    attr = json.load(open(attr_json)) if os.path.exists(attr_json) else []
    if isinstance(attr, dict):
        attr = attr.get("reps", [])
    return {"medians": m["medians"], "medians_min": m["medians_min"],
            "per_rep": m["per_rep"], "attribution": attr}


def main():
    # ---- BENCH_VERIFY_B32_r17.json
    probe = probe_rows(f"{T}/r17a_pairstage.jsonl")
    est = next(r for r in probe if r.get("probe_info") == "estimates")
    stages = {r["probe_stage"]: r["secs"] for r in probe if "probe_stage" in r}
    npairs = {r["dispatch"]: r["value"] for r in probe
              if r.get("probe_info") == "n_pairs"}
    out = {
        "protocol": (
            "Round-17 adjudication of the two-phase BROADCAST verify (the "
            "middle octave of Dedup.verifiedCommon's three-way dispatch: "
            "broadcast the 32-bit truncated hash sets for an "
            "overcount-or-equal screen, then confirm survivors against the "
            "64-bit sets of survivor docs only). CORRECTION to the r16 "
            "protocol prose: the claimed '~2.7 GB' sf50x 64-bit build was an "
            "unchecked extrapolation; the dispatch's own arithmetic on the "
            "actual corpus (probe 'estimates' row, rows*48 + postings*8) "
            "gives est64 = 1.162 GB — UNDER the 1.5 GB default fence. At "
            "~52 hashed shingles/doc the middle octave therefore engages on "
            "default settings between ~3.3M and ~6.5M docs, so the octave "
            "A/B runs at sf100x (5M docs), with sf50x supplying (i) a "
            "same-dispatch A/A noise calibration (default vs 4e9, both "
            "single-phase 64-bit broadcast) and (ii) a fence-pinned "
            "same-corpus dispatch A/B (0.9e9 -> two-phase b32 vs 4e9 -> "
            "single-phase b64). All legs: containmentPairsCapped, threshold "
            "0.5, budget 16/doc, 3 reps interleaved within each rep "
            "(LegBench pair, SPARK_GRAFT_FENCES), event-logged with per-rep "
            "attribution. Identical output rows on every rep of every leg "
            "is part of the claim (callers re-apply the exact gate on the "
            "64-bit n_common)."),
        "sf50x_probe": {
            "docs": 2500000, "est32_bytes": est["est32"],
            "est64_bytes": est["est64"],
            "stage_secs": stages, "n_pairs_by_dispatch": npairs,
            "note": ("one-shot production-stage table (LegBench pairstage "
                     "— calls cappedCandidateStages/docHashSets/"
                     "verifiedCommon directly); single shots on this box "
                     "are order/cache-confounded, the 3-rep legs below are "
                     "the adjudication")},
    }
    if os.path.exists(f"{T}/r17b_ab.json"):
        out["sf50x_default_vs_4e9_AA"] = leg_summary(
            f"{T}/r17b_ab.json", f"{T}/r17b_ab_attr.json")
        out["sf50x_default_vs_4e9_AA"]["reading"] = (
            "A/A by construction (est64 1.16 GB < both fences -> same "
            "single-phase 64-bit broadcast): medians within noise, "
            "identical rows and identical shuffle bytes every rep — the "
            "same-dispatch noise band that brackets the A/Bs below.")
    if os.path.exists(f"{T}/r17g_ab50x_dispatch.json"):
        out["sf50x_b32_vs_b64_same_corpus"] = leg_summary(
            f"{T}/r17g_ab50x_dispatch.json", f"{T}/r17g_ab50x_dispatch_attr.json")
    # sf100x: the 64 g attempt is the infeasibility reading (the 4e9 /
    # single-phase-64-bit leg died in Spark's broadcast build on rep 1
    # after the default / two-phase leg completed 437.0 s); the 100 g
    # retry is the controlled A/B.
    # NOTE: the numeric fields below are ONE-TIME TRANSCRIPTIONS from
    # target/r17f_ab100x.log as read during round 17 — they are NOT
    # parsed from logs, so rerunning this assembler after new
    # measurements re-emits the round-17 readings verbatim. Treat this
    # block as the archival record of that run, not a live reading.
    out["sf100x_64g_attempt"] = {
        "docs": 5000000, "heap": "64g",
        "default_leg_rep1_s": 437.043, "default_leg_rows": 257191,
        "b64_leg": ("FAILED: org.apache.spark.SparkException: Not enough "
                    "memory to build and broadcast the table to all worker "
                    "nodes (log: target/r17f_ab100x.log) — at est64 "
                    "~2.3 GB the single-phase 64-bit broadcast no longer "
                    "builds at a 64 GB heap, while the est32 ~1.3 GB "
                    "two-phase leg runs; the bucketed dispatch at 5M docs "
                    "needs ~2x sf50x's ~51 GB transient, over this box's "
                    "~78 GB free. The two-phase broadcast is the only "
                    "dispatch that completes sf100x on this box.")}
    if os.path.exists(f"{T}/r17i_ab100x_100g.json"):
        out["sf100x_default_vs_4e9_AB_100g"] = leg_summary(
            f"{T}/r17i_ab100x_100g.json", f"{T}/r17i_ab100x_100g_attr.json")
        out["sf100x_default_vs_4e9_AB_100g"]["reading"] = (
            "2 reps at a 100 g heap, where the 64-bit build fits: "
            "identical 257,191 rows and near-identical shuffle bytes "
            "(15.918 vs 15.915 GB — the 3 MB delta is the survivor "
            "screen) on every rep; walls bracket each other inside the "
            "documented drift band. The octave's value is FEASIBILITY, "
            "not speed: at standard sizing the two-phase form is the "
            "only broadcast-family dispatch past ~2 GB est64, and it "
            "costs nothing measurable where both run.")
    json.dump(out, open("/root/repo/BENCH_VERIFY_B32_r17.json", "w"), indent=1)
    print("wrote BENCH_VERIFY_B32_r17.json")

    # ---- flagship fifth rung (default dispatch; the pinned-bucketed
    # attempt ENOSPC'd and is recorded as such)
    if os.path.exists(f"{T}/r17h_flagship_default.json"):
        m = json.load(open(f"{T}/r17h_flagship_default.json"))
        attr = json.load(open(f"{T}/r17h_flagship_default_attr.json"))
        reps20 = next(v for k, v in m["per_rep"].items() if "sf20x" in k)
        reps50 = next(v for k, v in m["per_rep"].items() if "sf50x" in k)
        med20, med50 = median(reps20), median(reps50)
        import math
        span = math.log10(2.5)
        rung = {
            "protocol": (
                "Round 17 (r16 verdict #3): fifth rung 1M -> 2.5M docs "
                "(sf20x_de -> sf50x_de: 1M/2.5M docs, 400k/1M embeddings), "
                "SHIPPED ADAPTIVE dispatch (default fence — at this size "
                "the containment stage's est64 is 1.16 GB < 1.5 GB, so the "
                "dispatch broadcasts; see BENCH_VERIFY_B32_r17.json for "
                "the estimate correction), 3 reps interleaved (LegBench "
                "query), event-logged; attribution rows and the "
                "bytes-based exponent emitted by tools/attr_reps.py "
                "--sizes (the standing witness, r16 verdict #4). Exponents "
                "per decade over log10(2.5). The verdict asked for this "
                "rung on the PINNED BUCKETED dispatch; that attempt is "
                "recorded below as infeasible_bucketed_attempt — the "
                "7-stage composition stacks the bucketed containment's "
                "~51 GB wide intermediate (r16) on top of the other "
                "stages' shuffles and checkpoint blocks inside one job "
                "chain, over this box's ~79 GB transient budget (ENOSPC, "
                "rep 1; a cluster divides that intermediate by executor "
                "count, and the shipped dispatch never takes the bucketed "
                "path at a size where the hash-set frame broadcasts)."),
            "infeasible_bucketed_attempt": {
                "what": ("fence 0 (bucketed pinned), rep 1: sf20x_de leg "
                         "completed 490.6 s, sf50x_de leg died "
                         "java.io.IOException: No space left on device "
                         "(~79 GB transient budget; log: "
                         "target/r17c_flagship.log)"),
                "sf20x_rep1_s": 490.648},
            "sf20x_median": round(med20, 3), "sf50x_median": round(med50, 3),
            "sf20x_min": min(reps20), "sf50x_min": min(reps50),
            "exponent_per_decade_median":
                round(math.log10(med50 / med20) / span, 3),
            "exponent_per_decade_min":
                round(math.log10(min(reps50) / min(reps20)) / span, 3),
            "per_rep_sf20x": reps20, "per_rep_sf50x": reps50,
            "attribution": attr if isinstance(attr, list) else attr.get("reps"),
            "exponents_bytes": attr.get("exponents") if isinstance(attr, dict) else None,
        }
        art = json.load(open("/root/repo/BENCH_FLAGSHIP_DECADE.json"))
        art["fifth_rung_1M_to_2p5M_adaptive_dispatch"] = rung
        json.dump(art, open("/root/repo/BENCH_FLAGSHIP_DECADE.json", "w"),
                  indent=1)
        print("updated BENCH_FLAGSHIP_DECADE.json",
              rung["exponent_per_decade_median"], rung["exponent_per_decade_min"],
              rung.get("exponents_bytes"))


if __name__ == "__main__":
    main()
