#!/usr/bin/env python3
"""Build BENCH_SCALING_CAPPED_WIDE_r16.json from campaign part-2 outputs:
the 5-rep broadcast-pinned wide span (+ per-rep event-log attribution)
and the 2-rep bucketed span including the previously-infeasible sf50x
rung. Run from /root/repo after tools/r16_campaign2.sh."""
import json, math, os

lo, hi = '/root/repo/target/sf10x_docs', '/root/repo/target/sf50x_docs'
span = math.log10(5)


def leg_block(d, leg):
    lm, hm = d['medians'].get(f'{lo}#{leg}'), d['medians'].get(f'{hi}#{leg}')
    ln, hn = d['medians_min'].get(f'{lo}#{leg}'), d['medians_min'].get(f'{hi}#{leg}')
    if not (lm and hm):
        return None
    return {
        "sf10x_median": lm, "sf50x_median": hm,
        "sf10x_min": ln, "sf50x_min": hn,
        "exponent_per_decade_median": round(math.log10(hm / lm) / span, 3),
        "exponent_per_decade_min": round(math.log10(hn / ln) / span, 3),
        "per_rep_sf10x": d['per_rep'].get(f'{lo}#{leg}'),
        "per_rep_sf50x": d['per_rep'].get(f'{hi}#{leg}')}


out = {
    "protocol": ("Round-16 wide span sf10x -> sf50x (500k -> 2.5M docs, "
        "log10(5)=0.70 of a decade), capped pair family at budget 16/doc, "
        "round-16 verify (two-phase 32-bit screen + 64-bit confirm on the "
        "bucketed dispatch; unchanged single-phase broadcast below the "
        "fence). TWO pinned dispatches: broadcast "
        "(SPARK_GRAFT_VERIFY_BROADCAST_BYTES=4e9 — the sf50x hash-set "
        "estimate ~2.7 GB sits above the library's 1.5 GB default fence, so "
        "the pin keeps BOTH rungs on one dispatch) at 5 reps, and bucketed "
        "(=0) at 2 reps — the sf50x bucketed rung was PHYSICALLY INFEASIBLE "
        "in r15 (~100 GB transient vs ~79 GB disk); the halved intermediate "
        "(BENCH_VERIFY_I32.json) brings it on-box. Reps are dir-interleaved "
        "(PairLegBench), rep 1 carries JIT warm-up (excluded by the min "
        "protocol, included in medians). PER-REP EVENT-LOG ATTRIBUTION "
        "(tools/attr_reps.py, committed alongside in this artifact) "
        "separates dataflow (task time, shuffle bytes, spill) from "
        "environment per rep — the variance-attribution protocol the r15 "
        "verdict asked for."),
    "span_docs": "500k -> 2.5M", "budget_per_doc": 16,
}

if os.path.exists('target/r16c_broadcast.json'):
    d = json.load(open('target/r16c_broadcast.json'))
    out['broadcast_pinned_5rep'] = {
        leg: leg_block(d, leg) for leg in ('containment_capped', 'prefix_capped')}
if os.path.exists('target/r16c_broadcast_attr.json'):
    out['broadcast_per_rep_attribution'] = json.load(
        open('target/r16c_broadcast_attr.json'))
if os.path.exists('target/r16c_bucketed.json'):
    d = json.load(open('target/r16c_bucketed.json'))
    out['bucketed_pinned_2rep'] = {
        leg: leg_block(d, leg) for leg in ('containment_capped',)}
if os.path.exists('target/r16c_bucketed_attr.json'):
    out['bucketed_per_rep_attribution'] = json.load(
        open('target/r16c_bucketed_attr.json'))

out['r15_reference'] = {
    "broadcast_path": {"containment": {"median": 1.137, "min": 0.987},
                       "prefix": {"median": 0.51, "min": 0.856}},
    "bucketed_tmpfs_sf10x_to_sf20x": {"containment_median": 1.527,
                                      "containment_min": 0.958},
    "note": ("r15 medians/mins from BENCH_SCALING_CAPPED_3RD_WIDE.json and "
             "the r15 verdict; cross-boot absolute comparisons carry the "
             "documented 1.3-1.4x box drift.")}

json.dump(out, open('BENCH_SCALING_CAPPED_WIDE_r16.json', 'w'), indent=2)
for k in ('broadcast_pinned_5rep', 'bucketed_pinned_2rep'):
    if k in out:
        print(k, json.dumps({leg: (v['exponent_per_decade_median'],
                                   v['exponent_per_decade_min'])
                             for leg, v in out[k].items() if v}))
