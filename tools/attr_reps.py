#!/usr/bin/env python3
"""Per-rep variance attribution for PairLegBench runs (r15 verdict #2):
slice a Spark event log by the epoch windows each rep line prints and
report, per (rep, dir, leg): wall vs summed executor task time vs
shuffle read/write bytes vs disk spill. A rep whose wall is 3x the
family median while its task time and shuffle bytes match the others is
ENVIRONMENTAL (scheduler stall, page-cache state, device contention);
one whose task time or spill moves with the wall is DATAFLOW.

Usage: attr_reps.py <pairlegbench-stdout-log> <eventlog-file-or-dir>
       [--json OUT]
"""
import sys, json, re, os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from eventlog_stages import newest_log, event_lines, stage_record


def rep_windows(stdout_log):
    reps = []
    for line in open(stdout_log, errors="replace"):
        m = re.search(r'\{"pair_leg_rep":.*\}', line)
        if not m:
            continue
        try:
            d = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if "t0_ms" in d:
            reps.append(d)
    return reps


def main():
    args = sys.argv[1:]
    out_json = None
    if "--json" in args:
        i = args.index("--json"); out_json = args[i + 1]; del args[i:i + 2]
    reps = rep_windows(args[0])
    stages = []
    for line in event_lines(newest_log(args[1])):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            s = stage_record(ev["Stage Info"])
            if s["sub_ms"]:
                stages.append(s)
    gb = 1 << 30
    out = []
    print(f"{'rep':>3} {'dir':<16} {'leg':<20} {'wall_s':>8} {'task_s':>9} "
          f"{'shufW_GB':>9} {'shufR_GB':>9} {'spill_GB':>9} {'in_GB':>7} {'stages':>7}")
    for r in reps:
        w0, w1 = r["t0_ms"], r["t1_ms"]
        # a stage belongs to the rep whose window contains its submission
        mine = [s for s in stages if w0 <= s["sub_ms"] <= w1]
        row = {"rep": r["pair_leg_rep"], "dir": os.path.basename(r["dir"]),
               "leg": r["leg"], "wall_s": round(r["secs"], 2),
               "task_s": round(sum(s["task_time_s"] for s in mine), 1),
               "shuf_write_gb": round(sum(s["shuf_write_b"] for s in mine) / gb, 3),
               "shuf_read_gb": round(sum(s["shuf_read_b"] for s in mine) / gb, 3),
               "spill_disk_gb": round(sum(s["spill_disk_b"] for s in mine) / gb, 3),
               "input_gb": round(sum(s["input_b"] for s in mine) / gb, 3),
               "n_stages": len(mine)}
        out.append(row)
        print(f"{row['rep']:>3} {row['dir']:<16} {row['leg']:<20} "
              f"{row['wall_s']:>8.1f} {row['task_s']:>9.1f} "
              f"{row['shuf_write_gb']:>9.3f} {row['shuf_read_gb']:>9.3f} "
              f"{row['spill_disk_gb']:>9.3f} {row['input_gb']:>7.2f} "
              f"{row['n_stages']:>7}")
    if out_json:
        json.dump(out, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
