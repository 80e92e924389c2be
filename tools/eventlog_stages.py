#!/usr/bin/env python3
"""Per-stage attribution from a Spark event log: wall, task time, shuffle
read/write bytes, spill, input bytes — the ground truth for (a) sizing
the verify stage's candidate×array intermediate (r15 verdict #4) and
(b) separating environmental variance from dataflow per rep on the
wide-span rungs (r15 verdict #2).

Usage: eventlog_stages.py <eventlog-file-or-dir> [--json OUT] [--top N]

With a directory, picks the most recent application log inside it.
Prints a per-stage table (top N by wall) and a totals line; --json dumps
the full per-stage list for committing into a BENCH_* artifact.
"""
import sys, json, os, glob


def newest_log(path):
    if os.path.isfile(path):
        return path
    cands = [p for p in glob.glob(os.path.join(path, "*"))
             if os.path.isfile(p) and not p.endswith(".inprogress")]
    cands += [p for p in glob.glob(os.path.join(path, "*.inprogress"))]
    if not cands:
        sys.exit(f"no event logs under {path}")
    return max(cands, key=os.path.getmtime)


def parse(path):
    stages = {}
    with open(path, errors="replace") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = (si["Stage ID"], si["Stage Attempt ID"])
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "stage": si["Stage ID"],
                    "attempt": si["Stage Attempt ID"],
                    "name": si.get("Stage Name", "")[:80],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_s": round((comp - sub) / 1e3, 3)
                              if sub and comp else None,
                    "failed": si.get("Failure Reason") is not None,
                    # accumulated below from task ends
                    "task_time_s": 0.0, "shuf_write_b": 0, "shuf_read_b": 0,
                    "spill_mem_b": 0, "spill_disk_b": 0, "input_b": 0,
                    "output_b": 0,
                }
            elif k == "SparkListenerTaskEnd":
                sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.get(sid)
                m = ev.get("Task Metrics")
                if not m:
                    continue
                if st is None:
                    # task end seen before stage completion record: stash
                    st = stages.setdefault(sid, {
                        "stage": ev["Stage ID"], "attempt": ev["Stage Attempt ID"],
                        "name": "?", "tasks": 0, "wall_s": None, "failed": False,
                        "task_time_s": 0.0, "shuf_write_b": 0, "shuf_read_b": 0,
                        "spill_mem_b": 0, "spill_disk_b": 0, "input_b": 0,
                        "output_b": 0})
                st["task_time_s"] += m.get("Executor Run Time", 0) / 1e3
                sw = m.get("Shuffle Write Metrics") or {}
                st["shuf_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                st["shuf_read_b"] += (sr.get("Local Bytes Read", 0)
                                      + sr.get("Remote Bytes Read", 0))
                st["spill_mem_b"] += m.get("Memory Bytes Spilled", 0)
                st["spill_disk_b"] += m.get("Disk Bytes Spilled", 0)
                st["input_b"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                st["output_b"] += (m.get("Output Metrics") or {}).get("Bytes Written", 0)
    return sorted(stages.values(), key=lambda s: -(s["wall_s"] or 0))


def main():
    args = [a for a in sys.argv[1:]]
    out_json = None
    top = 20
    if "--json" in args:
        i = args.index("--json"); out_json = args[i + 1]; del args[i:i + 2]
    if "--top" in args:
        i = args.index("--top"); top = int(args[i + 1]); del args[i:i + 2]
    path = newest_log(args[0] if args else "target/eventlog")
    stages = parse(path)
    gb = 1 << 30
    tot = {k: sum(s[k] for s in stages) for k in
           ("task_time_s", "shuf_write_b", "shuf_read_b",
            "spill_mem_b", "spill_disk_b", "input_b", "output_b")}
    print(f"# {path} — {len(stages)} stages")
    print(f"{'stage':>6} {'wall_s':>8} {'task_s':>9} {'shufW_GB':>9} "
          f"{'shufR_GB':>9} {'spill_GB':>9} {'in_GB':>7}  name")
    for s in stages[:top]:
        print(f"{s['stage']:>6} {s['wall_s'] or 0:>8.1f} "
              f"{s['task_time_s']:>9.1f} {s['shuf_write_b']/gb:>9.3f} "
              f"{s['shuf_read_b']/gb:>9.3f} {s['spill_disk_b']/gb:>9.3f} "
              f"{s['input_b']/gb:>7.2f}  {s['name']}")
    print(json.dumps({"log": os.path.basename(path),
                      "n_stages": len(stages),
                      "total_task_time_s": round(tot["task_time_s"], 1),
                      "total_shuffle_write_gb": round(tot["shuf_write_b"]/gb, 3),
                      "total_shuffle_read_gb": round(tot["shuf_read_b"]/gb, 3),
                      "total_spill_disk_gb": round(tot["spill_disk_b"]/gb, 3),
                      "total_input_gb": round(tot["input_b"]/gb, 3)}))
    if out_json:
        json.dump({"log": os.path.basename(path), "stages": stages,
                   "totals": tot}, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
