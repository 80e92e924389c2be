#!/usr/bin/env python3
"""Cross-run determinism sweep: compare two Verify dumps query by query.

Every query must produce identical content (row order ignored) across
independent runs — the property that makes snapshot re-builds and
incremental pipelines safe. The only sanctioned divergence is the
intentional current_timestamp audit stamp inside the nested doc
queries, which are compared on row count only.

Usage: python3 tools/determinism.py target/det_a target/det_b
"""
import sys, os, glob
import pandas as pd

a_dir = sys.argv[1] if len(sys.argv) > 1 else "target/det_a"
b_dir = sys.argv[2] if len(sys.argv) > 2 else "target/det_b"

# nested doc dumps embed audit.snapshotTs = current_timestamp by design
COUNT_ONLY = {"q_flagship_pipeline", "q_outbound_push", "q_doc_assembly_nested"}

def load(d, name):
    files = glob.glob(os.path.join(d, name, "*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    by = [c for c in df.columns if df[c].map(lambda v: not isinstance(v, (list, dict, bytes))).all()]
    return df.sort_values(by=by, ignore_index=True) if by else df

fail = 0
names = sorted(n for n in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, n)))
for name in names:
    try:
        da, db = load(a_dir, name), load(b_dir, name)
        if name in COUNT_ONLY:
            ok = len(da) == len(db)
            verdict = "OK (count-only: audit stamp)" if ok else "ROW COUNT DIFFERS"
        else:
            ok = da.equals(db)
            verdict = "OK" if ok else "CONTENT DIFFERS"
    except Exception as e:
        ok, verdict = False, f"ERROR {e}"
    print(f"{'PASS ' if ok else 'FAIL '} {name}: {verdict}")
    fail += 0 if ok else 1

print(f"\n{len(names) - fail}/{len(names)} queries deterministic across runs")
sys.exit(1 if fail else 0)
