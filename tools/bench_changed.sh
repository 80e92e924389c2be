#!/bin/bash
# Changed-only bench for mid-round iteration (r15 verdict #7): the full
# 204-query x 3-rep suite costs ~25 min on a drifting box; this runs
# graft.Bench restricted (SPARK_GRAFT_ONLY) to the queries plausibly
# affected by the working tree's diff against a ref (default: the last
# commit whose subject starts with "round " — the previous round close).
#
# Query selection is deliberately OVER-inclusive, never under:
#  - a changed file under queries/ selects every q_ name it defines;
#  - any other changed main-source file selects every q_ name defined in
#    a queries/ file that mentions the changed file's object name (e.g.
#    editing text/Dedup.scala selects all queries whose registration
#    text contains "Dedup");
#  - a changed file outside src/main (tests, tools, docs) selects
#    nothing.
# If anything OUTSIDE queries/ and the mapped operator files changed in
# a way this heuristic cannot scope (SparkEntry, GraftSession, Verify,
# Bench, build.sbt), it falls back to the FULL suite and says so.
# The full suite remains the close protocol — this tool is for
# iteration only (PERF.md round 16).
#
# Usage: tools/bench_changed.sh [ref] [-- extra env assignments...]
set -u
cd "$(git rev-parse --show-toplevel)" || exit 1
REF="${1:-$(git log --grep='^round ' -n1 --format=%H)}"
[ -z "$REF" ] && REF=HEAD~1
# build.sbt and project/ are diffed alongside src/main: a build-config
# change (compiler flags, dependency pins) can shift EVERY query, so it
# must land in the full-suite fallback, not in "nothing to bench"
# (ADVICE r16: the old pathspec made the header's claim false).
CHANGED=$(git diff --name-only "$REF" -- 'src/main/scala/**' build.sbt 'project/**' ; git diff --name-only --cached "$REF" -- 'src/main/scala/**' build.sbt 'project/**')
CHANGED=$(echo "$CHANGED" | sort -u | grep -v '^$' || true)
if [ -z "$CHANGED" ]; then
  echo "no main-source changes vs $REF — nothing to bench"
  exit 0
fi
echo "changed vs ${REF:0:10}:"; echo "$CHANGED" | sed 's/^/  /'

GLOBAL_RE='(SparkEntry|GraftSession|Verify|Bench|CacheScope)\.scala$|^build\.sbt$|^project/'
if echo "$CHANGED" | grep -qE "$GLOBAL_RE"; then
  echo "global-surface file changed -> FULL suite"
  QUERIES=""
else
  NAMES=""
  for f in $CHANGED; do
    case "$f" in
      src/main/scala/graft/queries/*)
        NAMES+=" $(grep -oE '"q_[a-z0-9_]+"' "$f" | tr -d '"')" ;;
      *)
        obj=$(basename "$f" .scala)
        for qf in src/main/scala/graft/queries/*.scala; do
          if grep -q "\b$obj\b" "$qf"; then
            # scope to registrations whose body mentions the object:
            # take each q_ name whose following ~30 lines mention it
            NAMES+=" $(python3 - "$qf" "$obj" <<'PY'
import re, sys
src = open(sys.argv[1]).read(); obj = sys.argv[2]
names = [(m.start(), m.group(1)) for m in re.finditer(r'"(q_[a-z0-9_]+)"', src)]
starts = [s for s, _ in names] + [len(src)]
out = []
for i, (s, n) in enumerate(names):
    body = src[s:starts[i + 1]]
    if re.search(r'\b%s\b' % re.escape(obj), body):
        out.append(n)
print(" ".join(out))
PY
)"
          fi
        done ;;
    esac
  done
  QUERIES=$(echo $NAMES | tr ' ' '\n' | sort -u | grep -v '^$' | paste -sd, -)
  if [ -z "$QUERIES" ]; then
    echo "no registered queries map to the diff — nothing to bench"
    exit 0
  fi
  echo "selected $(echo "$QUERIES" | tr ',' '\n' | wc -l) queries: $QUERIES"
fi

export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-3}"
[ -n "$QUERIES" ] && export SPARK_GRAFT_ONLY="$QUERIES"
exec sbt -batch "runMain graft.Bench"
