#!/bin/bash
# Drift-bisect in one command (round-15 verdict task 5; recipe from
# SCALING.md "BENCH_QUIET_r14 adjudication"): rebuild a named git
# snapshot in a throwaway worktree, then run a CODE-UNTOUCHED query
# subset through graft.Bench alternately against the snapshot build and
# the current build (A B A B — pass-separated so a co-tenant noise burst
# cannot land on only one side), and print the per-query min-of-runs
# table. If the OLD code is as fast or faster than the NEW code under
# today's conditions, a round-over-round quiet drift is environmental;
# if the NEW code is slower like-for-like, it's a real regression.
#
# Usage: tools/bisect_bench.sh <git-ref> <sfDir> [query-substring...]
#   default subset: the standing untouched-7 from the round-14 bisect
#     (q07 q43 q60 q84 q85 q86 q95 — re-check they are code-untouched
#      across your range before trusting the verdict).
set -eu
REF="${1:?usage: tools/bisect_bench.sh <git-ref> <sfDir> [query-substring...]}"
SFDIR="${2:?usage: tools/bisect_bench.sh <git-ref> <sfDir> [query-substring...]}"
shift 2
SUBSET=("$@")
if [ ${#SUBSET[@]} -eq 0 ]; then
  SUBSET=(q07 q43 q60 q84 q85 q86 q95)
fi
REPO=/root/repo
WT=/tmp/bisect_wt_$(git -C "$REPO" rev-parse --short "$REF")
OUT=/tmp/bisect_out_$$
mkdir -p "$OUT"

echo "[bisect] snapshot $REF -> $WT"
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$REF"
fi
# Compile both sides BEFORE any timing (compilation is not part of the
# measurement). The snapshot compiles in its own worktree dir, so the
# current repo's sbt project lock is untouched.
(cd "$WT" && sbt -batch compile > "$OUT/compile_old.log" 2>&1) \
  || { echo "[bisect] snapshot compile FAILED, see $OUT/compile_old.log"; exit 1; }
(cd "$REPO" && sbt -batch compile > "$OUT/compile_new.log" 2>&1) \
  || { echo "[bisect] current compile FAILED, see $OUT/compile_new.log"; exit 1; }

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
TMPDIR_OPT="${SPARK_GRAFT_TMPDIR:-/dev/shm/graft-tmp}"
mkdir -p "$TMPDIR_OPT"

run_side() { # $1 = classes dir, $2 = output json
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Djava.io.tmpdir="$TMPDIR_OPT" -Xmx"${SPARK_DRIVER_MEM:-48g}" \
    -cp "$1:/opt/spark/jars/*" graft.Bench "${SUBSET[@]}" > /dev/null 2>&1
  cp /tmp/bench_full.json "$2"
}

# A B A B: each graft.Bench invocation is itself min-of-2 interleaved;
# the two invocations per side sit minutes apart (the other side runs
# in between), which is exactly the burst-noise separation the recipe
# calls for. Per-query result = min over both invocations.
for round in 1 2; do
  echo "[bisect] round $round: snapshot build"
  run_side "$WT/target/scala-2.13/classes" "$OUT/old_$round.json"
  echo "[bisect] round $round: current build"
  run_side "$REPO/target/scala-2.13/classes" "$OUT/new_$round.json"
done

python3 - "$OUT" "$REF" <<'EOF'
import json, sys
out, ref = sys.argv[1], sys.argv[2]
def best(side):
    m = {}
    for r in (1, 2):
        with open(f"{out}/{side}_{r}.json") as f:
            for k, v in json.load(f)["queries"].items():
                m[k] = min(m.get(k, float("inf")), v)
    return m
old, new = best("old"), best("new")
keys = sorted(set(old) & set(new))
print(f"\n| query | {ref} (old) s | current s | new/old |")
print("|---|---|---|---|")
to, tn = 0.0, 0.0
for k in keys:
    to += old[k]; tn += new[k]
    print(f"| {k} | {old[k]:.2f} | {new[k]:.2f} | {new[k]/old[k]:.2f} |")
print(f"| total | {to:.2f} | {tn:.2f} | {tn/to:.2f} |")
verdict = ("current build is like-for-like FASTER/equal -> drift is environmental"
           if tn <= to * 1.05 else
           "current build is like-for-like SLOWER -> investigate a real regression")
print(f"\n[bisect] {verdict}")
EOF
echo "[bisect] raw runs in $OUT (worktree kept at $WT; remove with: git -C $REPO worktree remove --force $WT)"
