#!/usr/bin/env bash
# Parallel inner-loop test runner (VERDICT r7 item #4): the suite is a
# long tail of ~820 tests with no single dominator, so the win is
# process-level sharding -- N concurrent pytest processes, each over a
# disjoint set of test FILES, each with its own Spark JVM sized to
# 32/N cores. Test files share no mutable state (no saveAsTable / fixed
# warehouse paths; everything tmp_path-scoped -- grep-verified), and
# each shard gets its own --basetemp so pytest tmp dirs cannot collide.
#
# Usage: scripts/test_fast.sh [extra pytest args...]
#   SHARDS=4 (default)  number of concurrent pytest processes
#
# This is the fast default for mid-round iteration. The single-process
# run the driver/judge uses (`python -m pytest tests/ -x -q`) remains
# the canonical gate; run it before calling a round done.
set -u
SHARDS=${SHARDS:-4}
cd "$(dirname "$0")/.."

CORES=$(( $(nproc) / SHARDS ))
[ "$CORES" -lt 4 ] && CORES=4

# Size-descending file order as a cost proxy, round-robin onto shards.
mapfile -t FILES < <(ls -S tests/test_*.py)
declare -a GROUPS_ARR
for i in "${!FILES[@]}"; do
  s=$(( i % SHARDS ))
  GROUPS_ARR[$s]="${GROUPS_ARR[$s]:-} ${FILES[$i]}"
done

pids=()
live=()
for s in $(seq 0 $(( SHARDS - 1 ))); do
  # A shard with no assigned files (SHARDS > number of test files) must
  # be skipped: bare `python -m pytest` would collect the entire default
  # test path and duplicate every other shard's work (ADVICE r8 item #4).
  [ -z "${GROUPS_ARR[$s]:-}" ] && continue
  live+=("$s")
  # -m "slow or not slow" overrides pytest.ini's default deselection of
  # the @slow cross-verification tests: the builder's sharded gate runs
  # EVERYTHING; only the driver's single-process run takes the fast
  # subset (r14, VERDICT r13 #2).
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=$CORES python -m pytest ${GROUPS_ARR[$s]} -q \
    -m "slow or not slow" \
    --basetemp="/tmp/pytest-shard-$s" -p no:cacheprovider "$@" \
    > "/tmp/test_shard_$s.log" 2>&1 &
  pids+=($!)
done

rc=0
for i in "${!live[@]}"; do
  s=${live[$i]}
  if ! wait "${pids[$i]}"; then
    rc=1
    echo "=== shard $s FAILED (tail of /tmp/test_shard_$s.log):"
    tail -n 25 "/tmp/test_shard_$s.log"
  fi
done

echo "=== shard summaries:"
for s in "${live[@]}"; do
  printf 'shard %d: %s\n' "$s" "$(tail -n 1 "/tmp/test_shard_$s.log")"
done
exit $rc
