#!/usr/bin/env bash
# Sharded test runner: the full suite in ONE pytest process accumulates
# XLA/8-virtual-device client state and reproducibly SIGABRTs around test
# ~190 (first seen at tests/test_sp.py::test_forward_matches_unsharded,
# round-4 VERDICT "What's weak" #3) even though every file passes in
# isolation. Running the same files across a few fresh processes bounds
# the per-process state and makes `make test` a trustworthy gate again.
#
# Files are discovered at run time and dealt round-robin (sorted order)
# into $SHARDS groups, so new test files are picked up automatically and
# the assignment is deterministic. Each shard is a separate pytest
# invocation; the script fails if any shard fails.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
#   SHARDS=5   number of pytest processes (sequential), default 5
set -u
cd "$(dirname "$0")/.."

SHARDS="${SHARDS:-5}"
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

mapfile -t FILES < <(ls tests/test_*.py | sort)
declare -a GROUPS_LIST
for i in "${!FILES[@]}"; do
  g=$((i % SHARDS))
  GROUPS_LIST[g]="${GROUPS_LIST[g]:-} ${FILES[i]}"
done

fail=0
for g in $(seq 0 $((SHARDS - 1))); do
  files="${GROUPS_LIST[g]:-}"
  [ -z "$files" ] && continue
  echo "=== shard $((g + 1))/$SHARDS:$files"
  # shellcheck disable=SC2086
  python -m pytest $files -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== shard $((g + 1)) FAILED (rc=$rc)"
    fail=1
  fi
done
exit $fail
