#!/bin/bash
# Canonical full-suite runner: one pytest process PER TEST FILE.
#
# Why not one `pytest tests/`: a single process accumulates hundreds of XLA:CPU
# executables (x8 virtual devices) across the suite and has segfaulted inside
# XLA's backend_compile_and_load deep into the run on small boxes (round-3 verdict:
# crash at tests/test_pallas_resblock.py:362 after ~109 green tests; the test passes
# alone). Per-file processes bound the cumulative state; tests/conftest.py also
# clears jax caches per module as a second layer.
#
# Usage:
#   bash scripts/run_tests.sh               # full suite (every tier)
#   bash scripts/run_tests.sh -m "not slow" # fast tier only
# Extra args are passed through to every pytest invocation.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

declare -a failed=()
total_files=0
t_start=$SECONDS
for f in tests/test_*.py; do
    total_files=$((total_files + 1))
    t0=$SECONDS
    python -m pytest "$f" -q --no-header "$@"
    rc=$?
    # exit code 5 = no tests collected in this file for the given -m filter
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then
        failed+=("$f")
    fi
    echo "--- $f done in $((SECONDS - t0))s"
done

echo
echo "=== ${total_files} files in $(((SECONDS - t_start) / 60))m$(((SECONDS - t_start) % 60))s"
if [ ${#failed[@]} -gt 0 ]; then
    echo "=== FAILED files: ${failed[*]}"
    exit 1
fi
echo "=== all green"
