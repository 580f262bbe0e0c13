#!/usr/bin/env bash
# Test runner. Unlike the reference (whose FEniCS global state forces one
# pytest process per integrated test, run_tests.sh:6-8), everything here is
# functional/jit state — one process runs the lot.
#
# Default: the QUICK tier (unit tests minus slow-marked ones; target <2 min
# on one core). `./run_tests.sh --all` runs the full suite including the
# compile-heavy verification/parallel fixtures.
set -e
cd "$(dirname "$0")"
if [ "$1" = "--all" ]; then
    shift
    python -m pytest tests/ -q "$@"
else
    python -m pytest tests/ -q -m "not slow" "$@"
fi
