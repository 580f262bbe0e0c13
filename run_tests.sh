#!/usr/bin/env bash
# Test runner. Unlike the reference (whose FEniCS global state forces one
# pytest process per integrated test, run_tests.sh:6-8), everything here is
# functional/jit state — one process runs the lot.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
