#!/bin/sh
# One-command verification: full test suite (8 virtual CPU devices),
# the driver's multi-chip dryrun, and (with RUN_BENCH=1) the TPU bench.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
if [ "${RUN_BENCH:-0}" = "1" ]; then python bench.py; fi
echo "check.sh: all green"
