#!/usr/bin/env bash
# Pre-commit bar for ANY registry change (new/edited query key, oracle,
# or TABLES_BY_KEY entry). Rule adopted after round 5, where a
# never-executed key (q_bloom_probe) landed in the final snapshot commit
# and broke CORRECTNESS, the driver bench (rc 1), and 6 test files'
# collection in one stroke: NO KEY LANDS UNEXECUTED.
#
# Usage: scripts/precommit_check.sh [key ...]
#   With keys: driver_sim runs exactly those keys (plain SparkSession +
#   DuckDB oracle side-by-side — what the real driver does).
#   Without keys: registry/table-usage lockstep tests only (for commits
#   that do not add or change keys).
set -euo pipefail
cd "$(dirname "$0")/.."

# --streaming (first arg): also run the end-to-end streaming CDC check
# (scripts/streaming_check.py — real readStream micro-batches over the
# sf0.01 events feed, checksummed against the batch twin, ~40s). Run it
# for any change under streaming/ or pipeline/incremental.py.
STREAMING=0
if [ "${1:-}" = "--streaming" ]; then
  STREAMING=1
  shift
fi

if [ "$#" -gt 0 ]; then
  python scripts/driver_sim.py /root/testdata/sf0.01 "$@"
fi
if [ "$STREAMING" = "1" ]; then
  python scripts/streaming_check.py /root/testdata/sf0.01
fi
python -m pytest tests/test_survey_registry.py tests/test_table_usage.py -q
