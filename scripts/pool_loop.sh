#!/bin/bash
# Grow the annotate scaling pool (BENCH/curation_scaling.json) one
# interleaved matrix round at a time, for as long as /tmp/pool_run
# exists. /tmp/pool_pause suspends BETWEEN rounds (never mid-round, so
# every appended per-round ratio is measured on an interference-free
# harness side — the operator's own heavy jobs pause the loop first).
# Usage: touch /tmp/pool_run && bash scripts/pool_loop.sh
set -u
cd "$(dirname "$0")/.."
while [ -f /tmp/pool_run ]; do
  if [ -f /tmp/pool_pause ]; then sleep 20; continue; fi
  echo "=== round start $(date -u +%H:%M:%S) ===" >> /tmp/pool_log.txt
  python scripts/curation_scaling.py /root/testdata/sf0.1 1 annotate \
    800,3200 2,8 >> /tmp/pool_log.txt 2>&1
  echo "=== round end $(date -u +%H:%M:%S) rc=$? ===" >> /tmp/pool_log.txt
done
echo "pool_loop exiting (run flag removed)" >> /tmp/pool_log.txt
