#!/bin/bash
# Round-3 TPU stage 2: run after tpu_session_r3.sh.
#   - cost-model calibration (verdict task 5): forced-theta regret table
#   - stream split A/B on powerlaw (task 7 follow-up)
#   - small-matrix glue floor check (task 6 acceptance)
#   - full corpus sweep -> results_r3.csv (C23 / weak #1)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_r3
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "$TO" "$@" >/tmp/tpu_r3/"$name".log 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S)); tail:"
  tail -8 /tmp/tpu_r3/"$name".log
}

TO=2400 run cost    python scripts/calibrate_cost.py
TO=1200 run split   python scripts/ab_stream_split.py powerlaw_large mixed_large
TO=900  run glue    python scripts/ab_glue_floor.py
TO=2400 run sweep   python -c "
from tilespmv_tpu.bench.sweep import sweep
sweep(csv_path='results_r3.csv', json_path='results_r3.json', backend='pallas')
"
echo "ALL DONE $(date +%H:%M:%S)"
