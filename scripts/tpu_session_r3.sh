#!/bin/bash
# Round-3 TPU measurement batch: run when the tunnel is back.
# Logs to /tmp/tpu_r3/*.log; each stage tolerates failure so later
# stages still run.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_r3
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "$TO" "$@" >/tmp/tpu_r3/"$name".log 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S)); tail:"
  tail -5 /tmp/tpu_r3/"$name".log
}

TO=1200 run verify  python scripts/verify_drive.py
TO=2400 run slabns  python scripts/calibrate_slab_ns.py mixed_large powerlaw_large mixed_medium
TO=900  run profmix python scripts/prof_stream.py mixed_large
TO=900  run profpow python scripts/prof_stream.py powerlaw_large
TO=1800 run bench   python bench.py
echo "ALL DONE $(date +%H:%M:%S)"
