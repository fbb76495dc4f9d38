#!/bin/bash
# Full convergence campaign with crash resilience: the TPU tunnel worker can
# restart transiently; every stage is checkpointed (done.json markers), so a
# re-run resumes where it left off.  Usage: tools/run_campaign.sh [outdir]
set -u
DIR="${1:-campaign_out}"
for attempt in 1 2 3 4 5 6 7 8; do
  echo "[run_campaign] attempt $attempt -> $DIR"
  timeout 14400 python tools/campaign.py --dir "$DIR" "${@:2}"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[run_campaign] done"
    exit 0
  fi
  echo "[run_campaign] attempt $attempt failed (rc=$rc); retrying in 60s"
  sleep 60
done
exit 1
