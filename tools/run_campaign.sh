#!/bin/bash
# Full convergence campaign with crash resilience: the TPU tunnel worker can
# restart transiently; every stage is checkpointed (done.json markers), so a
# re-run resumes where it left off.  Usage: tools/run_campaign.sh [outdir]
#
# Liveness watchdog: a dropped tunnel RPC leaves the client blocked on a
# socket read FOREVER (observed twice on the mask stage — the worker
# restarted mid-chunk and the reply never came).  A wall-clock timeout can't
# distinguish that hang from legitimate hours of training, so instead we
# watch the campaign dir: training writes checkpoints/metrics every epoch,
# and campaign.py additionally touches $DIR/.alive from its MAIN thread at
# the boundaries of every write-quiet phase (dataset gen, pred-flow dumps,
# final eval — ADVICE r4 #4: those phases got healthy processes killed).
# "No file in $DIR newer than STALE_S" therefore means a wedged client:
# a blocked main thread can't beat.  Kill it (by the recorded PID — never
# by pattern) and retry; per-epoch crash resume continues from the last
# checkpoint.
set -u
DIR="${1:-campaign_out}"
STALE_S="${STALE_S:-900}"
for attempt in 1 2 3 4 5 6 7 8; do
  echo "[run_campaign] attempt $attempt -> $DIR"
  mkdir -p "$DIR"
  touch "$DIR/.watchdog_start"   # resume case: old artifacts are already
                                 # stale; measure from attempt start instead
  python tools/campaign.py --dir "$DIR" "${@:2}" &
  PID=$!
  rc=""
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"
      rc=$?
      break
    fi
    newest=$(find "$DIR" -type f -newermt "-${STALE_S} seconds" 2>/dev/null | head -1)
    if [ -z "$newest" ] && [ -d "$DIR" ]; then
      echo "[run_campaign] no $DIR write in ${STALE_S}s: client wedged; killing $PID"
      kill "$PID" 2>/dev/null
      sleep 5
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      rc=99
      break
    fi
  done
  if [ "$rc" = "0" ]; then
    echo "[run_campaign] done"
    exit 0
  fi
  echo "[run_campaign] attempt $attempt failed (rc=$rc); retrying in 60s"
  sleep 60
done
exit 1
