#!/bin/sh
# Supervisor for long TPU training runs on the axon relay: the client
# wedges silently every ~25-35 min (all threads futex_wait, zero CPU, no
# exception — CLAUDE.md round-3/4 observations). Watch the run's stdout
# mtime; stale >300 s => kill by PID and relaunch (orbax resumes from the
# last i_weights checkpoint). Exits when the target step is checkpointed.
#
# Usage: supervise_train.sh <expname> <datadir> <n_ids> <iters> [extra args...]
# Optional: SUP_DEADLINE (epoch seconds) — stop training at that wall-clock
# time even if the target step isn't reached; the caller evals from the last
# checkpoint. Guards the round-end bench window (round-4 lesson: never let a
# training run overlap the driver's bench.py).
set -u
EXPNAME=$1; DATADIR=$2; NIDS=$3; ITERS=$4; shift 4
DEADLINE=${SUP_DEADLINE:-0}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/sup_${EXPNAME}.out
CKPT=studydata/logs/${EXPNAME}/checkpoints

while :; do
  last=$(ls "$CKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1 | sed 's/^0*//')
  last=${last:-0}
  if [ "$last" -ge "$ITERS" ]; then
    echo "SUPERVISOR_DONE last_ckpt=$last"
    break
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "SUPERVISOR_DEADLINE last_ckpt=$last $(date)"
    break
  fi
  echo "SUPERVISOR launch (last_ckpt=$last) $(date)"
  # i_testset disabled ON PURPOSE (ADVICE r4 #2): a mid-run test render is a
  # new jit shape on the relay (1-10 min cold compile) and raises the wedge
  # odds; every chain instead runs the FULL held-out eval
  # (morphable_flagship.py --stage eval) right after training completes.
  python -u examples/morphable_flagship.py --stage train \
    --data "$DATADIR" --n_ids "$NIDS" --expname "$EXPNAME" \
    --iters "$ITERS" --white_bkgd --device_data \
    --i_weights 2000 --i_testset 1000000000 "$@" >> "$OUT" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_inner.pid
  KILLED=0
  # A brand-new jit shape (e.g. a bigger device store) remote-compiles for
  # 1-10 silent minutes; 300 s staleness would false-kill mid-compile and
  # the relay's round-robin caches make the retry cold again (livelock).
  # Until the first [TRAIN] line of THIS launch, allow 900 s; after that
  # the loop prints every ~30 s and 300 s means a real wedge.
  # NB: grep -c prints 0 itself on zero matches (exit 1), so `|| echo 0`
  # would yield "0\n0" and break [ -gt ] — default only when empty instead
  IT0=$(grep -c '^\[TRAIN\]' "$OUT" 2>/dev/null); IT0=${IT0:-0}
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "SUPERVISOR deadline reached, killing $PID $(date)"
      kill "$PID"; sleep 5; kill -9 "$PID" 2>/dev/null
      KILLED=1
      break
    fi
    THRESH=900
    ITN=$(grep -c '^\[TRAIN\]' "$OUT" 2>/dev/null); ITN=${ITN:-0}
    if [ "$ITN" -gt "$IT0" ]; then
      THRESH=300
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$OUT" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$THRESH" ]; then
      echo "SUPERVISOR wedge: stdout stale ${age}s, killing $PID $(date)"
      kill "$PID"; sleep 5; kill -9 "$PID" 2>/dev/null
      KILLED=1
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$KILLED" -eq 0 ] && [ "$rc" -ne 0 ]; then
    echo "SUPERVISOR: run exited rc=$rc without wedge; aborting"
    break
  fi
  sleep 3
done
