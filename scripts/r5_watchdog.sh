#!/bin/bash
# Supervise scripts/r5_chain.py against the axon tunnel's silent-hang mode
# (one in-flight call hangs forever at 0% CPU — no exception, so the
# in-process retry loop never fires; verify SKILL.md "tunnel gotchas").
#
# Liveness = any runs_r5 metrics.jsonl OR chain.log mtime within 30 min
# (n=200 evals are silent for 10-20 min incl. compile, so the window is
# deliberately generous).  On hang: kill -9 the exact recorded PID (never
# pattern-kill) and relaunch — the chain restores ckpt_latest and continues.
cd /root/repo || exit 1
STEPS="${1:-96000}"
while ! grep -q "R5 CHAIN DONE" runs_r5/chain.log 2>/dev/null; do
  python scripts/r5_chain.py "$STEPS" >> runs_r5/chain.log 2>&1 &
  PID=$!
  echo "$PID" > runs_r5/chain.pid
  echo "WATCHDOG: launched chain pid $PID" >> runs_r5/chain.log
  LAUNCH=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 120
    FRESH=$(find runs_r5 \( -name metrics.jsonl -o -name eval_heartbeat \) -mmin -15 2>/dev/null)
    LOGFRESH=$(find runs_r5 -maxdepth 1 -name chain.log -mmin -15 2>/dev/null)
    AGE=$(( $(date +%s) - LAUNCH ))
    if [ -z "$FRESH" ] && [ -z "$LOGFRESH" ] && [ "$AGE" -gt 900 ]; then
      echo "WATCHDOG: silent hang (no progress 15 min), killing $PID" \
        >> runs_r5/chain.log
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  sleep 30
done
echo "WATCHDOG: chain reported done, exiting" >> runs_r5/chain.log
