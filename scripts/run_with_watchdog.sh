#!/usr/bin/env bash
# Run a command with a log-progress watchdog: if the command's log file stops
# growing for STALL_SECS, the process tree is killed (TERM, then KILL). This
# guards long TPU runs against transport wedges (observed: the axon tunnel can
# drop mid-run, leaving the client futex-blocked forever on a reply that will
# never arrive — RESULTS.md round 3). The trainer emits a log line every
# --log_period iters, so a silent log IS a stalled run.
#
# Usage: run_with_watchdog.sh LOGFILE STALL_SECS TIMEOUT_SECS -- cmd args...
# Exit code: the command's, or 124 on total-timeout, or 125 on stall-kill.
#
# Two-phase stall window: STALL_SECS must be generous enough to survive a
# cold flagship compile (13-15 min with an empty persistent cache), but a
# transport wedge during STEADY-STATE training then costs the same 25 min
# before the kill fires (observed: the iter-5000 wedge on the sixth fresh
# host sat futex-blocked from 06:46 to the 07:11 kill). Once the log
# contains a trainer step line ("sec/iter" — only emitted after the step is
# compiled and running), the longest legitimate silence is a first-time
# sampler compile (~2.5 min), so the window tightens to
# ACTIVE_STALL (default 600 s, env-overridable; never above STALL_SECS).
# Logs without step lines (eval sweeps, probes) keep the full window.
set -u
LOG="$1"; STALL="$2"; TOTAL="$3"; shift 3
[ "$1" = "--" ] && shift
ACTIVE_STALL=${ACTIVE_STALL:-600}
[ "$ACTIVE_STALL" -gt "$STALL" ] && ACTIVE_STALL=$STALL

# Preserve the previous attempt's log instead of truncating it: retry loops
# reuse the same LOG path, and a truncated log destroys the crash traceback
# the retry was reacting to (this lost the first 3-scale attempt's rc=1 cause).
if [ -s "$LOG" ]; then
  N=1; while [ -e "$LOG.prev$N" ]; do N=$((N+1)); done
  mv "$LOG" "$LOG.prev$N"
fi

"$@" > "$LOG" 2>&1 &
PID=$!
START=$(date +%s)
STATUS_FILE=$(mktemp)
echo running > "$STATUS_FILE"

while kill -0 "$PID" 2>/dev/null; do
  sleep 20
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$TOTAL" ]; then
    echo "watchdog: total timeout ${TOTAL}s — killing $PID" >&2
    echo timeout > "$STATUS_FILE"
    kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
    break
  fi
  if [ -f "$LOG" ]; then
    MTIME=$(stat -c %Y "$LOG")
    AGE=$((NOW - MTIME))
    WINDOW=$STALL
    if grep -q "sec/iter" "$LOG" 2>/dev/null; then
      WINDOW=$ACTIVE_STALL
    fi
    if [ "$AGE" -ge "$WINDOW" ]; then
      echo "watchdog: log silent ${AGE}s (>= ${WINDOW}) — killing $PID" >&2
      echo stalled > "$STATUS_FILE"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  fi
done

wait "$PID" 2>/dev/null
RC=$?
ST=$(cat "$STATUS_FILE"); rm -f "$STATUS_FILE"
case "$ST" in
  timeout) exit 124 ;;
  stalled) exit 125 ;;
  *) exit "$RC" ;;
esac
