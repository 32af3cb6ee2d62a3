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
set -u
LOG="$1"; STALL="$2"; TOTAL="$3"; shift 3
[ "$1" = "--" ] && shift

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
    if [ "$AGE" -ge "$STALL" ]; then
      echo "watchdog: log silent ${AGE}s (>= ${STALL}) — killing $PID" >&2
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
