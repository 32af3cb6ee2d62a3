#!/usr/bin/env bash
# Prune dense checkpoints from a training out-dir, keeping:
#   - every checkpoint whose iter is a multiple of KEEP_MOD (default 1000)
#   - the newest KEEP_TAIL (default 8) checkpoints regardless (the NaN-abort
#     rollback trail: the windowed detector may need to rewind ~1-2k iters)
#   - sibling .ema artifacts follow their base checkpoint's fate
# Usage: prune_ckpts.sh OUT_DIR [KEEP_MOD] [KEEP_TAIL]
# Loop mode: prune_ckpts.sh --loop SECS OUT_DIR [KEEP_MOD] [KEEP_TAIL]
set -u

LOOP=0
if [ "${1:-}" = "--loop" ]; then LOOP="$2"; shift 2; fi
OUT="$1"; KEEP_MOD="${2:-1000}"; KEEP_TAIL="${3:-8}"

prune_once() {
  # list (iter, path) for non-ema checkpoints, ascending by iter
  local rows
  rows=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
         | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n)
  [ -n "$rows" ] || return 0
  local total; total=$(printf '%s\n' "$rows" | wc -l)
  local cut=$(( total - KEEP_TAIL ))
  [ "$cut" -le 0 ] && return 0
  printf '%s\n' "$rows" | head -n "$cut" | while read -r it path; do
    if [ $(( it % KEEP_MOD )) -ne 0 ]; then
      echo "prune: $path"
      rm -rf "$path" "$path.ema"
    fi
  done
}

if [ "$LOOP" -gt 0 ] 2>/dev/null; then
  while true; do prune_once; sleep "$LOOP"; done
else
  prune_once
fi
