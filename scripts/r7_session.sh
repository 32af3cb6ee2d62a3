#!/usr/bin/env bash
# Round-4 session driver (eighth session): bank-early ordering.
#
# Unlike r5_chain.sh (flagship first, demos in the reserve tail), this session
# runs the SHORT high-value chip item first — the 64px/16f EMA demo to 12k with
# the live-vs-EMA held-out alignment comparison that two sessions queued and
# never executed (VERDICT r3 item 1) — so a mid-session host reset cannot wipe
# it again. Then it hands the chip to r5_chain.sh (flagship cond-128 to 28k,
# dense trail, full mitigation stack, alignment sweep, bench warm) for the rest
# of the budget.
#
# Usage: HARD_END=<epoch> bash scripts/r7_session.sh
set -x
cd "$(dirname "$0")/.."

HARD_END=${HARD_END:-$(( $(date +%s) + 23400 ))}   # default: now + 6.5 h
export HARD_END
left() { echo $(( HARD_END - $(date +%s) )); }
[ "$(left)" -le 0 ] && { echo "HARD_END already passed"; exit 1; }

# ---- 1. EMA 64px demo + live-vs-EMA alignment (short, bank it first) ----
TARGET_ITER=12000 timeout 3600 bash scripts/r4_ema64.sh > /tmp/r7_ema64.log 2>&1
tail -3 /tmp/r7_ema64.log

# ---- 2. flagship chain for the rest of the budget ----
bash scripts/r5_chain.sh > /tmp/r7_chain.log 2>&1
tail -5 /tmp/r7_chain.log
echo R7_SESSION_DONE
