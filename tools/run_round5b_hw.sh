#!/bin/bash
# Round-5 (session B) hardware artifact queue — relay is UP this session.
#
# Differences from run_round5_hw.sh (which spent its whole budget waiting
# through an 11.5 h relay outage, outputs/hw_r5_blocked.json):
#   * no long relay wait (quick probe only — the relay is up right now);
#   * a STEP-START DEADLINE: after NBMF_HW_DEADLINE_S seconds no new step
#     starts, so no TPU process is still holding the device lease when the
#     driver runs bench.py at round end (two processes contending for the
#     single tunneled chip would turn a working build into a red BENCH);
#   * ordered cheapest->most-expendable: coldstart -> flagship headline+
#     sparse -> shapes -> tpu pytest record -> ceiling rows.
#
# Step failures set a FAIL flag, are summarised, and exit nonzero.
#
# Usage:  nohup bash tools/run_round5b_hw.sh & echo $! > /tmp/hw_r5b.pid
# Env:    NBMF_HW_DEADLINE_S  step-start deadline in seconds (default 2400)

set -u
cd "$(dirname "$0")/.."
LOGDIR=outputs
QLOG="$LOGDIR/hw_r5_queue.log"
mkdir -p "$LOGDIR"

note() { echo "$* ($(date -u +%FT%TZ))" | tee -a "$QLOG"; }

START_S=$(date +%s)
DEADLINE=$(( START_S + ${NBMF_HW_DEADLINE_S:-2400} ))

FAILED_STEPS=""
SKIPPED_STEPS=""
step() { # step <name> <cmd...>
  local name=$1; shift
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "=== SKIP $name (past step-start deadline)"
    SKIPPED_STEPS="$SKIPPED_STEPS $name"
    return 0
  fi
  note "=== START $name: $*"
  "$@" > "$LOGDIR/hw_r5_${name}.log" 2>&1
  local rc=$?
  note "=== END $name rc=$rc"
  if [ $rc -ne 0 ]; then FAILED_STEPS="$FAILED_STEPS $name(rc=$rc)"; fi
  return $rc
}

# --- 1. quick relay check (no long wait — bail fast if it just died) ----
if ! ss -tln | grep -q ':809'; then
  note "relay listeners absent at queue-b start; aborting"
  exit 7
fi
until env JAX_PLATFORMS=axon python -c "
import jax
jax.config.update('jax_platforms', 'axon')
print(jax.devices())
" >> "$QLOG" 2>&1; do
  if [ "$(date +%s)" -ge "$(( START_S + 300 ))" ]; then
    note "PROBE NEVER PASSED (5 min)"
    exit 7
  fi
  note "port up but probe failed; retrying in 60s"
  sleep 60
done
note "device probe OK; running queue-b (deadline in $(( DEADLINE - $(date +%s) ))s)"

# --- 2. the artifact queue (cheapest / highest-value first) -------------
step coldstart  python tools/bench_coldstart.py
step flagship   python experiments/flagship_scale.py --sparse
step shapes     python tools/bench_shapes.py
step tpu_pytest env NBMF_TEST_PLATFORM=axon python -m pytest tests/ -m tpu -q
step ceiling4e9 python experiments/flagship_scale.py --only ceiling_4e9 --append
step ceiling1e10 python experiments/flagship_scale.py --only ceiling_1e10 --append

RES=0
if [ -n "$FAILED_STEPS" ]; then
  note "QUEUE-B COMPLETE WITH FAILURES:$FAILED_STEPS"
  RES=1
else
  note "QUEUE-B COMPLETE (all run steps rc=0)"
fi
[ -n "$SKIPPED_STEPS" ] && note "skipped past deadline:$SKIPPED_STEPS"
exit $RES
