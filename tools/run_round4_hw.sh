#!/bin/bash
# Round-4 hardware artifact queue (VERDICT r3 items 1-5, 8).
#
# Runs unattended: waits (bounded) for the tunneled-TPU relay to come back,
# confirms with one un-killed jax probe, then runs every hardware harness
# sequentially, logging each step to outputs/hw_r4_<step>.log.  No kill
# timers on TPU steps — a process killed mid-compile wedges the device
# lease for 10-30 min (CLAUDE.md "Environment gotchas").
#
# Usage:  nohup bash tools/run_round4_hw.sh & echo $! > /tmp/hw_r4.pid
# Env:    NBMF_HW_WAIT_S  relay wait budget in seconds (default 21600 = 6 h)

set -u
cd "$(dirname "$0")/.."
LOGDIR=outputs
QLOG="$LOGDIR/hw_r4_queue.log"
mkdir -p "$LOGDIR"

note() { echo "$* ($(date -u +%FT%TZ))" | tee -a "$QLOG"; }

step() { # step <name> <cmd...>
  local name=$1; shift
  note "=== START $name: $*"
  "$@" > "$LOGDIR/hw_r4_${name}.log" 2>&1
  local rc=$?
  note "=== END $name rc=$rc"
  return $rc
}

# --- 1. wait for the relay's 809x listeners (cheap TCP signal) ---------
deadline=$(( $(date +%s) + ${NBMF_HW_WAIT_S:-21600} ))
note "queue start; waiting for relay listeners"
until ss -tln | grep -q ':809'; do
  if [ "$(date +%s)" -ge "$deadline" ]; then note "RELAY NEVER CAME UP"; exit 7; fi
  sleep 30
done
note "port up; settling 30s"
sleep 30

# --- 2. confirm with ONE un-killed jax probe ---------------------------
until env JAX_PLATFORMS=axon python -c "
import jax
jax.config.update('jax_platforms', 'axon')
print(jax.devices())
" >> "$QLOG" 2>&1; do
  if [ "$(date +%s)" -ge "$deadline" ]; then note "PROBE NEVER PASSED"; exit 7; fi
  note "port up but probe failed; retrying in 60s"
  sleep 60
done
note "device probe OK; running queue"

# --- 3. the artifact queue (cheap->expensive) ---------------------------
# Flagship runs are split so one config's failure cannot abort the others:
# headline+sparse first (rewrites the CSV), then each ceiling row appended.
step tpu_pytest env NBMF_TEST_PLATFORM=axon python -m pytest tests/ -m tpu -q
step bench      python bench.py
step shapes     python tools/bench_shapes.py
step coldstart  python tools/bench_coldstart.py
step flagship   python experiments/flagship_scale.py --sparse
step ceiling4e9 python experiments/flagship_scale.py --only ceiling_4e9 --append
step ceiling1e10 python experiments/flagship_scale.py --only ceiling_1e10 --append
note "QUEUE COMPLETE"
