#!/bin/bash
# Round-5 hardware artifact queue (VERDICT r4 items 1, 3, 4, 5, 8).
#
# Runs unattended: waits (bounded) for the tunneled-TPU relay to come back,
# confirms with one un-killed jax probe, then runs every hardware harness
# sequentially, logging each step to outputs/hw_r5_<step>.log.  No kill
# timers on TPU steps — a process killed mid-compile wedges the device
# lease for 10-30 min (CLAUDE.md "Environment gotchas").
#
# If the relay never comes up inside the wait budget, writes a
# machine-readable outputs/hw_r5_blocked.json so a red BENCH_r05.json is
# distinguishable from a broken harness at a glance (VERDICT r4 item 8).
#
# Step failures set a FAIL flag, are summarised at the end, and make the
# script exit nonzero (ADVICE r4: no silent 'QUEUE COMPLETE' over failures).
#
# Usage:  nohup bash tools/run_round5_hw.sh & echo $! > /tmp/hw_r5.pid
# Env:    NBMF_HW_WAIT_S  relay wait budget in seconds (default 41400 = 11.5 h)

set -u
cd "$(dirname "$0")/.."
LOGDIR=outputs
QLOG="$LOGDIR/hw_r5_queue.log"
mkdir -p "$LOGDIR"

note() { echo "$* ($(date -u +%FT%TZ))" | tee -a "$QLOG"; }

FAILED_STEPS=""
step() { # step <name> <cmd...>
  local name=$1; shift
  note "=== START $name: $*"
  "$@" > "$LOGDIR/hw_r5_${name}.log" 2>&1
  local rc=$?
  note "=== END $name rc=$rc"
  if [ $rc -ne 0 ]; then FAILED_STEPS="$FAILED_STEPS $name(rc=$rc)"; fi
  return $rc
}

# --- 1. wait for the relay's 809x listeners (cheap TCP signal) ---------
START_TS=$(date -u +%FT%TZ)
START_S=$(date +%s)
deadline=$(( START_S + ${NBMF_HW_WAIT_S:-41400} ))
probes=0
note "queue start; waiting for relay listeners"
until ss -tln | grep -q ':809'; do
  probes=$((probes + 1))
  if [ "$(date +%s)" -ge "$deadline" ]; then
    note "RELAY NEVER CAME UP"
    python - "$probes" "$START_TS" "$(date -u +%FT%TZ)" <<'PYEOF'
import json, os, sys
probes, start, end = int(sys.argv[1]), sys.argv[2], sys.argv[3]
path = "outputs/hw_r5_blocked.json"
rec = {"relay_up_seconds": 0, "probes": 0, "windows": []}
if os.path.exists(path):
    old = json.load(open(path))
    rec["probes"] = old.get("probes", 0)
    rec["windows"] = old.get("windows") or ([old["window"]] if "window" in old else [])
rec["probes"] += probes
rec["windows"].append([start, end])
json.dump(rec, open(path, "w"))
PYEOF
    exit 7
  fi
  sleep 30
done
RELAY_UP_S=$(( $(date +%s) - START_S ))
note "port up after ${RELAY_UP_S}s (${probes} probes); settling 30s"
sleep 30

# --- 2. confirm with ONE un-killed jax probe ---------------------------
until env JAX_PLATFORMS=axon python -c "
import jax
jax.config.update('jax_platforms', 'axon')
print(jax.devices())
" >> "$QLOG" 2>&1; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    note "PROBE NEVER PASSED"
    printf '{"relay_up_seconds": %d, "probes": %d, "probe_passed": false, "window": ["%s", "%s"]}\n' \
      "$RELAY_UP_S" "$probes" "$START_TS" "$(date -u +%FT%TZ)" > "$LOGDIR/hw_r5_blocked.json"
    exit 7
  fi
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

if [ -n "$FAILED_STEPS" ]; then
  note "QUEUE COMPLETE WITH FAILURES:$FAILED_STEPS"
  exit 1
fi
note "QUEUE COMPLETE (all steps rc=0)"
