#!/bin/bash
# Round-3 measurement sequence, resumable across TPU-tunnel deaths.
#
# Runs (in order), skipping steps whose .done marker exists:
#   1. tools/hybrid_operating_point.py (budget dial: smallest error-safe
#      budget that clears 500 Mrays/s; writes /tmp/r3_logs/oppoint_512.json)
#   2. the 72-pose hybrid sweep AT that budget (north-star error check;
#      per-pose checkpoints inside tools/hybrid_sweep.py survive deaths)
#   3. bench.py --all with VOK_HYBRID_BUDGET pinned to the same point
#   4. tools/prequad_ab.py (exact-kernel int32-quad layout A/B)
# Each step first waits for the tunnel to answer a devices() probe; a step
# that fails MAX_FAILS times with the tunnel alive is marked .failed and
# skipped so a deterministic bug can't wedge the sequence. Logs land in
# /tmp/r3_logs/.
set -u
mkdir -p /tmp/r3_logs
cd "$(dirname "$0")/.."

wait_tunnel() {
  while true; do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "[r3] tunnel alive $(date)"; return 0
    fi
    echo "[r3] tunnel dead, retrying $(date)"; sleep 120
  done
}

MAX_FAILS=4

run_step() {  # name cmd...
  local name=$1; shift
  local marker=/tmp/r3_logs/$name.done
  local fails=0
  [ -f "$marker" ] && { echo "[r3] $name already done"; return 0; }
  while true; do
    wait_tunnel
    echo "[r3] starting $name $(date)"
    local rc=0
    timeout 7200 "$@" >> /tmp/r3_logs/$name.log 2>&1 || rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$marker"; echo "[r3] $name DONE $(date)"; return 0
    fi
    # only count failures with the tunnel still alive afterwards: a death
    # mid-step is the tunnel's fault, not the step's
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      fails=$((fails + 1))
    fi
    if [ "$fails" -ge "$MAX_FAILS" ]; then
      touch /tmp/r3_logs/$name.failed
      echo "[r3] $name FAILED $fails times on a live tunnel, skipping $(date)"
      return 1
    fi
    echo "[r3] $name failed/timed out (rc=$rc, live-fails=$fails), will retry $(date)"
    sleep 60
  done
}

run_step oppoint python tools/hybrid_operating_point.py 512

# if I=512 has no conjunction point, probe I=256 (cheaper fast frame ->
# more budget fits under 2.1 ms; 2x the fast error -> selection works
# harder) before settling
II=512
if python -c "import json,sys; op=json.load(open('/tmp/r3_logs/oppoint_512.json'))['operating_point']; sys.exit(0 if op else 1)" 2>/dev/null; then
  :
else
  run_step oppoint256 python tools/hybrid_operating_point.py 256
  if python -c "import json,sys; op=json.load(open('/tmp/r3_logs/oppoint_256.json'))['operating_point']; sys.exit(0 if op else 1)" 2>/dev/null; then
    II=256
  fi
fi

# budget from the measured operating point (fallback 64: the midpoint if
# no probe found a conjunction — the sweep still reports honest errors)
BUDGET=$(python - <<EOF
import json
try:
    op = json.load(open("/tmp/r3_logs/oppoint_${II}.json"))["operating_point"]
    print(op["budget"] if op else 64)
except Exception:
    print(64)
EOF
)
echo "[r3] hybrid operating point: I=$II budget=$BUDGET"

run_step hybrid_sweep python tools/hybrid_sweep.py "$BUDGET" "$II"
VOK_HYBRID_BUDGET=$BUDGET VOK_HYBRID_II=$II run_step bench_all python bench.py --all
# prequad A/B: measured NEUTRAL (0.990x) in round 3 — stays opt-in, not re-run
echo "[r3] all steps complete $(date)"
