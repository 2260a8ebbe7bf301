#!/bin/bash
# Round-4 follow-up: idle-host config refresh + oneshot + anatomy at the
# new kernel defaults (roll + pipelined). Waits out tunnel outages first.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=benchmarks/r4_probe_results.txt

echo "== r4 probe3 started $(date -u +%FT%TZ) ==" >> "$LOG"
python -m tpumcia.utils.outage --max-wait "${R4_MAX_WAIT:-10800}" \
  || { echo "backend never came up" >> "$LOG"; exit 1; }
echo "backend up $(date -u +%FT%TZ)" >> "$LOG"

run() {
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "--- $label (${envs[*]:-none}) $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2700 env "${envs[@]}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

run configs_v2defaults -- python benchmarks/run_configs.py
run oneshot_v2defaults -- python benchmarks/oneshot_probe.py
run anatomy_v2defaults -- python benchmarks/anatomy_probe.py
echo "== r4 probe3 done $(date -u +%FT%TZ) ==" >> "$LOG"
