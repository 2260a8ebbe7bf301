#!/bin/bash
# Round-4 follow-up probes: e2e bench for the untested sched x roll combos.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=benchmarks/r4_probe_results.txt

echo "== r4 probe2 started $(date -u +%FT%TZ) ==" >> "$LOG"
python -m tpumcia.utils.outage --max-wait "${R4_MAX_WAIT:-7200}" \
  || { echo "backend never came up" >> "$LOG"; exit 1; }

run() {
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "--- $label (${envs[*]:-none}) $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2700 env "${envs[@]}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

run mfu_roll_phased TPUMCIA_KERNEL_SHIFT=roll TPUMCIA_KERNEL_SCHED=phased -- python benchmarks/mfu.py
run bench_roll_phased TPUMCIA_KERNEL_SHIFT=roll TPUMCIA_KERNEL_SCHED=phased -- python bench.py
run bench_roll_pipelined TPUMCIA_KERNEL_SHIFT=roll TPUMCIA_KERNEL_SCHED=pipelined -- python bench.py
echo "== r4 probe2 done $(date -u +%FT%TZ) ==" >> "$LOG"
