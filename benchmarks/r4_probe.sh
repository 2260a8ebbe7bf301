#!/bin/bash
# Round-4 TPU measurement runbook. Waits out any tunnel outage, then runs
# every queued experiment, appending results to benchmarks/r4_probe_results.txt.
# Each experiment runs in its own subprocess because the kernel knobs
# (TPUMCIA_KERNEL_*) are read at import. Mosaic compiles are cached under
# .jax_cache, so re-runs are cheap.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=benchmarks/r4_probe_results.txt

echo "== r4 probe started $(date -u +%FT%TZ) ==" >> "$LOG"
python -m tpumcia.utils.outage --max-wait "${R4_MAX_WAIT:-7200}" \
  || { echo "backend never came up" >> "$LOG"; exit 1; }
echo "backend up $(date -u +%FT%TZ)" >> "$LOG"

run() {  # run LABEL [ENV=V ...] -- cmd...
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "--- $label (${envs[*]:-none}) $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2700 env "${envs[@]}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# 0. e2e bench FIRST: warms the driver-relevant compile cache and
# records a headline number as early as possible in the tunnel window
run bench_default -- python bench.py

# 1. MFU + kernel timing at HEAD (wire + full)
run mfu_baseline -- python benchmarks/mfu.py

# 2. ablation bisection (results WRONG by design; timing only)
for a in g onehot recovery hist epilogue; do
  run "ablate_$a" TPUMCIA_KERNEL_ABLATE=$a -- python benchmarks/mfu.py
done

# 3. v6 schedule candidates
run sched_pipelined TPUMCIA_KERNEL_SCHED=pipelined -- python benchmarks/mfu.py
run sched_phased    TPUMCIA_KERNEL_SCHED=phased    -- python benchmarks/mfu.py

# 4. rolled neighbour stream (prologue + HBM halving)
run shift_roll TPUMCIA_KERNEL_SHIFT=roll -- python benchmarks/mfu.py
run roll_plus_pipelined TPUMCIA_KERNEL_SHIFT=roll TPUMCIA_KERNEL_SCHED=pipelined \
  -- python benchmarks/mfu.py

# 4b. pipelined schedule with more steps per image (smaller chunks)
run pipelined_chunk1024 TPUMCIA_KERNEL_SCHED=pipelined TPUMCIA_KERNEL_CHUNK=1024 \
  -- python benchmarks/mfu.py
run pipelined_chunk2048 TPUMCIA_KERNEL_SCHED=pipelined TPUMCIA_KERNEL_CHUNK=2048 \
  -- python benchmarks/mfu.py

# 5. one-shot decomposition (VERDICT #7)
run oneshot -- python benchmarks/oneshot_probe.py

# 6. e2e bench variants
run bench_async_head TPUMCIA_HEAD_FETCH=async -- python bench.py
run bench_roll TPUMCIA_KERNEL_SHIFT=roll -- python bench.py

# 7. refresh the 5-config record (link-stamped lines for BENCHMARKS.md)
run configs -- python benchmarks/run_configs.py

echo "== r4 probe done $(date -u +%FT%TZ) ==" >> "$LOG"
