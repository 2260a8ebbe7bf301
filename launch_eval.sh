#!/usr/bin/env bash
# Multi-host pod launcher (the reference's planned launch_eval.sh,
# .gitignore:146-147). Run ONE copy per host; every copy must see the same
# coordinator address and the pod-wide process count.
#
#   TPUMCIA_COORDINATOR=host0:8476 TPUMCIA_NUM_PROCESSES=4 \
#   TPUMCIA_PROCESS_ID=$(hostname_index) ./launch_eval.sh --source h5 --data /data
#
# On Cloud TPU pod slices the three variables are optional —
# jax.distributed.initialize reads the pod metadata. All arguments are
# forwarded to `python -m tpumcia.eval` (plus --distributed).
set -euo pipefail
cd "$(dirname "$0")"
# wait a (documented-routine) TPU tunnel outage out before touching
# the backend; bounded, skippable with TPUMCIA_NO_WAIT=1
if [ -z "${TPUMCIA_NO_WAIT:-}" ]; then
  python -m tpumcia.utils.outage --max-wait "${TPUMCIA_MAX_WAIT:-1200}"
fi
exec python -m tpumcia.eval --config configs/sample_config.json --distributed "$@"
