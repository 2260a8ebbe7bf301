#!/usr/bin/env bash
# Config-driven evaluation (the reference's planned eval.sh, SURVEY.md §0.2).
# Usage: ./eval.sh [--source h5|folder|synthetic] [--data DIR] [...]
set -euo pipefail
cd "$(dirname "$0")"
# wait a (documented-routine) TPU tunnel outage out before touching
# the backend; bounded, skippable with TPUMCIA_NO_WAIT=1
if [ -z "${TPUMCIA_NO_WAIT:-}" ]; then
  python -m tpumcia.utils.outage --max-wait "${TPUMCIA_MAX_WAIT:-1200}"
fi
exec python -m tpumcia.eval --config configs/sample_config.json "$@"
