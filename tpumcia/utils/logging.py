"""Structured JSONL metrics logging (SURVEY.md §5 observability plan)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metrics stream (stdout and/or file)."""

    def __init__(self, path: str | Path | None = None, echo: bool = False):
        self._fh = open(path, "a") if path else None
        self._echo = echo or path is None

    def log(self, event: str, **fields) -> dict:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stdout, flush=True)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
