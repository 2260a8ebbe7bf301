"""Structured JSONL metrics logging (SURVEY.md §5 observability plan)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def _json_default(o):
    item = getattr(o, "item", None)
    if item is not None and getattr(o, "ndim", 1) == 0:
        return item()  # numpy/jax scalar
    tolist = getattr(o, "tolist", None)
    if tolist is not None:
        return tolist()  # numpy/jax array
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


class MetricsLogger:
    """Append-only JSONL metrics stream (stdout and/or file)."""

    def __init__(self, path: str | Path | None = None, echo: bool = False):
        self._fh = open(path, "a") if path else None
        self._echo = echo or path is None

    def log(self, event: str, **fields) -> dict:
        rec = {"ts": time.time(), "event": event, **fields}
        # numpy scalars/arrays serialize instead of TypeError-ing a
        # multi-hour run at a log call (call sites no longer hand-cast)
        line = json.dumps(rec, default=_json_default)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stdout, flush=True)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
