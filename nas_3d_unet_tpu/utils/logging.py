"""Structured JSONL metrics logging (SURVEY.md §5 metrics row).

The reference logs via print/tqdm only; here every step/epoch record is one
JSON line (machine-readable: step, losses, per-region dice, patches/sec) to
a file and optionally mirrored to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


def _is_primary_process() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:  # no backend (e.g. pure-host tooling) → single process
        return True


class MetricsLogger:
    """Multi-host: only process 0 emits (metrics are computed from replicated
    values, so other hosts would write interleaved duplicates)."""

    def __init__(self, path: Optional[str] = None, stdout: bool = True):
        primary = _is_primary_process()
        self._file = None
        if path and primary:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a", buffering=1)
        self._stdout = stdout and primary
        self._t0 = time.time()

    def log(self, **record) -> None:
        record.setdefault("t", round(time.time() - self._t0, 3))
        line = json.dumps(record, default=float)
        if self._file:
            self._file.write(line + "\n")
        if self._stdout:
            print(line, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
