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


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stdout: bool = True):
        self._file = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a", buffering=1)
        self._stdout = stdout
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
