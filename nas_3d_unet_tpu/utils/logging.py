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
    values, so other hosts would write interleaved duplicates).

    `tb_dir`: optional TensorBoard mirror (SURVEY.md §5 metrics row:
    "JSONL + optional TensorBoard").  Numeric fields of each record become
    scalar summaries tagged `<event>/<field>`; the step is the record's
    `step` (falling back to `epoch`, then a running record count).
    TensorFlow is imported lazily and only when requested — its absence
    downgrades the mirror to a no-op with one warning line.
    """

    def __init__(self, path: Optional[str] = None, stdout: bool = True,
                 tb_dir: Optional[str] = None):
        primary = _is_primary_process()
        self._file = None
        if path and primary:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a", buffering=1)
        self._stdout = stdout and primary
        self._t0 = time.time()
        self._tb = None
        self._n = 0
        if tb_dir and primary:
            try:
                from tensorflow import summary as tf_summary  # lazy: ~seconds

                self._tb = tf_summary.create_file_writer(tb_dir)
            except Exception as e:  # TF not in the image → JSONL only
                print(json.dumps({"event": "warn",
                                  "msg": f"tensorboard mirror disabled: {e}"}),
                      file=sys.stderr)

    def log(self, **record) -> None:
        record.setdefault("t", round(time.time() - self._t0, 3))
        line = json.dumps(record, default=float)
        if self._file:
            self._file.write(line + "\n")
        if self._stdout:
            print(line, file=sys.stdout, flush=True)
        self._n += 1
        if self._tb is not None:
            self._write_tb(record)

    def _write_tb(self, record: dict) -> None:
        from tensorflow import summary as tf_summary

        prefix = str(record.get("event", "metrics"))
        step = record.get("step", record.get("epoch", self._n - 1))
        with self._tb.as_default():
            for key, val in record.items():
                if key in ("event", "step", "epoch", "t"):
                    continue
                try:
                    f = float(val)
                except (TypeError, ValueError):
                    continue
                tf_summary.scalar(f"{prefix}/{key}", f, step=int(step))
        self._tb.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
