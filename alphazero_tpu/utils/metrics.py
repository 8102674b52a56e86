"""Structured metrics logging.

Replaces the reference's ``print`` + per-game file loggers (utils.py:71-90,
train.py:77-83) with JSON-line records to stdout and an optional file —
machine-readable env-steps/s, sims/s, losses, win rates (SURVEY.md §5)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stdout: bool = True):
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh: Optional[IO] = open(path, "a") if path else None
        self._stdout = stdout
        self._t0 = time.time()

    def log(self, kind: str, **fields):
        rec = {"kind": kind, "t": round(time.time() - self._t0, 3), **fields}
        line = json.dumps(rec, default=float)
        if self._stdout:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
