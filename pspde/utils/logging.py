"""Structured metrics logging (SURVEY.md section 5.5).

The reference appends Python lists and prints (solver.py:112-119,
533-548).  :class:`MetricsLogger` keeps that in-memory log dict AND can
stream each iteration as one JSONL line for external observability.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Optional


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None):
        self.history: dict[str, list] = {}
        self._fh: Optional[IO] = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
            self._fh = open(jsonl_path, "a")

    def log(self, step: int, **metrics):
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(v)
        if self._fh is not None:
            rec = {"step": step, "time": time.time(), **metrics}
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __getitem__(self, k):
        return self.history[k]
