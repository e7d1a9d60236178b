"""Structured metrics logging.

The reference logs human-readable lines to a per-run logfile passed into
``train(logfile=...)`` and writes prediction/error-rate files per epoch
(SURVEY.md §5.5).  This framework keeps that workflow and adds structured
JSONL metrics (step, loss, lr, frames/sec, ...) for machines.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """JSONL metrics + optional human-readable logfile."""

    def __init__(self, run_dir: str, logfile: Optional[str] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._log = logging.getLogger("avsr_tpu")
        if not self._log.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            self._log.addHandler(h)
            self._log.setLevel(logging.INFO)
        if logfile:
            fh = logging.FileHandler(logfile)
            fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            self._log.addHandler(fh)

    def log(self, kind: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {"kind": kind, "time": time.time()}
        for k, v in fields.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def info(self, msg: str) -> None:
        self._log.info(msg)

    def close(self) -> None:
        self._jsonl.close()
