"""Structured per-step metrics logging (SURVEY.md section 5, metrics row).

The reference prints epoch/batch averages via an ``AverageMeter``
(SURVEY.md 2.11); here the jitted step returns a metrics dict (joint /
unimodal / KL terms separately -- needed for the ELBO-trajectory
comparison [B:5]) and this module accumulates and writes them as JSONL,
no external deps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

__all__ = ["AverageMeter", "MetricsWriter"]


class AverageMeter:
    """Running average, reference-style (SURVEY.md 2.11)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricsWriter:
    """Append-only JSONL metrics sink: one record per call."""

    def __init__(self, workdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, filename)
        self._fh = open(self.path, "a", buffering=1)

    def write(self, record: dict[str, Any]) -> None:
        def clean(v):
            if isinstance(v, (np.ndarray, np.generic)):
                return np.asarray(v).tolist()
            if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
                return v.item()
            if hasattr(v, "tolist"):
                return v.tolist()
            return v

        rec = {k: clean(v) for k, v in record.items()}
        rec.setdefault("time", time.time())
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()
