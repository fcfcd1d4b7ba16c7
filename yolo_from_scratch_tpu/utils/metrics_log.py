"""Structured metrics logging + profiling hooks.

The reference logs to stdout only (reference: train.py:1528-1531). Per
SURVEY.md §5.1/§5.5 the framework adds: a JSONL metrics stream (one record
per epoch with losses, val metrics, LR, throughput) and an optional
`jax.profiler` trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metrics writer."""

    def __init__(self, path=None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, record: dict):
        if not self.path:
            return
        record = dict(record, ts=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


@contextlib.contextmanager
def profiler_trace(logdir=None):
    """Wrap a region in a jax.profiler trace when a logdir is given."""
    import jax

    if logdir:
        jax.profiler.start_trace(str(logdir))
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
