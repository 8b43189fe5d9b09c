"""Metrics logging and step timing.

Replaces the reference's TensorBoard writers + `timer` tape + colored prints
(`code/utils.py:154-213`, `lightGCN/.../main.py:47-54`, `LightGCN.py:60-105`) with a
JSONL metrics log (one record per event, machine-readable), stdout echo, and a
`jax.profiler` trace hook.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None, echo: bool = True):
        self.echo = echo
        self.path = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, "metrics.jsonl")

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "t": time.time(), **fields}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.echo:
            body = " ".join(
                f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {body}")


class Timer:
    """Named wall-clock tape (role of `code/utils.py:154-213`)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}" for k, v in self.totals.items()
        )


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str]) -> Iterator[None]:
    """`jax.profiler` trace context; no-op when out_dir is falsy."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
