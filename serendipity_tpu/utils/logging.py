"""Metrics logging and step timing.

Replaces the reference's TensorBoard writers + colored prints
(`lightGCN/.../main.py:47-54`, `LightGCN.py:60-105`, `Procedure.py:52-53,164-170`)
with a JSONL metrics log (one record per event, machine-readable), stdout echo, an
optional TensorBoard scalar mirror (same scalars the reference writers emitted), and
a `jax.profiler` trace hook.  The named timer tape lives in `utils.timing`.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator, Optional


class MetricsLogger:
    def __init__(
        self, out_dir: Optional[str] = None, echo: bool = True, tensorboard: bool = False
    ):
        self.echo = echo
        self.path = None
        self._tb = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, "metrics.jsonl")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except Exception:
                    self._tb = None  # tensorboard not installed: JSONL still has it all

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "t": time.time(), **fields}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            step = int(fields.get("epoch", fields.get("step", 0)) or 0)
            for k, v in fields.items():
                if isinstance(v, (int, float)) and k not in ("epoch", "step"):
                    self._tb.add_scalar(f"{event}/{k}", float(v), step)
        if self.echo:
            body = " ".join(
                f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {body}")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


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
