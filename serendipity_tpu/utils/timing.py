"""Named wall-clock timer tape (capability of `code/utils.py:154-213` `timer`).

The reference reports per-epoch sample/train splits with a context-manager timer
accumulating into a global named tape (`Procedure.py:31,55-56`).  This is the same
contract, TPU-aware: an optional `sync` callable (e.g. forcing a device value to
host) runs before the stop timestamp so asynchronous dispatch doesn't make blocks
look free.  For deep traces use `utils.logging.profile_trace` (jax.profiler)
instead — this tape is for cheap always-on accounting.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional


class timer:
    NAMED_TAPE: Dict[str, float] = {}
    COUNTS: Dict[str, int] = {}

    def __init__(self, name: str, sync: Optional[Callable[[], None]] = None):
        self.name = name
        self.sync = sync
        timer.NAMED_TAPE.setdefault(name, 0.0)
        timer.COUNTS.setdefault(name, 0)

    def __enter__(self):
        if self.sync is not None:
            self.sync()
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.sync is not None:
            self.sync()
        timer.NAMED_TAPE[self.name] += time.perf_counter() - self.start
        timer.COUNTS[self.name] += 1

    @staticmethod
    def dict(select_keys: Optional[Iterable[str]] = None) -> str:
        """Formatted `|name:seconds|` report, the reference's epoch-log format."""
        keys = timer.NAMED_TAPE.keys() if select_keys is None else select_keys
        return "|" + "".join(f"{k}:{timer.NAMED_TAPE[k]:.2f}|" for k in keys)

    @staticmethod
    def zero(select_keys: Optional[Iterable[str]] = None) -> None:
        keys = list(timer.NAMED_TAPE.keys()) if select_keys is None else select_keys
        for k in keys:
            timer.NAMED_TAPE[k] = 0.0
            timer.COUNTS[k] = 0
