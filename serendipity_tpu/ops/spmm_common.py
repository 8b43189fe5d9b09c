"""Split representation of prebuilt SpMM operators: device arrays + bind fn.

Why not plain closures: a closure over concrete device arrays turns them into jit
CONSTANTS at trace time.  That (a) serializes megabytes (for the hybrid layout,
hundreds of MB) of adjacency data into the HLO on every compile — pathological on
remote-compile TPU toolchains — and (b) is impossible under multi-controller
`jax.distributed`, where a constant spanning non-addressable devices cannot be
fetched at all (tests/test_distributed.py).

`SplitSpmm` carries the arrays as a pytree (`consts`) plus a `bind` function that
rebuilds the operator closures from them.  Jitted code passes `consts` as an
ARGUMENT and calls `bind` on the traced values inside the trace; `jax.custom_vjp`
closures over tracers are supported, so the scatter-free VJPs survive unchanged.
Eager code (embedding export, one-off evaluations) uses `.ops()`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class SplitSpmm:
    consts: Any               # pytree of device arrays (layout + weights)
    bind: Callable[[Any], Any]  # consts -> spmm_ops (op closure or (ui, iu) pair)

    def ops(self):
        """Bound closures over the concrete arrays — for use OUTSIDE jit."""
        return self.bind(self.consts)
