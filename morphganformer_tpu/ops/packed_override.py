"""Trace-time override disabling every packed pallas path.

The packed kernels carry custom VJPs whose backwards are raw pallas
launches — first-order gradients are exact and fast, but SECOND-order
autodiff (differentiating through the backward) is undefined for them.
The two places that need it — path-length regularization (grad of a
grad-norm through G) and R1 (grad of a gradient penalty through D) —
trace their model applies inside `force_unpacked()`, falling back to the
XLA layers which JAX differentiates to any order. These stages run at
1/4 and 1/16 of main-stage frequency (lazy regularization), so the
unpacked cost is amortized away.

The flag is consulted by the packed-path gates at TRACE time (they are
ordinary Python), so the context manager need only enclose the traced
apply, even inside jit.
"""

from __future__ import annotations

import contextlib

_FORCE_UNPACKED = False


def packed_paths_disabled() -> bool:
    return _FORCE_UNPACKED


@contextlib.contextmanager
def force_unpacked():
    global _FORCE_UNPACKED
    prev = _FORCE_UNPACKED
    _FORCE_UNPACKED = True
    try:
        yield
    finally:
        _FORCE_UNPACKED = prev
