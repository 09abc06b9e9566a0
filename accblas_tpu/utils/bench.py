"""Measurement protocol — faithful reproduction of the reference harness.

``benchmark_function`` (reference ``cuda/utils.cuh:236-262``): one warm-up call
followed by a device sync, then ``bench_iters = 10`` timed repetitions, return
the **minimum** time in milliseconds; with ``skip=True`` run once and return 0
(used by the drivers' error mode). CUDA event timing maps to wall-clock around
``jax.block_until_ready`` — on TPU the dispatch gap is amortized by the jitted
function boundary, and the warm-up call doubles as the compile step.
"""

from __future__ import annotations

import time

import jax

BENCH_ITERS = 10  # reference: bench_iters, cuda/utils.cuh:239


def synchronize(x=None):
    """Analogue of ``synchronize()`` (``cuda/utils.cuh:107``)."""
    if x is not None:
        return jax.block_until_ready(x)
    # no handle: effectively a full-device barrier via a tiny op
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros(()))
    return None


def benchmark_function(func, skip: bool = False, iters: int = BENCH_ITERS) -> float:
    """Run `func` with the reference protocol, return min time in ms.

    `func` must return the values it produces (so block_until_ready can wait
    on real device work — the CudaTimer.stop() sync analogue,
    ``cuda/utils.cuh:154-158``).
    """
    out = func()  # warm-up (+ JIT compile)
    synchronize(out)
    if skip:
        return 0.0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = func()
        synchronize(out)
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) * 1e3)
    return best


class Timer:
    """RAII-style wall timer, the CudaTimer analogue (``cuda/utils.cuh:144-182``)."""

    def __init__(self):
        self._t0 = None
        self._ms = 0.0

    def start(self):
        synchronize()
        self._t0 = time.perf_counter()

    def stop(self, handle=None):
        synchronize(handle)
        self._ms += (time.perf_counter() - self._t0) * 1e3

    def reset(self):
        self._ms = 0.0

    def get_time(self) -> float:
        return self._ms
