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


def _sync_carry(carry):
    """Force completion via a real device-to-host read (under remote-tunnel
    transports plain block_until_ready can return before device work ends)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(carry)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])
    return carry


def benchmark_loop(body, init_carry, *, args=(), reps: int = 3, target_ms: float = 250.0,
                   k_min: int = 4, k_cap: int = 50_000) -> float:
    """Per-iteration kernel time in ms, measured as the slope of chained
    in-device loops — the TPU-faithful analogue of the reference's CUDA-event
    timing (``cuda/utils.cuh:144-182``): like device events, it excludes host
    dispatch latency (which through a remote TPU tunnel can exceed the kernel
    time by orders of magnitude).

    `body(carry, *args) -> carry` must CONSUME the carry inside the measured
    op; operand arrays go in `args` (NOT python closures — closed-over device
    arrays get baked into the executable as multi-GB constants). All
    accblas kernels provide a chain point: DOT's `init`, GEMV's `res`, TRSV's
    `b`), otherwise XLA hoists the loop-invariant computation and the
    measurement is fiction.

    Protocol: one compiled fori_loop with a *runtime* trip count (single
    compile), warm-up, then `reps` repetitions of the (K_lo, K_hi) pair; the
    minimum slope is returned (min over reps, like the reference's min over
    10 timed launches, ``cuda/utils.cuh:236-262``).
    """
    import time as _time

    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(k, carry, *a):
        return lax.fori_loop(0, k, lambda i, c: body(c, *a), carry)

    k_lo = k_min
    # warm-up / compile, and a probe to size K_hi
    _sync_carry(loop(1, init_carry, *args))
    t0 = _time.perf_counter()
    _sync_carry(loop(4 * k_min, init_carry, *args))
    t_probe = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    _sync_carry(loop(k_min, init_carry, *args))
    t_base = _time.perf_counter() - t0
    per_est = max((t_probe - t_base) / (3 * k_min), 1e-7)
    k_hi = int(min(max(target_ms / 1e3 / per_est, 8 * k_min), k_cap))

    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        _sync_carry(loop(k_lo, init_carry, *args))
        t_lo = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        _sync_carry(loop(k_hi, init_carry, *args))
        t_hi = _time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
    return best * 1e3


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
