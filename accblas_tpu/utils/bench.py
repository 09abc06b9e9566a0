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

    def timed(k):
        t0 = _time.perf_counter()
        _sync_carry(loop(k, init_carry, *args))
        return _time.perf_counter() - t0

    k_lo = k_min
    _sync_carry(loop(1, init_carry, *args))  # warm-up / compile

    # base time and its jitter (the dispatch floor varies by milliseconds
    # through the tunnel)
    base_samples = [timed(k_lo) for _ in range(3)]
    t_base = min(base_samples)
    jitter = max(max(base_samples) - t_base, 1e-4)

    # grow K until the loop body's signal dominates the jitter; min over two
    # samples per step — one tunnel latency spike on a single sample would
    # freeze k_hi with near-zero true signal and the final slope would be
    # jitter, not kernel time
    def timed2(k):
        return min(timed(k), timed(k))

    k_hi = 8 * k_min
    t_hi = timed2(k_hi)
    while (
        k_hi < k_cap
        and (t_hi - t_base) < max(target_ms / 1e3, 8 * jitter)
    ):
        k_hi = min(k_hi * 4, k_cap)
        t_hi = timed2(k_hi)

    # slope of the min times: min() over reps suppresses host/tunnel noise
    # spikes on each endpoint independently (a per-rep slope can go negative
    # when a spike lands on t_lo)
    t_los = [t_base]
    t_his = [t_hi]
    for _ in range(reps - 1):
        t_los.append(timed(k_lo))
        t_his.append(timed(k_hi))
    slope = (min(t_his) - min(t_los)) / (k_hi - k_lo)
    return slope * 1e3 if slope > 0 else float("nan")


class profile_trace:
    """Optional profiler hook (SURVEY.md §5, tracing): wraps a region in
    ``jax.profiler.trace`` when a directory is given, no-op otherwise —
    the NVTX-style hook the reference lacks."""

    def __init__(self, log_dir=None):
        self.log_dir = log_dir
        self._cm = None

    def __enter__(self):
        if self.log_dir:
            self._cm = jax.profiler.trace(self.log_dir)
            self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            return self._cm.__exit__(*exc)
        return False


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
