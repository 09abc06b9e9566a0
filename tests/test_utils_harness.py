"""Utility-layer parity components: benchmark_function protocol (C10),
Timer (C8), write_random / format_mtx (C16), device_info (C20)."""

import numpy as np
import jax.numpy as jnp

from accblas_tpu.utils import (
    MatrixInfo,
    Timer,
    benchmark_function,
    format_mtx,
    gen_mtx,
    write_random,
)
from accblas_tpu.bench.common import device_info, sweep_sizes


def test_benchmark_function_protocol():
    calls = []

    def f():
        calls.append(1)
        return jnp.zeros(())

    ms = benchmark_function(f, iters=3)
    assert ms >= 0.0
    assert len(calls) == 4  # 1 warmup + 3 timed (reference: warmup + N reps)
    calls.clear()
    assert benchmark_function(f, skip=True) == 0.0  # error-mode skip
    assert len(calls) == 1


def test_timer():
    t = Timer()
    t.start()
    _ = jnp.zeros((128,)) + 1.0
    t.stop()
    assert t.get_time() >= 0.0
    t.reset()
    assert t.get_time() == 0.0


def test_write_random_and_format():
    buf = np.zeros((8, 16))
    write_random(buf, MatrixInfo(8, 10), seed=5)
    assert np.all(buf[:, :10] != 0)
    np.testing.assert_array_equal(buf[:, 10:], 0.0)
    s = format_mtx(buf)
    assert isinstance(s, str) and "[" in s


def test_device_info_and_sweeps():
    kind, bw = device_info()
    assert bw > 0

    class A:
        sweep = "pow2"
        size = 8192

    assert sweep_sizes(A, 1024, 1024, 0) == [1024, 2048, 4096, 8192]
    A.sweep = "single"
    assert sweep_sizes(A, 1024, 1024, 0) == [8192]
    A.sweep = "dense"
    assert sweep_sizes(A, 1024, 1024, 2048)[:2] == [1024, 3072]

    # --min-size resume: same residue class as the full grid's tail, so a
    # resumed campaign's rows concatenate with the flushed CSV prefix
    class B:
        sweep = "dense"
        size = 24576
        step = 256
        min_size = 16512

    full = sweep_sizes(type("F", (), {"sweep": "dense", "size": 24576,
                                      "step": 256}), 128, 128, 1024)
    tail = sweep_sizes(B, 128, 128, 1024)
    assert tail == [s for s in full if s >= 16512]
    assert tail[0] == 16512 and tail[-1] == 24576
