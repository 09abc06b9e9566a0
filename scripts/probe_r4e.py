"""Probe r4e: native Pallas f8 GEMV (f32 arithmetic over e4m3 storage).

Follow-up to probe_r4a: if its E-variant shows Mosaic streams 2-D f8->f32
conversion near HBM speed at big blocks, a native kernel can beat the
shipped kcols=8 XLA GEMM-embed (1352 GF/s = 83% of the 1638 GF/s roofline
at 24576^2, VERDICT r3 #5 target >=1475). Three kernel forms, each at
several block shapes:

  V1  VPU convert+fold: A block (bm, bn) f8 -> f32, multiply by an f32
      x row, fold bn into 128-lane partials, accumulate in VMEM scratch,
      row-sum on the last column step. (The shipped df64 fullrow kernel's
      shape, minus the EFT chains.)
  V2  MXU f8 dot: A block f8 x an f8 (bn, 8) x-embed (col 0 = x) ->
      dot_general f8xf8->f32 on the MXU per block. Tests whether Mosaic's
      MXU path takes e4m3 operands directly like XLA's GEMM emitter does.
  V3  MXU f32 dot: convert the A block to f32 and contract with an f32
      (bn, 1) x column. Convert cost + f32 MXU throughput.

Correctness: each variant is checked against the XLA reference on the
first (small) shape before timing. CPU: run with ACCBLAS_INTERPRET=1 to
validate all forms in interpret mode (no timing).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4e.py
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("ACCBLAS_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from accblas_tpu.ops.common import compiler_params  # noqa: E402
from accblas_tpu.utils import devgen  # noqa: E402
from accblas_tpu.utils.bench import benchmark_loop  # noqa: E402

print("devices:", jax.devices(), flush=True)

F8 = jnp.float8_e4m3fn
ROOF = 819.0


# ---------------- V1: VPU convert + 128-lane fold ----------------
def _v1_kernel(x_ref, a_ref, o_ref, acc, *, bn, nsj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    av = a_ref[...].astype(jnp.float32)          # (bm, bn)
    xv = x_ref[...]                              # (1, bn) f32
    p = av * xv                                  # (bm, bn)
    bm = av.shape[0]
    p = p.reshape(bm, bn // 128, 128).sum(axis=1)  # (bm, 128)
    acc[...] = acc[...] + p

    @pl.when(j == nsj - 1)
    def _fin():
        o_ref[...] = jnp.sum(acc[...], axis=1, keepdims=True)


def make_v1(n, bm, bn):
    grid = (n // bm, n // bn)
    call = pl.pallas_call(
        functools.partial(_v1_kernel, bn=bn, nsj=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 128), jnp.float32)],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=INTERPRET,
    )

    def run(a, x32):
        return call(x32.reshape(1, n), a).reshape(n)

    return run


# ---------------- V2: MXU f8 x f8 dot ----------------
def _v2_kernel(x_ref, a_ref, o_ref, acc, *, nsj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    av = a_ref[...]                              # (bm, bn) f8
    xv = x_ref[...]                              # (bn, 8) f8, col 0 = x
    acc[...] = acc[...] + jax.lax.dot_general(
        av, xv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nsj - 1)
    def _fin():
        o_ref[...] = acc[...][:, :1]


def make_v2(n, bm, bn):
    grid = (n // bm, n // bn)
    call = pl.pallas_call(
        functools.partial(_v2_kernel, nsj=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, 8), lambda i, j: (j, 0)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 8), jnp.float32)],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=INTERPRET,
    )

    def run(a, x8emb):
        return call(x8emb, a).reshape(n)

    return run


# ---------------- V3: convert + MXU f32 dot ----------------
def _v3_kernel(x_ref, a_ref, o_ref, acc, *, nsj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    av = a_ref[...].astype(jnp.float32)          # (bm, bn)
    xv = x_ref[...]                              # (bn, 1) f32
    acc[...] = acc[...] + jax.lax.dot_general(
        av, xv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nsj - 1)
    def _fin():
        o_ref[...] = acc[...]


def make_v3(n, bm, bn):
    grid = (n // bm, n // bn)
    call = pl.pallas_call(
        functools.partial(_v3_kernel, nsj=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=INTERPRET,
    )

    def run(a, x32):
        return call(x32.reshape(n, 1), a).reshape(n)

    return run


N_SMALL = 1024
a8_small = devgen.gen_f32((N_SMALL, N_SMALL), 7, "p4e_as").astype(F8)
a8x_small = devgen.gen_f32((N_SMALL,), 7, "p4e_xs").astype(F8)
x32_small = a8x_small.astype(jnp.float32)
x8e_small = jnp.zeros((N_SMALL, 8), F8).at[:, 0].set(a8x_small)

# correctness gate on the small shape
variants = []
for name, maker, xarg in (
    ("V1 vpu-fold", make_v1, "x32"),
    ("V2 mxu-f8", make_v2, "x8e"),
    ("V3 mxu-f32", make_v3, "x32"),
):
    for bm, bn in ((256, 1024), (512, 512), (512, 1024), (32, 1024)):
        try:
            fn = maker(N_SMALL, min(bm, N_SMALL), min(bn, N_SMALL))
            xs = {"x32": x32_small, "x8e": x8e_small}[xarg]
            got = np.asarray(jax.jit(fn)(a8_small, xs))
            want = np.asarray(
                jnp.matmul(
                    a8_small,
                    jnp.zeros((N_SMALL, 8), F8).at[:, 0].set(a8x_small),
                    preferred_element_type=jnp.float32,
                )[:, 0]
            )
            rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30))
            ok = rel < 1e-5
            print(f"{name} ({bm},{bn}) check rel={rel:.2e} "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)
            if ok:
                variants.append((name, maker, xarg, bm, bn))
        except Exception as e:  # noqa: BLE001
            print(f"{name} ({bm},{bn}) COMPILE/RUN FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

if INTERPRET:
    print("interpret mode: correctness only, skipping timing", flush=True)
    raise SystemExit(0)

# ---------------- timing at the endpoint ----------------
N = 24576
a8 = devgen.gen_f32((N, N), 42, "p4a_a").astype(F8)
x8 = devgen.gen_f32((N,), 42, "p4a_x").astype(F8)
x32 = x8.astype(jnp.float32)
x8e = jnp.zeros((N, 8), F8).at[:, 0].set(x8)
r32 = devgen.gen_f32((N,), 42, "p4a_r")
flops = 2.0 * N * N

for name, maker, xarg, bm, bn in variants:
    try:
        fn = maker(N, bm, bn)
        xs = {"x32": x32, "x8e": x8e}[xarg]

        def body(c, a, xv):
            # perturb the VECTOR operand (n elements, negligible copy), not
            # the matrix — a.at[0,0].add on the loop-invariant (n,n) f8 args
            # entry forces a full 600 MB scatter-copy every iteration and
            # halves every measured number (the driver pattern,
            # bench/gemv_benchmark.py body). The f8 cast may round the
            # perturbation to zero; the graph dependence is what blocks
            # hoisting, not the value.
            xc = xv.at[(0,) * xv.ndim].add((c[0] * 1e-30).astype(xv.dtype))
            return fn(a, xc)

        ms = benchmark_loop(body, r32, args=(a8, xs))
        gf = flops / (ms * 1e-3) / 1e9
        print(f"{name} ({bm},{bn})  {gf:8.1f} GF/s  "
              f"({100.0 * gf / (2 * ROOF):5.1f}% roofline)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} ({bm},{bn}) TPU FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
