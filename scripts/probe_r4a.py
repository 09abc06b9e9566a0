"""Probe r4a: GEMV Acc<f32,f8e4m3> beyond the GEMM-embed 82%.

State (BENCH_NOTES "f8/f16 lowering findings"): XLA's f8 matvec emitter
stalls at 1042 GF/s (64% of the 1638 GF/s roofline at 24576²); the kcols=8
zero-embed GEMM reaches 1348 (82%); DOT f8 through XLA's reduce lowering
reaches 748 = 91% of ITS roofline. Untried formulations:

  A  baseline re-measure: shipped acc_gemv (kcols=8 embed)
  B  fused multiply-reduce: sum(A.astype(f32) * x, axis=1) — the 2-D
     analogue of the DOT lowering that hits 91%
  C  two-contracting-dim dot_general: A(m, n/8, 8) · x(n/8, 8) — engages a
     contraction of size n without the zero-embed columns
  D  kcols=16/32 embeds (8 and 128 measured equal; check for a bump between)
  E  Pallas 2-D f8→f32 convert bandwidth at (256,1024)/(512,512) blocks —
     if Mosaic converts f8 at streaming speed in 2-D (the 70-122 GF/s
     finding was the 1-D DOT), a native colform kernel is back on the table

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4a.py
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)

N = 24576
F8 = jnp.float8_e4m3fn
ROOF = 819.0  # GB/s HBM -> GF/s at 1 B/elem, 2 flop/elem

a8 = devgen.gen_f32((N, N), 42, "p4a_a").astype(F8)
x8 = devgen.gen_f32((N,), 42, "p4a_x").astype(F8)
r32 = devgen.gen_f32((N,), 42, "p4a_r")
flops = 2.0 * N * N


def perturb(x, c):
    return x.at[0].add((c[0].astype(jnp.float32) * 1e-30).astype(x.dtype))


def report(tag, ms):
    gf = flops / (ms * 1e-3) / 1e9
    print(f"{tag:34s} {gf:8.1f} GF/s  ({100.0*gf/ (2*ROOF):5.1f}% roofline)",
          flush=True)
    return gf


# ---- A: shipped path ----
def body_a(c, a, x):
    return gemvops.acc_gemv(a, perturb(x, c), c, 1.0, 0.0, ar="f32")

report("A shipped acc_gemv (kcols=8)", benchmark_loop(body_a, r32, args=(a8, x8)))


# ---- B: fused multiply-reduce ----
def body_b(c, a, x):
    xc = perturb(x, c).astype(jnp.float32)
    return jnp.sum(a.astype(jnp.float32) * xc[None, :], axis=1)

report("B mult-reduce f32", benchmark_loop(body_b, r32, args=(a8, x8)))


# ---- C: two-contracting-dim dot_general ----
def body_c(c, a, x):
    xc = perturb(x, c)
    a3 = a.reshape(N, N // 8, 8)
    x2 = xc.reshape(N // 8, 8)
    return jax.lax.dot_general(
        a3, x2, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)

report("C 2-contract dot_general", benchmark_loop(body_c, r32, args=(a8, x8)))


# ---- D: kcols sweep ----
def make_body_k(k):
    def body(c, a, x):
        xc = perturb(x, c)
        x2 = jnp.zeros((N, k), a.dtype).at[:, 0].set(xc)
        return jnp.matmul(a, x2, preferred_element_type=jnp.float32)[:, 0]
    return body

for k in (4, 16, 32):
    report(f"D kcols={k} embed", benchmark_loop(make_body_k(k), r32, args=(a8, x8)))


# ---- E: Pallas 2-D f8 convert bandwidth ----
def conv_kernel(a_ref, o_ref):
    # read the f8 block, convert, fold to a (1,BN) partial and ACCUMULATE
    # over the row blocks (an overwrite would both drop all but the last
    # row-panel and bounce the out block through HBM every step): measures
    # the f8 load+convert stream rate. Row index rides the MINOR grid dim
    # so the out block is constant between consecutive steps and Pallas
    # skips its DMA (the TRSV dead-triangle trick).
    v = a_ref[...].astype(jnp.float32)
    p = jnp.sum(v, axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = p

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        o_ref[...] = o_ref[...] + p

for bm, bn in ((256, 1024), (512, 512), (32, 128)):
    grid = (N // bn, N // bm)  # (col blocks, row blocks) — rows minor
    conv = pl.pallas_call(
        conv_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bn), lambda jb, ib: (ib, jb))],
        out_specs=pl.BlockSpec((1, bn), lambda jb, ib: (0, jb)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )

    def body_e(c, a):
        ac = a.at[0, 0].add((c[0, 0] * 1e-30).astype(a.dtype))
        return conv(ac)

    ce = jnp.zeros((1, N), jnp.float32)
    try:
        ms = benchmark_loop(body_e, ce, args=(a8,))
        gbps = N * N / (ms * 1e-3) / 1e9
        print(f"E pallas f8 convert ({bm},{bn})       {gbps:8.1f} GB/s  "
              f"({100.0*gbps/ROOF:5.1f}% HBM)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"E pallas f8 convert ({bm},{bn})  FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
