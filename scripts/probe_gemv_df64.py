"""TPU probe: GEMV df64 accumulation strategies (round-2 work item 1).

Compares, at m=n=16384 on the real chip:
  - lib      : current library acc_gemv df64 path (per-row unrolled folds)
  - halve    : whole-panel last-axis two_sum halving tree (err side-channel)
  - kahan    : chunk-sequential Kahan compensated accumulation, fused products
  - kahan2   : Kahan with two interleaved chains (latency hiding)
  - fixed32  : library fixed-f32 full-row path (the storage-speed target)
Storage f32 and bf16 for the winners.

Prints GFLOP/s per variant; roofline f32 = 409 GFLOP/s @ 819 GB/s, bf16 = 819.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from accblas_tpu.ops import df64 as dfm
from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.ops.common import compiler_params
from accblas_tpu.utils.bench import benchmark_loop

M = N = 16384


def _epilogue(total_df, r_ref, o_ref):
    rv = r_ref[...].astype(jnp.float32)
    out = dfm.df_add(total_df, dfm.df_from(rv))
    o_ref[...] = dfm.df_to_f32(out)


def kern_halve(a_ref, x_ref, r_ref, o_ref, *, n):
    av = a_ref[...].astype(jnp.float32)
    xv = x_ref[...].astype(jnp.float32)
    s = av * xv  # (bm, n)
    err = None
    w = n
    while w > 128:
        half = w // 2
        s, e = dfm.two_sum(s[:, :half], s[:, half:])
        err = e if err is None else err[:, :half] + err[:, half:] + e
        w = half
    part = dfm.DF(s, err)
    _epilogue(dfm.df_fold_lanes(part, 1), r_ref, o_ref)


def kern_kahan(a_ref, x_ref, r_ref, o_ref, *, n, chains):
    k = n // 128
    ss, cs = [], []
    for ch in range(chains):
        p0 = (
            a_ref[:, ch * 128 : (ch + 1) * 128].astype(jnp.float32)
            * x_ref[:, ch * 128 : (ch + 1) * 128].astype(jnp.float32)
        )
        ss.append(p0)
        cs.append(jnp.zeros_like(p0))
    for k0 in range(chains, k):
        ch = k0 % chains
        p = (
            a_ref[:, k0 * 128 : (k0 + 1) * 128].astype(jnp.float32)
            * x_ref[:, k0 * 128 : (k0 + 1) * 128].astype(jnp.float32)
        )
        y = p - cs[ch]
        t = ss[ch] + y
        cs[ch] = (t - ss[ch]) - y
        ss[ch] = t
    # combine chains exactly; apply the final Kahan residual (-c)
    tot = dfm.DF(ss[0], -cs[0])
    for ch in range(1, chains):
        tot = dfm.df_add(tot, dfm.DF(ss[ch], -cs[ch]))
    _epilogue(dfm.df_fold_lanes(tot, 1), r_ref, o_ref)


def fullrow_call(kernel, a, x, res, bm):
    m, n = a.shape
    return pl.pallas_call(
        functools.partial(kernel, n=n),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        compiler_params=compiler_params(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n,
            bytes_accessed=m * n * jnp.dtype(a.dtype).itemsize,
            transcendentals=0,
        ),
    )(a, x.reshape(1, n), res.reshape(m, 1)).reshape(m)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    a32 = jax.random.uniform(key, (M, N), jnp.float32, -1, 1)
    x32 = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32, -1, 1)
    abf = a32.astype(jnp.bfloat16)
    xbf = x32.astype(jnp.bfloat16)
    r0 = jnp.zeros((M,), jnp.float32)
    jax.block_until_ready((a32, abf, x32, xbf, r0))

    # correctness oracle (host, f64)
    an = np.asarray(a32, np.float64)
    xn = np.asarray(x32, np.float64)
    ref = an @ xn
    abn = np.asarray(abf.astype(jnp.float32), np.float64)
    xbn = np.asarray(xbf.astype(jnp.float32), np.float64)
    refb = abn @ xbn

    flops = 2.0 * M * N

    def report(name, body, args, oracle):
        out = body(r0, *args)
        rel = np.linalg.norm(np.asarray(out, np.float64) - oracle) / np.linalg.norm(oracle)
        ms = benchmark_loop(body, r0, args=args)
        gf = flops / (ms * 1e-3) / 1e9
        print(f"{name:28s} {gf:8.1f} GFLOP/s   rel_err {rel:.2e}")

    # library baselines
    report(
        "lib acc_gemv df64/f32",
        lambda c, a, x: gemvops.acc_gemv(a, x, c, 1.0, 1.0, ar="df64"),
        (a32, x32),
        ref,
    )
    report(
        "lib fixed f32 (target)",
        lambda c, a, x: gemvops.gemv(a, x, c, 1.0, 1.0),
        (a32, x32),
        ref,
    )

    for bm in (8, 16, 32):
        report(
            f"halve f32 bm={bm}",
            lambda c, a, x, bm=bm: fullrow_call(kern_halve, a, x, c, bm),
            (a32, x32),
            ref,
        )
    for bm in (8, 16, 32):
        for chains in (1, 2):
            report(
                f"kahan{chains} f32 bm={bm}",
                lambda c, a, x, bm=bm, ch=chains: fullrow_call(
                    functools.partial(kern_kahan, chains=ch), a, x, c, bm
                ),
                (a32, x32),
                ref,
            )
    # bf16 storage on the two contenders
    for bm in (16, 32, 64):
        report(
            f"halve bf16 bm={bm}",
            lambda c, a, x, bm=bm: fullrow_call(kern_halve, a, x, c, bm),
            (abf, xbf),
            refb,
        )
        report(
            f"kahan2 bf16 bm={bm}",
            lambda c, a, x, bm=bm: fullrow_call(
                functools.partial(kern_kahan, chains=2), a, x, c, bm
            ),
            (abf, xbf),
            refb,
        )


if __name__ == "__main__":
    main()
