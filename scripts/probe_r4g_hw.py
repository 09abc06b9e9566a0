"""probe_r4g (hardware half): error x speed frontier of the f32 single-rhs
TRSV routes at the driver endpoint (n=24576, upper non-unit LU triangle,
driver data + driver metric), to settle VERDICT r3 #4a/#7 jointly.

probe_r4f/r4g model (numpy f32, same data): per-app refine 1.87e-4 ~
substitution 1.95e-4; inv-only 8.3e-4; two-level leaf=128/256 1.92/2.09e-4;
cond1(D_leaf) median 3.8e2/5.1e3/7.3e4 at leaf 64/256/1024 — inverse-apply
error tracks block conditioning. The Pallas sweep IS the two-level scheme,
so sweep configs here should land in substitution class while running 361+
GF/s (probe_r4b) vs the shipped refined blocked route's 341-347.

Candidates (error = 1-norm vs host scipy fp64, the trsv_error metric;
speed = benchmark_loop on the same LU triangle):
  - XLA TriangularSolve       (comparator: r3 measured 8.68e-5, 64.9 GF/s)
  - shipped auto              (blocked-XLA + per-app refine)
  - blocked-XLA refine OFF    (probe flag; r4d measured 385.1 GF/s)
  - Pallas sweep (BLOCK_VEC, LEAF_VEC) grid incl. 2048-blocks
  - fused df64 sweep at the winning config (speed only, error ~6.4e-5 known)
"""
import os
import sys
import time

import numpy as np
import scipy.linalg

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop
from accblas_tpu.utils.compare import relative_error
from accblas_tpu.utils.matrix import gen_mtx, MatrixInfo

print("devices:", jax.devices(), flush=True)

N = int(os.environ.get("R4G_N", 24576))  # 1024 for the CPU smoke run
lu_path = os.path.expanduser(f"~/.cache/accblas_jit/lu64_seed42_n{N}.npy")
t64 = np.triu(np.asarray(np.load(lu_path, mmap_mode="r")[:N, :N]))
b64 = gen_mtx(MatrixInfo(1, N), seed=43)[0].astype(np.float64)
x_ref = scipy.linalg.solve_triangular(t64, b64, lower=False)

t0 = time.time()
a = jnp.asarray(t64.astype(np.float32))
b = jnp.asarray(b64.astype(np.float32))
a.block_until_ready()
print(f"H2D {a.nbytes / 2**30:.2f} GiB in {time.time() - t0:.0f}s", flush=True)
flops = float(N) * N


def run(name, fn, speed=True, error=True):
    try:
        jfn = jax.jit(fn)
        if error:
            x = np.asarray(jfn(a, b), np.float64)
            err = relative_error(x, x_ref)
        else:
            err = float("nan")
        gf = float("nan")
        if speed:
            def body(c, a_):
                return jfn(a_, jnp.clip(c, -1.0, 1.0))
            ms = benchmark_loop(body, b, args=(a,))
            gf = flops / (ms * 1e-3) / 1e9
        print(f"{name:42s} {gf:7.1f} GF/s   err {err:.4e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


run("xla TriangularSolve",
    lambda a_, b_: trsvops.xla_trsv(a_, b_, "upper", False))

run("shipped auto (blocked + refine)",
    lambda a_, b_: trsvops.trsv(a_, b_, "upper", False))

trsvops._PROBE_DISABLE_REFINE = True
run("blocked refine OFF",
    lambda a_, b_: trsvops.trsv(a_, b_, "upper", False))
trsvops._PROBE_DISABLE_REFINE = False

# round-4 addition: rounding-class diagonal-block inverses at setup
# (_df_tri_inverse, pure-HLO double-float substitution vs the identity),
# per-app refinement off — CPU model says below-substitution error at
# refine-OFF speed, IF the setup still hoists out of the timing loop.
trsvops._PROBE_SETUP_DF64_INV = True
run("blocked df64-setup inverse",
    lambda a_, b_: trsvops.trsv(a_, b_, "upper", False))


def run_cold(name, fn):
    """Driver cold protocol: the matrix rides the carry with a data-
    dependent O(1) in-place bump so phase-1 setup re-runs every iteration
    — prices the DF-substitution setup for one-shot solves."""
    try:
        jfn = jax.jit(fn)

        def body(c, b_):
            xprev, ac = c
            bump = (xprev[0] * 1e-30).astype(ac.dtype)
            ac = ac.at[0, 0].add(bump)
            x = jfn(ac, jnp.clip(xprev, -1.0, 1.0))
            return (x, ac)

        ms = benchmark_loop(body, (b, a), args=(b,))
        print(f"{name:42s} {flops / (ms * 1e-3) / 1e9:7.1f} GF/s   (cold)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


run_cold("blocked df64-setup inverse COLD",
         lambda a_, b_: trsvops.trsv(a_, b_, "upper", False))
trsvops._PROBE_SETUP_DF64_INV = False
run_cold("shipped auto COLD (refine)",
         lambda a_, b_: trsvops.trsv(a_, b_, "upper", False))

for bv, lv in ((1024, 128), (1024, 256), (1536, 256), (2048, 256),
               (2048, 512)):
    trsvops.BLOCK_VEC, trsvops.LEAF_VEC = bv, lv
    run(f"sweep block={bv} leaf={lv}",
        lambda a_, b_: trsvops.trsv(a_, b_, "upper", False, resident=False))

# fused df64 at the 2048-block configs (known error class 6.4e-5; speed only)
for bv, lv in ((1024, 256), (2048, 256)):
    trsvops.BLOCK_VEC, trsvops.LEAF_VEC = bv, lv
    run(f"df64 sweep block={bv} leaf={lv}",
        lambda a_, b_: trsvops.acc_trsv(a_, b_, "upper", False, ar="df64",
                                        resident=False),
        error=False)
trsvops.BLOCK_VEC, trsvops.LEAF_VEC = 1024, 256

print("probe_r4g_hw done", flush=True)
