"""probe_r4f: numpy f32 model — can a setup-time Newton-refined diagonal-block
inverse replace the per-application residual correction in the blocked TRSV
route (ops/trsv.py:_trsv_small)?

Background: the shipped per-application refinement (commit 1ff04e7) computes
    xb = X·rhs;  r = rhs − T·xb;  xb += X·r
which is algebraically (2X − X·T·X)·rhs — one Newton step of the inverse,
applied to the rhs. probe_r4d measured its cost at ~10% (385.1 → 347.2 GF/s
at 24576/block=1024). If the Newton step is instead folded into the inverse
ONCE at setup (X2 = X + X·(I − T·X), hoisted out of the repeated-solve loop
exactly like the inversion itself), the per-solve cost is zero and the
accuracy should be near-identical — the only difference is that the
per-application form also catches the X·rhs matvec rounding, a second-order
term.

Model: exact driver data (cached LU fp64, upper non-unit triangle, rhs from
gen_mtx seed 43), block=1024, all arithmetic f32 (numpy/BLAS accumulates in
f32 like the MXU at HIGHEST), error = 1-norm relative vs scipy fp64 solve —
the trsv_error driver's metric. Runs on the host, no JAX, no TPU.
"""
import numpy as np
import scipy.linalg
import sys, os, time

sys.path.insert(0, "/root/repo")
from accblas_tpu.utils.matrix import gen_mtx, MatrixInfo

N = int(os.environ.get("R4F_N", 24576))
BLOCK = int(os.environ.get("R4F_BLOCK", 1024))

lu_path = os.path.expanduser(f"~/.cache/accblas_jit/lu64_seed42_n{N}.npy")
print(f"n={N} block={BLOCK} lu={lu_path}", flush=True)
a64 = np.load(lu_path, mmap_mode="r")[:N, :N]
t64 = np.triu(np.asarray(a64))  # upper, non-unit (driver --no-unit)
del a64
b64 = gen_mtx(MatrixInfo(1, N), seed=43)[0].astype(np.float64)

x_ref = scipy.linalg.solve_triangular(t64, b64, lower=False)
nrm = np.abs(x_ref).sum()

t32 = t64.astype(np.float32)
b32 = b64.astype(np.float32)


def relerr(x32):
    return float(np.abs(x32.astype(np.float64) - x_ref).sum() / nrm)


def blocked_solve(inv_blocks, refine_apply: bool):
    """Upper-triangular blocked substitution, bottom-up, all f32."""
    nb = N // BLOCK
    xs = [None] * nb
    for bi in range(nb - 1, -1, -1):
        s0 = bi * BLOCK
        rhs = b32[s0 : s0 + BLOCK].copy()
        if bi < nb - 1:
            panel = t32[s0 : s0 + BLOCK, (bi + 1) * BLOCK :]
            xcat = np.concatenate(xs[bi + 1 :])
            rhs = rhs - panel @ xcat
        X = inv_blocks[bi]
        xb = X @ rhs
        if refine_apply:
            D = t32[s0 : s0 + BLOCK, s0 : s0 + BLOCK]
            r = rhs - D @ xb
            xb = xb + X @ r
        xs[bi] = xb
    return np.concatenate(xs)


# --- per-block inverses -------------------------------------------------
nb = N // BLOCK
eye = np.eye(BLOCK, dtype=np.float32)
inv0, inv_newton, inv_newton2, inv_exact = [], [], [], []
t0 = time.time()
for bi in range(nb):
    s0 = bi * BLOCK
    D = t32[s0 : s0 + BLOCK, s0 : s0 + BLOCK]
    X = scipy.linalg.solve_triangular(D, eye, lower=False)  # f32 substitution
    inv0.append(X)
    R = eye - D @ X  # f32 residual, same rounding class as on-device
    X1 = X + X @ R
    inv_newton.append(X1)
    R1 = eye - D @ X1
    inv_newton2.append(X1 + X1 @ R1)
    D64 = t64[s0 : s0 + BLOCK, s0 : s0 + BLOCK]
    inv_exact.append(
        scipy.linalg.solve_triangular(D64, np.eye(BLOCK), lower=False).astype(
            np.float32
        )
    )
print(f"inverses built in {time.time() - t0:.1f}s", flush=True)

rows = [
    ("substitution f32 (scipy)", relerr(
        scipy.linalg.solve_triangular(t32, b32, lower=False))),
    ("inv-only", relerr(blocked_solve(inv0, False))),
    ("per-app refine (shipped)", relerr(blocked_solve(inv0, True))),
    ("newton-setup inverse", relerr(blocked_solve(inv_newton, False))),
    ("newton-setup x2", relerr(blocked_solve(inv_newton2, False))),
    ("f64-rounded inverse", relerr(blocked_solve(inv_exact, False))),
    ("newton-setup + per-app", relerr(blocked_solve(inv_newton, True))),
]
for name, e in rows:
    print(f"{name:28s} {e:.4e}", flush=True)
