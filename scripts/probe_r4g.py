"""probe_r4g (model half): which device-expressible variant recovers
substitution-class accuracy for the blocked TRSV route WITHOUT the ~10%
per-application refinement cost (probe_r4d: 385.1 refine=False vs 347.2
refine=True at 24576/block=1024)?

probe_r4f showed: f32 Newton-at-setup FAILS (8.43e-4 ~ inv-only 8.29e-4) —
the matrix residual I - D@X computed in f32 is swamped by the triple-product
rounding — while an f64-rounded inverse recovers (1.98e-4 ~ substitution
1.95e-4). Candidates here, all with zero or setup-only extra cost:

  A  newton-r64: Newton step with the RESIDUAL computed in f64 (device:
     a df64/EFT residual), X@R and the update in f32. Isolates whether
     residual accuracy alone suffices.
  B  two-level leaf: invert only leaf-sized diagonal sub-blocks (64..512)
     and substitute leaf-by-leaf INSIDE each 1024 block (panel updates still
     block-wide). Inverse forward error scales with cond(leaf) instead of
     cond(block) — the reference's own regime (32-wide in-warp inverses,
     cuda/trsv_kernels.cuh:125-162). Reads FEWER bytes than inv-apply
     (triangular within-block panels + small dense leaf inverses vs one
     dense block inverse); extra cost is chain latency only (96 vs 24
     sequential steps at n=24576).
  C  leaf cond sweep: report cond_1(D_leaf) quartiles per leaf size to tie
     the error scaling to conditioning.
"""
import numpy as np
import scipy.linalg
import sys, os, time

sys.path.insert(0, "/root/repo")
from accblas_tpu.utils.matrix import gen_mtx, MatrixInfo

N = int(os.environ.get("R4G_N", 24576))
BLOCK = int(os.environ.get("R4G_BLOCK", 1024))

lu_path = os.path.expanduser(f"~/.cache/accblas_jit/lu64_seed42_n{N}.npy")
print(f"n={N} block={BLOCK}", flush=True)
a64 = np.load(lu_path, mmap_mode="r")[:N, :N]
t64 = np.triu(np.asarray(a64))
del a64
b64 = gen_mtx(MatrixInfo(1, N), seed=43)[0].astype(np.float64)
x_ref = scipy.linalg.solve_triangular(t64, b64, lower=False)
nrm = np.abs(x_ref).sum()
t32 = t64.astype(np.float32)
b32 = b64.astype(np.float32)
nb = N // BLOCK


def relerr(x32):
    return float(np.abs(x32.astype(np.float64) - x_ref).sum() / nrm)


def solve_invapply(inv_blocks):
    xs = [None] * nb
    for bi in range(nb - 1, -1, -1):
        s0 = bi * BLOCK
        rhs = b32[s0 : s0 + BLOCK].copy()
        if bi < nb - 1:
            rhs = rhs - t32[s0 : s0 + BLOCK, (bi + 1) * BLOCK :] @ np.concatenate(
                xs[bi + 1 :]
            )
        xs[bi] = inv_blocks[bi] @ rhs
    return np.concatenate(xs)


def solve_twolevel(leaf):
    """Leaf inverses + leaf-level substitution inside each block; block-wide
    panel updates unchanged."""
    nl = BLOCK // leaf
    eye = np.eye(leaf, dtype=np.float32)
    xs = [None] * nb
    for bi in range(nb - 1, -1, -1):
        s0 = bi * BLOCK
        rhs = b32[s0 : s0 + BLOCK].copy()
        if bi < nb - 1:
            rhs = rhs - t32[s0 : s0 + BLOCK, (bi + 1) * BLOCK :] @ np.concatenate(
                xs[bi + 1 :]
            )
        xb = np.empty(BLOCK, np.float32)
        for li in range(nl - 1, -1, -1):
            l0 = s0 + li * leaf
            r = rhs[li * leaf : (li + 1) * leaf]
            if li < nl - 1:
                r = r - t32[l0 : l0 + leaf, l0 + leaf : s0 + BLOCK] @ xb[
                    (li + 1) * leaf :
                ]
            D = t32[l0 : l0 + leaf, l0 : l0 + leaf]
            X = scipy.linalg.solve_triangular(D, eye, lower=False)
            xb[li * leaf : (li + 1) * leaf] = X @ r
        xs[bi] = xb
    return np.concatenate(xs)


eye = np.eye(BLOCK, dtype=np.float32)
inv0, inv_r64 = [], []
conds = []
t0 = time.time()
for bi in range(nb):
    s0 = bi * BLOCK
    D = t32[s0 : s0 + BLOCK, s0 : s0 + BLOCK]
    X = scipy.linalg.solve_triangular(D, eye, lower=False)
    inv0.append(X)
    # A: residual in f64 (device: df64/EFT residual), correction in f32
    R = (np.eye(BLOCK) - t64[s0 : s0 + BLOCK, s0 : s0 + BLOCK]
         @ X.astype(np.float64)).astype(np.float32)
    inv_r64.append(X + X @ R)
print(f"block inverses in {time.time() - t0:.1f}s", flush=True)

print(f"{'inv-only':28s} {relerr(solve_invapply(inv0)):.4e}", flush=True)
print(f"{'A newton-r64':28s} {relerr(solve_invapply(inv_r64)):.4e}", flush=True)
for leaf in (64, 128, 256, 512):
    print(f"{'B two-level leaf=%d' % leaf:28s} "
          f"{relerr(solve_twolevel(leaf)):.4e}", flush=True)

# C: leaf conditioning
for leaf in (64, 256, 1024):
    cs = []
    for s0 in range(0, N, leaf):
        D = t64[s0 : s0 + leaf, s0 : s0 + leaf]
        cs.append(np.linalg.cond(D, 1))
    q = np.percentile(cs, [50, 90, 100])
    print(f"cond1 leaf={leaf:5d}: med {q[0]:.1e}  p90 {q[1]:.1e}  "
          f"max {q[2]:.1e}", flush=True)
