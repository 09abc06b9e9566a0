"""CPU error model: does dropping the eps^2 refine term (cl = inv @ r.lo)
from _trsm_small_df64 change its error class?

The refine correction targets the inv-apply error (~eps_f32 relative); the
residual r is already O(eps)*|rhs|, so r.lo is O(eps^2)*|rhs| and inv@r.lo
contributes below the f32-storage floor. If confirmed, dropping it saves 1
of the 4 refine GEMMs per diagonal block (~block/n of total flops).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/probe_r5d_cpu.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_backend_optimization_level=0").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.matrix import MatrixInfo, gen_mtx


# the benchmark's own LU master (gen_mtx uniform(-1,1), seed 42) — the
# conditioning class where refine actually separates (probe_r5b errors)
_cache = os.environ.get("ACCBLAS_CACHE",
                        os.path.expanduser("~/.cache/accblas_jit"))
lu_master = np.load(os.path.join(_cache, "lu64_seed42_n24576.npy"),
                    mmap_mode="r")

for n in (1024, 1664, 4096):
    lu = np.array(lu_master[:n, :n])
    b64 = gen_mtx(MatrixInfo(128, n), seed=7 + n).T
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    t64 = np.triu(lu)
    ref = scipy.linalg.solve_triangular(t64, b64, lower=False,
                                        unit_diagonal=False)

    def rel(x):
        return (np.abs(np.asarray(x, np.float64) - ref).sum()
                / np.abs(ref).sum())

    x_ref = jax.jit(lambda A, B: trsvops._trsm_small_df64(
        A, B, "upper", False, "f32", refine=True))(a, b)
    x_nr = jax.jit(lambda A, B: trsvops._trsm_small_df64(
        A, B, "upper", False, "f32", refine=False))(a, b)
    x_f32 = jax.jit(lambda A, B: trsvops._trsv_small(
        A, B, "upper", False, "f32"))(a, b)
    print(f"n={n}: refine {rel(x_ref):.4e}  norefine {rel(x_nr):.4e}  "
          f"f32 {rel(x_f32):.4e}")
