"""Pre-generate the disk-cached 16384 LU master on the host (CPU-only),
so the campaign_r5u error captures don't burn their TPU window on
scipy.lu_factor (~20 min on this 1-core host). Mirrors
accblas_tpu.bench.trsv_benchmark._lu_cached exactly (seed 42).

Usage: JAX_PLATFORMS=cpu python scripts/pregen_lu16384.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import scipy.linalg  # noqa: E402

from accblas_tpu.bench.trsv_benchmark import _lu_cached  # noqa: E402

lu = _lu_cached(16384, 42, scipy)
print("lu64_seed42_n16384 ready:", lu.shape, lu.dtype, file=sys.stderr)
