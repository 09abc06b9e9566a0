"""accblas-tpu: TPU-native mixed-precision accessor BLAS.

A from-scratch JAX/Pallas rebuild of the capabilities of
ginkgo-project/accessor-BLAS: an accessor (Range / ReducedRowMajor) decoupling
storage precision from arithmetic precision, three kernel families (DOT, GEMV,
TRSV) each in fixed-precision / accessor mixed-precision / XLA-baseline
variants, a benchmark + error-analysis harness, and multi-chip sharded
extensions. See SURVEY.md at the repo root for the layer-by-layer mapping to
the reference.
"""

from .accessor.dtypes import canon, promote
from .accessor.range import Range, ReducedRowMajor, make_range
from .ops.df64 import DF
from .ops.dot import acc_dot, dot, xla_dot
from .ops.gemv import acc_gemv, gemv, xla_gemv
from .ops.trsv import acc_trsm, acc_trsv, trsm, trsv, xla_trsm, xla_trsv

__version__ = "0.1.0"

__all__ = [
    "Range",
    "ReducedRowMajor",
    "make_range",
    "DF",
    "canon",
    "promote",
    # kernel families, three tiers each (the reference's public surface,
    # cuda/{dot,gemv,trsv}_kernels.cuh host launchers)
    "dot",
    "acc_dot",
    "xla_dot",
    "gemv",
    "acc_gemv",
    "xla_gemv",
    "trsv",
    "acc_trsv",
    "xla_trsv",
    "trsm",
    "acc_trsm",
    "xla_trsm",
]
