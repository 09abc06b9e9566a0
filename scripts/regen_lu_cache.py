"""Regenerate the fp64 LU disk cache after a host wipe (reboot clears
~/.cache). Pure host-side numpy/scipy — must NOT touch the TPU (a bench
campaign may be running); no axon on PYTHONPATH and JAX forced to cpu.

Produces the exact artifact `_lu_cached(24576, 42)` writes
(bench/trsv_benchmark.py:40-62): gen_mtx seed-42 master -> scipy getrf.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.linalg

from accblas_tpu.utils import MatrixInfo, gen_mtx

cache = os.environ.get("ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit"))
os.makedirs(cache, exist_ok=True)
path = os.path.join(cache, "lu64_seed42_n24576.npy")
if os.path.exists(path):
    print("already present:", path, flush=True)
else:
    print("generating 24576^2 fp64 master (seed 42)...", flush=True)
    a = gen_mtx(MatrixInfo(24576, 24576), seed=42)
    print("getrf...", flush=True)
    lu, _ = scipy.linalg.lu_factor(a)
    del a
    np.save(path, lu)
    print("LU cache ready:", path, flush=True)
