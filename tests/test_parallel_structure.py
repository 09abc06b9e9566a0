"""Collective structure of the sharded BLAS layer, pinned at the jaxpr level.

The multi-chip scaling model (BENCH_NOTES "Multi-chip scaling model") prices
each `parallel/blas.py` op by its ICI cost — e.g. pdot f32 = ONE scalar psum
(latency-only), the df64 tiers = all_gather of DF pairs + local error-free
folds (a component-wise psum of hi/lo would silently drop the hi-sum
rounding — the round-2 bug `test_pdot_df64_exact_combine` guards
numerically). These tests pin the *structure* those prices assume: the
exact collective primitives each op traces to, counted by walking the
jaxpr recursively (through shard_map / scan / while / pjit), so a refactor
cannot quietly change the communication pattern (or the exactness
discipline) without the model — and the numeric guards — noticing.

The reference has no distributed layer at all (SURVEY.md §2 "Parallelism &
communication", /root/reference/cuda/dot_kernels.cuh:33 is single-device);
this is beyond-parity surface, tested the same way the kernels are.
"""

import collections

import jax
import jax.numpy as jnp
import pytest

from accblas_tpu.parallel import make_mesh, pcg, pdot, pgemv, power_step, ptrsv
from accblas_tpu.utils import MatrixInfo, gen_mtx


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)  # (2, 4): rows=2, cols=4


def _walk(jaxpr, counts):
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] += 1
        for v in eqn.params.values():
            for j in jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: isinstance(x, (jax.extend.core.Jaxpr,
                                                    jax.extend.core.ClosedJaxpr))
            ):
                if isinstance(j, jax.extend.core.ClosedJaxpr):
                    _walk(j.jaxpr, counts)
                elif isinstance(j, jax.extend.core.Jaxpr):
                    _walk(j, counts)


def collective_counts(fn, *args):
    """Counter of collective-primitive names in fn's (recursive) jaxpr."""
    counts = collections.Counter()
    _walk(jax.make_jaxpr(fn)(*args).jaxpr, counts)
    return collections.Counter(
        {k: v for k, v in counts.items()
         if any(t in k for t in ("psum", "all_gather", "all_to_all",
                                 "ppermute", "reduce_scatter"))}
    )


def _vec(n, seed, dtype=jnp.float32):
    return jnp.asarray(gen_mtx(MatrixInfo(1, n), seed=seed)[0], dtype)


def _psums(c):
    return sum(v for k, v in c.items() if "psum" in k)


def _gathers(c):
    return sum(v for k, v in c.items() if "all_gather" in k)


def test_pdot_f32_is_one_psum(mesh):
    """Scaling-model row: pdot f32 combine = one scalar psum, nothing else."""
    x, y = _vec(4096, 1), _vec(4096, 2)
    c = collective_counts(lambda u, v: pdot(u, v, mesh, axis="cols"), x, y)
    assert _psums(c) == 1 and _gathers(c) == 0, c


def test_pdot_df64_gathers_df_pairs_never_psums(mesh):
    """The exact combine: hi+lo all_gathers, ZERO psums anywhere — a
    component-wise psum of the DF pytree is the exactness bug class."""
    x, y = _vec(4096, 1), _vec(4096, 2)
    c = collective_counts(
        lambda u, v: pdot(u, v, mesh, axis="cols", ar="df64", precise=True),
        x, y)
    assert _psums(c) == 0 and _gathers(c) == 2, c


def test_pgemv_f32_is_one_psum(mesh):
    n = 1024
    a = jnp.asarray(gen_mtx(MatrixInfo(n, n), seed=3), jnp.float32)
    x, r = _vec(n, 4), _vec(n, 5)
    c = collective_counts(
        lambda a_, x_, r_: pgemv(a_, x_, r_, 1.0, 1.0, mesh=mesh), a, x, r)
    assert _psums(c) == 1 and _gathers(c) == 0, c


def test_pgemv_df64_gathers_df_pairs_never_psums(mesh):
    n = 1024
    a = jnp.asarray(gen_mtx(MatrixInfo(n, n), seed=3), jnp.float32)
    x, r = _vec(n, 4), _vec(n, 5)
    c = collective_counts(
        lambda a_, x_, r_: pgemv(a_, x_, r_, 1.0, 1.0, ar="df64", mesh=mesh),
        a, x, r)
    assert _psums(c) == 0 and _gathers(c) == 2, c


def test_ptrsv_is_d_allgathers_no_psum(mesh):
    """Scaling-model row: d dependency-ordered all_gathers of n/d lanes —
    the sequential diag chain the d=8 prediction prices at d·t_trsv(n/d)."""
    n = 1024
    d = mesh.shape["rows"]
    a = jnp.asarray(gen_mtx(MatrixInfo(n, n), seed=6), jnp.float32)
    a = a + n * jnp.eye(n, dtype=jnp.float32)  # diagonally dominant
    b = _vec(n, 7)
    c = collective_counts(
        lambda a_, b_: ptrsv(a_, b_, "upper", False, mesh=mesh), a, b)
    assert _psums(c) == 0 and _gathers(c) == d, c


def test_power_step_two_psums(mesh):
    """y = A@x + r (psum over cols) then nu = <y,y> (psum over rows); the
    rows->cols reshard is a sharding constraint, not a traced collective."""
    n = 1024
    a = jnp.asarray(gen_mtx(MatrixInfo(n, n), seed=8), jnp.float32)
    x, r = _vec(n, 9), _vec(n, 10)
    c = collective_counts(
        lambda a_, x_, r_: power_step(a_, x_, r_, mesh=mesh), a, x, r)
    assert _psums(c) == 2 and _gathers(c) == 0, c


@pytest.mark.parametrize("ar", ["f32", "df64"])
def test_pcg_collective_discipline(mesh, ar):
    """Every pcg iteration communicates only through pdot/pgemv combines:
    f32 tier = psums only; df64 tier = all_gathers only (the exact DF
    combine end-to-end — no psum may touch a DF component anywhere in the
    while-loop body)."""
    n = 256
    a = jnp.asarray(gen_mtx(MatrixInfo(n, n), seed=11), jnp.float32)
    a = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)  # SPD
    b = _vec(n, 12)
    c = collective_counts(
        lambda a_, b_: pcg(a_, b_, mesh=mesh, iters=3, ar=ar)[0], a, b)
    if ar == "f32":
        assert _psums(c) > 0 and _gathers(c) == 0, c
    else:
        assert _psums(c) == 0 and _gathers(c) > 0, c
