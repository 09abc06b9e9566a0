"""TPU probe: where does TRSV time go, especially at small n (round-2 item 2).

Times, at n in {1024, 2048, 4096, 8192, 16384}:
  - full trsv (cold: phase1 + sweep)
  - phase 1 alone (_leaf_inverses: extract + batched triangular_solve)
  - extract alone
  - sweep alone (amortized path)
  - XLA TriangularSolve (vendor)
at BLOCK in {256, 512} where divisible.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    nmax = 16384
    # device-side LU-like matrix: random + strong diagonal so triangles are
    # well conditioned (probe cares about time, not the scipy getrf parity)
    a_full = jax.random.uniform(key, (nmax, nmax), jnp.float32, -1, 1)
    a_full = a_full + nmax * 0.001 * jnp.eye(nmax, dtype=jnp.float32)
    jax.block_until_ready(a_full)

    for n in (1024, 2048, 4096, 8192, 16384):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = 2.0 * n * n / 2  # triangle MACs * 2

        def run_xla(c, a):
            return trsvops.xla_trsv(a, c, uplo="upper", unit=True)

        ms = benchmark_loop(run_xla, b, args=(a,))
        print(f"n={n:6d} XLA TriangularSolve      {ms*1e3:9.1f} us  {flops/(ms*1e-3)/1e9:7.1f} GF/s")

        for block in (256, 512):
            if n % block:
                continue
            nb = n // block
            trsvops_BLOCK = block

            def cold(c, a, block=block):
                # full solve with phase 1, at the probed block size
                old = trsvops.BLOCK
                trsvops.BLOCK = block
                try:
                    return trsvops.trsv(a, c, uplo="upper", unit=True)
                finally:
                    trsvops.BLOCK = old

            ms = benchmark_loop(cold, b, args=(a,))
            print(f"n={n:6d} B={block} cold solve        {ms*1e3:9.1f} us  {flops/(ms*1e-3)/1e9:7.1f} GF/s")

            # batched-inversion part alone: chains through the diag stack
            m_leaves = nb * block // trsvops.LEAF
            d0 = jax.block_until_ready(
                trsvops._extract_leaf_diag(a, nb, block, trsvops.LEAF, False)
            ).astype(jnp.float32)

            def solve_part(c):
                L = trsvops.LEAF
                r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
                d = jnp.where((r <= cc)[None], c, 0.0)
                d = jnp.where((r == cc)[None], 1.0, d)
                eye = jnp.broadcast_to(jnp.eye(L, dtype=jnp.float32), c.shape)
                with jax.default_matmul_precision("highest"):
                    inv = jax.lax.linalg.triangular_solve(
                        d, eye, left_side=True, lower=False, unit_diagonal=False
                    )
                return inv  # same shape as carry -> perfect chain

            ms = benchmark_loop(solve_part, d0)
            print(f"n={n:6d} B={block} batched tri-inv   {ms*1e3:9.1f} us   ({m_leaves} leaves)")

            # sweep alone (amortized): precompute invt, chain through b
            a_p, b_p, nb2, npad = trsvops._pad_packed(a, b, block)
            invt = jax.block_until_ready(
                trsvops._leaf_inverses(a_p, nb2, block, trsvops.LEAF, False, True, False)
            )

            def sweep(c, a_p, invt, nb2=nb2, block=block):
                x = trsvops._trsv_sweep(
                    a_p, invt, c.reshape(nb2, block), nb2, block, False, "f32", False
                )
                return x.reshape(-1)

            ms = benchmark_loop(sweep, b_p, args=(a_p, invt))
            print(f"n={n:6d} B={block} sweep (amortized) {ms*1e3:9.1f} us  {flops/(ms*1e-3)/1e9:7.1f} GF/s")


if __name__ == "__main__":
    main()
