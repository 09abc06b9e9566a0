"""probe_r5c — DOT routing boundary + tail-mask fix validation (round 5).

Two questions, both raised by the round-5 dense DOT capture:

1. Tail-mask fix: fixed-bf16 / Acc<bf16,bf16> measured ~355 GF/s at dense
   sizes with rows % 2048 != 0 vs 377 at divisible sizes — the per-step
   iota mask. ops/dot.py now masks only the final block; re-measure the
   VPU-bound tiers at indivisible sizes. Expect ~377.

2. Resident-routing boundary: RESIDENT_BYTES = 32 MiB was probed at
   n <= 2^22 (round 3). The dense capture shows XLA holding operands
   VMEM-resident far above that: XLA bf16 = 1411 GF/s at 64 MiB input
   while the same-semantics Acc<f32,bf16> tier, routed to the streaming
   kernel, did 1104. Map kernel-vs-resident per tier over input bytes
   32..160 MiB to place the boundary (v5e VMEM = 128 MiB; the timing
   carry adds ~0.5x in_bytes footprint).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5c.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.bench import common
from accblas_tpu.ops import dot as dotops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()
SEED = 42


def body_for(kind, resident):
    def mk(fn):
        def body(c, x, y):
            s, yc = c
            yc = yc.at[0].add((s * 1e-30).astype(yc.dtype))
            return fn(x, yc), yc

        return body

    if kind == "fixed":
        return mk(lambda x, y: dotops.dot(x, y, resident=resident)
                  .astype(jnp.float32))
    if kind == "acc32":
        return mk(lambda x, y: dotops.acc_dot(x, y, ar="f32",
                                              resident=resident))
    if kind == "df":
        return mk(lambda x, y: dotops.acc_dot(x, y, ar="df64",
                                              resident=resident).hi)
    raise ValueError(kind)


def measure(label, kind, x, y, resident):
    n = x.shape[0]

    def run():
        body = body_for(kind, resident)
        c0 = (jnp.float32(0.0), y)
        ms = benchmark_loop(body, c0, args=(x, y))
        return 2.0 * n / (ms * 1e-3) / 1e9

    g = common.guarded(run, label)
    print(f"{label}: {g:.1f} GF/s", flush=True)
    return g


def vecs(n, dt):
    x = devgen.gen_f32((n,), SEED, "dot_x", 0).astype(dt)
    y = devgen.gen_f32((n,), SEED, "dot_y", 0).astype(dt)
    jax.block_until_ready((x, y))
    return x, y


def main():
    print("=== part 1: tail-mask fix at indivisible dense sizes", flush=True)
    for n in (126009344, 222011392, 2**27):  # last = divisible control
        xb, yb = vecs(n, jnp.bfloat16)
        measure(f"fixed bf16 n={n}", "fixed", xb, yb, False)
        measure(f"acc32 bf16 n={n}", "acc32", xb, yb, False)
        del xb, yb

    print("=== part 2: resident boundary (input MiB: kernel vs resident)",
          flush=True)
    mib = 2**20
    for dt, name, kinds in (
        (jnp.bfloat16, "bf16", ("fixed", "acc32")),
        (jnp.float32, "f32", ("fixed", "df")),
        (jnp.float8_e4m3fn, "f8", ("acc32",)),
    ):
        isz = jnp.dtype(dt).itemsize
        for in_mib in (32, 48, 64, 96, 128, 160):
            n = in_mib * mib // (2 * isz)
            n = (n // 8192) * 8192
            x, y = vecs(n, dt)
            for kind in kinds:
                k = measure(f"{name}/{kind} {in_mib}MiB kernel", kind, x, y, False)
                r = measure(f"{name}/{kind} {in_mib}MiB resident", kind, x, y, True)
                print(f">> {name}/{kind} {in_mib}MiB: kernel {k:.1f} "
                      f"resident {r:.1f} ratio {r/k if k else float('nan'):.2f}",
                      flush=True)
            del x, y
    print("probe_r5c done", flush=True)


if __name__ == "__main__":
    main()
