"""Is there a per-iteration floor inside lax.fori_loop on this TPU?

gather_microbench showed ~900 us/iter regardless of gather size (768
fetches of 512 B timed the same as 49k of 8 B) — if the chain itself
has a fixed per-iteration cost, every chained microbench number is a
floor measurement, not an op measurement.  Compare: fori_loop chains
of a trivial op at several sizes, vs UNROLLED chains of the same op,
vs the gather again unrolled.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def t_fori(op, x0, K=32, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, v: op(v), x)

    jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / K


def t_unroll(op, x0, K=32, reps=3):
    @jax.jit
    def run(x):
        for _ in range(K):
            x = op(x)
        return x

    jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    rng = np.random.default_rng(0)
    for n in (1024, 66564, 1048576):
        x = jnp.asarray(rng.standard_normal((n,)), dtype=jnp.float32)
        op = lambda v: v * 1.0000001 + 1e-30  # noqa: E731
        print(json.dumps({
            "n": n,
            "fori_us": round(t_fori(op, x) * 1e6, 1),
            "unroll_us": round(t_unroll(op, x) * 1e6, 1),
        }), flush=True)

    # the real patch gather, unrolled vs fori
    total, n = 98304, 66564
    idx = jnp.asarray(rng.integers(0, n // 2, size=(total // 2,)))
    v = jnp.asarray(rng.standard_normal((n // 2, 2)), dtype=jnp.float32)

    def g(x):
        return x + 1e-30 * x[idx].sum()

    print(json.dumps({
        "gather_row2_fori_us": round(t_fori(g, v) * 1e6, 1),
        "gather_row2_unroll_us": round(t_unroll(g, v) * 1e6, 1),
    }), flush=True)

    # batched GEMV (the patch apply core) both ways
    A = jnp.asarray(rng.standard_normal((4225, 14, 14)),
                    dtype=jnp.float32)
    rp = jnp.asarray(rng.standard_normal((4225, 14)), dtype=jnp.float32)

    def gemv(r):
        return jnp.einsum("pij,pj->pi", A, r)

    print(json.dumps({
        "gemv_fori_us": round(t_fori(gemv, rp) * 1e6, 1),
        "gemv_unroll_us": round(t_unroll(gemv, rp) * 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
