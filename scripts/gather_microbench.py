"""How should an unstructured FEM gather be shaped for the TPU?

profile_cycle.py showed the smoother hot loop is INDEX-bound: random
scalar gathers run at ~50-90M elem/s (~20 cycles/fetch) while the
batched GEMV between them is 2x cheaper.  This measures the same
logical gather at different fetch granularities — scalar, d-vector
row (the (ndof, d) velocity layout), cell-row (nld floats), 128-lane
row — plus the gather-sum scatter at matching granularities, to pick
the layout for the index-op redesign.

All timings chain K applications inside one jit (tunnel RPC ~26 ms
per dispatch otherwise dominates).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from alfi_tpu.utils.scatter import make_gather_sum


def chain_time(fn, x0, K=32, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, v: fn(v), x)

    jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    rng = np.random.default_rng(0)
    n = 66564          # bench fine-level flat velocity dofs
    total = 98304      # level gather volume (8192 cells x 12)
    out = {}
    for rowlen in (1, 2, 4, 12, 128):
        nfetch = total // rowlen
        nrows = n // rowlen
        idx = jnp.asarray(rng.integers(0, nrows, size=(nfetch,)))
        v = jnp.asarray(rng.standard_normal((nrows, rowlen)),
                        dtype=jnp.float32)

        def g(x):
            return x + 1e-30 * x[idx].sum()

        dt = chain_time(g, v)
        out["gather_row%d" % rowlen] = {
            "us": round(dt * 1e6, 1),
            "Melem_s": round(total / dt / 1e6),
            "GBps": round(total * 4 / dt / 1e9, 1),
        }
        # gather-sum at the same granularity: nfetch contributions
        # into nrows outputs (mu from the random multiplicity)
        gs = make_gather_sum(np.asarray(idx), nrows)
        vals = jnp.asarray(rng.standard_normal((nfetch, rowlen)),
                           dtype=jnp.float32)

        def s(x):
            return x + 1e-30 * gs(x).sum()

        dt = chain_time(s, vals)
        out["gathersum_row%d" % rowlen] = {
            "us": round(dt * 1e6, 1),
            "Melem_s": round(total / dt / 1e6),
            "mu": gs.mu,
        }
        print(json.dumps({("row%d" % rowlen): {
            "gather": out["gather_row%d" % rowlen],
            "gathersum": out["gathersum_row%d" % rowlen]}}), flush=True)

    # one-hot MXU gather: X[idx] as P @ X with P (nfetch, nrows)
    # one-hot — only viable blocked; measure a 4096x4096 block as the
    # unit cost
    nb = 4096
    idxb = jnp.asarray(rng.integers(0, nb, size=(nb,)))
    P = jax.nn.one_hot(idxb, nb, dtype=jnp.bfloat16)
    Xb = jnp.asarray(rng.standard_normal((nb, 2)), dtype=jnp.float32)

    def oh(x):
        return x + 1e-30 * (P @ x.astype(jnp.bfloat16)).astype(
            jnp.float32)

    dt = chain_time(oh, Xb)
    print(json.dumps({"onehot_4096block_us": round(dt * 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
