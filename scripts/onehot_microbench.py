"""Can a blocked one-hot matmul beat XLA's gather on this TPU?

gather_microbench.py measured XLA's native gather at ~8 ns per
ELEMENT (~0.5 GB/s) at every fetch granularity — 1600x below HBM —
so every index op in the smoother hot loop sits on that floor.  The
candidate replacement: sort the fetch indices into WINDOWS of width W
over the source vector and evaluate each window's fetches as a one-hot
matmul  Y_g = P_g @ X_g  with X_g a contiguous slice — the MXU streams
P (nfetch x W one-hot, bf16) at HBM speed, so the per-element cost is
W x 2 bytes of P-stream instead of the 8 ns gather floor.  Break-even
at W*2/800GBps = 8ns -> W ~ 3200; anything W <= 1024 should win 3x+.

Also measures: indices_are_sorted/unique_indices hints on the native
gather, and f32 vs bf16 one-hot.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


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
    n = 66564        # bench fine-level flat velocity dofs
    total = 194350   # patch gather volume (np*m at nref=2)
    d = 2
    out = {}

    # ---- native gather with compiler hints, sorted indices ----
    idx_np = np.sort(rng.integers(0, n // d, size=(total // d,)))
    idx = jnp.asarray(idx_np)
    v = jnp.asarray(rng.standard_normal((n // d, d)), dtype=jnp.float32)

    def g_plain(x):
        return x + 1e-30 * x[idx].sum()

    out["native_sorted_us"] = round(chain_time(g_plain, v) * 1e6, 1)

    def g_hint(x):
        y = jax.lax.gather(
            x, idx[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, d),
            indices_are_sorted=True, unique_indices=False)
        return x + 1e-30 * y.sum()

    out["native_sorted_hint_us"] = round(chain_time(g_hint, v) * 1e6, 1)
    print(json.dumps(out), flush=True)

    # ---- blocked one-hot: windows of W source rows, R fetches each ----
    # sorted indices -> each consecutive block of R fetches spans a
    # window; pick W = max span (here uniform-random so W ~ n/d * R/F)
    F = total // d
    for W in (256, 512, 1024):
        for pdt in (jnp.bfloat16, jnp.float32):
            R = max(256, W // 2)
            G = -(-F // R)
            Fpad = G * R
            ipad = np.concatenate([idx_np, np.full(Fpad - F, idx_np[-1])])
            blk = ipad.reshape(G, R)
            starts = np.clip(blk.min(axis=1), 0, n // d - W)
            local = blk - starts[:, None]
            ok = bool((local < W).all())
            if not ok:
                out["onehot_W%d_%s" % (W, pdt.__name__)] = "span>W"
                continue
            P = jax.nn.one_hot(jnp.asarray(local), W, dtype=pdt)  # (G,R,W)
            sj = jnp.asarray(starts)

            def oh(x, P=P, sj=sj, W=W, pdt=pdt):
                xw = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(x, (s, 0), (W, d))
                )(sj)  # (G, W, d)
                y = jnp.einsum("grw,gwd->grd", P, xw.astype(pdt),
                               preferred_element_type=jnp.float32)
                return x + 1e-30 * y.sum()

            dt = chain_time(oh, v)
            out["onehot_W%d_%s" % (W, pdt.__name__)] = {
                "us": round(dt * 1e6, 1),
                "ns_per_elem": round(dt / total * 1e9, 2),
            }
            print(json.dumps({("onehot_W%d_%s" % (W, pdt.__name__)):
                              out["onehot_W%d_%s" % (W, pdt.__name__)]}),
                  flush=True)

    # ---- reference floors ----
    big = jnp.asarray(rng.standard_normal((total, 4)), dtype=jnp.float32)

    def stream(x):
        return x * 1.000001

    dt = chain_time(stream, big)
    out["stream_3MB_us"] = round(dt * 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
