"""Measure the XLA minor-dim tile-padding tax on the operator streams.

Times the two hot bandwidth-bound patterns of the MG cycle at bench
shapes, in both layouts:

* level matvec: gather -> per-cell contraction with (nc, nld, nld)
  element tensors -> gather-sum   (mg/velocity.py level_apply)
* patch apply: gather -> batched GEMV with (np, m, m) inverses ->
  gather-sum                      (mg/patches.py build_patch_solver)

Batch-major layouts put the small dims minor-most, which XLA tiles to
(8, 128) — physically 2.5-10x the logical bytes.  The cell-/patch-minor
layouts put the large batch axis on lanes.  Effective GB/s is computed
from LOGICAL bytes, so a layout at the padding tax shows up as a
correspondingly low fraction of HBM bandwidth (~819 GB/s on v5e).

Each timing chains the op through a lax.fori_loop on-device so dispatch
overhead amortises away.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("ALFI_TPU_FORCE_CPU") == "1":
    # the image's sitecustomize overwrites JAX_PLATFORMS, so a plain
    # env var cannot force CPU; the config route works pre-init
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from alfi_tpu.utils.scatter import make_gather_sum

HBM = 819e9  # v5e


def timed(fn, x, iters=60):
    y = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    y = jax.block_until_ready(fn(x))
    dt = (time.perf_counter() - t0) / iters
    return dt, y


def chain(op, iters=60):
    @jax.jit
    def fn(v):
        def body(_, v):
            return op(v)

        return jax.lax.fori_loop(0, iters, body, v)

    return fn


def level_matvec(nc, nld, n, dtype, rng):
    rows = rng.integers(0, n, size=(nc, nld))
    T = jnp.asarray(rng.standard_normal((nc, nld, nld)), dtype=dtype)
    Tt = jnp.moveaxis(T, 0, -1)
    rows_j = jnp.asarray(rows)
    rows_tj = jnp.asarray(rows.T)
    gs = make_gather_sum(rows, n)
    gst = make_gather_sum(rows.T, n)

    def bm(v):
        rloc = jnp.einsum("cij,cj->ci", T, v[rows_j])
        return gs(rloc)

    def cm(v):
        rloc = jnp.sum(Tt * v[rows_tj][None, :, :], axis=1)
        return gst(rloc)

    bytes_log = nc * nld * nld * T.dtype.itemsize
    v = jnp.asarray(rng.standard_normal((n,)), dtype=dtype)
    out = {}
    for name, op in [("batch_major", bm), ("cell_minor", cm)]:
        dt, _ = timed(chain(op), v)
        out[name] = {"us": round(dt * 1e6, 1),
                     "GBps_logical": round(bytes_log / dt / 1e9, 1),
                     "frac_HBM": round(bytes_log / dt / HBM, 3)}
    out["shape"] = [nc, nld, nld]
    out["dtype"] = str(T.dtype)
    return out


def patch_apply(npat, m, n, dtype, rng):
    from alfi_tpu.solvers.batched_lu import apply_transposed_xla

    dofs = rng.integers(0, n, size=(npat, m))
    A = jnp.asarray(rng.standard_normal((npat, m, m)), dtype=dtype)
    At = jnp.moveaxis(A, 0, -1)
    dofs_j = jnp.asarray(dofs)
    dofs_tj = jnp.asarray(dofs.T)
    gs = make_gather_sum(dofs, n)
    gst = make_gather_sum(dofs.T, n)

    def bm(v):
        return gs(jnp.einsum("pij,pj->pi", A, v[dofs_j]))

    def cm(v):
        return gst(apply_transposed_xla(At, v[dofs_tj]))

    bytes_log = npat * m * m * A.dtype.itemsize
    v = jnp.asarray(rng.standard_normal((n,)), dtype=dtype)
    out = {}
    for name, op in [("batch_major", bm), ("patch_minor_xla", cm)]:
        try:
            dt, _ = timed(chain(op), v)
            out[name] = {"us": round(dt * 1e6, 1),
                         "GBps_logical": round(bytes_log / dt / 1e9, 1),
                         "frac_HBM": round(bytes_log / dt / HBM, 3)}
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
    out["shape"] = [npat, m, m]
    out["dtype"] = str(A.dtype)
    return out


def main():
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    f64 = jnp.float64
    results = {"backend": jax.default_backend()}
    # ldc2d pkp0 k=2 baseN=16 nref=2 fine level: 8192 cells, nld=12,
    # n = 33282*2; patches: ~4225 stars of m~46
    results["level_2d"] = level_matvec(8192, 12, 66564, f64, rng)
    results["level_2d_f32"] = level_matvec(8192, 12, 66564, f32, rng)
    # ldc3d [P2+FB]^3-P0 nref=1: 3072 cells, nld=3*35? P2+FB 3D:
    # 10+4=14 scalar, nld=42
    results["level_3d"] = level_matvec(3072, 42, 34323, f64, rng)
    results["patch_2d"] = patch_apply(4225, 46, 66564, f32, rng)
    results["patch_2d_small"] = patch_apply(4225, 14, 66564, f32, rng)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
