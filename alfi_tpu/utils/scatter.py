"""Scatter-add as gather+sum — the TPU formulation of FEM accumulation.

Measured on v5e (docs/DESIGN.md): an in-graph XLA scatter-add costs ~8 ms
at assembly shapes while gathers of any count are essentially free, so
every hot-loop ``zeros.at[idx].add(vals)`` is transposed into a
precomputed (nout, mu) gather table + sum over the multiplicity axis
(mu = max #contributions to any output row).  Tables are built on host
once per static index set.

CPU keeps the native scatter (same op order as the reference path and no
table memory); the gather-sum changes only the summation order, at
~eps-level differences.
"""

from __future__ import annotations

import numpy as np


def make_gather_sum(indices, nout):
    """Build ``apply(vals) -> (nout, *rest)`` computing
    ``zeros((nout, *rest)).at[indices].add(vals)`` with gathers only.

    indices : host int array, any shape; entries outside [0, nout) are
        treated as padding and dropped (the reference scatter would have
        required a dump slot for them).
    vals passed to apply must have shape ``indices.shape + rest``.
    """
    import jax.numpy as jnp

    idx = np.asarray(indices).reshape(-1)
    nin = idx.size
    valid = (idx >= 0) & (idx < nout)
    vpos = np.where(valid)[0]
    order = vpos[np.argsort(idx[vpos], kind="stable")]
    sr = idx[order]
    counts = np.bincount(sr, minlength=nout)
    mu = int(counts.max()) if nin else 0
    starts = np.concatenate([[0], np.cumsum(counts)])
    table = np.full((nout, max(mu, 1)), nin, dtype=np.int64)
    pos = np.arange(order.size) - starts[sr]
    table[sr, pos] = order
    # index range is [0, nin] (nin = pad slot); int32 halves resident
    # index memory across the many per-level/per-color tables
    if nin < np.iinfo(np.int32).max:
        table = table.astype(np.int32)
    table_j = jnp.asarray(table)
    ndim_idx = np.asarray(indices).ndim
    shape_idx = np.asarray(indices).shape

    def apply(vals):
        rest = vals.shape[ndim_idx:]
        v = vals.reshape((nin,) + rest)
        vpad = jnp.concatenate(
            [v, jnp.zeros((1,) + rest, dtype=v.dtype)], axis=0)
        return vpad[table_j].sum(axis=1)

    apply.indices_shape = shape_idx
    apply.mu = mu
    apply.nout = nout
    return apply


def default_use_tables():
    """Tables on accelerators, scatter on CPU; ALFI_TPU_GATHER_SUM=0/1
    overrides (e.g. to validate the table path in CPU test runs)."""
    import os

    env = os.environ.get("ALFI_TPU_GATHER_SUM")
    if env is not None:
        return env == "1"
    import jax

    return jax.default_backend() != "cpu"
