"""Fused patch-inverse application as a Pallas TPU kernel.

The additive patch sweep applies explicit dense patch inverses
(solvers/batched_lu.py _ExplicitInverseFactorization — the TPU
formulation of the reference's ``patch_pc_patch_dense_inverse``,
/root/reference/alfi/solver.py:599-602).  Each application streams the
whole inverse array from HBM, so its speed of light is bytes/bandwidth
— but XLA tiles the two MINOR dims of an ``(np, m, m)`` f32 array to
(8, 128), and with patch sizes m ~ 14-50 the physical array is 2.5-9x
the logical bytes: the "bandwidth-bound" op spends most of its time
streaming layout padding.

Fix: store the inverses patch-minor, ``fac[i, j, p] = inv[p, i, j]``
with shape (m, m, np).  The lane dimension is now the large patch axis
(np >> 128, negligible padding) and the batched GEMV becomes m^2 VPU
FMAs over patch-vectors:

    out[i, p] = sum_j fac[i, j, p] * r[j, p]

This module provides that contraction as a Pallas kernel with an
explicit grid over patch blocks, streaming (m, m, B) tiles through VMEM
(the pallas_call pipeline double-buffers the HBM->VMEM copies), plus the
equivalent plain-XLA reduction used as fallback and correctness
reference.  On CPU the kernel runs in interpreter mode (used by the
tests); on TPU it compiles via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _block_patches(m):
    """Lane-block size: keep the double-buffered (m, m, B) working set
    comfortably inside ~16 MB VMEM."""
    if m <= 24:
        return 1024
    if m <= 40:
        return 512
    return 256


def _gemv_kernel(m, a_ref, r_ref, o_ref):
    # a_ref is the (m*m, B) flattening of (m, m, B): row i*m+j holds
    # inv[i, j, :].  Accumulate in the output dtype (f32) regardless of
    # the stored factor dtype, so bf16 factors halve the HBM stream
    # without compounding rounding in the j-sum.
    dt = o_ref.dtype
    r = r_ref[:].astype(dt)  # (m, B)
    rows = [
        jnp.sum(a_ref[i * m:(i + 1) * m, :].astype(dt) * r,
                axis=0, keepdims=True)
        for i in range(m)
    ]
    o_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _apply_padded(fac, rp, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, _, npad = fac.shape
    B = _block_patches(m)
    grid = (npad // B,)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}
    out_dtype = (jnp.float32 if fac.dtype == jnp.bfloat16
                 else fac.dtype)
    # The round-3 Mosaic "failed to legalize 'func.return'" was the
    # index maps: under jax_enable_x64 the literal 0 lowers as an i64
    # constant next to the i32 program id, and Mosaic refuses the mixed
    # return.  Pin every index-map component to i32.
    def imap(i):
        # i * 0, not the literal 0: index maps may not capture traced
        # constants, and a Python 0 lowers as i64 under x64
        return (i * 0, i)

    return pl.pallas_call(
        functools.partial(_gemv_kernel, m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m * m, B), imap, **ms),
            pl.BlockSpec((m, B), imap, **ms),
        ],
        out_specs=pl.BlockSpec((m, B), imap, **ms),
        out_shape=jax.ShapeDtypeStruct((m, npad), out_dtype),
        interpret=interpret,
    )(fac.reshape(m * m, npad), rp)


def pad_patch_axis(fac):
    """Pad the minor (patch) axis of an (m, m, np) factor to the kernel
    block size.  Done once at factor time so the hot apply never pads
    the large array."""
    m = fac.shape[0]
    B = _block_patches(m)
    npat = fac.shape[-1]
    npad = -(-npat // B) * B
    if npad != npat:
        fac = jnp.pad(fac, ((0, 0), (0, 0), (0, npad - npat)))
    return fac


def apply_transposed_pallas(fac, rp):
    """out (m, np) = batched GEMV of patch-minor inverses ``fac``
    (m, m, npad — pre-padded via :func:`pad_patch_axis`) against
    patch-minor rhs ``rp`` (m, np)."""
    npat = rp.shape[-1]
    # factors normally arrive pre-padded; sub-batches sliced out of a
    # padded factor (multiplicative color sweeps) get re-padded here
    fac = pad_patch_axis(fac)
    m, _, npad = fac.shape
    if npad != npat:
        rp = jnp.pad(rp, ((0, 0), (0, npad - npat)))
    interpret = jax.default_backend() == "cpu"
    # bf16 factors: the rhs/residual stays f32 (only the stored
    # inverses are bf16) — same contract as apply_transposed_xla
    rdt = jnp.float32 if fac.dtype == jnp.bfloat16 else fac.dtype
    out = _apply_padded(fac, rp.astype(rdt), interpret)
    return out[:, :npat]


def apply_transposed_xla(fac, rp):
    """Plain-XLA form of the same contraction: elementwise multiply +
    reduce over j, which XLA fuses into a single stream over ``fac``
    without relayouting to batch-major (an einsum/dot_general with the
    batch dim minor-most may transpose operands first)."""
    npat = rp.shape[-1]
    npad = fac.shape[-1]
    if npad != npat:
        rp = jnp.pad(rp, ((0, 0), (0, npad - npat)))
    dt = jnp.float32 if fac.dtype == jnp.bfloat16 else fac.dtype
    out = jnp.sum(fac.astype(dt) * rp[None, :, :].astype(dt), axis=1)
    return out[:, :npat]
