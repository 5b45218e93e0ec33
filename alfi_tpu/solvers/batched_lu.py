"""Batched dense LU with partial pivoting in pure elementwise JAX ops.

TPU XLA implements its LuDecomposition expansion only for f32, but the AL
patch/coarse operators have condition ~ gamma/nu * h^-2 (1e7+ at the
default gamma=1e4), far beyond f32 factorisation accuracy — the patch
smoother silently collapses (observed: Newton divergence at Re=100 on
v5e).  This module provides the f64 path: factorisation and triangular
solves built from adds/multiplies/gathers only, which XLA supports in
(emulated) f64 on TPU.  Shapes: A (..., m, m); everything vmaps/batches
over the leading axes.  Pivoting is partial (row) pivoting, matching
LAPACK getrf behaviour for our use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lu_factor_batched(A):
    """Returns (LU (..., m, m), perm (..., m)) with L unit-lower in the
    strictly-lower triangle and U upper; perm maps solve rhs rows."""
    m = A.shape[-1]
    batch = A.shape[:-2]
    perm0 = jnp.broadcast_to(jnp.arange(m), batch + (m,))
    rows = jnp.arange(m)

    def step(k, state):
        LU, perm = state
        col = jnp.abs(LU[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)  # (...,)
        # row swap k <-> p via a gather permutation
        idx = jnp.broadcast_to(rows, batch + (m,))
        pk = p[..., None]
        idx = jnp.where(idx == k, pk, jnp.where(idx == pk, k, idx))
        LU = jnp.take_along_axis(LU, idx[..., None], axis=-2)
        perm = jnp.take_along_axis(perm, idx, axis=-1)
        # eliminate below the pivot — update ONLY columns right of k: the
        # columns <= k of later rows hold already-stored L multipliers
        # which the rank-1 update must not touch
        pivval = LU[..., k, k]
        safe = jnp.where(pivval == 0.0, 1.0, pivval)
        fac = LU[..., :, k] / safe[..., None]
        below = rows > k
        pivrow = jnp.where(below, LU[..., k, :], 0.0)  # cols > k only
        upd = (jnp.where(below, fac, 0.0)[..., :, None]
               * pivrow[..., None, :])
        LU = LU - upd
        LU = jnp.where(
            (below[:, None] & (rows == k)[None, :]),
            jnp.broadcast_to(fac[..., :, None], LU.shape), LU)
        return LU, perm

    LU, perm = lax.fori_loop(0, m, step, (A, perm0))
    return LU, perm


def lu_solve_batched(lu_perm, b):
    """Solve A x = b given lu_factor_batched output; b (..., m)."""
    LU, perm = lu_perm
    m = LU.shape[-1]
    rows = jnp.arange(m)
    y = jnp.take_along_axis(b, perm, axis=-1)

    def fwd(k, y):
        # y_k -= sum_{j<k} L[k, j] y_j
        Lrow = jnp.where(rows < k, LU[..., k, :], 0.0)
        s = jnp.sum(Lrow * y, axis=-1)
        return y.at[..., k].add(-s)

    y = lax.fori_loop(0, m, fwd, y)

    def bwd(i, x):
        k = m - 1 - i
        Urow = jnp.where(rows > k, LU[..., k, :], 0.0)
        s = jnp.sum(Urow * x, axis=-1)
        diag = LU[..., k, k]
        safe = jnp.where(diag == 0.0, 1.0, diag)
        return x.at[..., k].set((x[..., k] - s) / safe)

    x = lax.fori_loop(0, m, bwd, y)
    return x


def lu_solve_batched_multi(lu_perm, B):
    """Multi-rhs variant: B (..., m, k) -> X (..., m, k)."""
    LU, perm = lu_perm
    m = LU.shape[-1]
    rows = jnp.arange(m)
    y = jnp.take_along_axis(B, perm[..., None], axis=-2)

    def fwd(j, y):
        Lrow = jnp.where(rows < j, LU[..., j, :], 0.0)
        s = jnp.einsum("...m,...mk->...k", Lrow, y)
        return y.at[..., j, :].add(-s)

    y = lax.fori_loop(0, m, fwd, y)

    def bwd(i, x):
        j = m - 1 - i
        Urow = jnp.where(rows > j, LU[..., j, :], 0.0)
        s = jnp.einsum("...m,...mk->...k", Urow, x)
        diag = LU[..., j, j]
        safe = jnp.where(diag == 0.0, 1.0, diag)
        return x.at[..., j, :].set((x[..., j, :] - s) / safe[..., None])

    return lax.fori_loop(0, m, bwd, y)


def has_native_f64_lu():
    """True when jax.scipy.linalg.lu_factor works in f64 on the default
    backend (CPU yes; TPU no)."""
    return jax.default_backend() == "cpu"


class _ScipyFactorization:
    """Native XLA LU in a fixed dtype (f64 on CPU, optionally f32 on
    accelerators for speed-over-accuracy experiments)."""

    def __init__(self, dtype):
        self.dtype = dtype

    def factor(self, A):
        return jax.scipy.linalg.lu_factor(A.astype(self.dtype))

    def solve(self, fac, b):
        # cast to the FACTOR's dtype, not the construction dtype: the
        # f32-cycle state cast (mg/velocity.py setup) may have stored
        # the factor in the cycle dtype
        dt = fac[0].dtype
        x = jax.scipy.linalg.lu_solve(fac, b.astype(dt)[..., None])
        return x[..., 0].astype(b.dtype)


class _QRFactorization:
    """Batched QR solve — the f64 path on TPU, where XLA implements Qr /
    TriangularSolve (but not LuDecomposition) in f64.  ~2x the flops of
    LU but native-speed and unconditionally stable for the nonsymmetric
    advective patch operators."""

    def factor(self, A):
        Q, R = jnp.linalg.qr(A)
        return Q, R

    def solve(self, fac, b):
        Q, R = fac
        y = jnp.einsum("...ji,...j->...i", Q, b)
        x = jax.scipy.linalg.solve_triangular(R, y[..., None],
                                              lower=False)
        return x[..., 0]


class _CustomF64Factorization:
    """Elementwise-ops f64 LU (works on any backend)."""

    def factor(self, A):
        return lu_factor_batched(A)

    def solve(self, fac, b):
        return lu_solve_batched(fac, b)


class _QRInverseFactorization:
    """Explicit f64 inverse via one-time QR + blocked matrix-rhs trsm;
    every apply is then a single (emulated-f64) GEMV.  For the MG
    coarse grid on TPU: _QRFactorization's vector-rhs TriangularSolve
    serialises its N back-substitution steps INSIDE every coarse apply
    (measured ~18 ms at N=2178 — a third of the whole FMG cycle),
    while apply-by-inverse has the same ~kappa*eps forward-error order
    and streams at MXU speed."""

    def factor(self, A):
        Q, R = jnp.linalg.qr(A)
        return jax.scipy.linalg.solve_triangular(R, Q.T, lower=False)

    def solve(self, fac, b):
        return fac @ b


def apply_transposed_xla(fac, rp):
    """Batched GEMV of PATCH-MINOR inverses: out (m, np) = sum_j
    fac[i, j, :] * rp[j, :] as an elementwise multiply + reduce over j,
    which XLA fuses into a single stream over ``fac`` without
    relayouting to batch-major (an einsum/dot_general with the batch
    dim minor-most may transpose operands first).  The patch-minor
    layout puts the large patch axis on lanes, so XLA's (8, 128)
    minor-dim tiling pads negligibly (np >> 128) — batch-major (np, m,
    m) factors with m ~ 14-50 are physically 2.5-9x their logical bytes
    and the bandwidth-bound apply would mostly stream padding."""
    npat = rp.shape[-1]
    npad = fac.shape[-1]
    if npad != npat:
        rp = jnp.pad(rp, ((0, 0), (0, npad - npat)))
    dt = jnp.float32 if fac.dtype == jnp.bfloat16 else fac.dtype
    out = jnp.sum(fac.astype(dt) * rp[None, :, :].astype(dt), axis=1)
    return out[:, :npat]


class _ExplicitInverseFactorization:
    """Dense patch INVERSES — the reference's own PkP0 patch trick
    (``patch_pc_patch_dense_inverse``, /root/reference/alfi/solver.py:599-602):
    pay one elementwise f64 LU + multi-rhs solve at factor time, then
    every application is a single batched matvec (the hot-loop shape the
    MXU wants).  Forward error of apply-by-inverse is ~kappa*eps64, the
    same order as an LU solve — and identical to what PETSc's dense
    inverse does.

    ``apply_dtype=f32``: keep the f64 factorisation (the
    gamma-conditioned cancellation lives there) but run the hot-loop
    matvec on the native-f32 MXU instead of in emulated f64.  The patch
    sweep is a PRECONDITIONER inside (flexible) FGMRES, which tolerates
    an inexact application by construction; iteration-count parity is
    the acceptance gate (measured on the high-Re sweeps).

    ``transposed=True``: store the inverses PATCH-MINOR, (m, m, np)
    instead of (np, m, m).  XLA tiles the two minor dims of an f32
    array to (8, 128), so batch-major inverses with m ~ 14-50 are
    physically 2.5-9x their logical bytes and the bandwidth-bound apply
    streams mostly padding; patch-minor layout makes the padding
    negligible (np >> 128).  See apply_transposed_xla.  The apply
    takes/returns patch-minor vectors via :meth:`solve_t` (the hot
    path, wired through mg/patches.build_patch_solver); :meth:`solve`
    keeps the batch-major interface for the remaining callers.

    A fused Pallas kernel for this contraction existed through round 4;
    its post-fix hardware run (results/logs/roofline_patches.log,
    round-5 closure entry: 4.27 ms/apply vs 1.19-1.49 ms for the XLA
    struct path at identical shapes) retired it — the XLA
    multiply-reduce IS the fast formulation here."""

    def __init__(self, apply_dtype=None, transposed=False,
                 promote=False):
        self.apply_dtype = apply_dtype
        self.transposed = transposed
        #: store-narrow / compute-wide (the config.mg_store pattern):
        #: inverses stored in apply_dtype but the GEMV runs in the
        #: RESIDUAL dtype via promotion — halved factor stream, exact
        #: iteration parity (consistent eps32 perturbation of the PC)
        self.promote = promote
        self.batch_axis = -1 if transposed else 0

    def factor(self, A):
        m = A.shape[-1]

        def one(Ac):
            lu = lu_factor_batched(Ac)
            inv = lu_solve_batched_multi(
                lu, jnp.broadcast_to(jnp.eye(m, dtype=Ac.dtype),
                                     Ac.shape))
            if self.apply_dtype is not None:
                inv = inv.astype(self.apply_dtype)
            return inv

        # sequential patch chunks: the elementwise-LU while loop plus
        # the m-RHS inverse solve hold several (np, m, m) buffers at
        # once — a single 7.2 GB AllocateBuffer at ldc3d nref=2
        # (np=4913, m=189; round-5 OOM log).  ~256 MB of working set
        # per chunk, 2D patch batches (m ~ 14-62) stay unchunked.
        from ..fem.nsforms import _map_cell_chunks

        # floor 1, not a fixed 64: SV 3D macrostar patches reach
        # m ~ 1600 where even 64 patches of working set is ~10 GB
        # (sv_ldc3d k=3 nref=1 OOM log, round 5)
        per = m * m * A.dtype.itemsize * 8
        chunk = max(1, (256 << 20) // per)
        inv = _map_cell_chunks(one, A, chunk=chunk)
        if self.transposed:
            inv = jnp.moveaxis(inv, 0, -1)  # (m, m, np)
        return inv

    def solve_t(self, Ainv, rp):
        """Patch-minor apply: rp (m, np) -> (m, np)."""
        # bf16 factors: only the stored inverses are bf16 — the
        # residual and the accumulation stay f32
        if self.promote:
            return apply_transposed_xla(Ainv, rp)
        rdt = (jnp.float32 if Ainv.dtype == jnp.bfloat16
               else Ainv.dtype)
        return apply_transposed_xla(
            Ainv, rp.astype(rdt)).astype(rp.dtype)

    def solve(self, Ainv, b):
        if self.transposed:
            # compat path for batch-major callers (multiplicative
            # color sweeps, distributed blocks): transpose the small
            # vectors, never the factor
            return self.solve_t(Ainv, b.T).T
        if self.apply_dtype is not None:
            rhs = b if self.promote else b.astype(self.apply_dtype)
            y = jnp.einsum("...ij,...j->...i", Ainv, rhs)
            return y.astype(b.dtype)
        return jnp.einsum("...ij,...j->...i", Ainv, b)


_fs = {}


def get_factorization(kind="dense"):
    """Platform-appropriate dense factorisation for the ill-conditioned
    AL operators.  CPU: native f64 LU.  TPU (no native f64
    LuDecomposition):

    * ``kind="patch"`` — large batches of SMALL matrices (the patch
      smoother/transfer hot path): explicit dense inverses built by the
      elementwise-ops f64 LU (the reference's own PkP0 dense-inverse
      trick), so every smoother application is one batched matvec.
      Measured on v5e at (4225, 14, 14): LU factor 53 ms vs 671 ms for
      the batched f64 QR, apply ~3 ms vs 78 ms
      (scripts/profile_patches.py).
    * ``kind="dense"`` — ONE large matrix (coarse grid, lu/allu modes):
      batched f64 QR; the elementwise LU would serialise N pivot steps.

    Overrides: ALFI_TPU_PATCH_DTYPE=f32 (f32 LU everywhere, unsafe at
    high gamma/Re), =lu64 (elementwise f64 LU everywhere), =inv64
    (explicit inverses everywhere — only sane for patch-sized
    matrices)."""
    if kind not in _fs:
        import os

        env = os.environ.get("ALFI_TPU_PATCH_DTYPE")
        if env == "f32":
            _fs[kind] = _ScipyFactorization(jnp.float32)
        elif env == "lu64":
            _fs[kind] = _CustomF64Factorization()
        elif env == "inv64":
            _fs[kind] = _ExplicitInverseFactorization()
        elif has_native_f64_lu():
            from ..config import real_dtype

            _fs[kind] = _ScipyFactorization(real_dtype)
        elif kind == "patch":
            # ALFI_TPU_PATCH_APPLY: f64 factor always; apply variants
            #   f32   — f32 batch-major einsum
            #   f32t  — f32 patch-minor layout, XLA multiply-reduce
            #   bf16t — bf16-STORED patch-minor inverses (half the HBM
            #       stream), f32 residual + accumulation; iteration-
            #       count parity on the high-Re sweeps is the
            #       acceptance gate
            #   t     — f64 patch-minor (layout effect in isolation)
            #   f32s / f32st — f32-STORED inverses, f64-COMPUTED GEMV
            #       (dtype promotion): halved factor stream with EXACT
            #       iteration parity (the config.mg_store pattern)
            # (the retired f32p/bf16p Pallas modes: see the round-5
            # closure entry in results/logs/roofline_patches.log)
            app = os.environ.get("ALFI_TPU_PATCH_APPLY", "")
            if app not in ("", "f32", "f32t", "bf16t", "t", "f32s",
                           "f32st"):
                # a typo (e.g. bare "bf16") would silently pick a mode
                # that truncates the residual — refuse instead
                raise ValueError(
                    "ALFI_TPU_PATCH_APPLY=%r: expected one of "
                    "'', f32, f32t, bf16t, t, f32s, f32st" % app)
            dt = (jnp.float32 if app.startswith("f32")
                  else jnp.bfloat16 if app.startswith("bf16") else None)
            _fs[kind] = _ExplicitInverseFactorization(
                dt, transposed=app in ("f32t", "bf16t", "t", "f32st"),
                promote=app in ("f32s", "f32st"))
        elif kind == "coarse":
            # ONE matrix applied many times per cycle: pay the blocked
            # inverse once, GEMV thereafter
            _fs[kind] = _QRInverseFactorization()
        else:
            _fs[kind] = _QRFactorization()
    return _fs[kind]
