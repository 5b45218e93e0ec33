"""Jittable Krylov solvers over pytree vectors.

TPU-native replacements for the PETSc KSPs the reference configures
(/root/reference/alfi/solver.py:305-514): flexible GMRES (the outer solver,
``ksp_type fgmres``), CG (the graddiv harness driver,
/root/reference/examples/graddiv/graddiv.py:88-97), Richardson and
Chebyshev (the multigrid level drivers).

All solvers are pure functions of pytrees; operators / preconditioners are
closures.  Everything uses fixed-size buffers + ``lax.while_loop`` so the
whole solve stays inside one XLA program — no host round-trips per
iteration (the reference pays a Python/C crossing per PETSc callback).

Convergence semantics mirror KSPConvergedDefault with unpreconditioned
norms: stop when ||r|| <= max(rtol * ||r0||, atol); for right-
preconditioned (F)GMRES the Givens residual estimate IS the
unpreconditioned residual norm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import real_dtype
from ..utils.tree import (
    taxpy,
    tdot,
    tget,
    tnorm,
    tscale,
    tset,
    tstack_zeros,
    tsub,
    tzeros_like,
)

_EPS = 1e-300


def _identity_pc(x):
    return x


class DotContext:
    """Inner-product context for the Krylov loops.

    The default is the plain single-program inner product; the
    shard_map-distributed solver passes an owner-weighted psum variant
    (parallel/distributed.py) so the SAME fgmres/cg implementation runs
    per-block with the reference's MPI-allreduce dot semantics
    (SURVEY.md §5.8)."""

    def dot(self, a, b):
        return tdot(a, b)

    def norm(self, a):
        return tnorm(a)

    def buf_dots(self, buf, w, j, n):
        return _buf_dots(buf, w, j, n)


class ShardDotContext(DotContext):
    """Owner-weighted dots with a psum over the device-mesh axis: every
    replicated (interface/halo) dof is counted once, matching the global
    inner product bit-for-bit up to summation order."""

    def __init__(self, weight, axis):
        #: pytree of 0/1 owner weights matching the vector pytrees
        self.weight = weight
        self.axis = axis

    def dot(self, a, b):
        loc = sum(
            jax.tree.leaves(
                jax.tree.map(lambda w, x, y: jnp.sum(w * x * y),
                             self.weight, a, b)))
        return lax.psum(loc, self.axis)

    def norm(self, a):
        return jnp.sqrt(self.dot(a, a))

    def buf_dots(self, buf, w, j, n):
        dots = sum(
            jax.tree.leaves(
                jax.tree.map(
                    lambda b, ww, wt: jnp.tensordot(
                        b.reshape(n, -1), (wt * ww).reshape(-1), axes=1),
                    buf, w, self.weight)))
        dots = lax.psum(dots, self.axis)
        return jnp.where(jnp.arange(n) < j, dots, 0.0)


def _buf_dots(buf, w, j, n):
    """dots[i] = <buf[i], w> for i < j else 0 — one batched reduction."""
    dots = sum(
        jax.tree.leaves(
            jax.tree.map(
                lambda b, ww: jnp.tensordot(
                    b.reshape(n, -1), ww.reshape(-1), axes=1
                ),
                buf,
                w,
            )
        )
    )
    return jnp.where(jnp.arange(n) < j, dots, 0.0)


def _buf_axpy(buf, coef, w):
    """w - sum_i coef[i] * buf[i]."""
    return jax.tree.map(
        lambda ww, b: ww - jnp.tensordot(coef, b, axes=(0, 0)), w, buf
    )


def fgmres(A, b, pc=None, x0=None, rtol=1e-9, atol=1e-10, maxit=500,
           restart=30, project=None, ctx=None):
    """Right-preconditioned flexible GMRES.

    Parameters
    ----------
    A, pc : pytree -> pytree closures (pc may be nonlinear/state-dependent,
        e.g. an inner Krylov-smoothed multigrid cycle — that is the
        "flexible" part the reference relies on for almg).
    project : optional nullspace projector applied to operator outputs
        (constant-pressure mode removal, the MatNullSpace analogue of
        /root/reference/alfi/problem.py:33-38).

    Returns
    -------
    (x, info) with info = dict(iters, rnorm, rnorm0, converged).
    """
    if pc is None:
        pc = _identity_pc
    if project is None:
        project = _identity_pc
    if ctx is None:
        ctx = DotContext()
    zero_guess = x0 is None
    if zero_guess:
        x0 = tzeros_like(b)
    b = project(b)
    m = restart
    # scalar state (Hessenberg, Givens, residual estimate) follows the
    # VECTOR dtype: the f32 MG level smoother (config.mg_dtype) must not
    # upcast its iterates through f64 scalars; the f64 outer solve is
    # unchanged
    vdt = jnp.result_type(*[x.dtype for x in jax.tree.leaves(b)])

    def opA(v):
        return project(A(v))

    # scalar results from the dot context are pinned to vdt: a context
    # that accumulates in f64 (ShardDotContext's owner-weighted psums)
    # must not upcast an f32 (MG-smoother) Krylov loop through its
    # norms/dots — the carries and the V-basis scaling would silently
    # promote to f64
    def _norm(v):
        return ctx.norm(v).astype(vdt)

    # zero initial guess: the residual IS b — no operator application
    # spent before the Krylov loop (the fixed-iteration MG smoother
    # calls this once per level per cycle, so the saving is real)
    r0 = b if zero_guess else tsub(b, opA(x0))
    rnorm0 = _norm(r0)
    target = jnp.maximum(rtol * rnorm0, atol)

    def cgs2(V, w, j):
        """Classical Gram-Schmidt with one re-orthogonalisation pass."""
        h1 = ctx.buf_dots(V, w, j, m + 1).astype(vdt)
        w = _buf_axpy(V, h1, w)
        h2 = ctx.buf_dots(V, w, j, m + 1).astype(vdt)
        w = _buf_axpy(V, h2, w)
        return w, h1 + h2

    def cycle(x, total_it, r=None):
        if r is None:
            r = tsub(b, opA(x))
        beta = _norm(r)
        V = tstack_zeros(b, m + 1)
        V = tset(V, 0, tscale(1.0 / (beta + _EPS), r))
        Z = tstack_zeros(b, m)
        R = jnp.zeros((m + 1, m), dtype=vdt)  # rotated Hessenberg
        cs = jnp.zeros((m,), dtype=vdt)
        sn = jnp.zeros((m,), dtype=vdt)
        g = jnp.zeros((m + 1,), dtype=vdt).at[0].set(beta)

        def arnoldi_cond(state):
            V, Z, R, cs, sn, g, j, rnorm = state
            return (j < m) & (rnorm > target) & (total_it + j < maxit)

        def arnoldi_step(state):
            V, Z, R, cs, sn, g, j, rnorm = state
            z = pc(tget(V, j))
            Z = tset(Z, j, z)
            w = opA(z)
            w, h = cgs2(V, w, j + 1)  # orthogonalise against V[0..j]
            hj1 = _norm(w)
            V = tset(V, j + 1, tscale(1.0 / (hj1 + _EPS), w))
            # apply stored Givens rotations to the new column h[0..j]
            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                return hcol.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                )

            hcol = h.at[j + 1].set(hj1)  # j < m inside the loop
            hcol = lax.fori_loop(0, j, rot, hcol)
            a_, b_ = hcol[j], hcol[j + 1]
            denom = jnp.sqrt(a_ * a_ + b_ * b_) + _EPS
            c_new, s_new = a_ / denom, b_ / denom
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            R = R.at[:, j].set(hcol)
            gj = g[j]
            g = g.at[j].set(c_new * gj).at[j + 1].set(-s_new * gj)
            rnorm = jnp.abs(g[j + 1])
            return V, Z, R, cs, sn, g, j + 1, rnorm

        init = (V, Z, R, cs, sn, g, 0, beta)
        V, Z, R, cs, sn, g, j, rnorm = lax.while_loop(
            arnoldi_cond, arnoldi_step, init
        )
        # back-substitute on the padded triangle: inactive columns get a
        # unit diagonal and zero rhs so their y_i vanish.
        idx = jnp.arange(m)
        active = idx < j
        Rsq = R[:m, :]
        Rsq = jnp.where(
            active[None, :] & active[:, None],
            Rsq,
            jnp.eye(m, dtype=vdt),
        )
        y = jax.scipy.linalg.solve_triangular(
            Rsq, jnp.where(active, g[:m], 0.0), lower=False
        )
        x = jax.tree.map(
            lambda xx, zz: xx + jnp.tensordot(y, zz, axes=(0, 0)), x, Z
        )
        return x, total_it + j, rnorm

    def outer_cond(state):
        x, it, rnorm = state
        return (rnorm > target) & (it < maxit)

    def outer_body(state):
        x, it, rnorm = state
        return cycle(x, it)

    if maxit <= restart:
        # fixed-iteration (smoother) mode: at most ONE Arnoldi cycle
        # can run (arnoldi_cond caps j at maxit, outer_cond then
        # fails), so call it directly with the known initial residual
        # instead of recomputing b - A x0 inside the loop body
        x, iters, rnorm = cycle(x0, 0, r0)
    else:
        x, iters, rnorm = lax.while_loop(
            outer_cond, outer_body, (x0, jnp.asarray(0), rnorm0)
        )
    info = {
        "iters": iters,
        "rnorm": rnorm,
        "rnorm0": rnorm0,
        "converged": rnorm <= target,
    }
    return x, info


def fgmres_stepper(A_of, pc_of, m, maxit, rtol, atol,
                   project_of=None, ctx=None):
    """Host-driven right-preconditioned FGMRES with chunk-bounded
    dispatches.

    :func:`fgmres` runs every Arnoldi iteration and restart cycle of a
    solve as ONE XLA program; through the tunneled-TPU transport a
    single such dispatch can run for minutes, so (a) any transport
    fault loses the entire solve and (b) a per-RPC execution deadline
    makes sufficiently hard solves *unsolvable* (the ldc3d Re=3000
    continuation step, results/logs/ldc3d_p2fb_nref1_re5000.log).  This
    factory splits the SAME algorithm at host level: ``start(aux, b,
    x0)`` initialises a restart cycle, ``step(aux, b, carry, chunk)``
    advances at most ``chunk`` Arnoldi iterations — finishing the cycle
    (back-substitution + solution update) and opening the next one when
    it hits the restart length or the tolerance — and the caller polls
    ``carry["done"]`` between dispatches.  ``chunk`` is a TRACED scalar,
    so the host driver can resize dispatches (fgmres_chunked's adaptive
    mode) without recompiling.  Numerics are identical to
    fgmres: same CGS2 orthogonalisation, Givens recurrence, padded
    back-substitution and KSPConvergedDefault-style test
    (/root/reference/alfi/solver.py:464-499 tolerances).

    ``A_of(aux, v)`` / ``pc_of(aux, v)`` / ``project_of(aux, v)`` are
    pure functions of an explicit operator-state pytree ``aux`` rather
    than closures, so the returned (start, step) can each be jitted
    exactly once by the caller with ``aux`` as an argument.
    """
    if ctx is None:
        ctx = DotContext()
    if project_of is None:
        def project_of(aux, x):  # noqa: ARG001
            return x

    def opA(aux, v):
        return project_of(aux, A_of(aux, v))

    def cgs2(V, w, j):
        h1 = ctx.buf_dots(V, w, j, m + 1)
        w = _buf_axpy(V, h1, w)
        h2 = ctx.buf_dots(V, w, j, m + 1)
        w = _buf_axpy(V, h2, w)
        return w, h1 + h2

    def _open_cycle(aux, b, x, vdt):
        """Fresh restart-cycle buffers at iterate x."""
        r = tsub(b, opA(aux, x))
        beta = ctx.norm(r)
        V = tstack_zeros(b, m + 1)
        V = tset(V, 0, tscale(1.0 / (beta + _EPS), r))
        Z = tstack_zeros(b, m)
        R = jnp.zeros((m + 1, m), dtype=vdt)
        cs = jnp.zeros((m,), dtype=vdt)
        sn = jnp.zeros((m,), dtype=vdt)
        g = jnp.zeros((m + 1,), dtype=vdt).at[0].set(beta)
        return dict(x=x, V=V, Z=Z, R=R, cs=cs, sn=sn, g=g,
                    j=jnp.asarray(0), rnorm=beta)

    def start(aux, b, x0=None):
        if x0 is None:
            x0 = tzeros_like(b)
        b = project_of(aux, b)
        vdt = jnp.result_type(*[x.dtype for x in jax.tree.leaves(b)])
        cyc = _open_cycle(aux, b, x0, vdt)
        rnorm0 = cyc["rnorm"]  # x0 = 0 or caller-supplied: r0 = b - A x0
        target = jnp.maximum(rtol * rnorm0, atol)
        carry = dict(cyc, it=jnp.asarray(0), rnorm0=rnorm0,
                     target=target, done=rnorm0 <= target)
        return carry

    def step(aux, b, carry, chunk):
        b = project_of(aux, b)
        vdt = jnp.result_type(*[x.dtype for x in jax.tree.leaves(b)])
        target = carry["target"]
        it0 = carry["it"]
        jcap = jnp.minimum(carry["j"] + chunk, m)

        def arnoldi_cond(state):
            V, Z, R, cs, sn, g, j, rnorm = state
            return (j < jcap) & (rnorm > target) & (it0 + j < maxit)

        def arnoldi_step(state):
            V, Z, R, cs, sn, g, j, rnorm = state
            z = pc_of(aux, tget(V, j))
            Z = tset(Z, j, z)
            w = opA(aux, z)
            w, h = cgs2(V, w, j + 1)
            hj1 = ctx.norm(w)
            V = tset(V, j + 1, tscale(1.0 / (hj1 + _EPS), w))

            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                return hcol.at[i].set(
                    cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1)

            hcol = h.at[j + 1].set(hj1)
            hcol = lax.fori_loop(0, j, rot, hcol)
            a_, b_ = hcol[j], hcol[j + 1]
            denom = jnp.sqrt(a_ * a_ + b_ * b_) + _EPS
            c_new, s_new = a_ / denom, b_ / denom
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            R = R.at[:, j].set(hcol)
            gj = g[j]
            g = g.at[j].set(c_new * gj).at[j + 1].set(-s_new * gj)
            return V, Z, R, cs, sn, g, j + 1, jnp.abs(g[j + 1])

        init = (carry["V"], carry["Z"], carry["R"], carry["cs"],
                carry["sn"], carry["g"], carry["j"], carry["rnorm"])
        V, Z, R, cs, sn, g, j, rnorm = lax.while_loop(
            arnoldi_cond, arnoldi_step, init)

        cycle_end = (j >= m) | (rnorm <= target) | (it0 + j >= maxit)

        def close_cycle(_):
            idx = jnp.arange(m)
            active = idx < j
            Rsq = jnp.where(active[None, :] & active[:, None],
                            R[:m, :], jnp.eye(m, dtype=vdt))
            y = jax.scipy.linalg.solve_triangular(
                Rsq, jnp.where(active, g[:m], 0.0), lower=False)
            x = jax.tree.map(
                lambda xx, zz: xx + jnp.tensordot(y, zz, axes=(0, 0)),
                carry["x"], Z)
            it = it0 + j
            done = (rnorm <= target) | (it >= maxit)

            def reopen(_):
                return _open_cycle(aux, b, x, vdt)

            def keep(_):
                # j folded into it above; zero it so (it + j) stays the
                # exact total-iteration count for the host driver
                return dict(x=x, V=V, Z=Z, R=R, cs=cs, sn=sn, g=g,
                            j=jnp.zeros_like(j), rnorm=rnorm)

            cyc = lax.cond(done, keep, reopen, None)
            # closed-cycle rnorm: the reopened cycle's TRUE residual
            # norm when continuing, the Givens estimate when done
            return dict(cyc, x=x, it=it, done=done,
                        rnorm=jnp.where(done, rnorm, cyc["rnorm"]))

        def keep_open(_):
            return dict(x=carry["x"], V=V, Z=Z, R=R, cs=cs, sn=sn,
                        g=g, j=j, rnorm=rnorm, it=it0,
                        done=jnp.asarray(False))

        out = lax.cond(cycle_end, close_cycle, keep_open, None)
        out["rnorm0"] = carry["rnorm0"]
        out["target"] = target
        return out

    return start, step


def fgmres_chunked(A_of, pc_of, aux, b, m=30, maxit=500, rtol=1e-9,
                   atol=1e-10, chunk=0, target_s=20.0, project_of=None,
                   ctx=None, jit_cache=None):
    """Drive :func:`fgmres_stepper` to convergence from the host.

    ``chunk``: Arnoldi iterations per dispatch.  0 (default) =
    ADAPTIVE: start at 1, measure the per-iteration wall-clock of each
    dispatch, and grow/shrink the next chunk to target ``target_s``
    seconds per dispatch — comfortably under the tunneled transport's
    ~60 s dispatch deadline (measured: a 55.6 s dispatch survives, a
    60.0 s one is killed) while amortising the per-RPC cost on cheap
    problems.  Because ``chunk`` is a traced argument of the compiled
    step, resizing never recompiles.

    ``jit_cache``: optional dict the caller owns; the jitted
    (start, step) pair and the adaptation state are memoised there so
    repeated solves (Newton iterations, continuation steps) reuse ONE
    compilation and remember the learned per-iteration cost.
    Returns ``(x, info)`` with the same info dict as :func:`fgmres`.
    """
    import time as _time

    if jit_cache is None:
        jit_cache = {}
    if "stepper" not in jit_cache:
        start, step = fgmres_stepper(
            A_of, pc_of, m=m, maxit=maxit, rtol=rtol, atol=atol,
            project_of=project_of, ctx=ctx)
        jit_cache["stepper"] = (jax.jit(start), jax.jit(step))
    start_j, step_j = jit_cache["stepper"]
    adaptive = chunk <= 0
    if adaptive:
        chunk = jit_cache.get("chunk", 1)
    carry = start_j(aux, b)
    done, it, j = jax.device_get(
        (carry["done"], carry["it"], carry["j"]))
    # poll the scalars between bounded dispatches (the whole point:
    # one host round-trip per `chunk` Krylov iterations)
    while not bool(done):
        t0 = _time.perf_counter()
        carry = step_j(aux, b, carry, chunk)
        done, it2, j2 = jax.device_get(
            (carry["done"], carry["it"], carry["j"]))
        if adaptive:
            dt = _time.perf_counter() - t0
            # progress made this dispatch; `it` jumps by the in-cycle j
            # at cycle close, so (it + j) is monotone across dispatches
            adv = max(1, int(it2 + j2) - int(it + j))
            if jit_cache.get("warm", False):
                per_it = dt / adv
                chunk = max(1, min(m, int(target_s / max(per_it, 1e-6))))
                jit_cache["chunk"] = chunk
            else:
                # first dispatch carries the XLA compile: don't let it
                # poison the estimate, just mark warm and stay small
                jit_cache["warm"] = True
        it, j = it2, j2
    return carry["x"], {
        "iters": carry["it"],
        "rnorm": carry["rnorm"],
        "rnorm0": carry["rnorm0"],
        "converged": carry["rnorm"] <= carry["target"],
    }


def cg(A, b, pc=None, x0=None, rtol=1e-8, atol=1e-50, maxit=200,
       project=None, ctx=None):
    """Preconditioned CG with unpreconditioned-norm convergence test
    (``ksp_norm_type unpreconditioned`` of
    /root/reference/examples/graddiv/graddiv.py:90-96)."""
    if pc is None:
        pc = _identity_pc
    if project is None:
        project = _identity_pc
    if ctx is None:
        ctx = DotContext()
    if x0 is None:
        x0 = tzeros_like(b)
    b = project(b)
    r = tsub(b, project(A(x0)))
    rnorm0 = ctx.norm(r)
    target = jnp.maximum(rtol * rnorm0, atol)
    z = pc(r)
    p = z
    rz = ctx.dot(r, z)

    def cond(state):
        x, r, p, rz, it, rnorm = state
        return (rnorm > target) & (it < maxit)

    def body(state):
        x, r, p, rz, it, rnorm = state
        Ap = project(A(p))
        alpha = rz / (ctx.dot(p, Ap) + _EPS)
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, Ap, r)
        z = pc(r)
        rz_new = ctx.dot(r, z)
        beta = rz_new / (rz + _EPS)
        p = taxpy(beta, p, z)
        return x, r, p, rz_new, it + 1, ctx.norm(r)

    x, r, p, rz, iters, rnorm = lax.while_loop(
        cond, body, (x0, r, p, rz, jnp.asarray(0), rnorm0)
    )
    return x, {
        "iters": iters,
        "rnorm": rnorm,
        "rnorm0": rnorm0,
        "converged": rnorm <= target,
    }


def richardson(A, b, pc, x0=None, maxit=1, scale=1.0):
    """Fixed-iteration Richardson (the reference's MG outer driver,
    ``ksp_type richardson, ksp_max_it 1``, /root/reference/alfi/solver.py:346-366)."""
    if x0 is None:
        x0 = tzeros_like(b)

    def body(i, x):
        return taxpy(scale, pc(tsub(b, A(x))), x)

    return lax.fori_loop(0, maxit, body, x0)


def fixed_fgmres(A, b, pc, maxit, x0=None, ctx=None):
    """FGMRES with a fixed iteration count and no convergence test — the
    reference's MG level smoother driver (``ksp_convergence_test skip``,
    ``ksp_max_it`` = smoothing, /root/reference/alfi/solver.py:311-317).
    maxit is a Python int (compile-time constant), so buffers are exact."""
    x, _ = fgmres(A, b, pc=pc, x0=x0, rtol=0.0, atol=-1.0, maxit=maxit,
                  restart=maxit, ctx=ctx)
    return x


def chebyshev(A, b, pc, x0=None, maxit=2, lmin=None, lmax=None,
              eig_scale=(0.1, 1.1)):
    """Chebyshev smoother (graddiv harness jacobi branch,
    /root/reference/examples/graddiv/graddiv.py:99-111).  Eigenvalue bounds
    (for the preconditioned operator) must be supplied; when lmin is None
    the bounds are (0.1*lmax, 1.1*lmax) — deliberately wider at the low
    end than PETSc's (0.3, 1.1) because our power-iteration lmax estimate
    is looser than PETSc's GMRES-based esteig (docs/DESIGN.md)."""
    if x0 is None:
        x0 = tzeros_like(b)
    if lmin is None:
        lmin = eig_scale[0] * lmax
        lmax = eig_scale[1] * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def body(i, state):
        x, d, alpha = state
        r = pc(tsub(b, A(x)))
        beta = jnp.where(i == 0, 0.0, (0.5 * delta * alpha) ** 2)
        alpha = jnp.where(
            i == 0, 1.0 / theta, 1.0 / (theta - beta / (alpha + _EPS))
        )
        d = jax.tree.map(lambda dd, rr: beta * dd + rr, d, r)
        x = taxpy(alpha, d, x)
        return x, d, alpha

    vdt = jnp.result_type(*[xx.dtype for xx in jax.tree.leaves(b)])
    x, _, _ = lax.fori_loop(
        0, maxit, body,
        (x0, tzeros_like(b), jnp.asarray(0.0, vdt))
    )
    return x
