"""Global configuration for alfi_tpu.

The reference stack (Firedrake/PETSc) is double precision throughout.  TPUs
emulate f64, so we keep the *outer* Krylov/Newton arithmetic in f64 (needed to
hit the reference tolerances ksp_rtol=1e-9 / snes_atol=1e-8, see
/root/reference/alfi/solver.py:464-499) while allowing the multigrid
preconditioner and the batched patch solves to run in f32.  Flexible GMRES
permits an inexact (lower precision, nonlinear) preconditioner by
construction, so this does not change convergence semantics.
"""

import os

import jax

# f64 must be enabled before any arrays are created.
if os.environ.get("ALFI_TPU_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)

# Backend forcing must happen HERE, not via plain env vars: the runtime
# image's sitecustomize registers the TPU plugin at interpreter start,
# so JAX_PLATFORMS set by a parent process is too late for harnesses
# that don't do the config-update dance themselves (observed: "[cpu]"
# queue stages OOM-ing the TPU compile helper, queue_r4cpu round 1-3).
if os.environ.get("ALFI_TPU_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU constant folding evaluates the big FEM tabulation einsums
    # at compile time (>2 GB HLO protos, multi-hour "Constant folding an
    # instruction is taking > 32s" stalls — the round-3 ldc3d CPU
    # blocker).  Disabling the pass cut the ldc3d nref=1 continuation
    # step to ~3.5 s on one host core with no measured runtime penalty.
    if "constant_folding" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_disable_hlo_passes=constant_folding").strip()

# persistent compilation cache: the solver programs are large (minutes of
# XLA time on TPU) and identical across processes/runs
if os.environ.get("ALFI_TPU_COMPILE_CACHE", "1") == "1":
    _cache_dir = os.environ.get(
        "ALFI_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "alfi_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # older jax without the knobs
        pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

#: dtype of outer solver arithmetic (residuals, Krylov vectors, dots).
real_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

#: host-side index dtype.
index_dtype = np.int32

_pc_dtype = None


def pc_dtype():
    """dtype of the DG pressure-mass inversion (its only remaining user
    — the patch/coarse factorisation strategy lives in
    solvers/batched_lu.py get_factorization and
    solvers/linear.py woodbury_refined_dense_closure): f32 inversion +
    f64 Newton-Schulz refinement on accelerators, plain f64 on CPU."""
    global _pc_dtype
    if _pc_dtype is None:
        env = os.environ.get("ALFI_TPU_PC_DTYPE")
        if env:
            _pc_dtype = {"f32": jnp.float32, "f64": jnp.float64}[env]
        elif jax.default_backend() == "cpu":
            _pc_dtype = real_dtype
        else:
            _pc_dtype = jnp.float32
    return _pc_dtype


def set_pc_dtype(dtype):
    global _pc_dtype
    _pc_dtype = dtype


_mg_dtype = None


def mg_dtype():
    """dtype of the velocity-block MG CYCLE (level matvecs, smoother
    Krylov arithmetic, transfers, patch applies).  The cycle is a
    PRECONDITIONER inside flexible GMRES, which admits an inexact
    (lower-precision) application by construction; the factorisations
    that carry the gamma-conditioned cancellation (patch LU, coarse
    solve) stay f64 regardless — only the per-iteration STREAMING work
    changes precision.  f64 is emulated on TPU (~3-10x the cost of f32
    on the VPU, no MXU), so the f32 cycle is the difference between an
    idle chip and a fast one; iteration-count parity on the high-Re
    sweeps is the acceptance gate (results/README.md round 3).

    Default: f64 (the safe control) until the per-component precision
    mix proves iteration-count parity on the high-Re sweeps; opt in
    with ALFI_TPU_MG_DTYPE=f32 (+ ALFI_TPU_MG_F64_KEYS for the state
    entries to keep in f64)."""
    global _mg_dtype
    if _mg_dtype is None:
        env = os.environ.get("ALFI_TPU_MG_DTYPE")
        if env:
            _mg_dtype = {"f32": jnp.float32, "f64": jnp.float64}[env]
        else:
            _mg_dtype = real_dtype
        if (_mg_dtype == jnp.float32
                and jax.default_backend() not in ("cpu",)):
            # On TPU an f32 einsum runs the MXU at DEFAULT matmul
            # precision = bf16 inputs, so the "f32 cycle" silently
            # becomes a bf16 cycle: measured Re=700 ldc2d nref=2 solve
            # took 86 Krylov its on TPU vs 31 on CPU with bit-true f32
            # (scripts/diag_f32_tail.py).  The cycle's matvecs are
            # HBM-BANDWIDTH-bound (~0.25 flop/byte), so full-f32 MXU
            # passes cost ~nothing; pin HIGHEST unless overridden.
            prec = os.environ.get("ALFI_TPU_MATMUL_PRECISION", "highest")
            jax.config.update("jax_default_matmul_precision", prec)
    return _mg_dtype


def set_mg_dtype(dtype):
    global _mg_dtype
    _mg_dtype = dtype


_mg_store = None


def mg_store():
    """STORAGE dtype of the MG level-operator stream (gamma-split
    M/B element tensors, facet tensors) — independent of the cycle's
    COMPUTE dtype (mg_dtype).

    The f32 cycle fails iteration parity at high Re (measured: 31 vs 15
    Krylov its at Re=700 regardless of which STORED state stays f64 —
    scripts/diag_f32_tail.py), i.e. the loss is in f32 vector
    arithmetic.  Storing the operator stream in f32 while computing in
    f64 is the complementary mix: a consistent relative-eps32 operator
    perturbation (absorbed by flexible GMRES like the Woodbury f32
    factorisation) that halves the dominant HBM traffic of every level
    matvec.  XLA fuses the widening converts into the loads, so the
    stream stays f32 bytes.

    Default on TPU (round 4): f32 — the acceptance gate (VERDICT r3
    item 2) passed with ITERATION-EXACT Krylov counts vs the f64
    control on the ldc2d nref=2 high-Re sweep
    (results/logs/iters_ldc2d_nref2_re10000_s32full.log vs
    results/logs/iters_ldc2d_nref2_re10000.log).  CPU keeps the
    compute dtype (f64 is native there; no bandwidth win to buy).
    Override with ALFI_TPU_MG_STORE=f64."""
    global _mg_store
    if _mg_store is None:
        env = os.environ.get("ALFI_TPU_MG_STORE")
        if env:
            _mg_store = {"f32": jnp.float32, "f64": jnp.float64}[env]
        elif jax.default_backend() == "tpu":
            # the f32-storage gate evidence is TPU (where the HBM win
            # pays for it); other accelerators inherit the compute
            # dtype until they get their own acceptance run (ADVICE r4)
            _mg_store = jnp.float32
        else:
            _mg_store = mg_dtype()
    return _mg_store


def set_mg_store(dtype):
    global _mg_store
    _mg_store = dtype


_mg_smooth = None


def mg_smooth_dtype():
    """COMPUTE dtype of the level smoother's inner Krylov loop
    (defect-correction mixed precision, VERDICT r4 item 2).

    The round-4 bisect localised the f32 cycle's parity loss to f32
    VECTOR arithmetic (scripts/diag_f32_tail.py: 31 vs 15 Krylov its at
    Re=700 no matter which STORED state stays f64).  The classical
    mixed-precision-MG answer is defect correction: keep every
    RESIDUAL/correction accumulation (b - Ax, restrict, prolong-add,
    coarse) in f64, and run only the inner fixed-iteration smoother on
    the DEFECT in f32 — the smoother's output is a correction whose
    f32 rounding is RELATIVE to the defect it smooths, so the cycle's
    contraction factor survives while the m matvecs + patch applies +
    Arnoldi arithmetic per level run on the native-f32 VPU/MXU instead
    of 3-10x-cost emulated f64 (mg/velocity.py _smooth).

    Default f32 on TPU — the round-5 acceptance gate:

    * ldc2d nref=2 Re->10,000, all 102 continuation steps
      iteration-IDENTICAL to the f64 control (incl. 19 == 19 at
      Re=10,000; results/logs/iters_ldc2d_nref2_re10000_dc32.log vs
      results/iters_ldc2d_nref2_re10000.log);
    * bench.py 14.77 s -> 8.99 s (1.64x) at identical counts 22/7;
    * bench3d 138.9 s -> 117.6 s (1.18x) with 16 -> 18 outer its —
      the +2-iteration drift at smoothing=10/m~135 is the documented
      price, absorbed by flexible GMRES (robustness/flatness is the
      contract, results/logs/bench3d_dc32_ab.log).

    CPU/other backends keep the cycle dtype (f64 native there).
    Override with ALFI_TPU_MG_SMOOTH_DTYPE=f64 / f32."""
    global _mg_smooth
    if _mg_smooth is None:
        env = os.environ.get("ALFI_TPU_MG_SMOOTH_DTYPE")
        if env:
            _mg_smooth = {"f32": jnp.float32, "f64": jnp.float64}[env]
        elif jax.default_backend() == "tpu":
            _mg_smooth = jnp.float32
        else:
            _mg_smooth = mg_dtype()
        if (_mg_smooth == jnp.float32
                and jax.default_backend() not in ("cpu",)):
            # the inner smoother runs f32 einsums on the MXU: pin
            # full f32 matmul precision (default would use bf16
            # inputs — measured 86 vs 31 its at Re=700, mg_dtype)
            prec = os.environ.get("ALFI_TPU_MATMUL_PRECISION",
                                  "highest")
            jax.config.update("jax_default_matmul_precision", prec)
    return _mg_smooth


def set_mg_smooth_dtype(dtype):
    global _mg_smooth
    _mg_smooth = dtype


def host_callbacks_ok():
    """Whether the live backend can execute host send/recv callbacks
    (jax pure_callback / io_callback).  The axon TPU tunnel's PJRT
    shim rejects them at EXECUTION time (UNIMPLEMENTED), which would
    kill any solve whose coarse grid rides the telescoped host sparse
    LU — callers fall back to the on-device dense factorisation
    instead (mg/velocity.py coarse-solve strategy).

    Detection: the tunnel presents platform 'tpu' just like real
    hardware; only the PJRT ``platform_version`` string names the
    axon plugin (measured: a jitted pure_callback probe dies with
    UNIMPLEMENTED exactly when 'axon' appears there)."""
    from jax._src import xla_bridge

    try:
        pv = getattr(xla_bridge.get_backend(), "platform_version", "")
        return "axon" not in pv
    except Exception:
        return True


_use_woodbury = None


def use_woodbury():
    """gamma-split (Woodbury) patch/coarse solves: f32 factorisations
    whose conditioning is independent of gamma (docs/DESIGN.md).
    Currently OPT-IN (ALFI_TPU_WOODBURY=1): exact vs the direct path at
    moderate Reynolds but the f32 M-solves lose smoother quality as nu
    drops (Re>=500 on the cavity); the default TPU path is the native
    batched f64 QR factorisation instead."""
    global _use_woodbury
    if _use_woodbury is None:
        _use_woodbury = os.environ.get("ALFI_TPU_WOODBURY") == "1"
    return _use_woodbury


def set_use_woodbury(v):
    global _use_woodbury
    _use_woodbury = v


_ksp_chunk = None


def ksp_chunk():
    """Arnoldi iterations per XLA dispatch in the OUTER almg FGMRES.

    0: the whole solve (setup + every restart cycle) is one fused XLA
    program — minimum overhead, the right choice on healthy local
    hardware (and the CPU default).  N>0: the solve is driven from the
    host in fixed N-iteration chunks (solvers/krylov.py
    fgmres_stepper).  -1 / "auto" (the accelerator default): chunked
    with ADAPTIVE sizing — each dispatch's wall-clock is measured and
    the next chunk targets ~20 s.  This exists because the tunneled-TPU
    transport kills any dispatch running ~60 s (measured in
    /tmp/probe2: a 55.6 s dispatch survives, a 60.0 s one dies with
    "TPU worker process crashed"): the ldc3d Re=3000 continuation step
    deterministically died inside its one-program linear solve
    (results/logs/ldc3d_p2fb_nref1_re5000.log) while every shorter step
    succeeded.  Numerics are identical; the cost is one ~4-25 ms RPC
    per chunk, negligible against multi-second 3D solves."""
    global _ksp_chunk
    if _ksp_chunk is None:
        env = os.environ.get("ALFI_TPU_KSP_CHUNK", "auto")
        if env == "auto":
            # chunked+adaptive on accelerators (where the tunnel
            # deadline lives), monolithic on CPU (tests, local runs)
            _ksp_chunk = -1 if jax.default_backend() != "cpu" else 0
        else:
            _ksp_chunk = int(env)
    return _ksp_chunk


def set_ksp_chunk(n):
    global _ksp_chunk
    _ksp_chunk = int(n)
