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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

#: dtype of outer solver arithmetic (residuals, Krylov vectors, dots).
real_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

#: dtype used inside the MG preconditioner / patch smoother hot loops.
pc_dtype = jnp.float32 if os.environ.get("ALFI_TPU_PC_F32", "0") == "1" else real_dtype

#: host-side index dtype.
index_dtype = np.int32


def set_pc_dtype(dtype):
    global pc_dtype
    pc_dtype = dtype
