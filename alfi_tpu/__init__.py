"""alfi_tpu — TPU-native Reynolds-robust Navier-Stokes solvers.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
florianwechsung/alfi (augmented-Lagrangian preconditioned Newton-FGMRES
with patch-smoother multigrid and Schoeberl transfers), with no
Firedrake/PETSc underneath: host-side numpy topology compilation + pure
jitted device solvers.
"""

from . import config  # noqa: F401  (enables x64 before anything else)

__version__ = "0.1.0"
