from .fieldsplit import SchurPC, pressure_nullspace_projector
from .krylov import cg, chebyshev, fgmres, fixed_fgmres, richardson
from .newton import newton, newton_jit
