"""Per-cell affine geometry factors (device constants)."""

from __future__ import annotations

from math import factorial

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype


class CellGeometry:
    """jinv: (nc, d, d) inverse Jacobian; detj: (nc,) |det J|; physical
    gradient of a reference gradient g is jinv^T @ g."""

    def __init__(self, mesh):
        v = mesh.cell_coords()  # (nc, d+1, d)
        J = np.transpose(v[:, 1:, :] - v[:, :1, :], (0, 2, 1))  # (nc,d,d)
        detj = np.abs(np.linalg.det(J))
        jinv = np.linalg.inv(J)
        self.dim = mesh.dim
        self.v0 = jnp.asarray(v[:, 0, :], dtype=real_dtype)
        self.J = jnp.asarray(J, dtype=real_dtype)
        self.jinv = jnp.asarray(jinv, dtype=real_dtype)
        self.detj = jnp.asarray(detj, dtype=real_dtype)
        self.vol = jnp.asarray(detj / factorial(mesh.dim), dtype=real_dtype)
        # cell diameter, matching Firedrake's CellSize (problem.mesh_size)
        diff = v[:, :, None, :] - v[:, None, :, :]
        self.h = jnp.asarray(
            np.sqrt((diff**2).sum(-1)).max(axis=(1, 2)), dtype=real_dtype
        )

    def quad_points_physical(self, ref_pts):
        """(nc, nq, d) physical coordinates of reference points."""
        ref = jnp.asarray(ref_pts, dtype=real_dtype)
        return self.v0[:, None, :] + jnp.einsum(
            "cde,qe->cqd", self.J, ref
        )
