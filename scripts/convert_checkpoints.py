#!/usr/bin/env python3
"""Migrate solver checkpoints to the geometric entity numbering.

The round-4 geometric numbering (mesh/renumber.py) permutes velocity
dofs, so npz checkpoints written before it would load scrambled.  The
driver refuses them via the ``numbering`` tag; this script rewrites
them in place: it builds the SAME function space under both numberings
(the gate is a runtime env var, so one process can do both), matches
scalar dofs by their coordinates (each P2 dof position — vertex or
edge midpoint — is unique), permutes ``u``, and stamps the new tag.
P0 pressure dofs are per-cell and cell order is numbering-invariant.

    python scripts/convert_checkpoints.py <chkptdir> \
        --problem ldc2d --baseN 16 --nref 3 --k 2

Only u/p/(info scalars) are touched; already-tagged files are skipped.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

os.environ.setdefault("ALFI_TPU_FORCE_CPU", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def scalar_perm(build_space):
    """old scalar dof id -> new scalar dof id, by position matching."""
    os.environ["ALFI_TPU_GEOM_NUMBERING"] = "0"
    pos_old = np.asarray(build_space().dof_coords)
    os.environ["ALFI_TPU_GEOM_NUMBERING"] = "1"
    pos_new = np.asarray(build_space().dof_coords)
    del os.environ["ALFI_TPU_GEOM_NUMBERING"]

    def key(p):
        q = np.round(p, 9)
        return np.lexsort(tuple(q[:, i] for i in range(q.shape[1])))

    ko, kn = key(pos_old), key(pos_new)
    assert np.allclose(pos_old[ko], pos_new[kn], atol=1e-8), \
        "dof position sets differ — wrong problem configuration?"
    perm = np.empty(len(ko), dtype=np.int64)
    perm[ko] = kn  # old id -> new id
    return perm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("chkptdir")
    ap.add_argument("--problem", default="ldc2d", choices=["ldc2d"])
    ap.add_argument("--baseN", type=int, default=16)
    ap.add_argument("--nref", type=int, required=True)
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    def build_space():
        from alfi_tpu import ConstantPressureSolver
        from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

        s = ConstantPressureSolver(
            TwoDimLidDrivenCavityProblem(args.baseN), nref=args.nref,
            k=args.k, solver_type="almg", hierarchy="uniform",
            verbose=False)
        return s.form.V

    perm = scalar_perm(build_space)
    files = sorted(glob.glob(os.path.join(args.chkptdir, "*.npz")))
    for f in files:
        with np.load(f) as chk:
            if ("numbering" in chk.files
                    and str(chk["numbering"]) == "geom1"):
                print(f, "already geom1, skipped")
                continue
            data = {k: chk[k] for k in chk.files}
        u = data["u"]
        assert u.shape[0] == perm.size, (u.shape, perm.size)
        u2 = np.empty_like(u)
        u2[perm] = u
        data["u"] = u2
        data["numbering"] = "geom1"
        np.savez(f, **data)
        print(f, "converted")


if __name__ == "__main__":
    main()
