"""Second-stage bisect of the ldc3d nref=2 setup-execution crash:
run each setup ingredient as its own dispatch on the fine level."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("ALFI_TPU_GEOM_NUMBERING_3D", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def mark(s, t0=[None]):
    now = time.time()
    if t0[0] is None:
        t0[0] = now
    print(f"[{now - t0[0]:8.1f}s] {s}", flush=True)


def main():
    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import ThreeDimLidDrivenCavityProblem

    mark("construct")
    solver = ConstantPressureSolver(
        ThreeDimLidDrivenCavityProblem(4), nref=2, k=2,
        solver_type="almg", hierarchy="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, gamma=1e4, verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 100.0
    params = solver.params()
    vmg = solver.vmg
    L = vmg.nlevels - 1
    form = vmg.levels[L].form
    u = solver.z[0]

    mark("static K/G (fine)")
    K, G = jax.jit(lambda: form._static_velocity_tensors())()
    jax.block_until_ready((K, G))
    mark("static K/G DONE")

    N = jax.jit(lambda w: form.advection_element_tensors(w))(u)
    jax.block_until_ready(N)
    mark("advection N DONE")

    if vmg.stab is not None and vmg.stab[L] is not None:
        S = jax.jit(
            lambda z, p: vmg.stab[L].velocity_tensors_hook(z, p)
        )((u, solver.z[1]), dict(params, wind=u))
        jax.block_until_ready(S)
        mark("SUPG hook DONE")
        M = K  # placeholder
    mark("patch factor (fine)")
    A = None
    ps = vmg.patchsets[L - 1]
    from alfi_tpu.mg.patches import assemble_patch_matrices

    T = jax.jit(lambda K, G, N: params["nu"] * K + 1e4 * G + N)(K, G, N)
    fac = jax.jit(
        lambda T: vmg.patch_solvers[L - 1][0](T))(T)
    jax.block_until_ready(fac)
    mark("patch factor DONE — all setup ingredients pass")


if __name__ == "__main__":
    main()
