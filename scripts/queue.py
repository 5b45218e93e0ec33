#!/usr/bin/env python3
"""THE measurement queue — one parameterized, resumable runner.

Replaces the accreted run_queue_r2*.sh / run_cpu_tables*.sh scripts
(VERDICT round-2 weak #5): the flaky TPU tunnel is a standing
condition, so waiting, retrying, snapshotting and partial-credit
accounting live HERE, and a round's queue is just a stage list.

    python scripts/queue.py <queue> [--list]      # e.g. r3tpu, r3cpu

Per stage:
  * runs from an immutable HEAD snapshot (scripts/launch_snapshot.sh)
    with a PERSISTENT checkpoint dir, so retries resume their Reynolds
    continuation instead of restarting multi-hour sweeps;
  * TPU stages first wait for the tunnel to answer;
  * exit 0 -> results/logs/.done_<name> (FULL completion);
  * otherwise converged solves are counted ONLY after the last
    "=== attempt" marker of the CURRENT attempt (ADVICE r2 items 1-2:
    cumulative grep double-counts resumed work) and recorded in
    .partial_<name> as "<solves>/<full>" — partial credit is visibly
    distinct from done;
  * stages are retried round-robin until done or --max-rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = "/root/repo"
LOGS = os.path.join(REPO, "results", "logs")
SNAP = os.path.join(REPO, "scripts", "launch_snapshot.sh")


def iters(problem, need, **kw):
    """An examples/iters.py stage command; ``need`` = #continuation
    steps in the full sweep (for partial-credit accounting)."""
    cmd = [sys.executable, "examples/iters.py", "--checkpoint",
           "--problem", problem]
    for k, v in kw.items():
        flag = "--" + k.replace("_", "-")
        if v is True:
            cmd.append(flag)
        else:
            cmd += [flag, str(v)]
    return cmd, need


# ---------------------------------------------------------------------
# Round-3 queues.  Judge-criticality order (VERDICT round-2 "Next
# round" items 2, 3, 4): the north star first, then the two untouched
# production families, then the scale rows.
# ---------------------------------------------------------------------

def _stage(name, log, cmd, need=0, timeout=14400, platform="tpu",
           env=None, stall=None):
    return dict(name=name, log=log, cmd=cmd, need=need, timeout=timeout,
                platform=platform, env=env or {}, stall=stall)


def r3tpu():
    st = []
    # north star: ldc3d [P2+FB]^3-P0 SUPG almg, Re -> 5000
    # (reference: examples/generate_submission:12-23 at 12288 ranks;
    # single-chip scale: baseN=4 nref=1, 37k dofs)
    cmd, need = iters(
        "ldc3d", 52, nref_start=1, nref_end=1, baseN=4, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, re_max=5000)
    st.append(_stage("ns1", "ldc3d_p2fb_nref1_re5000.log", cmd,
                     need=need, timeout=21600))
    # p1fb_bfs3d production family on the reference coarse mesh — the
    # first end-to-end [P1+FB]^3 continuation (BubbleTransfer in anger)
    cmd, need = iters(
        "bfs3d", 11, mesh="tests/fixtures/bfs3d_coarse55.msh",
        nref_start=1, nref_end=1, baseN=0, k=1, solver_type="almg",
        discretisation="pkp0", mh="uniform", stabilisation_type="supg",
        stabilisation_weight=0.05, patch="star", smoothing=10,
        restriction=True, re_max=500)
    st.append(_stage("f2", "bfs3d_p1fb_coarse55_re500.log", cmd,
                     need=need, timeout=14400))
    # sv_ldc3d production family (k=3 bary macrostar Burman)
    cmd, need = iters(
        "ldc3d", 7, nref_start=1, nref_end=1, baseN=2, k=3,
        solver_type="almg", discretisation="sv", mh="bary",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        patch="macro", smoothing=10, restriction=True, re_max=500)
    st.append(_stage("f1", "sv_ldc3d_k3_nref1_re500.log", cmd,
                     need=need, timeout=14400))
    # 2D nref=3 headline row to Re=10000 (resumes checkpoint_c3;
    # round-2's attempt diverge-cascaded at Re=2200 — fixed)
    cmd, need = iters(
        "ldc2d", 102, nref_start=3, nref_end=3, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=10000)
    st.append(_stage("c3", "iters_ldc2d_nref3_re10000.log", cmd,
                     need=need, timeout=21600))
    # 3D scale row: ldc3d [P2+FB]^3 nref=2 (~256k dofs), Re -> 500
    cmd, need = iters(
        "ldc3d", 7, nref_start=2, nref_end=2, baseN=4, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, re_max=500)
    st.append(_stage("f3", "ldc3d_p2fb_nref2_re500.log", cmd,
                     need=need, timeout=21600))
    # SV nref=3 stretch row
    cmd, need = iters(
        "ldc2d", 102, nref_start=3, nref_end=3, baseN=16, k=2,
        solver_type="almg", discretisation="sv", mh="bary",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        patch="macro", restriction=True, re_max=10000)
    st.append(_stage("sv3", "iters_ldc2d_sv_nref3_re10000.log", cmd,
                     need=need, timeout=21600))
    return st


def r3cpu():
    """Iteration-count tables are platform-independent; CPU chain runs
    niced so it never competes with the TPU process for the host."""
    st = []
    # dfg full reference-protocol sweep (VERDICT missing #6): the dfg
    # benchmark regime is Re<=200 (benchmark 2D-1 at Re=20); sweep the
    # iters ladder to 400 with the bfs extra points for depth
    cmd = [sys.executable, "examples/dfg.py", "--checkpoint",
           "--nref", "1", "--k", "2", "--solver-type", "almg",
           "--discretisation", "pkp0", "--mh", "uniform",
           "--stabilisation-type", "supg", "--patch", "star",
           "--restriction", "--re-max", "500"]
    st.append(_stage("dfg2", "dfg_pkp0_nref1_re500.log", cmd, need=8,
                     timeout=43200, platform="cpu"))
    return st


# ---------------------------------------------------------------------
# Round-4 queues (VERDICT r3 "Next round" items 1-4, 6): the north star
# first (its round-3 blocker — the jacfwd SUPG-Jacobian OOM — is fixed
# by the analytic element Jacobian), then the f32-cycle acceptance
# gate, then the untouched production families and the scale rows.
# ---------------------------------------------------------------------


def r4tpu():
    st = []
    # 1. north star: ldc3d [P2+FB]^3-P0 SUPG almg, Re -> 5000
    # (reference: examples/generate_submission:12-23)
    cmd, need = iters(
        "ldc3d", 52, nref_start=1, nref_end=1, baseN=4, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, re_max=5000)
    st.append(_stage("ns1", "ldc3d_p2fb_nref1_re5000.log", cmd,
                     need=need, timeout=21600))
    # 2. f32 MG-cycle acceptance gate: ldc2d nref=2 Re->10000 with the
    # gamma-split f32 cycle; pass = Krylov counts match the f64 table
    # (results/README.md nref=2 row) within ~10% (VERDICT item 2)
    cmd, need = iters(
        "ldc2d", 102, nref_start=2, nref_end=2, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=10000)
    st.append(_stage("f32g", "iters_ldc2d_nref2_re10000_f32.log", cmd,
                     need=need, timeout=21600,
                     env={"ALFI_TPU_MG_DTYPE": "f32"}))
    # 3. finish the refinement axis: nref=3 resume (23/101 done in
    # checkpoint_c3), then the first nref=4 rows
    cmd, need = iters(
        "ldc2d", 102, nref_start=3, nref_end=3, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=10000)
    st.append(_stage("c3", "iters_ldc2d_nref3_re10000.log", cmd,
                     need=need, timeout=21600))
    # 4. sv_ldc3d production family (k=3 bary macrostar Burman,
    # generate_submission:71-87)
    cmd, need = iters(
        "ldc3d", 7, nref_start=1, nref_end=1, baseN=2, k=3,
        solver_type="almg", discretisation="sv", mh="bary",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        patch="macro", smoothing=10, restriction=True, re_max=500)
    st.append(_stage("f1", "sv_ldc3d_k3_nref1_re500.log", cmd,
                     need=need, timeout=14400))
    # 5. p1fb_bfs3d production family — the first end-to-end
    # [P1+FB]^3 continuation (generate_submission:26-37)
    cmd, need = iters(
        "bfs3d", 11, mesh="tests/fixtures/bfs3d_coarse55.msh",
        nref_start=1, nref_end=1, baseN=0, k=1, solver_type="almg",
        discretisation="pkp0", mh="uniform", stabilisation_type="supg",
        stabilisation_weight=0.05, patch="star", smoothing=10,
        restriction=True, re_max=500)
    st.append(_stage("f2", "bfs3d_p1fb_coarse55_re500.log", cmd,
                     need=need, timeout=14400))
    # 6. 3D scale row: ldc3d [P2+FB]^3 nref=2 (~256k dofs)
    cmd, need = iters(
        "ldc3d", 7, nref_start=2, nref_end=2, baseN=4, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, re_max=500)
    st.append(_stage("f3", "ldc3d_p2fb_nref2_re500.log", cmd,
                     need=need, timeout=21600))
    # 7. nref=4 2D row (657k dofs; round-3 setup crash = the same
    # jacfwd blow-up the analytic Jacobian fixes)
    cmd, need = iters(
        "ldc2d", 9, nref_start=4, nref_end=4, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=1000)
    st.append(_stage("c4", "iters_ldc2d_nref4_re1000.log", cmd,
                     need=need, timeout=21600))
    return st


def r4cpu():
    """dfg reference-ladder table (VERDICT item 6): iteration counts
    are platform-independent; runs niced on the host CPU."""
    st = []
    cmd = [sys.executable, "examples/dfg.py", "--checkpoint",
           "--nref", "1", "--k", "2", "--solver-type", "almg",
           "--discretisation", "pkp0", "--mh", "uniform",
           "--stabilisation-type", "supg", "--patch", "star",
           "--restriction", "--re-max", "500"]
    st.append(_stage("dfg2", "dfg_pkp0_nref1_re500.log", cmd, need=8,
                     timeout=43200, platform="cpu"))
    return st


def r4sv():
    """SV top-of-sweep A/B (VERDICT r3 item 7): the measured nref=2
    Re=10^4 kpn is 28.5 under the reference's exact pins (smoothing 6,
    --restriction, Burman weight 5e-3, /root/reference/examples/
    Makefile:12-17); these stages vary one knob each to locate the gap
    vs the papers' ~<15.  Iteration counts are platform-independent —
    CPU, niced."""
    st = []
    for name, kw in [
            ("svs10", dict(smoothing=10)),
            ("svw12", dict(stabilisation_weight=1e-2)),
            ("svw13", dict(stabilisation_weight=1e-3)),
    ]:
        base = dict(nref_start=2, nref_end=2, baseN=16, k=2,
                    solver_type="almg", discretisation="sv", mh="bary",
                    stabilisation_type="burman",
                    stabilisation_weight=5e-3, patch="macro",
                    restriction=True, re_max=10000)
        base.update(kw)
        cmd, need = iters("ldc2d", 102, **base)
        st.append(_stage(name, "sv_ldc2d_nref2_%s.log" % name, cmd,
                         need=need, timeout=43200, platform="cpu"))
    return st


# ---------------------------------------------------------------------
# Round-5 queues (VERDICT r4 "Next round" items 1, 5-8): the big
# configurations ON THE TPU itself — every >170k-dof row so far was
# minted on the host — then the production-ladder extensions and the
# 3D graddiv comparison.  Attempt timeouts are capped BELOW the stage
# totals so the round-robin visits every stage ~2x per session even
# when early stages always fill their cap (checkpoints make attempts
# cumulative).
# ---------------------------------------------------------------------


def r5tpu():
    st = []
    # 0. defect-correction smoother acceptance gate (VERDICT item 2):
    # ldc2d nref=2 Re->10000 with the f32 inner smoother; pass =
    # Krylov counts match the committed f64 table
    # (results/logs/iters_ldc2d_nref2_re10000.log) step for step
    cmd, need = iters(
        "ldc2d", 102, nref_start=2, nref_end=2, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=10000)
    st.append(_stage("dcg", "iters_ldc2d_nref2_re10000_dc32.log", cmd,
                     need=need, timeout=3600,
                     env={"ALFI_TPU_MG_SMOOTH_DTYPE": "f32"}))
    # 2. finish the 2D nref=3 headline row (VERDICT item 7)
    cmd, need = iters(
        "ldc2d", 102, nref_start=3, nref_end=3, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=10000)
    st.append(_stage("c3t", "iters_ldc2d_nref3_re10000_tpu.log", cmd,
                     need=need, timeout=3600))
    # 3. 2D nref=4 (657k dofs) ON the chip (VERDICT item 1a)
    cmd, need = iters(
        "ldc2d", 31, nref_start=4, nref_end=4, baseN=16, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star",
        restriction=True, re_max=2900)
    st.append(_stage("c4t", "iters_ldc2d_nref4_re2900_tpu.log", cmd,
                     need=need, timeout=3600))
    # 4. sv_ldc3d k=3 ladder extension Re->5000 (VERDICT item 5;
    # reference generate_submission:71-87)
    cmd, need = iters(
        "ldc3d", 52, nref_start=1, nref_end=1, baseN=2, k=3,
        solver_type="almg", discretisation="sv", mh="bary",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        patch="macro", smoothing=10, restriction=True, re_max=5000)
    st.append(_stage("f1x", "sv_ldc3d_k3_nref1_re5000.log", cmd,
                     need=need, timeout=3600))
    # 5. bfs3d on the reference's own coarse13.msh ladder mesh
    # (VERDICT item 6; generate_submission:26-37)
    cmd, need = iters(
        "bfs3d", 11, mesh="/root/reference/examples/bfs3d/coarse13.msh",
        nref_start=1, nref_end=1, baseN=0, k=1, solver_type="almg",
        discretisation="pkp0", mh="uniform", stabilisation_type="supg",
        stabilisation_weight=0.05, patch="star", smoothing=10,
        restriction=True, re_max=500)
    st.append(_stage("f2r", "bfs3d_p1fb_coarse13_re500.log", cmd,
                     need=need, timeout=3600))
    # 6. 3D graddiv comparison (VERDICT item 8; reference
    # examples/graddiv/Makefile pkp03dcomparison/sv3dcomparison)
    cmd = ["bash", "scripts/graddiv3d.sh"]
    st.append(_stage("gd3", "graddiv3d_comparison.log", cmd,
                     need=0, timeout=5400,
                     env={"ALFI_TPU_GEOM_NUMBERING_3D": "1"}))
    # 7. bfs2d on the reference gmsh mesh — every bfs2d log in-tree is
    # a failed io_callback-era run (round 2); first real table
    # (VERDICT weak 4; reference examples/bfs2d/Makefile)
    cmd, need = iters(
        "bfs2d", 16, mesh="tests/fixtures/bfs2d_coarse12.msh",
        nref_start=1, nref_end=1, baseN=0, k=2, solver_type="almg",
        discretisation="pkp0", mh="uniform", stabilisation_type="supg",
        patch="star", restriction=True, re_max=1000)
    st.append(_stage("b2r", "iters_bfs2d_coarse12_nref1_re1000.log",
                     cmd, need=need, timeout=3600))
    # moved LAST: the composed 284k-dof program crashes the v5e
    # worker at execution (every ingredient passes standalone —
    # scripts/probe_f3t*.py); retries stay cheap via compile cache
    # 1. ldc3d [P2+FB]^3 nref=2 (284k dofs) Re->5000 ON THE TPU
    # (VERDICT item 1a; reference generate_submission:12-23)
    cmd, need = iters(
        "ldc3d", 52, nref_start=2, nref_end=2, baseN=4, k=2,
        solver_type="almg", discretisation="pkp0", mh="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, re_max=5000)
    st.append(_stage("f3t", "ldc3d_p2fb_nref2_re5000_tpu.log", cmd,
                     need=need, timeout=5400, stall=2700,
                     env={"ALFI_TPU_GEOM_NUMBERING_3D": "1"}))
    return st


def r5cpu():
    """One niced CPU lane (single-core host): the SV top-of-sweep
    re-mint (VERDICT item 5) — iteration counts are platform-
    independent; forks branch from its checkpoints once deep."""
    st = []
    cmd, need = iters(
        "ldc2d", 102, nref_start=2, nref_end=2, baseN=16, k=2,
        solver_type="almg", discretisation="sv", mh="bary",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        patch="macro", restriction=True, re_max=10000)
    st.append(_stage("svb5", "sv_ldc2d_nref2_svbase_r5.log", cmd,
                     need=need, timeout=43200, platform="cpu"))
    return st


QUEUES = {"r3tpu": r3tpu, "r3cpu": r3cpu, "r4tpu": r4tpu,
          "r4cpu": r4cpu, "r4sv": r4sv, "r5tpu": r5tpu,
          "r5cpu": r5cpu}


# ---------------------------------------------------------------------


def wait_tpu(poll=240):
    """Block until the TPU can execute a FRESH compile.

    jax.devices() succeeding is not enough: the tunnel's AOT compile
    service wedges independently of execution (round 5: cached
    programs ran while every novel compile hung forever), and a stage
    started in that state burns its whole attempt timeout.  The probe
    bakes a unique literal into the program so every poll forces an
    actual compile round-trip."""
    while True:
        probe = (
            "import jax, jax.numpy as jnp;"
            "x = jnp.full((129, 65), %r);"
            "assert jax.devices()[0].platform != 'cpu';"
            "(jnp.sin(x) @ x.T).sum().block_until_ready()"
            % time.time())
        try:
            ok = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=poll, capture_output=True).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        time.sleep(poll)


MARKER = "=== attempt"


def solves_in_current_attempt(log):
    try:
        lines = open(log, errors="replace").read().splitlines()
    except OSError:
        return 0
    last = 0
    for i, ln in enumerate(lines):
        if ln.startswith(MARKER):
            last = i
    return sum("Nonlinear solve converged" in ln for ln in lines[last:])


RESUME = os.path.join(REPO, "results", "resume")
_TABLE_ONLY_MAX = 4096  # a table-only npz is O(1 KB); full state is MBs


def _seed_checkpoints(name):
    """Re-populate a stage's (gitignored, session-volatile) checkpoint
    dir from the COMMITTED compact resume state, so a sweep survives
    the machine being re-imaged between sessions (round 4 lost the
    nref=3/bfs3d/svbase1 tails exactly this way)."""
    src = os.path.join(RESUME, name)
    if not os.path.isdir(src):
        return
    for dofs in os.listdir(src):
        sd = os.path.join(src, dofs)
        dd = os.path.join(REPO, "results", "checkpoint_" + name, dofs)
        os.makedirs(dd, exist_ok=True)
        for f in os.listdir(sd):
            if ".tmp" in f:  # leftover from a crashed distill
                continue
            t = os.path.join(dd, f)
            if not os.path.exists(t):
                shutil.copy2(os.path.join(sd, f), t)


def _distill_checkpoints(name):
    """Distill a stage's checkpoint dir into results/resume/<name>:
    the continuation FRONTIER (max-Re converged step) keeps its full
    u/p state; every earlier step shrinks to its info dict (the
    driver's table-only checkpoint form), so the committed resume
    state is one npz of state + O(100-byte) table rows per sweep."""
    import numpy as np

    src = os.path.join(REPO, "results", "checkpoint_" + name)
    if not os.path.isdir(src):
        return
    for dofs in os.listdir(src):
        sd = os.path.join(src, dofs)
        if not os.path.isdir(sd):
            continue
        rows = []
        for f in os.listdir(sd):
            if ".tmp" in f:  # stale intermediate from a crashed write
                try:
                    os.unlink(os.path.join(sd, f))
                except OSError:
                    pass
                continue
            if f.startswith("nssolution-Re-") and f.endswith(".npz"):
                try:
                    rows.append((float(f[14:-4]), f))
                except ValueError:
                    pass
        if not rows:
            continue
        rows.sort()
        # the frontier must be a USABLE warm-start: full u/p state and
        # converged — a legacy diverged/table-only npz at the top of
        # the dir would otherwise become a resume state the driver
        # refuses, stranding the sweep (ADVICE r4)
        def _is_full(path):
            try:
                with np.load(path) as chk:
                    return ("u" in chk.files
                            and (bool(chk["converged"])
                                 if "converged" in chk.files else True))
            except Exception:
                return False

        fi = len(rows) - 1
        while fi >= 0 and not _is_full(os.path.join(sd, rows[fi][1])):
            fi -= 1
        if fi < 0:
            frontier = None
            tail = rows
        else:
            frontier = rows[fi][1]
            tail = rows[:fi] + rows[fi + 1:]
        dd = os.path.join(RESUME, name, dofs)
        os.makedirs(dd, exist_ok=True)
        for f in os.listdir(dd):
            if ".tmp" in f:
                try:
                    os.unlink(os.path.join(dd, f))
                except OSError:
                    pass
        if frontier is not None:
            # atomic: an interrupt mid-copy must not commit a
            # truncated npz as the resume frontier (ADVICE r4)
            tmp = os.path.join(dd, frontier + ".tmp%d" % os.getpid())
            shutil.copy2(os.path.join(sd, frontier), tmp)
            os.replace(tmp, os.path.join(dd, frontier))
        for _, f in tail:
            out = os.path.join(dd, f)
            if (os.path.exists(out)
                    and os.path.getsize(out) <= _TABLE_ONLY_MAX):
                continue
            try:
                with np.load(os.path.join(sd, f)) as chk:
                    info = {k: chk[k] for k in chk.files
                            if k not in ("u", "p", "numbering")}
            except Exception:
                continue  # corrupt npz: nothing distillable
            tmp = out + ".tmp%d" % os.getpid()
            np.savez(tmp, **info)
            os.replace(tmp + ".npz", out)
        # shrink any SUPERSEDED frontier already in resume/ (its info
        # keys are self-contained, so rewrite from its own content);
        # anything at or past the current frontier Re is left alone —
        # a resume dir can legitimately be AHEAD of a fresh partial
        # checkpoint dir, and shrinking that state would lose it
        for f in os.listdir(dd):
            if not (f.startswith("nssolution-Re-")
                    and f.endswith(".npz") and ".tmp" not in f):
                continue
            try:
                f_re = float(f[14:-4])
            except ValueError:
                continue
            p = os.path.join(dd, f)
            if (frontier is not None and f_re < rows[fi][0]
                    and os.path.getsize(p) > _TABLE_ONLY_MAX):
                try:
                    with np.load(p) as chk:
                        info = {k: chk[k] for k in chk.files
                                if k not in ("u", "p", "numbering")}
                except Exception:
                    continue
                tmp = p + ".tmp%d" % os.getpid()
                np.savez(tmp, **info)
                os.replace(tmp + ".npz", p)


def run_stage(s):
    name = s["name"]
    done = os.path.join(LOGS, ".done_" + name)
    failed = os.path.join(LOGS, ".failed_" + name)
    cpu_flip = os.path.join(LOGS, ".cpu_" + name)
    if os.path.exists(done) or os.path.exists(failed):
        return os.path.exists(done)
    # cooperative pause: `touch results/logs/.pause_queue` makes the
    # queue yield the TPU between stages (dev measurements borrow the
    # chip); remove the file to resume
    while os.path.exists(os.path.join(LOGS, ".pause_queue")):
        time.sleep(30)
    platform = ("cpu" if os.path.exists(cpu_flip) else s["platform"])
    if platform == "tpu":
        wait_tpu()
    log = os.path.join(LOGS, s["log"])
    with open(log, "a") as f:
        f.write("%s %s %s [%s]\n" % (
            MARKER, name, time.strftime("%F %T", time.gmtime()),
            platform))
    _seed_checkpoints(name)
    env = dict(os.environ, **s["env"])
    cmd = [SNAP, name] + s["cmd"]
    if platform == "cpu":
        env["ALFI_TPU_FORCE_CPU"] = "1"
        # force-override: the session env pins JAX_PLATFORMS to the
        # TPU backend, and setdefault silently left CPU stages on TPU
        env["JAX_PLATFORMS"] = "cpu"
        cmd = ["nice", "-n", "19"] + cmd
    stall = (s.get("stall")
             or int(os.environ.get("ALFI_QUEUE_STALL_S", "900")))
    with open(log, "a") as f:
        # watchdog Popen loop instead of subprocess.run: a tunnel
        # dispatch can die SILENTLY (round 5: a step hung >13 min with
        # zero log output while the chip idled) — burning the whole
        # attempt timeout on a corpse.  If the stage log goes stale for
        # ``stall`` seconds after first output, kill and retry; the
        # per-Re checkpoints make retries cheap.  First-compile phases
        # legitimately print nothing for a long time, so staleness
        # counts from the LATER of process start and last log growth,
        # with a 3x allowance before any output has appeared.
        proc = subprocess.Popen(cmd, stdout=f,
                                stderr=subprocess.STDOUT, env=env,
                                cwd=REPO)
        t0 = time.time()
        start_size = size0 = os.path.getsize(log)
        last_growth = t0
        rc = None
        while True:
            try:
                rc = proc.wait(timeout=20)
                break
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            if os.path.getsize(log) != size0:
                size0 = os.path.getsize(log)
                last_growth = now
            grew = size0 > start_size
            limit = stall if grew else 3 * stall
            if now - t0 > s["timeout"] or now - last_growth > limit:
                proc.kill()
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    pass
                f.write("\n[queue] attempt killed: %s\n" % (
                    "timeout" if now - t0 > s["timeout"]
                    else "stalled %ds without log output" % limit))
                rc = -1
                break
    _distill_checkpoints(name)
    if rc == 0:
        open(done, "w").write("exit 0\n")
        partial = os.path.join(LOGS, ".partial_" + name)
        if os.path.exists(partial):
            os.unlink(partial)
        return True
    solves = solves_in_current_attempt(log)
    total = sum(solves_in_current_attempt_all(log))
    if s["need"] and total >= s["need"]:
        # every sweep step is checkpointed: cumulative credit across
        # attempts is sound ONLY because --checkpoint resumes skip
        # already-solved Re values (they print as 'checkpointed')
        open(os.path.join(LOGS, ".partial_" + name), "w").write(
            "%d/%d solves (this attempt: %d)\n"
            % (total, s["need"], solves))
    _triage(s, platform, total)
    return False


STREAK_LIMIT = 3


def _triage(s, platform, total):
    """No-progress triage (VERDICT r3 weak #5: the dfg stage burned 20
    identical retries against one compile failure).  A failure streak
    is an attempt that adds NO new converged Re row; at STREAK_LIMIT a
    TPU stage is flipped to the CPU backend (iteration counts are
    platform-independent), and a CPU stage is marked .failed_<name> and
    skipped from then on — loudly, so the round report shows it."""
    name = s["name"]
    streak_file = os.path.join(LOGS, ".streak_" + name)
    streak, last_total = 0, -1
    try:
        streak, last_total = map(int, open(streak_file).read().split())
    except (OSError, ValueError):
        pass
    streak = 0 if total > last_total else streak + 1
    open(streak_file, "w").write("%d %d\n" % (streak, total))
    if streak < STREAK_LIMIT:
        return
    cpu_flip = os.path.join(LOGS, ".cpu_" + name)
    if platform == "tpu":
        open(cpu_flip, "w").write(
            "flipped to cpu after %d no-progress attempts\n" % streak)
        open(streak_file, "w").write("0 %d\n" % total)
        print("[queue] stage %s: %d no-progress TPU attempts -> "
              "SWITCHING TO CPU BACKEND" % (name, streak), flush=True)
    else:
        open(os.path.join(LOGS, ".failed_" + name), "w").write(
            "abandoned after %d no-progress attempts on %s\n"
            % (streak, platform))
        print("[queue] stage %s: %d no-progress attempts on %s -> "
              "ABANDONED (.failed_%s)" % (name, streak, platform, name),
              flush=True)


def solves_in_current_attempt_all(log):
    """Converged-or-checkpointed count per attempt section."""
    try:
        lines = open(log, errors="replace").read().splitlines()
    except OSError:
        return [0]
    # count unique converged Re rows over the whole log: resumed
    # attempts re-print checkpointed rows, so dedup by Re value
    res = set()
    for ln in lines:
        if "'converged': True" in ln and "'Re':" in ln:
            try:
                res.add(ln.split("'Re':")[1].split(",")[0].strip())
            except IndexError:
                pass
    return [len(res)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queue", choices=sorted(QUEUES))
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=20)
    args = ap.parse_args()
    stages = QUEUES[args.queue]()
    if args.list:
        for s in stages:
            print(json.dumps({k: s[k] for k in
                              ("name", "log", "need", "timeout",
                               "platform")}))
        return
    os.makedirs(LOGS, exist_ok=True)
    for rnd in range(1, args.max_rounds + 1):
        pending = [s for s in stages
                   if not os.path.exists(
                       os.path.join(LOGS, ".done_" + s["name"]))
                   and not os.path.exists(
                       os.path.join(LOGS, ".failed_" + s["name"]))]
        print("[queue %s] round %d: %d pending" %
              (args.queue, rnd, len(pending)), flush=True)
        if not pending:
            break
        for s in pending:
            ok = run_stage(s)
            print("[queue %s] stage %s -> %s" %
                  (args.queue, s["name"], "done" if ok else "retry"),
                  flush=True)
        time.sleep(60)


if __name__ == "__main__":
    main()
