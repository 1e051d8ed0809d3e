"""Fused Pallas TPU kernel for the batched BDF2 chord-Newton step.

Why this exists: the JAX op-soup step (forward_kinematics + jacobians +
assemble + GJ solve, integrators.make_bdf2_step) is utilization-bound on TPU —
every tensor has tiny trailing dims (4x4 SE(3) blocks, 6-twists, nr<=32 DOF
columns) that occupy a sliver of the (8,128) VPU tile, so a 12-link chain
step costs ~3.8 ms at B=1024 even though its FLOPs are microscopic
(benchmarks/profile_residual2.py).

This kernel flips the layout: the BATCH is the tile. Every per-lane scalar
(a joint angle, one entry of a rotation matrix, one Jacobian column entry)
is an [8,128] f32 block = 1024 rollout lanes, and the whole fixed-iteration
chord solve — structured-Hessian assembly, unrolled Gauss-Jordan inverse,
`fixed_iters` residual/solve iterations, divergence rejection — runs as one
pallas_call with topology unrolled at trace time (static python loops over
joints; the per-scene kernel is compiled once and cached).

Scope (the production MPC regime): the constant-S joint types — FIXED /
REVOLUTE / PRISMATIC / PLANAR / TRANSLATIONAL — with the built-in
joint-space forces (tau, stiffness, damping, penalty limits,
Joint.m:437-487), maximal Coriolis + gravity + body viscous damping
(Body.computeMassGrav, Body.m:83-135), no closure forces. `supports()`
reports whether a scene qualifies; integrators.make_bdf2_step_batched falls
back to the vmapped JAX path otherwise. Everything here is forward-only:
the adjoint path differentiates the pure-JAX residual (adjoint.py), so the
kernel needs no VJP — it returns the chord factor H^{-1} for the backward
transposed solve (the same factor-reuse as NewtonConfig.adjoint_reuse_factor).

Numerics match integrators.newton(fixed_iters>0, chord=True, guarded=False)
with hessian="structured" and linsolve="gj" exactly up to f32 reassociation:
same residual (residual_bdf2), same structured Newton matrix
(model.structured_hessian — the local-force K/D blocks appear here in closed
form, verified against the jacfwd blocks in tests/test_pallas_step.py), same
divergence rejection (growth_reject/tol_reject/NaN poisoning).
"""

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from redmax_tpu.types import JointType, Topology

LANES = (8, 128)           # one lane-block = 1024 batch lanes
TILE = LANES[0] * LANES[1]

# Constant-S joint types: S is q-independent in the joint frame, so the
# kernel's Sbdot = 0 shortcut and closed-form Q(q) hold. (UNIVERSAL /
# SPHERICAL etc. have q-dependent S -> vmapped fallback.)
_SUPPORTED = {JointType.FIXED, JointType.REVOLUTE, JointType.PRISMATIC,
              JointType.PLANAR, JointType.TRANSLATIONAL}


def supports(topo: Topology, force_fns: Tuple) -> bool:
    """True when the fused kernel covers this scene's step exactly."""
    if force_fns:
        return False
    return all(JointType(t) in _SUPPORTED for t in topo.jtype)


# ---------------------------------------------------------------------------
# small dense helpers over python-list matrices whose entries are lane blocks
# (or 0-d scalars; broadcasting unifies them)
# ---------------------------------------------------------------------------


def _mat3_mul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _mat3_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(3)) for i in range(3)]


def _mat3_T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _E_mul(E1, E2):
    """Compose (R, p) pairs: E1 @ E2."""
    R1, p1 = E1
    R2, p2 = E2
    R = _mat3_mul(R1, R2)
    p = [p1[i] + sum(R1[i][k] * p2[k] for k in range(3)) for i in range(3)]
    return (R, p)


def _E_inv(E):
    R, p = E
    Rt = _mat3_T(R)
    return (Rt, [-sum(Rt[i][k] * p[k] for k in range(3)) for i in range(3)])


def _Ad(E):
    """6x6 spatial adjoint of (R, p): [[R, 0], [hat(p) R, R]] (se3.Ad)."""
    R, p = E
    pxR = [[p[1] * R[2][j] - p[2] * R[1][j] for j in range(3)],
           [p[2] * R[0][j] - p[0] * R[2][j] for j in range(3)],
           [p[0] * R[1][j] - p[1] * R[0][j] for j in range(3)]]
    Z = 0.0
    return [[R[0][0], R[0][1], R[0][2], Z, Z, Z],
            [R[1][0], R[1][1], R[1][2], Z, Z, Z],
            [R[2][0], R[2][1], R[2][2], Z, Z, Z],
            [pxR[0][0], pxR[0][1], pxR[0][2], R[0][0], R[0][1], R[0][2]],
            [pxR[1][0], pxR[1][1], pxR[1][2], R[1][0], R[1][1], R[1][2]],
            [pxR[2][0], pxR[2][1], pxR[2][2], R[2][0], R[2][1], R[2][2]]]


def _mat6_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(6)) for i in range(6)]


def _ad_vec(phi, y):
    """ad(phi) @ y for 6-twists phi=(w,v), y=(yw,yv): (w x yw, v x yw + w x yv)."""
    w, v = phi[:3], phi[3:]
    top = _cross(w, y[:3])
    bot = [a + b for a, b in zip(_cross(v, y[:3]), _cross(w, y[3:]))]
    return top + bot


def _adT_vec(phi, y):
    """ad(phi)^T @ y = (yw x w + yv x v, yv x w)."""
    w, v = phi[:3], phi[3:]
    top = [a + b for a, b in zip(_cross(y[:3], w), _cross(y[3:], v))]
    bot = _cross(y[3:], w)
    return top + bot


def local_force_blocks_closed(Ii, R, phi, bd, g):
    """Closed-form per-body K/D blocks of Coriolis + gravity + body damping.

    Matches jax.jacfwd of model.local_force_blocks.f_one (verified in
    tests/test_pallas_step.py). With phi = (w, v), I = diag(Irot, m I3):

      f(xi, dphi) = ad(phi+dphi)^T (I (phi+dphi)) + [0; m R(xi)^T g] - bd (phi+dphi)
      K = df/dxi|0:  only gravity: d(R exp(xi_w))^T g / dxi_w = hat(R^T g)
                     -> K[3:6, 0:3] = m hat(R^T g)
      D = df/dphi|0: fcor_rot = (Irot w) x w   -> d/dw = hat(Irot w) - hat(w) Irot
                     fcor_lin = m (v x w)      -> d/dw = m hat(v), d/dv = -m hat(w)
                     minus bd I6.

    Entries are lane blocks; returns (K, D) as 6x6 lists.
    """
    w = phi[:3]
    m = Ii[3]
    Rtg = _mat3_vec(_mat3_T(R), g)

    def hat(a):
        Z = 0.0
        return [[Z, -a[2], a[1]], [a[2], Z, -a[0]], [-a[1], a[0], Z]]

    hIw = hat([Ii[0] * w[0], Ii[1] * w[1], Ii[2] * w[2]])
    hw = hat(w)
    hv = hat(phi[3:])
    Z = 0.0
    K = [[Z] * 6 for _ in range(6)]
    hRtg = hat(Rtg)
    for i in range(3):
        for j in range(3):
            K[3 + i][j] = m * hRtg[i][j]
    D = [[Z] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            D[i][j] = hIw[i][j] - hw[i][j] * Ii[j]
            D[3 + i][j] = m * hv[i][j]
            D[3 + i][3 + j] = -m * hw[i][j]
    for i in range(6):
        D[i][i] = D[i][i] - bd
    return K, D


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------


def _build_kernel(topo: Topology, cfg, kind: str, lanes: Tuple[int, ...] = LANES,
                  xp=jnp):
    """Trace-time construction of the fused chord-solve kernel.

    Static data baked in: parent array, joint types, dof offsets, ancestor
    mask. Returns kernel(refs...) closing over them. `lanes` is the shape of
    one per-scalar lane block — (8, 128) under pallas; chord_bdf2_dense
    evaluates the SAME kernel function on (B,) blocks for the CPU parity
    gate (tests/test_pallas_step.py). `xp` is the array namespace: jnp under
    pallas; PLAIN NUMPY for the parity oracle — the kernel body only uses
    ops numpy spells identically, so the oracle executes the identical
    computation eagerly in milliseconds with no XLA compile at all (the
    unrolled ~20k-op graph takes minutes through the XLA CPU pipeline).
    """
    N = topo.njoints
    nr = topo.nr
    parent = [int(p) for p in topo.parent]
    jtypes = [JointType(t) for t in topo.jtype]
    ndof = [int(d) for d in topo.ndof]
    doffs = np.concatenate([[0], np.cumsum(ndof)]).astype(int)  # dof offsets
    anc = np.asarray(topo.ancestor_mask()).astype(bool)         # [N, N] joints
    dofj = [int(j) for j in topo.dof_joint()]                   # [nr]
    assert kind == "bdf2"
    fixed_iters = cfg.fixed_iters
    growth_reject = float(cfg.growth_reject)
    tol_reject = float(cfg.tol_reject)
    dx_clamp = float(cfg.dx_clamp)

    def kernel(x0_ref, q0_ref, qd0_ref, q1_ref, qd1_ref, tau_ref,
               E0pj_ref, E0ji_ref, Ii_ref, axes_ref, jsf_ref, bd_ref, gh_ref,
               x_out_ref, hinv_out_ref):
        f32 = x0_ref.dtype
        h = gh_ref[0, 3]
        gvec = [gh_ref[0, 0], gh_ref[0, 1], gh_ref[0, 2]]

        def lane(ref, r):
            return ref[r]  # [8,128]

        x0 = [lane(x0_ref, r) for r in range(nr)]
        q0 = [lane(q0_ref, r) for r in range(nr)]
        qd0 = [lane(qd0_ref, r) for r in range(nr)]
        q1 = [lane(q1_ref, r) for r in range(nr)]
        qd1 = [lane(qd1_ref, r) for r in range(nr)]
        tau = [lane(tau_ref, r) for r in range(nr)]

        # static per-joint frames (scalar entries, read once)
        E0pj = []
        E0ji = []
        axes = []
        for j in range(N):
            Epj = E0pj_ref[j]
            Eji = E0ji_ref[j]
            E0pj.append(([[Epj[a, b] for b in range(3)] for a in range(3)],
                         [Epj[a, 3] for a in range(3)]))
            E0ji.append(([[Eji[a, b] for b in range(3)] for a in range(3)],
                         [Eji[a, 3] for a in range(3)]))
            axes.append([[axes_ref[j, a, b] for b in range(3)]
                         for a in range(3)])
        Ii = [[Ii_ref[j, k] for k in range(6)] for j in range(N)]
        bd = [bd_ref[0, j] for j in range(N)]
        stiff = [jsf_ref[0, r] for r in range(nr)]
        damp = [jsf_ref[1, r] for r in range(nr)]
        qrest = [jsf_ref[2, r] for r in range(nr)]
        qlimL = [jsf_ref[3, r] for r in range(nr)]
        qlimU = [jsf_ref[4, r] for r in range(nr)]
        qlimK = [jsf_ref[5, r] for r in range(nr)]
        qlimD = [jsf_ref[6, r] for r in range(nr)]

        # body-frame motion subspace columns Sb = Ad(inv(E0_ji)) S (static)
        Sb = [None] * nr
        for j in range(N):
            A0 = _Ad(_E_inv(E0ji[j]))
            for d in range(ndof[j]):
                r = doffs[j] + d
                col = [axes[j][a][d] for a in range(3)]
                if jtypes[j] == JointType.REVOLUTE:
                    Sj = col + [0.0, 0.0, 0.0]
                elif jtypes[j] in (JointType.PRISMATIC, JointType.PLANAR,
                                   JointType.TRANSLATIONAL):
                    Sj = [0.0, 0.0, 0.0] + col
                else:
                    raise AssertionError
                Sb[r] = _mat6_vec(A0, Sj)

        def fk_and_J(x, qd):
            """FK + world-column Jacobians at (x, qd). Returns
            (J, Jd, phi, R_wi) where J[i][r] is a 6-list of lane blocks
            (None when joint dofj[r] is not an ancestor-or-self of i)."""
            E_wj = [None] * N
            E_wi = [None] * N
            for j in range(N):
                jt = jtypes[j]
                if jt == JointType.REVOLUTE:
                    th = x[doffs[j]]
                    c, s = xp.cos(th), xp.sin(th)
                    a = [axes[j][k][0] for k in range(3)]
                    omc = 1.0 - c
                    R = [[c + omc * a[0] * a[0],
                          omc * a[0] * a[1] - s * a[2],
                          omc * a[0] * a[2] + s * a[1]],
                         [omc * a[1] * a[0] + s * a[2],
                          c + omc * a[1] * a[1],
                          omc * a[1] * a[2] - s * a[0]],
                         [omc * a[2] * a[0] - s * a[1],
                          omc * a[2] * a[1] + s * a[0],
                          c + omc * a[2] * a[2]]]
                    Q = (R, [0.0, 0.0, 0.0])
                elif jt in (JointType.PRISMATIC, JointType.PLANAR,
                            JointType.TRANSLATIONAL):
                    I3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
                    o = doffs[j]
                    p = [sum(axes[j][k][d] * x[o + d] for d in range(ndof[j]))
                         for k in range(3)]
                    Q = (I3, p)
                else:  # FIXED
                    I3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
                    Q = (I3, [0.0, 0.0, 0.0])
                E_pj = _E_mul(E0pj[j], Q)
                E_wj[j] = E_pj if parent[j] < 0 else _E_mul(E_wj[parent[j]], E_pj)
                E_wi[j] = _E_mul(E_wj[j], E0ji[j])

            # W[r] = Ad(E_wi[dofj[r]]) Sb[r]
            Ad_wb = [_Ad(E_wi[i]) for i in range(N)]
            Ad_bw = [_Ad(_E_inv(E_wi[i])) for i in range(N)]
            W = [_mat6_vec(Ad_wb[dofj[r]], Sb[r]) for r in range(nr)]

            J = [[None] * nr for _ in range(N)]
            for i in range(N):
                for r in range(nr):
                    if anc[i, dofj[r]]:
                        J[i][r] = _mat6_vec(Ad_bw[i], W[r])

            phi = []
            for i in range(N):
                acc = [0.0] * 6
                for r in range(nr):
                    if J[i][r] is not None:
                        for k in range(6):
                            acc[k] = acc[k] + J[i][r][k] * qd[r]
                phi.append(acc)

            # Wdot[r] = Ad_wb[a] (ad(phi_a) Sb[r])   (Sbdot = 0 for rev/prism)
            Wd = [_mat6_vec(Ad_wb[dofj[r]], _ad_vec(phi[dofj[r]], Sb[r]))
                  for r in range(nr)]
            Jd = [[None] * nr for _ in range(N)]
            for i in range(N):
                for r in range(nr):
                    if J[i][r] is not None:
                        t1 = _mat6_vec(Ad_bw[i], Wd[r])
                        t2 = _ad_vec(phi[i], J[i][r])
                        Jd[i][r] = [t1[k] - t2[k] for k in range(6)]
            R_wi = [E_wi[i][0] for i in range(N)]
            return J, Jd, phi, R_wi

        def joint_forces(x, qd):
            fr, hit = [], []
            for r in range(nr):
                f = tau[r] + stiff[r] * (qrest[r] - x[r]) - damp[r] * qd[r]
                hl = (x[r] < qlimL[r]).astype(f32)
                hu = (x[r] > qlimU[r]).astype(f32)
                f = f + hl * (qlimK[r] * (qlimL[r] - x[r]) - qlimD[r] * qd[r])
                f = f + hu * (qlimK[r] * (qlimU[r] - x[r]) - qlimD[r] * qd[r])
                fr.append(f)
                hit.append(hl + hu)
            return fr, hit

        def maximal_forces(phi, R_wi):
            fm = []
            for i in range(N):
                Iphi = [Ii[i][k] * phi[i][k] for k in range(6)]
                f = _adT_vec(phi[i], Iphi)
                Rtg = _mat3_vec(_mat3_T(R_wi[i]), gvec)
                m = Ii[i][3]
                f = [f[0], f[1], f[2],
                     f[3] + m * Rtg[0], f[4] + m * Rtg[1], f[5] + m * Rtg[2]]
                fm.append([f[k] - bd[i] * phi[i][k] for k in range(6)])
            return fm

        # BDF2 inner-step constants (residual_bdf2 / _hess_bdf2)
        ch2 = (4.0 / 9.0) * h * h
        cK = -(4.0 / 9.0) * h * h
        cD = -(2.0 / 3.0) * h

        def qdot_of(x):
            return [(1.5 / h) * (x[r] - (4.0 / 3.0) * q1[r] + (1.0 / 3.0) * q0[r])
                    for r in range(nr)]

        def dqtmp_of(x):
            return [x[r] - (4.0 / 3.0) * q1[r] + (1.0 / 3.0) * q0[r]
                    - (8.0 / 9.0) * h * qd1[r] + (2.0 / 9.0) * h * qd0[r]
                    for r in range(nr)]

        def residual(x, pre=None):
            """g(x) = J^T Mm J dqtmp - ch2 * (fr + J^T (fm - Mm Jdot qd))."""
            qd = qdot_of(x)
            J, Jd, phi, R_wi = pre if pre is not None else fk_and_J(x, qd)
            fr, _ = joint_forces(x, qd)
            fm = maximal_forces(phi, R_wi)
            dqt = dqtmp_of(x)
            g = []
            # per-body u = Mm (J dqtmp), z = fm - Mm (Jdot qd)
            u, z = [], []
            for i in range(N):
                Jd_qd = [0.0] * 6
                Jdq = [0.0] * 6
                for r in range(nr):
                    if J[i][r] is not None:
                        for k in range(6):
                            Jdq[k] = Jdq[k] + J[i][r][k] * dqt[r]
                            Jd_qd[k] = Jd_qd[k] + Jd[i][r][k] * qd[r]
                u.append([Ii[i][k] * Jdq[k] for k in range(6)])
                z.append([fm[i][k] - Ii[i][k] * Jd_qd[k] for k in range(6)])
            for r in range(nr):
                acc = 0.0
                for i in range(N):
                    if J[i][r] is not None:
                        for k in range(6):
                            acc = acc + J[i][r][k] * (u[i][k] - ch2 * z[i][k])
                g.append(acc - ch2 * fr[r])
            return g

        def hessian(x):
            """Structured H = M + cK Kt + cD Dt at x (model.structured_hessian),
            plus the (J, Jd, phi, R) pre-pack for residual reuse at x."""
            qd = qdot_of(x)
            pre = fk_and_J(x, qd)
            J, Jd, phi, R_wi = pre
            _, hit = joint_forces(x, qd)
            H = [[0.0] * nr for _ in range(nr)]
            # M + cD * (-2 (Mm J)^T Jdot) accumulated per body
            for i in range(N):
                cols = [r for r in range(nr) if J[i][r] is not None]
                K_i, D_i = local_force_blocks_closed(
                    Ii[i], R_wi[i], phi[i], bd[i], gvec
                )
                KJ = {s: _mat6_vec(K_i, J[i][s]) for s in cols}
                DJ = {s: _mat6_vec(D_i, J[i][s]) for s in cols}
                for r in cols:
                    for s in cols:
                        m_rs = sum(J[i][r][k] * Ii[i][k] * J[i][s][k]
                                   for k in range(6))
                        kd = sum(J[i][r][k] * (cK * KJ[s][k] + cD * DJ[s][k])
                                 for k in range(6))
                        qvv = sum(Ii[i][k] * J[i][r][k] * Jd[i][s][k]
                                  for k in range(6))
                        H[r][s] = H[r][s] + m_rs + kd + cD * (-2.0) * qvv
            for r in range(nr):
                Krd = -stiff[r] - hit[r] * qlimK[r]
                Drd = -damp[r] - hit[r] * qlimD[r]
                H[r][r] = H[r][r] + cK * Krd + cD * Drd
            return H, pre

        def gj_inverse(H):
            """Unrolled branch-free Gauss-Jordan over lanes (linalg.gj_inverse,
            pivot=False)."""
            M = [list(H[i]) + [1.0 if i == j else 0.0 for j in range(nr)]
                 for i in range(nr)]
            for k in range(nr):
                inv_p = 1.0 / M[k][k]
                rowk = [M[k][j] * inv_p for j in range(2 * nr)]
                for i in range(nr):
                    if i == k:
                        continue
                    fac = M[i][k]
                    M[i] = [M[i][j] - fac * rowk[j] for j in range(2 * nr)]
                M[k] = rowk
            return [[M[i][nr + j] for j in range(nr)] for i in range(nr)]

        # ----- chord solve (integrators.newton fixed-iters, guarded=False) ---
        H, pre0 = hessian(x0)
        Hinv = gj_inverse(H)

        x = list(x0)
        g0n = None
        gln = None
        for it in range(fixed_iters):
            g = residual(x, pre=pre0 if it == 0 else None)
            gn2 = sum(gi * gi for gi in g)
            gn = xp.sqrt(gn2)
            if g0n is None:
                g0n = gn
            gln = gn
            dx = [sum(Hinv[r][s] * g[s] for s in range(nr)) for r in range(nr)]
            if dx_clamp:
                dxn = xp.sqrt(sum(d * d for d in dx))
                scale = xp.minimum(1.0, dx_clamp / xp.maximum(dxn, 1e-30))
                dx = [d * scale for d in dx]
            x = [x[r] - dx[r] for r in range(nr)]

        finite = xp.isfinite(gln)
        for r in range(nr):
            finite = finite & xp.isfinite(x[r])
        diverged = ~finite
        if growth_reject:
            diverged = diverged | (gln > growth_reject * g0n)
        if tol_reject:
            diverged = diverged | (gln > tol_reject)
        nan = xp.full(lanes, xp.nan, dtype=f32)
        for r in range(nr):
            x_out_ref[r] = xp.where(diverged, nan, xp.broadcast_to(x[r], lanes).astype(f32))
        for r in range(nr):
            for s in range(nr):
                hinv_out_ref[r * nr + s] = xp.broadcast_to(
                    Hinv[r][s], lanes
                ).astype(f32)

    return kernel


def _prep_static(topo: Topology, params: Dict, dtype, xp=jnp):
    """Shared param packing for the kernel: (axes [N,3], jsf [7,nr], bd [1,N],
    gh [1,4]) in the layout both the pallas wrapper and the dense evaluator
    feed the kernel."""
    N, nr = topo.njoints, topo.nr
    # Per-joint dof-axis matrix [N, 3, 3]: column d = the d-th DOF's axis
    # (rotation axis for REVOLUTE; translation directions for PRISMATIC /
    # PLANAR / TRANSLATIONAL — identity columns for the latter).
    axes = xp.zeros((N, 3, 3), dtype)

    def put(members, block):
        nonlocal axes
        if xp is np:
            axes[np.array(members)] = np.asarray(block, dtype)
        else:
            axes = axes.at[np.array(members)].set(block.astype(dtype))

    eye3 = np.eye(3)
    for jt, members in topo.type_groups().items():
        jp = params.get("joint", {}).get(str(jt), {})
        jt_e = JointType(jt)
        if "axis" in jp:
            a = jp["axis"]                       # [G, 3]
            if xp is np:
                blk = np.zeros((len(members), 3, 3))
                blk[:, :, 0] = np.asarray(a)
            else:
                blk = jnp.zeros((len(members), 3, 3), dtype).at[:, :, 0].set(a)
            put(members, blk)
        elif "plane" in jp:
            b = jp["plane"]                      # [G, 3, 2]
            if xp is np:
                blk = np.zeros((len(members), 3, 3))
                blk[:, :, :2] = np.asarray(b)
            else:
                blk = jnp.zeros((len(members), 3, 3), dtype).at[:, :, :2].set(b)
            put(members, blk)
        elif jt_e == JointType.TRANSLATIONAL:
            put(members, (np.broadcast_to(eye3, (len(members), 3, 3)) if xp is np
                          else jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                                (len(members), 3, 3))))
    jsf = xp.stack([
        params["stiffness"], params["damping"], params["qrest"],
        params["qlimL"], params["qlimU"], params["qlimK"],
        params["qlimD"],
    ]).astype(dtype)
    bd = params.get("body_damping")
    bd = (xp.zeros((1, N), dtype) if bd is None
          else bd.reshape(1, N).astype(dtype))
    gh = xp.concatenate(
        [params["g"].reshape(3), params["h"].reshape(1)]
    ).reshape(1, 4).astype(dtype)
    return axes, jsf, bd, gh


class _Ref:
    """Read-only ref shim: lets chord_bdf2_dense drive the kernel function
    with plain (jnp or numpy) arrays instead of pallas Refs."""

    def __init__(self, a, xp):
        self.a = xp.asarray(a)
        self.dtype = self.a.dtype

    def __getitem__(self, i):
        return self.a[i]


class _OutRef:
    def __init__(self, shape, dtype, xp):
        self.a = xp.zeros(shape, dtype)
        self._np = xp is np

    def __getitem__(self, i):
        return self.a[i]

    def __setitem__(self, i, v):
        if self._np:
            self.a[i] = v
        else:
            self.a = self.a.at[i].set(v)


def chord_bdf2_dense(topo: Topology, cfg, params: Dict, x0, q0, qd0, q1, qd1,
                     xp=np):
    """Evaluate the EXACT kernel computation (same trace-time code path as
    the pallas kernel — _build_kernel) on plain [B]-shaped lane vectors, with
    no pallas plumbing. This is the oracle the parity tests diff the
    hardware kernel against; it also pins the kernel's numerics to
    reviewable array semantics.

    xp=numpy (default) executes the whole unrolled computation eagerly in
    numpy — milliseconds, no XLA. (Routing the same unrolled ~20k-op graph
    through XLA CPU takes minutes to compile at default opt, and level-0
    executables dispatch pathologically; see tests/test_pallas_step.py.)
    xp=jnp is jit-able and is what make_chord_bdf2(impl="dense") wires.
    """
    N, nr = topo.njoints, topo.nr
    dtype = xp.float32 if xp is not np else np.float32
    B = x0.shape[0]
    kernel = _build_kernel(topo, cfg, "bdf2", lanes=(B,), xp=xp)
    if xp is np:
        params = jax.tree_util.tree_map(np.asarray, dict(params))
        x0, q0, qd0, q1, qd1 = (np.asarray(a) for a in (x0, q0, qd0, q1, qd1))
    tau = params["tau"]
    if tau.ndim == 1:
        tau = xp.broadcast_to(tau, (B, nr))
    axes, jsf, bd, gh = _prep_static(topo, params, dtype, xp=xp)
    lane = lambda a: _Ref(xp.ascontiguousarray(a.astype(dtype).T)
                          if xp is np else a.astype(dtype).T, xp)
    out_x = _OutRef((nr, B), dtype, xp)
    out_h = _OutRef((nr * nr, B), dtype, xp)
    kernel(
        lane(x0), lane(q0), lane(qd0), lane(q1), lane(qd1), lane(tau),
        _Ref(params["E0_pj"].astype(dtype), xp),
        _Ref(params["E0_ji"].astype(dtype), xp),
        _Ref(params["I_i"].astype(dtype), xp), _Ref(axes, xp), _Ref(jsf, xp),
        _Ref(bd, xp), _Ref(gh, xp), out_x, out_h,
    )
    x = out_x.a.T
    Hinv = out_h.a.reshape(nr, nr, B).transpose(2, 0, 1)
    return x, Hinv


def make_chord_bdf2(topo: Topology, cfg, interpret: bool = None,
                    impl: str = "pallas"):
    """Batched fused BDF2 chord solve.

    Returns solve(params, x0, q0, qd0, q1, qd1) -> (x [B,nr], Hinv [B,nr,nr])
    with all state args [B,nr]; params["tau"] may be [B,nr] or [nr].
    B must be a multiple of 1024 (the wrapper pads and slices otherwise).

    impl: "pallas" (the TPU kernel; interpret optionally forces interpreter
    mode) or "dense" (chord_bdf2_dense with xp=jnp — the SAME kernel code on
    [B] lane vectors, no pallas).
    """
    assert supports(topo, ()), "scene not supported by the pallas fast path"
    assert cfg.fixed_iters > 0 and cfg.chord and not cfg.guarded, (
        "pallas path implements the fixed-iteration unguarded chord solve"
    )
    if impl == "dense":
        return partial(chord_bdf2_dense, topo, cfg, xp=jnp)
    N, nr = topo.njoints, topo.nr
    kernel = _build_kernel(topo, cfg, "bdf2")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def solve(params: Dict, x0, q0, qd0, q1, qd1):
        dtype = jnp.float32
        B = x0.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        G = Bp // TILE

        tau = params["tau"]
        if tau.ndim == 1:
            tau = jnp.broadcast_to(tau, (B, nr))

        axes, jsf, bd, gh = _prep_static(topo, params, dtype)

        def to_tiles(a):  # [B,nr] -> [nr, G*8, 128]
            a = a.astype(dtype)
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (Bp - B, nr))], axis=0
                )
            return a.T.reshape(nr, G * LANES[0], LANES[1])

        lane_spec = pl.BlockSpec(
            (nr, LANES[0], LANES[1]), lambda g: (0, g, 0),
            memory_space=pltpu.VMEM,
        )

        def shared(shape):
            zeros = (0,) * len(shape)
            return pl.BlockSpec(shape, lambda g, _z=zeros: _z,
                                memory_space=pltpu.VMEM)

        out_x, out_h = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[lane_spec] * 6 + [
                shared((N, 4, 4)), shared((N, 4, 4)), shared((N, 6)),
                shared((N, 3, 3)), shared((7, nr)), shared((1, N)),
                shared((1, 4)),
            ],
            out_specs=[
                lane_spec,
                pl.BlockSpec((nr * nr, LANES[0], LANES[1]),
                             lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nr, G * LANES[0], LANES[1]), dtype),
                jax.ShapeDtypeStruct((nr * nr, G * LANES[0], LANES[1]), dtype),
            ],
            # The live set (J/Jd pair blocks + H^-1 + GJ working rows) sits
            # near the default 16MB scoped-VMEM budget at nr=12 and the exact
            # footprint depends on the surrounding program's scheduling —
            # raise the Mosaic budget well clear of it (v5e has 128MB VMEM).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            to_tiles(x0), to_tiles(q0), to_tiles(qd0), to_tiles(q1),
            to_tiles(qd1), to_tiles(tau),
            params["E0_pj"].astype(dtype), params["E0_ji"].astype(dtype),
            params["I_i"].astype(dtype), axes, jsf, bd, gh,
        )
        x = out_x.reshape(nr, Bp).T[:B]
        Hinv = out_h.reshape(nr, nr, Bp).transpose(2, 0, 1)[:B]
        return x, Hinv

    return solve
