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
REVOLUTE / PRISMATIC / PLANAR / TRANSLATIONAL — plus UNIVERSAL (q-dependent
S(q)/Sdot as closed forms per lane, JointUniversal.m:74-130), with the
built-in joint-space forces (tau, stiffness, damping, penalty limits,
Joint.m:437-487), maximal Coriolis + gravity + body viscous damping
(Body.computeMassGrav, Body.m:83-135), and penalty ground contact
(ForceGroundCuboid — the differentiable-contact flagship,
matlab-diff/+redmax/ForceGroundCuboid.m:54-153): the 8-corner 3-regime
contact force and its closed-form per-body K/D blocks run inside the kernel
(_ground_contact below), matching the vmapped path's jacfwd blocks exactly
(frozen active/static masks have zero derivative through .astype). Other
closure forces fall back. `supports()` reports whether a scene qualifies;
integrators.make_bdf2_step_batched falls back to the vmapped JAX path
otherwise. Everything here is forward-only:
the adjoint path differentiates the pure-JAX residual (adjoint.py), so the
kernel needs no VJP — it returns the chord factor H^{-1} for the backward
transposed solve (the same factor-reuse as NewtonConfig.adjoint_reuse_factor).

Numerics match integrators.newton(fixed_iters>0) at the same config —
chord (guarded or not) and re-evaluated-H (chord=False) modes — with
hessian="structured" and linsolve="gj", exactly up to f32 reassociation:
same residual (residual_bdf2), same structured Newton matrix
(model.structured_hessian — the local-force and ground-contact K/D blocks
appear here in closed form, verified against the jacfwd blocks in
tests/test_pallas_step.py), same guard semantics and divergence rejection
(growth_reject/tol_reject/stay-put/NaN poisoning). For contact scenes the
Newton matrix uses the one-step proximity-margin activation on both paths
(benchmarks/CONTACT_NOTES.md).
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

# Oracle-side (xp=np) solve diagnostics: chord_bdf2_dense stashes the last
# solve's residual norms / guard state here for tests and debugging.
_ORACLE_DIAG = {}

# Kernel-covered joint types. The constant-S types (S q-independent in the
# joint frame -> Sbdot = 0) plus UNIVERSAL, whose S(q)/Sdot are small closed
# forms evaluated per lane in fk_and_J. SPHERICAL (exp-map) stays on the
# vmapped fallback: its S is the SO(3) body Jacobian (Taylor-guarded series)
# and it needs per-step reparam — the measured cost of that scope cut is
# committed in benchmarks/qdep_ablation.json.
_SUPPORTED = {JointType.FIXED, JointType.REVOLUTE, JointType.PRISMATIC,
              JointType.PLANAR, JointType.TRANSLATIONAL, JointType.UNIVERSAL}


def supports(topo: Topology, force_fns: Tuple) -> bool:
    """True when the fused kernel covers this scene's step exactly.

    Force closures: penalty ground contact (ForceGroundCuboid) is computed
    inside the kernel; any other force type routes to the vmapped fallback.
    """
    from redmax_tpu.forces import ForceGroundCuboid

    if not all(isinstance(f, ForceGroundCuboid) for f in force_fns):
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


def _hat(a):
    Z = 0.0
    return [[Z, -a[2], a[1]], [a[2], Z, -a[0]], [-a[1], a[0], Z]]


# The 8 cuboid corner sign triples (ForceGroundCuboid.m:72-81 column order,
# same table as forces._CORNERS).
_CORNER_SIGNS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
                 for sz in (-1.0, 1.0)]


def _ground_contact(E, phi_i, cp, f32, xp, want_blocks: bool, hpred=None):
    """Penalty ground contact on the 8 corners of one cuboid body.

    Returns (wrench [6-list], K [6x6 or None], D [6x6 or None]) with
    lane-block entries. Force law = forces.ForceGroundCuboid.__call__
    (ForceGroundCuboid.m:54-153, Geilinger-style 3 regimes, branchless
    masks); K/D are the CLOSED-FORM derivatives of the body wrench w.r.t.
    the body pose perturbation xi (E_wi <- E_wi exp(xi^)) and the body
    twist phi — the exact jacfwd of the vmapped path's structured_hessian
    closure-force blocks (masks frozen: .astype has zero derivative; the
    where-guarded |a| clamp is mirrored with a flow mask). Verified against
    jacfwd in tests/test_pallas_step.py.

    Derivation (world-frame A = dfW/dx_c, B = dfW/dv_c per corner):
      A = active (-kn n n^T - hf (1-st) mu kn a_hat n^T)
      B = active (-kd n n^T + hf (st (-kt) T + (1-st)(-mu kn d/|a|)(T - a_hat a_hat^T)))
    body-frame wrench blocks with u = Gamma(r) phi, fb = R^T fW:
      K_blk = Gamma^T [ R^T A R Gamma + [hat(fb) - R^T B R hat(u) | 0] ]
      D_blk = Gamma^T R^T B R Gamma
    (R(xi)^T = (I - hat(xi_w)) R^T; dx_c/dxi = R Gamma; dv_c/dxi_w = -R hat(u).)
    """
    R, p = E
    Rt = _mat3_T(R)
    w, v = phi_i[:3], phi_i[3:]
    ng, xg = cp["ng"], cp["xg"]
    kn, kt, kd, mu = cp["kn"], cp["kt"], cp["kd"], cp["mu"]
    sides = cp["sides"]
    hf = (mu > 0).astype(f32)
    wrench = [0.0] * 6
    K = [[0.0] * 6 for _ in range(6)] if want_blocks else None
    D = [[0.0] * 6 for _ in range(6)] if want_blocks else None
    for sx, sy, sz in _CORNER_SIGNS:
        r = [0.5 * sides[0] * sx, 0.5 * sides[1] * sy, 0.5 * sides[2] * sz]
        xc = [p[i] + sum(R[i][k] * r[k] for k in range(3)) for i in range(3)]
        d = sum(ng[i] * (xc[i] - xg[i]) for i in range(3))
        active = (d <= 0).astype(f32)
        u = [a + b for a, b in zip(_cross(w, r), v)]     # Gamma(r) phi
        vw = _mat3_vec(R, u)                             # world corner vel
        vn = sum(ng[i] * vw[i] for i in range(3))
        a = [vw[i] - vn * ng[i] for i in range(3)]       # tangential vel
        a2 = sum(ai * ai for ai in a)
        flow = (a2 >= 1e-24).astype(f32)                 # |a| clamp mask
        anorm = xp.sqrt(xp.maximum(a2, 1e-24))  # == forces.py where-clamp in value
        ainv = 1.0 / anorm
        st = (mu * xp.abs(kn * d) > kt * anorm).astype(f32)
        dyn = hf * (1.0 - st) * active
        sta = hf * st * active
        fc = [-kn * d * ng[i] - kd * vn * ng[i] for i in range(3)]
        fW = [active * fc[i] + sta * (-kt * a[i])
              + dyn * (-mu * kn * d * a[i] * ainv) for i in range(3)]
        fb = _mat3_vec(Rt, fW)
        rxf = _cross(r, fb)
        for i in range(3):
            wrench[i] = wrench[i] + rxf[i]
            wrench[3 + i] = wrench[3 + i] + fb[i]
        if not want_blocks:
            continue
        # Normal-spring activation for the NEWTON MATRIX only: a corner
        # REACHABLE within one step — d <= h |vn| + h^2 |g| (approach at the
        # current normal speed plus one step of gravity; direction-agnostic
        # because a bounce predictor can sit out of contact moving AWAY
        # while the solution is in contact) — contributes its kn stiffness
        # to H even though the force (exact residual) is still zero.
        # Without this, the chord H built at an out-of-contact predictor
        # has no contact stiffness while the residual does, and the first
        # Newton step at impact overshoots by orders of magnitude (observed:
        # every lane of a resting chain NaN within 4 steps). H-side-only =>
        # the converged solution is unchanged; an over-stiff H only slows
        # convergence, never destabilizes it.
        act_h = active
        if hpred is not None:
            hh, gmag = hpred
            margin = hh * xp.abs(vn) + hh * hh * gmag
            near = ((d - margin) <= 0).astype(f32)
            act_h = active + (1.0 - active) * near
        # world-frame force Jacobians per corner
        A3 = [[act_h * (-kn) * ng[i] * ng[j]
               + dyn * (-mu * kn) * (a[i] * ainv) * ng[j]
               for j in range(3)] for i in range(3)]
        cdyn = dyn * (-mu * kn) * d * ainv
        B3 = [[act_h * (-kd) * ng[i] * ng[j]
               + (sta * (-kt) + cdyn) * ((1.0 if i == j else 0.0) - ng[i] * ng[j])
               - cdyn * flow * a[i] * a[j] * (ainv * ainv)
               for j in range(3)] for i in range(3)]
        P = _mat3_mul(Rt, _mat3_mul(A3, R))              # R^T A R
        Q = _mat3_mul(Rt, _mat3_mul(B3, R))              # R^T B R
        hr, hfb, hu = _hat(r), _hat(fb), _hat(u)
        Phr = _mat3_mul(P, hr)
        Qhu = _mat3_mul(Q, hu)
        Qhr = _mat3_mul(Q, hr)
        # inner 3x6 rows of dW/dxi: [hat(fb) - P hat(r) - Q hat(u) | P]
        ML = [[hfb[i][j] - Phr[i][j] - Qhu[i][j] for j in range(3)]
              for i in range(3)]
        DL = [[-Qhr[i][j] for j in range(3)] for i in range(3)]
        hrML = _mat3_mul(hr, ML)
        hrP = _mat3_mul(hr, P)
        hrDL = _mat3_mul(hr, DL)
        hrQ = _mat3_mul(hr, Q)
        for i in range(3):
            for j in range(3):
                K[i][j] = K[i][j] + hrML[i][j]
                K[i][3 + j] = K[i][3 + j] + hrP[i][j]
                K[3 + i][j] = K[3 + i][j] + ML[i][j]
                K[3 + i][3 + j] = K[3 + i][3 + j] + P[i][j]
                D[i][j] = D[i][j] + hrDL[i][j]
                D[i][3 + j] = D[i][3 + j] + hrQ[i][j]
                D[3 + i][j] = D[3 + i][j] + DL[i][j]
                D[3 + i][3 + j] = D[3 + i][3 + j] + Q[i][j]
    return wrench, K, D


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------


def _build_kernel(topo: Topology, cfg, kind: str, lanes: Tuple[int, ...] = LANES,
                  xp=jnp, contact_bodies: Tuple[int, ...] = ()):
    """Trace-time construction of the fused chord-solve kernel.

    Static data baked in: parent array, joint types, dof offsets, ancestor
    mask, and the contact body list (one entry per ForceGroundCuboid, in
    force_fns order). Returns kernel(refs...) closing over them. When
    contact_bodies is non-empty the kernel takes one extra input ref cp_ref
    [C, 13] = per contact (sides[3], kn, kt, kd, mu, xg[3], ng[3]).
    `lanes` is the shape of one per-scalar lane block — (8, 128) under
    pallas; chord_bdf2_dense evaluates the SAME kernel function on (B,)
    blocks for the CPU parity gate (tests/test_pallas_step.py). `xp` is the
    array namespace: jnp under pallas; PLAIN NUMPY for the parity oracle —
    the kernel body only uses ops numpy spells identically, so the oracle
    executes the identical computation eagerly in milliseconds with no XLA
    compile at all (the unrolled ~20k-op graph takes minutes through the
    XLA CPU pipeline).
    """
    N = topo.njoints
    nr = topo.nr
    parent = [int(p) for p in topo.parent]
    jtypes = [JointType(t) for t in topo.jtype]
    ndof = [int(d) for d in topo.ndof]
    doffs = np.concatenate([[0], np.cumsum(ndof)]).astype(int)  # dof offsets
    anc = np.asarray(topo.ancestor_mask()).astype(bool)         # [N, N] joints
    dofj = [int(j) for j in topo.dof_joint()]                   # [nr]
    C = len(contact_bodies)
    assert kind == "bdf2"
    fixed_iters = cfg.fixed_iters
    guarded = bool(cfg.guarded)
    chord = bool(cfg.chord)
    growth_reject = float(cfg.growth_reject)
    tol_reject = float(cfg.tol_reject)
    dx_clamp = float(cfg.dx_clamp)

    def kernel(x0_ref, q0_ref, qd0_ref, q1_ref, qd1_ref, tau_ref,
               E0pj_ref, E0ji_ref, Ii_ref, axes_ref, jsf_ref, bd_ref, gh_ref,
               *rest):
        if C:
            cp_ref = rest[0]
            x_out_ref, hinv_out_ref = rest[1], rest[2]
        else:
            x_out_ref, hinv_out_ref = rest
        f32 = x0_ref.dtype
        h = gh_ref[0, 3]
        gvec = [gh_ref[0, 0], gh_ref[0, 1], gh_ref[0, 2]]
        gmag = xp.sqrt(gvec[0] * gvec[0] + gvec[1] * gvec[1]
                       + gvec[2] * gvec[2])

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
        cps = [
            {
                "sides": [cp_ref[c, k] for k in range(3)],
                "kn": cp_ref[c, 3], "kt": cp_ref[c, 4],
                "kd": cp_ref[c, 5], "mu": cp_ref[c, 6],
                "xg": [cp_ref[c, 7 + k] for k in range(3)],
                "ng": [cp_ref[c, 10 + k] for k in range(3)],
            }
            for c in range(C)
        ]

        # body-frame motion subspace columns Sb = Ad(inv(E0_ji)) S.
        # Constant-S types: static (scalar entries). UNIVERSAL: S(q) — filled
        # per lane inside fk_and_J (left None here), with Sbdot = A0 Sjdot.
        A0j = [_Ad(_E_inv(E0ji[j])) for j in range(N)]
        Sb_static = [None] * nr
        for j in range(N):
            A0 = A0j[j]
            for d in range(ndof[j]):
                r = doffs[j] + d
                col = [axes[j][a][d] for a in range(3)]
                if jtypes[j] == JointType.REVOLUTE:
                    Sj = col + [0.0, 0.0, 0.0]
                elif jtypes[j] in (JointType.PRISMATIC, JointType.PLANAR,
                                   JointType.TRANSLATIONAL):
                    Sj = [0.0, 0.0, 0.0] + col
                elif jtypes[j] == JointType.UNIVERSAL:
                    continue
                else:
                    raise AssertionError
                Sb_static[r] = _mat6_vec(A0, Sj)

        def fk_and_J(x, qd):
            """FK + world-column Jacobians at (x, qd). Returns
            (J, Jd, phi, Ew) where J[i][r] is a 6-list of lane blocks
            (None when joint dofj[r] is not an ancestor-or-self of i) and
            Ew[i] = (R, p) is the world body frame."""
            E_wj = [None] * N
            E_wi = [None] * N
            Sb = list(Sb_static)
            Sbd = [None] * nr     # Sbdot columns (q-dependent-S types only)
            for j in range(N):
                jt = jtypes[j]
                if jt == JointType.UNIVERSAL:
                    # JointUniversal.XY (JointUniversal.m:74): R = Rx(q0) Ry(q1),
                    # S = unhat(Q^-1 dQ/dq): S0 = [c1,0,s1;0], S1 = [ey;0],
                    # Sdot0 = [-s1,0,c1;0] * qd1 (joints.derive_S convention).
                    o = doffs[j]
                    c0, s0 = xp.cos(x[o]), xp.sin(x[o])
                    c1, s1 = xp.cos(x[o + 1]), xp.sin(x[o + 1])
                    R = [[c1, 0.0, s1],
                         [s0 * s1, c0, -s0 * c1],
                         [-c0 * s1, s0, c0 * c1]]
                    Q = (R, [0.0, 0.0, 0.0])
                    A0 = A0j[j]
                    Sb[o] = _mat6_vec(A0, [c1, 0.0, s1, 0.0, 0.0, 0.0])
                    Sb[o + 1] = _mat6_vec(A0, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
                    qd1j = qd[o + 1]
                    Sbd[o] = _mat6_vec(
                        A0, [-s1 * qd1j, 0.0, c1 * qd1j, 0.0, 0.0, 0.0]
                    )
                elif jt == JointType.REVOLUTE:
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

            # Wdot[r] = Ad_wb[a] (ad(phi_a) Sb[r] + Sbdot[r])
            # (Sbdot = 0 for the constant-S types)
            def _wd(r):
                inner = _ad_vec(phi[dofj[r]], Sb[r])
                if Sbd[r] is not None:
                    inner = [inner[k] + Sbd[r][k] for k in range(6)]
                return _mat6_vec(Ad_wb[dofj[r]], inner)

            Wd = [_wd(r) for r in range(nr)]
            Jd = [[None] * nr for _ in range(N)]
            for i in range(N):
                for r in range(nr):
                    if J[i][r] is not None:
                        t1 = _mat6_vec(Ad_bw[i], Wd[r])
                        t2 = _ad_vec(phi[i], J[i][r])
                        Jd[i][r] = [t1[k] - t2[k] for k in range(6)]
            return J, Jd, phi, E_wi

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

        def maximal_forces(phi, Ew):
            fm = []
            for i in range(N):
                Iphi = [Ii[i][k] * phi[i][k] for k in range(6)]
                f = _adT_vec(phi[i], Iphi)
                Rtg = _mat3_vec(_mat3_T(Ew[i][0]), gvec)
                m = Ii[i][3]
                f = [f[0], f[1], f[2],
                     f[3] + m * Rtg[0], f[4] + m * Rtg[1], f[5] + m * Rtg[2]]
                fm.append([f[k] - bd[i] * phi[i][k] for k in range(6)])
            for c in range(C):
                b = contact_bodies[c]
                wr, _, _ = _ground_contact(Ew[b], phi[b], cps[c], f32, xp,
                                           want_blocks=False)
                fm[b] = [fm[b][k] + wr[k] for k in range(6)]
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
            J, Jd, phi, Ew = pre if pre is not None else fk_and_J(x, qd)
            fr, _ = joint_forces(x, qd)
            fm = maximal_forces(phi, Ew)
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
            J, Jd, phi, Ew = pre
            _, hit = joint_forces(x, qd)
            H = [[0.0] * nr for _ in range(nr)]
            # M + cD * (-2 (Mm J)^T Jdot) accumulated per body
            for i in range(N):
                cols = [r for r in range(nr) if J[i][r] is not None]
                K_i, D_i = local_force_blocks_closed(
                    Ii[i], Ew[i][0], phi[i], bd[i], gvec
                )
                for c in range(C):
                    if contact_bodies[c] != i:
                        continue
                    _, Kc, Dc = _ground_contact(
                        Ew[i], phi[i], cps[c], f32, xp, want_blocks=True,
                        hpred=(h, gmag),
                    )
                    K_i = [[K_i[a][b] + Kc[a][b] for b in range(6)]
                           for a in range(6)]
                    D_i = [[D_i[a][b] + Dc[a][b] for b in range(6)]
                           for a in range(6)]
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

        # ----- fixed-iteration solve (integrators.newton semantics) ---------
        # cfg.chord=True: H frozen at the predictor (one factorization).
        # cfg.chord=False: H re-evaluated at every iterate (structured
        # Newton) — the robust mode for contact/regime flips, where the
        # frozen chord direction stalls; ~fixed_iters x the H+GJ cost.
        H, pre0 = hessian(x0)
        Hinv = gj_inverse(H)

        def hsolve(Hi, g):
            dx = [sum(Hi[r][s] * g[s] for s in range(nr)) for r in range(nr)]
            if dx_clamp:
                dxn = xp.sqrt(sum(d * d for d in dx))
                scale = xp.minimum(1.0, dx_clamp / xp.maximum(dxn, 1e-30))
                dx = [d * scale for d in dx]
            return dx

        x = list(x0)
        stayput = None
        if guarded:
            # Guarded solve (integrators.newton guarded=True semantics):
            # full step if the trial residual improved, else half step if
            # it improved, else stay put — the damped-Newton guard of
            # driverRedMaxBDF1.m:123-144 restricted to {1, 1/2, 0} steps,
            # branchless over lanes. 2 residual evals per iteration.
            g = residual(x, pre=pre0)
            gn = xp.sqrt(sum(gi * gi for gi in g))
            g0n = gn
            stayput = gn < 0  # all-False lane mask
            for it in range(fixed_iters):
                if not chord and it > 0:
                    Hit, _ = hessian(x)
                    Hinv = gj_inverse(Hit)
                dx = hsolve(Hinv, g)
                x_full = [x[r] - dx[r] for r in range(nr)]
                g_full = residual(x_full)
                gfn = xp.sqrt(sum(gi * gi for gi in g_full))
                ok_full = gfn <= gn          # NaN-safe: NaN compares False
                x_half = [x[r] - 0.5 * dx[r] for r in range(nr)]
                g_half = residual(x_half)
                ghn = xp.sqrt(sum(gi * gi for gi in g_half))
                # the half step must IMPROVE too (finiteness alone happily
                # walks into an exploding residual at a contact flip; NaN
                # compares False so this is also NaN-safe)
                ok_half = ghn <= gn
                stayput = stayput | (~ok_full & ~ok_half)
                x = [xp.where(ok_full, x_full[r],
                              xp.where(ok_half, x_half[r], x[r]))
                     for r in range(nr)]
                g = [xp.where(ok_full, g_full[r],
                              xp.where(ok_half, g_half[r], g[r]))
                     for r in range(nr)]
                gn = xp.where(ok_full, gfn, xp.where(ok_half, ghn, gn))
            gln = gn
        else:
            g0n = None
            gln = None
            for it in range(fixed_iters):
                if not chord and it > 0:
                    Hit, _ = hessian(x)
                    Hinv = gj_inverse(Hit)
                g = residual(x, pre=pre0 if it == 0 else None)
                gn = xp.sqrt(sum(gi * gi for gi in g))
                if g0n is None:
                    g0n = gn
                gln = gn
                dx = hsolve(Hinv, g)
                x = [x[r] - dx[r] for r in range(nr)]

        if xp is np:
            _ORACLE_DIAG.update(g0n=g0n, gln=gln, stayput=stayput)
        finite = xp.isfinite(gln)
        for r in range(nr):
            finite = finite & xp.isfinite(x[r])
        diverged = ~finite
        if stayput is not None:
            # stay-put only rejects when the lane never meaningfully
            # improved (newton() guarded semantics — see integrators.py).
            diverged = diverged | (stayput & (gln > 0.5 * g0n))
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


def _pack_contacts(force_fns: Tuple, params: Dict, dtype, xp=jnp):
    """cp [C, 13] rows: sides[3], kn, kt, kd, mu, xg[3], ng[3] — one row per
    ForceGroundCuboid instance, force_fns order. Returns (contact_bodies, cp);
    cp is None when there are no contacts."""
    bodies = tuple(int(fn.body) for fn in force_fns)
    if not bodies:
        return (), None
    rows = []
    for fn in force_fns:
        fp = params["forces"][fn.key]
        E = xp.asarray(fp["E"])
        rows.append(xp.concatenate([
            xp.asarray(fp["sides"]).reshape(3),
            xp.asarray(fp["kn"]).reshape(1), xp.asarray(fp["kt"]).reshape(1),
            xp.asarray(fp["kd"]).reshape(1), xp.asarray(fp["mu"]).reshape(1),
            E[:3, 3].reshape(3), E[:3, 2].reshape(3),
        ]))
    return bodies, xp.stack(rows).astype(dtype)


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
                     xp=np, force_fns: Tuple = ()):
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
    if xp is np:
        params = jax.tree_util.tree_map(np.asarray, dict(params))
        x0, q0, qd0, q1, qd1 = (np.asarray(a) for a in (x0, q0, qd0, q1, qd1))
    contact_bodies, cp = _pack_contacts(force_fns, params, dtype, xp=xp)
    kernel = _build_kernel(topo, cfg, "bdf2", lanes=(B,), xp=xp,
                           contact_bodies=contact_bodies)
    tau = params["tau"]
    if tau.ndim == 1:
        tau = xp.broadcast_to(tau, (B, nr))
    axes, jsf, bd, gh = _prep_static(topo, params, dtype, xp=xp)
    lane = lambda a: _Ref(xp.ascontiguousarray(a.astype(dtype).T)
                          if xp is np else a.astype(dtype).T, xp)
    out_x = _OutRef((nr, B), dtype, xp)
    out_h = _OutRef((nr * nr, B), dtype, xp)
    extra = (_Ref(cp, xp),) if contact_bodies else ()
    kernel(
        lane(x0), lane(q0), lane(qd0), lane(q1), lane(qd1), lane(tau),
        _Ref(params["E0_pj"].astype(dtype), xp),
        _Ref(params["E0_ji"].astype(dtype), xp),
        _Ref(params["I_i"].astype(dtype), xp), _Ref(axes, xp), _Ref(jsf, xp),
        _Ref(bd, xp), _Ref(gh, xp), *extra, out_x, out_h,
    )
    x = out_x.a.T
    Hinv = out_h.a.reshape(nr, nr, B).transpose(2, 0, 1)
    return x, Hinv


def make_chord_bdf2(topo: Topology, cfg, interpret: bool = None,
                    impl: str = "pallas", force_fns: Tuple = ()):
    """Batched fused BDF2 chord solve.

    Returns solve(params, x0, q0, qd0, q1, qd1) -> (x [B,nr], Hinv [B,nr,nr])
    with all state args [B,nr]; params["tau"] may be [B,nr] or [nr].
    B must be a multiple of 1024 (the wrapper pads and slices otherwise).

    force_fns: the scene's force closures — every entry must be a
    ForceGroundCuboid (supports() gate); their body indices are baked into
    the kernel and their params packed per call (_pack_contacts).

    impl: "pallas" (the TPU kernel; interpret optionally forces interpreter
    mode) or "dense" (chord_bdf2_dense with xp=jnp — the SAME kernel code on
    [B] lane vectors, no pallas).
    """
    assert supports(topo, force_fns), "scene not supported by the pallas fast path"
    assert cfg.fixed_iters > 0, (
        "pallas path implements fixed-iteration solves (chord or "
        "re-evaluated structured Newton, guarded or unguarded)"
    )
    if impl == "dense":
        return partial(chord_bdf2_dense, topo, cfg, xp=jnp,
                       force_fns=force_fns)
    N, nr = topo.njoints, topo.nr
    contact_bodies = tuple(int(fn.body) for fn in force_fns)
    Ccnt = len(contact_bodies)
    kernel = _build_kernel(topo, cfg, "bdf2", contact_bodies=contact_bodies)
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
        _, cp = _pack_contacts(force_fns, params, dtype)

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

        cp_specs = [shared((Ccnt, 13))] if Ccnt else []
        cp_args = (cp,) if Ccnt else ()
        out_x, out_h = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[lane_spec] * 6 + [
                shared((N, 4, 4)), shared((N, 4, 4)), shared((N, 6)),
                shared((N, 3, 3)), shared((7, nr)), shared((1, N)),
                shared((1, 4)),
            ] + cp_specs,
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
            params["I_i"].astype(dtype), axes, jsf, bd, gh, *cp_args,
        )
        x = out_x.reshape(nr, Bp).T[:B]
        Hinv = out_h.reshape(nr, nr, Bp).transpose(2, 0, 1)[:B]
        return x, Hinv

    return solve
