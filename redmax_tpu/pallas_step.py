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
REVOLUTE / PRISMATIC / PLANAR / TRANSLATIONAL — plus the q-dependent-S
closed forms per lane: UNIVERSAL (JointUniversal.m:74-130), SPHERICAL (the
exp-map ball joint — S is the SO(3) right Jacobian, _so3_exp_S below,
JointSphericalExp.m:49-91) and FREE3D (translation + ball,
JointFree3D.m) — with the built-in joint-space forces (tau, stiffness,
damping, penalty limits, Joint.m:437-487), maximal Coriolis + gravity +
body viscous damping (Body.computeMassGrav, Body.m:83-135), penalty ground
contact (ForceGroundCuboid — the differentiable-contact flagship,
matlab-diff/+redmax/ForceGroundCuboid.m:54-153): the 8-corner 3-regime
contact force and its closed-form per-body K/D blocks run inside the kernel
(_ground_contact below), matching the vmapped path's jacfwd blocks exactly
(frozen active/static masks have zero derivative through .astype) — and the
two-point spring closures ForcePointPoint / ForceSpringDamper
(ForcePointPoint.m:48-141, ForceSpringGeneric.m:37-83) with closed-form
PAIRWISE K/D lane blocks, including the cross blocks coupling the two
bodies (_spring_force below). Other closure forces (cables, SpringDamperM,
deformables) fall back. `supports()` reports whether a scene qualifies;
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
# joint frame -> Sbdot = 0) plus the q-dependent-S closed forms evaluated per
# lane in fk_and_J: UNIVERSAL (r4), and (r5) SPHERICAL — the exp-map ball
# joint, whose S is the SO(3) right/body Jacobian
# Jr(w) = I - a(s) W + b(s) W^2, s = |w|^2 (JointSphericalExp.m:49-91) — and
# FREE3D (translation + exp-map ball, JointFree3D.m). Their per-step exp-map
# rescale reparam runs OUTSIDE the kernel between steps
# (integrators.make_bdf2_step_batched.inner). SPHERICAL_EULER / splines /
# FREE_ST stay on the vmapped fallback.
_SUPPORTED = {JointType.FIXED, JointType.REVOLUTE, JointType.PRISMATIC,
              JointType.PLANAR, JointType.TRANSLATIONAL, JointType.UNIVERSAL,
              JointType.SPHERICAL, JointType.FREE3D}


def supports(topo: Topology, force_fns: Tuple) -> bool:
    """True when the fused kernel covers this scene's step exactly.

    Force closures computed inside the kernel: penalty ground contact
    (ForceGroundCuboid), the two-point spring closures ForcePointPoint /
    ForceSpringDamper with closed-form pairwise K/D lane blocks
    (_spring_force below), and the multi-point tension-only cable
    (ForceCable, _cable_force — shared tension couples every point pair).
    Any other force type (SpringDamperM, deformables) routes to the
    vmapped fallback.
    """
    from redmax_tpu.forces import (ForceCable, ForceGroundCuboid,
                                   ForcePointPoint, ForceSpringDamper)

    for f in force_fns:
        if type(f) not in (ForceGroundCuboid, ForcePointPoint,
                           ForceSpringDamper, ForceCable):
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


def _so3_exp_S(w, wd, xp):
    """Rodrigues R = exp(hat(w)) plus the exp-map motion subspace in closed
    form, per lane: S = unhat3(R^T dR/dw_k) = the SO(3) right/body Jacobian

        Jr(w) = I - a(s) W + b(s) W^2,   s = |w|^2, W = hat(w),
        a = (1-cos t)/t^2, b = (t-sin t)/t^3   (t = |w|)

    and Sdot = (dS/dw) wd = -a'(s) sdot W - a Wd + b'(s) sdot W^2
    + b (Wd W + W Wd) with sdot = 2 w.wd, Wd = hat(wd). Every coefficient is
    a SMOOTH, EVEN function of t written in s, with a Taylor branch below
    s = 0.04 where the trig formulas cancel catastrophically in f32 (the
    same guard family as se3.exp_so3). Matches joints.derive_S /
    jax.jvp(S_fn) to machine precision (tests/test_pallas_step.py).

    Reference: JointSphericalExp.update_ (matlab/+redmax/
    JointSphericalExp.m:49-91) computes the same closed-form S.
    Returns (R [3x3], S [3x3], Sdot [3x3]) as lane-block entry lists.
    """
    s = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    sg = xp.maximum(s, 1e-12)
    th = xp.sqrt(sg)
    sn, cs = xp.sin(th), xp.cos(th)
    small = s < 0.04

    def pick(t, f):
        return xp.where(small, t, f)

    c1 = pick(1.0 - s / 6.0 + s * s / 120.0, sn / th)
    a = pick(0.5 - s / 24.0 + s * s / 720.0, (1.0 - cs) / sg)
    b = pick(1.0 / 6.0 - s / 120.0 + s * s / 5040.0, (th - sn) / (sg * th))
    ap = pick(-1.0 / 24.0 + s / 360.0 - s * s / 13440.0,
              (th * sn * 0.5 - (1.0 - cs)) / (sg * sg))
    bp = pick(-1.0 / 120.0 + s / 2520.0 - s * s / 120960.0,
              ((1.0 - cs) * th - 3.0 * (th - sn)) / (2.0 * sg * sg * th))

    W = _hat(w)
    Wd = _hat(wd)
    W2 = [[w[i] * w[j] - (s if i == j else 0.0) for j in range(3)]
          for i in range(3)]
    eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    R = [[eye[i][j] + c1 * W[i][j] + a * W2[i][j] for j in range(3)]
         for i in range(3)]
    S = [[eye[i][j] - a * W[i][j] + b * W2[i][j] for j in range(3)]
         for i in range(3)]
    sd = 2.0 * (w[0] * wd[0] + w[1] * wd[1] + w[2] * wd[2])
    WdW = _mat3_mul(Wd, W)
    WWd = _mat3_mul(W, Wd)
    Sdot = [[-ap * sd * W[i][j] - a * Wd[i][j] + bp * sd * W2[i][j]
             + b * (WdW[i][j] + WWd[i][j]) for j in range(3)]
            for i in range(3)]
    return R, S, Sdot


def _spring_force(st1, st2, sp, f32, xp, want_blocks: bool):
    """Two-point spring closure (ForcePointPoint / ForceSpringDamper) on one
    lane block: world force law + closed-form pairwise K/D blocks.

    st_k = (x [3], v [3], R [3x3] or None, u [3] or None, r [3]) — the
    endpoint state (world position/velocity, body rotation, body-frame point
    velocity u = Gamma(r) phi, body-frame point r); R is None for a
    world-fixed endpoint (body = -1). sp = dict(kind, k, d, L, tension).

    Force law (matlab-diff/+redmax/ForcePointPoint.m:48-141 /
    ForceSpringGeneric.m:37-83 + ForceSpringDamper.m:62-72):
        pp: fW = k (x2 - x1) + d (v2 - v1)
        sd: l = |dx|, ldot = dx.dv/l, fs = k (l-L)/L + d ldot/L,
            fW = (fs/l) dx   (gated by strain > 0 when tension-only)
    applied +fW at endpoint 1, -fW at endpoint 2.

    K/D blocks are the exact jacfwd of the wrenches under the
    structured_hessian perturbation convention (E_wi <- E_wi exp(xi^),
    phi <- phi + dphi), including the CROSS blocks coupling the two bodies
    — the first kernel force whose H couples body pairs. With
    A = dfW/d(dx), B = dfW/d(dv) (world 3x3):
        dW_b/dxi_c = Gamma_b^T [ delta_bc hat(fb_b) | 0 ]
                   + Gamma_b^T s_b sig_c R_b^T (A R_c Gamma_c
                                                + B [-R_c hat(u_c) | 0])
        dW_b/dphi_c = Gamma_b^T s_b sig_c R_b^T B R_c Gamma_c
    (s_1, s_2 = +1, -1 the application sign; sig_1, sig_2 = -1, +1 the
    dx/dv sensitivity sign). Verified against jacfwd of the force closures
    in tests/test_pallas_step.py.

    Returns (wrench1 [6] or None, wrench2 [6] or None,
             blocks {(endpoint_i, endpoint_j): (K 6x6, D 6x6)}).
    """
    x1, v1, R1, u1, r1 = st1
    x2, v2, R2, u2, r2 = st2
    k, d = sp["k"], sp["d"]
    dx = [x2[i] - x1[i] for i in range(3)]
    dv = [v2[i] - v1[i] for i in range(3)]
    eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    if sp["kind"] == "pp":
        fW = [k * dx[i] + d * dv[i] for i in range(3)]
        if want_blocks:
            A = [[k * eye[i][j] for j in range(3)] for i in range(3)]
            B = [[d * eye[i][j] for j in range(3)] for i in range(3)]
    else:
        L = sp["L"]
        l2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
        l = xp.sqrt(xp.maximum(l2, 1e-24))
        linv = 1.0 / l
        e = [dx[i] * linv for i in range(3)]
        ldot = (dx[0] * dv[0] + dx[1] * dv[1] + dx[2] * dv[2]) * linv
        fs_raw = k * (l - L) / L + d * ldot / L
        gate = (l > L).astype(f32) if sp["tension"] else 1.0
        fW = [gate * fs_raw * linv * dx[i] for i in range(3)]
        if want_blocks:
            dfs = [(k / L) * e[i] + (d / L) * (dv[i] - ldot * e[i]) * linv
                   for i in range(3)]
            A = [[gate * (fs_raw * linv * (eye[i][j] - e[i] * e[j])
                          + e[i] * dfs[j]) for j in range(3)]
                 for i in range(3)]
            B = [[gate * (d / L) * e[i] * e[j] for j in range(3)]
                 for i in range(3)]

    def wrench(R, r, sgn):
        fb = _mat3_vec(_mat3_T(R), [sgn * fW[i] for i in range(3)])
        return _cross(r, fb) + fb, fb

    w1 = fb1 = w2 = fb2 = None
    if R1 is not None:
        w1, fb1 = wrench(R1, r1, 1.0)
    if R2 is not None:
        w2, fb2 = wrench(R2, r2, -1.0)
    blocks = {}
    if want_blocks:
        ends = [(R1, u1, r1, fb1, 1.0, -1.0), (R2, u2, r2, fb2, -1.0, 1.0)]
        for bi, (Rb, ub, rb, fbb, s_b, _) in enumerate(ends):
            if Rb is None:
                continue
            Rbt = _mat3_T(Rb)
            hrb = _hat(rb)
            for ci, (Rc, uc, rc, _f, _s, sig_c) in enumerate(ends):
                if Rc is None:
                    continue
                coef = s_b * sig_c
                P = _mat3_mul(Rbt, _mat3_mul(A, Rc))
                Q = _mat3_mul(Rbt, _mat3_mul(B, Rc))
                P = [[coef * P[i][j] for j in range(3)] for i in range(3)]
                Q = [[coef * Q[i][j] for j in range(3)] for i in range(3)]
                hrc, huc = _hat(rc), _hat(uc)
                Phr = _mat3_mul(P, hrc)
                Qhu = _mat3_mul(Q, huc)
                Qhr = _mat3_mul(Q, hrc)
                hfb = _hat(fbb) if bi == ci else [[0.0] * 3 for _ in range(3)]
                ML = [[hfb[i][j] - Phr[i][j] - Qhu[i][j] for j in range(3)]
                      for i in range(3)]
                DL = [[-Qhr[i][j] for j in range(3)] for i in range(3)]
                hrML = _mat3_mul(hrb, ML)
                hrP = _mat3_mul(hrb, P)
                hrDL = _mat3_mul(hrb, DL)
                hrQ = _mat3_mul(hrb, Q)
                K = [[0.0] * 6 for _ in range(6)]
                D = [[0.0] * 6 for _ in range(6)]
                for i in range(3):
                    for j in range(3):
                        K[i][j] = hrML[i][j]
                        K[i][3 + j] = hrP[i][j]
                        K[3 + i][j] = ML[i][j]
                        K[3 + i][3 + j] = P[i][j]
                        D[i][j] = hrDL[i][j]
                        D[i][3 + j] = hrQ[i][j]
                        D[3 + i][j] = DL[i][j]
                        D[3 + i][3 + j] = Q[i][j]
                blocks[(bi, ci)] = (K, D)
    return w1, w2, blocks


def _point_pair_blocks(stj, sti, fbj, A, B, same_point):
    """Generic wrench-derivative 6x6 blocks between two body points under
    the structured_hessian perturbation convention: point j's wrench
    W_j = Gamma_j^T R_j^T F_j, with A = dF_j/dx_i, B = dF_j/dv_i (world
    3x3). Returns (K, D) 6x6 lane-block lists.

        dW_j/dxi_i  = Gamma_j^T ([same_point ? hat(fb_j) : 0 | 0]
                      + R_j^T (A R_i Gamma_i + B [-R_i hat(w_i) | 0]))
        dW_j/dphi_i = Gamma_j^T R_j^T B R_i Gamma_i

    (the factored core of _spring_force's derivation, shared with
    _cable_force)."""
    _, _, Rj, _, rj = stj
    _, _, Ri, wi, ri = sti
    Rjt = _mat3_T(Rj)
    P = _mat3_mul(Rjt, _mat3_mul(A, Ri))
    Q = _mat3_mul(Rjt, _mat3_mul(B, Ri))
    hri, hwi = _hat(ri), _hat(wi)
    hrj = _hat(rj)
    Phr = _mat3_mul(P, hri)
    Qhw = _mat3_mul(Q, hwi)
    Qhr = _mat3_mul(Q, hri)
    hfb = _hat(fbj) if same_point else [[0.0] * 3 for _ in range(3)]
    ML = [[hfb[i][j] - Phr[i][j] - Qhw[i][j] for j in range(3)]
          for i in range(3)]
    DL = [[-Qhr[i][j] for j in range(3)] for i in range(3)]
    hrML = _mat3_mul(hrj, ML)
    hrP = _mat3_mul(hrj, P)
    hrDL = _mat3_mul(hrj, DL)
    hrQ = _mat3_mul(hrj, Q)
    K = [[0.0] * 6 for _ in range(6)]
    D = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            K[i][j] = hrML[i][j]
            K[i][3 + j] = hrP[i][j]
            K[3 + i][j] = ML[i][j]
            K[3 + i][3 + j] = P[i][j]
            D[i][j] = hrDL[i][j]
            D[i][3 + j] = hrQ[i][j]
            D[3 + i][j] = DL[i][j]
            D[3 + i][3 + j] = Q[i][j]
    return K, D


def _cable_force(sts, cab, f32, xp, want_blocks: bool):
    """Tension-only multi-point cable (ForceCable /
    ForceSpringMultiPointGeneric, matlab-diff: ForceCable.m:66-84,
    ForceSpringMultiPointGeneric.m:28-95) on one lane block.

    sts = per-point endpoint states (x, v, R, w, r); world points carry
    R = None. cab = dict(k, d, L). Value law (forces.ForceCable):
        l = sum_k |dx_k|, ldot = sum_k u_k . dv_k,
        fs = gate * (k (l-L)/L + d ldot/L),  gate = (l > L),
        point j force F_j = fs (u_j [j < P-1] - u_{j-1} [j > 0]) = fs c_j.

    Closed-form derivatives (the shared tension couples EVERY point pair):
        dl/dx_i    = -c_i
        dldot/dx_i = Pm_{i-1} dv_{i-1}/l_{i-1} - Pm_i dv_i/l_i
                     (Pm_k = I - u_k u_k^T)
        a_i = dfs/dx_i = gate (-(k/L) c_i + (d/L) dldot/dx_i)
        dF_j/dx_i = c_j (x) a_i + fs D_ji,
          D_ji = (Pm_j/l_j)(d_{i,j+1} - d_{i,j})
               - (Pm_{j-1}/l_{j-1})(d_{i,j} - d_{i,j-1})
        dF_j/dv_i = -gate (d/L) c_j (x) c_i
    mapped to body-frame wrench blocks by _point_pair_blocks. Exact jacfwd
    of the closure (masks frozen), gated in tests/test_pallas_step.py.

    Returns (wrenches [P of 6-list or None], blocks {(j, i): (K, D)}).
    """
    P = len(sts)
    k, d, L = cab["k"], cab["d"], cab["L"]
    segs = []
    l = 0.0
    ldot = 0.0
    for s in range(P - 1):
        x1, v1 = sts[s][0], sts[s][1]
        x2, v2 = sts[s + 1][0], sts[s + 1][1]
        dx = [x2[i] - x1[i] for i in range(3)]
        dv = [v2[i] - v1[i] for i in range(3)]
        l2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
        lk = xp.sqrt(xp.maximum(l2, 1e-24))
        linv = 1.0 / lk
        u = [dx[i] * linv for i in range(3)]
        l = l + lk
        ldot = ldot + (u[0] * dv[0] + u[1] * dv[1] + u[2] * dv[2])
        segs.append({"u": u, "dv": dv, "linv": linv})
    fs_raw = k * (l - L) / L + d * ldot / L
    gate = (l > L).astype(f32)
    fs = gate * fs_raw

    def seg_u(j):
        return segs[j]["u"] if 0 <= j < P - 1 else None

    def c_of(j):
        uj, ujm = seg_u(j), seg_u(j - 1)
        out = [0.0, 0.0, 0.0]
        if uj is not None:
            out = [out[i] + uj[i] for i in range(3)]
        if ujm is not None:
            out = [out[i] - ujm[i] for i in range(3)]
        return out

    cs = [c_of(j) for j in range(P)]
    wrenches = [None] * P
    for j in range(P):
        if sts[j][2] is None:
            continue
        Fj = [fs * cs[j][i] for i in range(3)]
        fb = _mat3_vec(_mat3_T(sts[j][2]), Fj)
        wrenches[j] = _cross(sts[j][4], fb) + fb
    blocks = {}
    if not want_blocks:
        return wrenches, blocks

    def Pm(jseg):
        u = segs[jseg]["u"]
        return [[(1.0 if a == b else 0.0) - u[a] * u[b] for b in range(3)]
                for a in range(3)]

    # a_i = dfs/dx_i (3-vec per point)
    a_of = []
    for i in range(P):
        ai = [-gate * (k / L) * cs[i][j] for j in range(3)]
        if i - 1 >= 0:
            Pv = _mat3_vec(Pm(i - 1), segs[i - 1]["dv"])
            ai = [ai[j] + gate * (d / L) * Pv[j] * segs[i - 1]["linv"]
                  for j in range(3)]
        if i < P - 1:
            Pv = _mat3_vec(Pm(i), segs[i]["dv"])
            ai = [ai[j] - gate * (d / L) * Pv[j] * segs[i]["linv"]
                  for j in range(3)]
        a_of.append(ai)

    def D_ji(j, i):
        out = [[0.0] * 3 for _ in range(3)]
        if j < P - 1:
            Pj = Pm(j)
            s = (1.0 if i == j + 1 else 0.0) - (1.0 if i == j else 0.0)
            if s:
                out = [[out[a][b] + s * Pj[a][b] * segs[j]["linv"]
                        for b in range(3)] for a in range(3)]
        if j - 1 >= 0:
            Pj = Pm(j - 1)
            s = (1.0 if i == j else 0.0) - (1.0 if i == j - 1 else 0.0)
            if s:
                out = [[out[a][b] - s * Pj[a][b] * segs[j - 1]["linv"]
                        for b in range(3)] for a in range(3)]
        return out

    for j in range(P):
        if sts[j][2] is None:
            continue
        Fj = [fs * cs[j][i] for i in range(3)]
        fbj = _mat3_vec(_mat3_T(sts[j][2]), Fj)
        for i in range(P):
            if sts[i][2] is None:
                continue
            Dji = D_ji(j, i)
            A = [[cs[j][a] * a_of[i][b] + fs * Dji[a][b] for b in range(3)]
                 for a in range(3)]
            B = [[-gate * (d / L) * cs[j][a] * cs[i][b] for b in range(3)]
                 for a in range(3)]
            blocks[(j, i)] = _point_pair_blocks(
                sts[j], sts[i], fbj, A, B, same_point=(i == j))
    return wrenches, blocks


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------


def _build_kernel(topo: Topology, cfg, kind: str, lanes: Tuple[int, ...] = LANES,
                  xp=jnp, contact_bodies: Tuple[int, ...] = (),
                  springs: Tuple = (), cables: Tuple = (),
                  perlane: frozenset = frozenset()):
    """Trace-time construction of the fused chord-solve kernel.

    Static data baked in: parent array, joint types, dof offsets, ancestor
    mask, the contact body list (one entry per ForceGroundCuboid, in
    force_fns order), and the spring spec (one dict per ForcePointPoint /
    ForceSpringDamper: kind/b1/b2/tension — see _spring_spec). Returns
    kernel(refs...) closing over them. When contact_bodies is non-empty the
    kernel takes one extra input ref cp_ref [C, 13] = per contact (sides[3],
    kn, kt, kd, mu, xg[3], ng[3]); when springs is non-empty one more,
    sp_ref [S, 9] = per spring (xl1[3], xl2[3], k, d, L); when cables
    (one dict per ForceCable: bodies — see _cable_spec) is non-empty one
    more, cb_ref [1, total] flat per-cable [xls (3P), k, d, L] rows.

    perlane ⊆ {"I_i", "gh", "bd", "cp", "sp", "cb"}: inputs promoted to PER-LANE
    blocks (the scenario-sampling / system-ID dimension — inertia, gravity
    + timestep, body damping, contact and spring coefficients vary per
    batch lane). A per-lane input arrives flattened to lane-block rows
    ([N*6] for I_i, [4] for gh, [N] for bd, [C*13] / [S*9] for cp/sp)
    instead of a small shared 2-D ref; the kernel math is unchanged —
    every scalar read just becomes a lane block and broadcasts.
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
    SP = len(springs)
    CB = len(cables)
    # static flat offsets into cb_ref (per-cable stride 3P + 3)
    cab_offs = []
    _o = 0
    for cb in cables:
        cab_offs.append(_o)
        _o += 3 * len(cb["bodies"]) + 3
    assert kind == "bdf2"
    fixed_iters = cfg.fixed_iters
    guarded = bool(cfg.guarded)
    guard_last = bool(getattr(cfg, "guard_last", False))
    chord = bool(cfg.chord)
    if guard_last:
        assert chord and not guarded, (
            "guard_last requires chord=True, guarded=False"
        )
    growth_reject = float(cfg.growth_reject)
    tol_reject = float(cfg.tol_reject)
    dx_clamp = float(cfg.dx_clamp)

    def kernel(x0_ref, q0_ref, qd0_ref, q1_ref, qd1_ref, tau_ref,
               E0pj_ref, E0ji_ref, Ii_ref, axes_ref, jsf_ref, bd_ref, gh_ref,
               *rest):
        ri = 0
        if C:
            cp_ref = rest[ri]
            ri += 1
        if SP:
            sp_ref = rest[ri]
            ri += 1
        if CB:
            cb_ref = rest[ri]
            ri += 1
        x_out_ref, hinv_out_ref = rest[ri], rest[ri + 1]
        f32 = x0_ref.dtype
        if "gh" in perlane:
            h = gh_ref[3]
            gvec = [gh_ref[0], gh_ref[1], gh_ref[2]]
        else:
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
        if "I_i" in perlane:
            Ii = [[Ii_ref[j * 6 + k] for k in range(6)] for j in range(N)]
        else:
            Ii = [[Ii_ref[j, k] for k in range(6)] for j in range(N)]
        if "bd" in perlane:
            bd = [bd_ref[j] for j in range(N)]
        else:
            bd = [bd_ref[0, j] for j in range(N)]
        stiff = [jsf_ref[0, r] for r in range(nr)]
        damp = [jsf_ref[1, r] for r in range(nr)]
        qrest = [jsf_ref[2, r] for r in range(nr)]
        qlimL = [jsf_ref[3, r] for r in range(nr)]
        qlimU = [jsf_ref[4, r] for r in range(nr)]
        qlimK = [jsf_ref[5, r] for r in range(nr)]
        qlimD = [jsf_ref[6, r] for r in range(nr)]
        def _cpr(c, k):
            return cp_ref[c * 13 + k] if "cp" in perlane else cp_ref[c, k]

        def _spr(s, k):
            return sp_ref[s * 9 + k] if "sp" in perlane else sp_ref[s, k]

        cps = [
            {
                "sides": [_cpr(c, k) for k in range(3)],
                "kn": _cpr(c, 3), "kt": _cpr(c, 4),
                "kd": _cpr(c, 5), "mu": _cpr(c, 6),
                "xg": [_cpr(c, 7 + k) for k in range(3)],
                "ng": [_cpr(c, 10 + k) for k in range(3)],
            }
            for c in range(C)
        ]
        sps = [
            {
                **springs[s],
                "xl1": [_spr(s, k) for k in range(3)],
                "xl2": [_spr(s, 3 + k) for k in range(3)],
                "k": _spr(s, 6), "d": _spr(s, 7), "L": _spr(s, 8),
            }
            for s in range(SP)
        ]

        def _cbr(idx):
            return cb_ref[idx] if "cb" in perlane else cb_ref[0, idx]

        cbs = []
        for ci in range(CB):
            o = cab_offs[ci]
            Pn = len(cables[ci]["bodies"])
            cbs.append({
                "bodies": cables[ci]["bodies"],
                "xls": [[_cbr(o + 3 * pi + k) for k in range(3)]
                        for pi in range(Pn)],
                "k": _cbr(o + 3 * Pn), "d": _cbr(o + 3 * Pn + 1),
                "L": _cbr(o + 3 * Pn + 2),
            })

        def point_state(Ew, phi, b, r):
            """Body-point state (x, v, R, w, r) for the force closures;
            world-fixed points (body < 0) carry R = None."""
            if b < 0:
                return (r, [0.0, 0.0, 0.0], None, None, r)
            R, p = Ew[b]
            x = [p[i] + sum(R[i][k] * r[k] for k in range(3))
                 for i in range(3)]
            w = [a + b2 for a, b2 in zip(_cross(phi[b][:3], r), phi[b][3:])]
            return (x, _mat3_vec(R, w), R, w, r)

        def spring_states(Ew, phi, sp):
            return (point_state(Ew, phi, sp["b1"], sp["xl1"]),
                    point_state(Ew, phi, sp["b2"], sp["xl2"]))

        def cable_states(Ew, phi, cb):
            return [point_state(Ew, phi, b, xl)
                    for b, xl in zip(cb["bodies"], cb["xls"])]

        # body-frame motion subspace columns Sb = Ad(inv(E0_ji)) S.
        # Constant-S types: static (scalar entries). UNIVERSAL: S(q) — filled
        # per lane inside fk_and_J (left None here), with Sbdot = A0 Sjdot.
        A0j = [_Ad(_E_inv(E0ji[j])) for j in range(N)]
        Sb_static = [None] * nr
        for j in range(N):
            if jtypes[j] in (JointType.UNIVERSAL, JointType.SPHERICAL,
                             JointType.FREE3D):
                continue              # q-dependent S, filled per lane below
            A0 = A0j[j]
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
                elif jt == JointType.SPHERICAL:
                    # JointSphericalExp (matlab/+redmax/JointSphericalExp.m:49):
                    # R = exp(hat(q)), S = the SO(3) right Jacobian, per lane.
                    o = doffs[j]
                    R, S3, S3d = _so3_exp_S(
                        [x[o], x[o + 1], x[o + 2]],
                        [qd[o], qd[o + 1], qd[o + 2]], xp,
                    )
                    Q = (R, [0.0, 0.0, 0.0])
                    A0 = A0j[j]
                    for dd in range(3):
                        Sb[o + dd] = _mat6_vec(
                            A0, [S3[0][dd], S3[1][dd], S3[2][dd],
                                 0.0, 0.0, 0.0])
                        Sbd[o + dd] = _mat6_vec(
                            A0, [S3d[0][dd], S3d[1][dd], S3d[2][dd],
                                 0.0, 0.0, 0.0])
                elif jt == JointType.FREE3D:
                    # JointFree3D (matlab-diff/+redmax/JointFree3D.m):
                    # Q = [R(q[3:6]) | p = q[0:3]] with exp coords for R.
                    # S cols 0-2 (translation): [0; R^T e_d] with
                    # Sdot = [0; -hat(omega_b) R^T e_d], omega_b = Jr rdot;
                    # cols 3-5: the spherical columns above.
                    o = doffs[j]
                    rd3 = [qd[o + 3], qd[o + 4], qd[o + 5]]
                    R, S3, S3d = _so3_exp_S(
                        [x[o + 3], x[o + 4], x[o + 5]], rd3, xp)
                    Q = (R, [x[o], x[o + 1], x[o + 2]])
                    A0 = A0j[j]
                    om = _mat3_vec(S3, rd3)
                    hom = _hat(om)
                    for dd in range(3):
                        colv = [R[dd][0], R[dd][1], R[dd][2]]  # R^T e_dd
                        sdv = [-sum(hom[i][k] * colv[k] for k in range(3))
                               for i in range(3)]
                        Sb[o + dd] = _mat6_vec(A0, [0.0, 0.0, 0.0] + colv)
                        Sbd[o + dd] = _mat6_vec(A0, [0.0, 0.0, 0.0] + sdv)
                        Sb[o + 3 + dd] = _mat6_vec(
                            A0, [S3[0][dd], S3[1][dd], S3[2][dd],
                                 0.0, 0.0, 0.0])
                        Sbd[o + 3 + dd] = _mat6_vec(
                            A0, [S3d[0][dd], S3d[1][dd], S3d[2][dd],
                                 0.0, 0.0, 0.0])
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
            for sp in sps:
                st1, st2 = spring_states(Ew, phi, sp)
                w1, w2, _ = _spring_force(st1, st2, sp, f32, xp,
                                          want_blocks=False)
                if w1 is not None:
                    b = sp["b1"]
                    fm[b] = [fm[b][k] + w1[k] for k in range(6)]
                if w2 is not None:
                    b = sp["b2"]
                    fm[b] = [fm[b][k] + w2[k] for k in range(6)]
            for cb in cbs:
                wrs, _ = _cable_force(cable_states(Ew, phi, cb), cb, f32,
                                      xp, want_blocks=False)
                for b, wr in zip(cb["bodies"], wrs):
                    if wr is not None:
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
            # Spring/cable closures: pairwise K/D blocks (incl. the cross
            # blocks coupling the endpoint bodies),
            # H[r][s] += J_b[r]^T G J_c[s] with G = cK K_bc + cD D_bc.
            def add_pair(bb, cc, Ksp, Dsp):
                G6 = [[cK * Ksp[a][b2] + cD * Dsp[a][b2]
                       for b2 in range(6)] for a in range(6)]
                colsb = [r for r in range(nr) if J[bb][r] is not None]
                colsc = [s for s in range(nr) if J[cc][s] is not None]
                GJ = {s: _mat6_vec(G6, J[cc][s]) for s in colsc}
                for r in colsb:
                    for s in colsc:
                        H[r][s] = H[r][s] + sum(
                            J[bb][r][k] * GJ[s][k] for k in range(6)
                        )

            for sp in sps:
                st1, st2 = spring_states(Ew, phi, sp)
                _, _, blocks = _spring_force(st1, st2, sp, f32, xp,
                                             want_blocks=True)
                bodies = (sp["b1"], sp["b2"])
                for (bi, ci), (Ksp, Dsp) in blocks.items():
                    add_pair(bodies[bi], bodies[ci], Ksp, Dsp)
            for cb in cbs:
                _, blocks = _cable_force(cable_states(Ew, phi, cb), cb,
                                         f32, xp, want_blocks=True)
                for (pi, pj), (Ksp, Dsp) in blocks.items():
                    add_pair(cb["bodies"][pi], cb["bodies"][pj], Ksp, Dsp)
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
            plain = fixed_iters - (1 if guard_last else 0)
            for it in range(plain):
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
            if guard_last:
                # One guarded final iteration (NewtonConfig.guard_last): 2
                # extra residual evals per SOLVE, not per iteration — the
                # affordable robust mode (benchmarks/robust_mode.json).
                g = residual(x, pre=pre0 if plain == 0 else None)
                gn = xp.sqrt(sum(gi * gi for gi in g))
                if g0n is None:
                    g0n = gn
                dx = hsolve(Hinv, g)
                x_full = [x[r] - dx[r] for r in range(nr)]
                g_full = residual(x_full)
                gfn = xp.sqrt(sum(gi * gi for gi in g_full))
                ok_full = gfn <= gn
                x_half = [x[r] - 0.5 * dx[r] for r in range(nr)]
                g_half = residual(x_half)
                ghn = xp.sqrt(sum(gi * gi for gi in g_half))
                ok_half = ghn <= gn
                stayput = ~ok_full & ~ok_half
                x = [xp.where(ok_full, x_full[r],
                              xp.where(ok_half, x_half[r], x[r]))
                     for r in range(nr)]
                gln = xp.where(ok_full, gfn, xp.where(ok_half, ghn, gn))

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
    if bd is None:
        bd = xp.zeros((1, N), dtype)
    elif bd.ndim == 2:
        bd = bd.astype(dtype)                      # per-lane [B, N]
    else:
        bd = bd.reshape(1, N).astype(dtype)
    g, hh = params["g"], params["h"]
    if g.ndim == 2 or hh.ndim == 1:
        # Per-lane gravity and/or timestep: gh [B, 4].
        B = g.shape[0] if g.ndim == 2 else hh.shape[0]
        gB = xp.broadcast_to(g.reshape(-1, 3), (B, 3)).astype(dtype)
        hB = xp.broadcast_to(hh.reshape(-1), (B,)).astype(dtype)
        gh = xp.concatenate([gB, hB[:, None]], axis=1)
    else:
        gh = xp.concatenate(
            [g.reshape(3), hh.reshape(1)]
        ).reshape(1, 4).astype(dtype)
    return axes, jsf, bd, gh


def _split_forces(force_fns: Tuple):
    """(ground_fns, spring_fns, cable_fns) in force_fns order; supports()
    guarantees nothing else is present on the kernel path."""
    from redmax_tpu.forces import ForceCable, ForceGroundCuboid

    gnd = tuple(f for f in force_fns if isinstance(f, ForceGroundCuboid))
    cab = tuple(f for f in force_fns if isinstance(f, ForceCable))
    spr = tuple(f for f in force_fns
                if not isinstance(f, (ForceGroundCuboid, ForceCable)))
    return gnd, spr, cab


def _pack_contacts(force_fns: Tuple, params: Dict, dtype, xp=jnp):
    """cp [C, 13] rows: sides[3], kn, kt, kd, mu, xg[3], ng[3] — one row per
    ForceGroundCuboid instance, force_fns order. Returns (contact_bodies, cp);
    cp is None when there are no contacts."""
    force_fns, _, _ = _split_forces(force_fns)
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


def _perlane_keys(params: Dict, force_fns: Tuple) -> frozenset:
    """Which kernel inputs carry a per-lane batch dim in these params
    (see _build_kernel perlane): I_i [B,N,6], g [B,3] / h [B],
    body_damping [B,N], contact kn/kt/kd/mu [B], spring k/d/L [B]."""
    pl = set()
    if params["I_i"].ndim == 3:
        pl.add("I_i")
    if params["g"].ndim == 2 or params["h"].ndim == 1:
        pl.add("gh")
    bd = params.get("body_damping")
    if bd is not None and bd.ndim == 2:
        pl.add("bd")
    gnd, spr, cab = _split_forces(force_fns)
    for fn in gnd:
        fp = params["forces"][fn.key]
        if any(getattr(fp.get(p), "ndim", 0) == 1
               for p in ("kn", "kt", "kd", "mu")):
            pl.add("cp")
    for fn in spr:
        fp = params["forces"][fn.key]
        if any(getattr(fp.get(p, None), "ndim", 0) == 1
               for p in ("k", "d", "L")):
            pl.add("sp")
    for fn in cab:
        fp = params["forces"][fn.key]
        if any(getattr(fp.get(p, None), "ndim", 0) == 1
               for p in ("k", "d", "L")):
            pl.add("cb")
    return frozenset(pl)


def _cable_spec(force_fns: Tuple) -> Tuple:
    """Static cable descriptors (bodies tuple) — one per ForceCable."""
    _, _, cab = _split_forces(force_fns)
    return tuple({"bodies": tuple(int(b) for b in fn.bodies)} for fn in cab)


def _pack_cables(force_fns: Tuple, params: Dict, dtype, xp=jnp):
    """cb [1, total] flat cable params, per-cable layout
    [xls (3P), k, d, L] at static offsets. None when there are no cables."""
    _, _, cab = _split_forces(force_fns)
    if not cab:
        return None
    ents = []
    for fn in cab:
        fp = params["forces"][fn.key]
        ents.append(xp.asarray(fp["xls"]).reshape(-1))
        ents.append(xp.asarray(fp["k"]).reshape(1))
        ents.append(xp.asarray(fp["d"]).reshape(1))
        ents.append(xp.asarray(fp["L"]).reshape(1))
    return xp.concatenate(ents).reshape(1, -1).astype(dtype)


def _pack_cables_lane(force_fns: Tuple, params: Dict, dtype, B, xp=jnp):
    """Per-lane cable packing: [total, B] (entry order of _pack_cables)."""
    _, _, cab = _split_forces(force_fns)
    cols = []
    for fn in cab:
        fp = params["forces"][fn.key]
        xls = xp.asarray(fp["xls"]).reshape(-1)
        ents = [xls[i] for i in range(xls.shape[0])] + [
            fp["k"], fp["d"], fp["L"]]
        for e in ents:
            cols.append(xp.broadcast_to(xp.asarray(e).astype(dtype), (B,)))
    return xp.stack(cols, axis=0)


def _pack_contacts_lane(force_fns: Tuple, params: Dict, dtype, B, xp=jnp):
    """Per-lane contact packing: [C*13, B] lane-column rows (same entry
    order as _pack_contacts), broadcasting lane-shared entries to [B]."""
    gnd, _, _ = _split_forces(force_fns)
    cols = []
    for fn in gnd:
        fp = params["forces"][fn.key]
        E = xp.asarray(fp["E"])
        sides = xp.asarray(fp["sides"]).reshape(3)
        ents = ([sides[k] for k in range(3)]
                + [fp["kn"], fp["kt"], fp["kd"], fp["mu"]]
                + [E[k, 3] for k in range(3)] + [E[k, 2] for k in range(3)])
        for e in ents:
            cols.append(xp.broadcast_to(xp.asarray(e).astype(dtype), (B,)))
    return xp.stack(cols, axis=0)


def _pack_springs_lane(force_fns: Tuple, params: Dict, dtype, B, xp=jnp):
    """Per-lane spring packing: [S*9, B] (entry order of _pack_springs)."""
    _, spr, _ = _split_forces(force_fns)
    cols = []
    for fn in spr:
        fp = params["forces"][fn.key]
        xl1 = xp.asarray(fp["xl1"]).reshape(3)
        xl2 = xp.asarray(fp["xl2"]).reshape(3)
        ents = ([xl1[k] for k in range(3)] + [xl2[k] for k in range(3)]
                + [fp["k"], fp["d"],
                   fp["L"] if "L" in fp else xp.zeros((), dtype)])
        for e in ents:
            cols.append(xp.broadcast_to(xp.asarray(e).astype(dtype), (B,)))
    return xp.stack(cols, axis=0)


def _spring_spec(force_fns: Tuple) -> Tuple:
    """Static spring descriptors (kind, b1, b2, tension) for _build_kernel —
    one per ForcePointPoint / ForceSpringDamper, force_fns order."""
    from redmax_tpu.forces import ForcePointPoint

    _, spr, _ = _split_forces(force_fns)
    return tuple(
        {
            "kind": "pp" if type(fn) is ForcePointPoint else "sd",
            "b1": int(fn.body1), "b2": int(fn.body2),
            "tension": bool(getattr(fn, "tension_only", False)),
        }
        for fn in spr
    )


def _pack_springs(force_fns: Tuple, params: Dict, dtype, xp=jnp):
    """sp [S, 9] rows: xl1[3], xl2[3], k, d, L (0 for point-point springs) —
    one row per spring closure, force_fns order. None when there are none."""
    _, spr, _ = _split_forces(force_fns)
    if not spr:
        return None
    rows = []
    for fn in spr:
        fp = params["forces"][fn.key]
        L = (xp.asarray(fp["L"]).reshape(1) if "L" in fp
             else xp.zeros(1, dtype))
        rows.append(xp.concatenate([
            xp.asarray(fp["xl1"]).reshape(3), xp.asarray(fp["xl2"]).reshape(3),
            xp.asarray(fp["k"]).reshape(1), xp.asarray(fp["d"]).reshape(1), L,
        ]))
    return xp.stack(rows).astype(dtype)


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
    perlane = _perlane_keys(params, force_fns)
    springs = _spring_spec(force_fns)
    if "cp" in perlane:
        gnd_fns, _, _ = _split_forces(force_fns)
        contact_bodies = tuple(int(fn.body) for fn in gnd_fns)
        cp = _pack_contacts_lane(force_fns, params, dtype, B, xp=xp)
    else:
        contact_bodies, cp = _pack_contacts(force_fns, params, dtype, xp=xp)
    sp = (_pack_springs_lane(force_fns, params, dtype, B, xp=xp)
          if "sp" in perlane else _pack_springs(force_fns, params, dtype, xp=xp))
    cables = _cable_spec(force_fns)
    cb = (_pack_cables_lane(force_fns, params, dtype, B, xp=xp)
          if "cb" in perlane else _pack_cables(force_fns, params, dtype, xp=xp))
    kernel = _build_kernel(topo, cfg, "bdf2", lanes=(B,), xp=xp,
                           contact_bodies=contact_bodies, springs=springs,
                           cables=cables, perlane=perlane)
    tau = params["tau"]
    if tau.ndim == 1:
        tau = xp.broadcast_to(tau, (B, nr))
    axes, jsf, bd, gh = _prep_static(topo, params, dtype, xp=xp)
    lane = lambda a: _Ref(xp.ascontiguousarray(a.astype(dtype).T)
                          if xp is np else a.astype(dtype).T, xp)
    out_x = _OutRef((nr, B), dtype, xp)
    out_h = _OutRef((nr * nr, B), dtype, xp)
    ii = params["I_i"].astype(dtype)
    ii_in = lane(ii.reshape(B, N * 6)) if "I_i" in perlane else _Ref(ii, xp)
    bd_in = lane(bd) if "bd" in perlane else _Ref(bd, xp)
    gh_in = lane(gh) if "gh" in perlane else _Ref(gh, xp)
    extra = (_Ref(cp, xp),) if contact_bodies else ()
    if springs:
        extra = extra + (_Ref(sp, xp),)
    if cables:
        extra = extra + (_Ref(cb, xp),)
    kernel(
        lane(x0), lane(q0), lane(qd0), lane(q1), lane(qd1), lane(tau),
        _Ref(params["E0_pj"].astype(dtype), xp),
        _Ref(params["E0_ji"].astype(dtype), xp),
        ii_in, _Ref(axes, xp), _Ref(jsf, xp),
        bd_in, gh_in, *extra, out_x, out_h,
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

    force_fns: the scene's force closures — ForceGroundCuboid /
    ForcePointPoint / ForceSpringDamper (supports() gate); their body
    indices are baked into the kernel and their params packed per call
    (_pack_contacts / _pack_springs).

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
    gnd_fns, _, _ = _split_forces(force_fns)
    contact_bodies = tuple(int(fn.body) for fn in gnd_fns)
    springs = _spring_spec(force_fns)
    cables = _cable_spec(force_fns)
    Ccnt = len(contact_bodies)
    Scnt = len(springs)
    CBtot = sum(3 * len(cb["bodies"]) + 3 for cb in cables)
    kernel = _build_kernel(topo, cfg, "bdf2", contact_bodies=contact_bodies,
                           springs=springs, cables=cables)
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

        # Per-lane physical params (system-ID / domain randomization):
        # rebuild the kernel with the matching read layout when any of
        # I_i / g / h / body_damping / contact / spring coeffs are [B, ...].
        perlane = _perlane_keys(params, force_fns)
        kern = (kernel if not perlane else
                _build_kernel(topo, cfg, "bdf2",
                              contact_bodies=contact_bodies, springs=springs,
                              cables=cables, perlane=perlane))

        axes, jsf, bd, gh = _prep_static(topo, params, dtype)
        if "cp" in perlane:
            cp = _pack_contacts_lane(force_fns, params, dtype, B)
        else:
            _, cp = _pack_contacts(force_fns, params, dtype)
        sp = (_pack_springs_lane(force_fns, params, dtype, B)
              if "sp" in perlane else _pack_springs(force_fns, params, dtype))
        cb = (_pack_cables_lane(force_fns, params, dtype, B)
              if "cb" in perlane else _pack_cables(force_fns, params, dtype))

        def to_tiles(a):  # [B, P] -> [P, G*8, 128]
            P = a.shape[1]
            a = a.astype(dtype)
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (Bp - B, P))], axis=0
                )
            return a.T.reshape(P, G * LANES[0], LANES[1])

        def lane_rows(P):
            return pl.BlockSpec(
                (P, LANES[0], LANES[1]), lambda g: (0, g, 0),
                memory_space=pltpu.VMEM,
            )

        lane_spec = lane_rows(nr)

        def shared(shape):
            zeros = (0,) * len(shape)
            return pl.BlockSpec(shape, lambda g, _z=zeros: _z,
                                memory_space=pltpu.VMEM)

        ii = params["I_i"].astype(dtype)
        if "I_i" in perlane:
            ii_arg, ii_spec = to_tiles(ii.reshape(B, N * 6)), lane_rows(N * 6)
        else:
            ii_arg, ii_spec = ii, shared((N, 6))
        if "bd" in perlane:
            bd_arg, bd_spec = to_tiles(bd), lane_rows(N)
        else:
            bd_arg, bd_spec = bd, shared((1, N))
        if "gh" in perlane:
            gh_arg, gh_spec = to_tiles(gh), lane_rows(4)
        else:
            gh_arg, gh_spec = gh, shared((1, 4))
        cp_specs, cp_args = [], ()
        if Ccnt:
            cp_specs = [lane_rows(Ccnt * 13) if "cp" in perlane
                        else shared((Ccnt, 13))]
            cp_args = (to_tiles(cp.T) if "cp" in perlane else cp,)
        if Scnt:
            cp_specs = cp_specs + [lane_rows(Scnt * 9) if "sp" in perlane
                                   else shared((Scnt, 9))]
            cp_args = cp_args + (to_tiles(sp.T) if "sp" in perlane else sp,)
        if CBtot:
            cp_specs = cp_specs + [lane_rows(CBtot) if "cb" in perlane
                                   else shared((1, CBtot))]
            cp_args = cp_args + (to_tiles(cb.T) if "cb" in perlane else cb,)
        out_x, out_h = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[lane_spec] * 6 + [
                shared((N, 4, 4)), shared((N, 4, 4)), ii_spec,
                shared((N, 3, 3)), shared((7, nr)), bd_spec,
                gh_spec,
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
            ii_arg, axes, jsf, bd_arg, gh_arg, *cp_args,
        )
        x = out_x.reshape(nr, Bp).T[:B]
        Hinv = out_h.reshape(nr, nr, Bp).transpose(2, 0, 1)[:B]
        return x, Hinv

    return solve
