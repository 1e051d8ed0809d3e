"""Per-joint-type kernels.

Each joint type is fully specified by its local transform ``Q(q, params)``
(child-joint frame wrt parent-joint frame at the joint). Everything else the
reference hand-derives per type — the motion subspace S, its time derivative
Sdot, the adjoint A = Ad(Q) with Adot, dAdq, dAdotdq, dSdq, dSdotdq
(matlab-diff/+redmax/Joint*.m update_) — follows from two exact identities:

    S_k    = unhat6( Q^{-1} dQ/dq_k )        (definition of the body Jacobian)
    d/dt Ad(Q) = Ad(Q) ad(S qdot)            (chain rule on the Lie group)

computed here by forward-mode autodiff (jax.jacfwd / jax.jvp) at trace time.
This replaces ~2500 lines of hand-derived MATLAB (including the symbolic
codegen of JointUniversal.m:74-130 and JointSpherical.m:241-1807) with exact,
jit-compiled derivatives. Closed-form S overrides are provided where S is
constant (revolute/prismatic/translational/planar) to skip the autodiff pass.

All kernels are written for a single joint (q: [d]) and vmapped over type
groups by the model layer.
"""

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from redmax_tpu import euler, se3
from redmax_tpu.types import NDOF, JointType


class JointKernel(NamedTuple):
    """Type kernel: Q_fn(q, params) -> [4,4]; S_fn optional closed form.

    reparam_fn(q, qdot, params) -> (q, qdot) applies the post-step
    reparameterization (exp-map rescale / chart switch); identity if None.
    """

    Q_fn: Callable
    S_fn: Optional[Callable] = None
    reparam_fn: Optional[Callable] = None


# ---------------------------------------------------------------------------
# Q(q) definitions per type
# ---------------------------------------------------------------------------


def _Q_fixed(q, params):
    # JointFixed: welds the frames (matlab-diff/+redmax/JointFixed.m)
    return jnp.eye(4, dtype=q.dtype)


def _Q_revolute(q, params):
    # JointRevolute.update_ (matlab-diff/+redmax/JointRevolute.m:29): rotation
    # about a fixed unit axis stored in params["axis"].
    R = se3.exp_so3(params["axis"] * q[0])
    return se3.make_E(R, jnp.zeros(3, dtype=R.dtype))


def _S_revolute(q, params):
    a = params["axis"]
    return jnp.concatenate([a, jnp.zeros(3, dtype=a.dtype)])[:, None]


def _Q_prismatic(q, params):
    # JointPrismatic.update_ (matlab-diff/+redmax/JointPrismatic.m:28):
    # translation along a fixed unit axis.
    a = params["axis"]
    return se3.make_E(jnp.eye(3, dtype=a.dtype), a * q[0])


def _S_prismatic(q, params):
    a = params["axis"]
    return jnp.concatenate([jnp.zeros(3, dtype=a.dtype), a])[:, None]


def _Q_planar(q, params):
    # JointPlanar.update_ (matlab-diff/+redmax/JointPlanar.m:24): translation
    # in the span of the 3x2 orthonormal basis params["plane"].
    B = params["plane"]
    return se3.make_E(jnp.eye(3, dtype=B.dtype), B @ q)


def _S_planar(q, params):
    B = params["plane"]
    return jnp.concatenate([jnp.zeros((3, 2), dtype=B.dtype), B], axis=0)


def _Q_translational(q, params):
    # JointTranslational.update_ (matlab-diff/+redmax/JointTranslational.m:20).
    return se3.make_E(jnp.eye(3, dtype=q.dtype), q)


def _S_translational(q, params):
    z = jnp.zeros((3, 3), dtype=q.dtype)
    return jnp.concatenate([z, jnp.eye(3, dtype=q.dtype)], axis=0)


def _Q_universal(q, params):
    # JointUniversal.XY (matlab-diff/+redmax/JointUniversal.m:74): R = Rx(q1) Ry(q2).
    dtype = q.dtype
    ex = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
    ey = jnp.array([0.0, 1.0, 0.0], dtype=dtype)
    R = se3.exp_so3(ex * q[0]) @ se3.exp_so3(ey * q[1])
    return se3.make_E(R, jnp.zeros(3, dtype=dtype))


def _S_universal(q, params):
    # Closed form (JointUniversal.m:74-130 codegen result): for R = Rx Ry,
    # col0 = unhat(R^T dR/dq0) = Ry^T ex = [c1, 0, s1], col1 = ey.
    dtype = q.dtype
    z = jnp.zeros((), dtype)
    c1, s1 = jnp.cos(q[1]), jnp.sin(q[1])
    col0 = jnp.stack([c1, z, s1, z, z, z])
    col1 = jnp.stack([z, 1.0 + z, z, z, z, z])
    return jnp.stack([col0, col1], axis=-1)


def _Q_spherical(q, params):
    # JointSphericalExp.update_ (matlab/+redmax/JointSphericalExp.m:49):
    # R = exp(hat(q)); S is the right/body Jacobian of SO(3) (closed form
    # below, matching JointSphericalExp.m:49-91).
    R = se3.exp_so3(q)
    return se3.make_E(R, jnp.zeros(3, dtype=q.dtype))


def so3_right_jacobian(r):
    """Body Jacobian of exp_so3 at r — the SO(3) right Jacobian

        Jr(r) = I - a(s) W + b(s) W^2,  s = |r|^2, W = hat(r),
        a = (1-cos t)/t^2, b = (t - sin t)/t^3  (t = |r|)

    as a smooth closed form: every coefficient an EVEN function of t written
    in s, Taylor below s = 0.04 where the trig forms cancel in f32 (the se3
    guard family — jvp/vjp-safe at r = 0). Equal to jacfwd of exp_so3 to
    machine precision at a fraction of the graph: this is the exp-map
    S (JointSphericalExp.m:49-91), evaluated per joint in the residual AND
    per lane per step in the batched reparam, and its closed form keeps the
    adjoint's residual-VJP first-order instead of third-order
    (vjp∘jvp∘jacfwd of exp_so3)."""
    dtype = r.dtype
    s = jnp.dot(r, r)
    sg = jnp.maximum(s, jnp.asarray(1e-12, dtype))
    th = jnp.sqrt(sg)
    small = s < 0.04
    a = jnp.where(small, 0.5 - s / 24.0 + s * s / 720.0,
                  (1.0 - jnp.cos(th)) / sg)
    b = jnp.where(small, 1.0 / 6.0 - s / 120.0 + s * s / 5040.0,
                  (th - jnp.sin(th)) / (sg * th))
    W = se3.hat3(r)
    return jnp.eye(3, dtype=dtype) - a * W + b * (W @ W)


def so3_right_jacobian_inv(r):
    """Closed-form inverse of the SO(3) right Jacobian:

        Jr(r)^-1 = I + W/2 + d(s) W^2,  d = (1 - (t/2) cot(t/2)) / s

    (s = |r|^2, t = |r|, W = hat(r)); Taylor d = 1/12 + s/720 + s^2/30240
    + s^3/1209600 below a DTYPE-DEPENDENT threshold: the closed form
    subtracts two nearly-equal terms, so f32 wants the wide Taylor branch
    (s < 1: truncation 2e-8 < f32 eps, cancellation avoided), while f64
    wants the narrow one (s < 0.04: truncation 5e-14, and f64 carries the
    cancellation harmlessly above it). Valid for t < 2*pi; reparam keeps
    its inputs at t <= 1.5*pi where cot(t/2) is regular. Gated by
    tests/test_derivatives.py::test_so3_right_jacobian_inv (product
    check)."""
    dtype = r.dtype
    s = jnp.dot(r, r)
    sg = jnp.maximum(s, jnp.asarray(1e-12, dtype))
    th = jnp.sqrt(sg)
    half = 0.5 * th
    small = s < (1.0 if dtype == jnp.float32 else 0.04)
    # cot(t/2) = cos(t/2)/sin(t/2); sin(t/2) > 0 for 0 < t <= 1.5*pi.
    sn = jnp.sin(half)
    cs = jnp.cos(half)
    d = jnp.where(
        small,
        1.0 / 12.0 + s / 720.0 + s * s / 30240.0 + s * s * s / 1209600.0,
        (1.0 - half * cs / jnp.where(small, jnp.ones((), dtype), sn)) / sg,
    )
    W = se3.hat3(r)
    return jnp.eye(3, dtype=dtype) + 0.5 * W + d * (W @ W)


def _S_spherical(q, params):
    # S = [Jr(q); 0]: unhat6(Q^-1 dQ/dq_k) has rotation part = Jr column k,
    # zero translation (Q is a pure rotation).
    return jnp.concatenate(
        [so3_right_jacobian(q), jnp.zeros((3, 3), dtype=q.dtype)], axis=0
    )


def _Q_free2d(q, params):
    # JointFree2D.update_ (matlab-diff/+redmax/JointFree2D.m:19): planar x, y, theta.
    dtype = q.dtype
    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=dtype)
    R = R.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    p = jnp.stack([q[0], q[1], jnp.zeros((), dtype=dtype)])
    return se3.make_E(R, p)


def _S_free2d(q, params):
    # Q = [Rz(th) | (x, y, 0)]: col_x = [0; Rz^T ex], col_y = [0; Rz^T ey],
    # col_th = [ez; 0].
    dtype = q.dtype
    z = jnp.zeros((), dtype)
    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    return jnp.stack([
        jnp.stack([z, z, z, c, -s, z]),
        jnp.stack([z, z, z, s, c, z]),
        jnp.stack([z, z, 1.0 + z, z, z, z]),
    ], axis=-1)


def _Q_spherical_euler(q, params):
    # JointSpherical.update_ (matlab-diff/+redmax/JointSpherical.m:105-129):
    # R from the joint's current Euler chart; the chart index is dynamic
    # per-joint state delivered via params["chart"] (from State.aux).
    # S = [T; 0] and all derivatives follow by AD of euler_R.
    R = euler.euler_R(params["chart"], q)
    return se3.make_E(R, jnp.zeros(3, dtype=q.dtype))


def _S_spherical_euler(q, params):
    # S = [T(chart, q); 0] — the chart's body angular-velocity map
    # (euler.euler_T closed form).
    return jnp.concatenate(
        [euler.euler_T(params["chart"], q),
         jnp.zeros((3, 3), dtype=q.dtype)], axis=0
    )


def _Q_free3d_euler(q, params):
    # JointFree3D.update_ (matlab-diff/+redmax/JointFree3D.m:34-66):
    # Q = [R(q[3:6]) | p = q[0:3]] with the rotation from the Euler chart.
    R = euler.euler_R(params["chart"], q[3:6])
    return se3.make_E(R, q[0:3])


def _S_free3d_euler(q, params):
    # Translation cols k = [0; R^T e_k], rotation cols = [T col k; 0]
    # (the FREE3D decomposition with the chart rotation).
    R = euler.euler_R(params["chart"], q[3:6])
    T = euler.euler_T(params["chart"], q[3:6])
    z3 = jnp.zeros((3, 3), dtype=q.dtype)
    return jnp.concatenate(
        [jnp.concatenate([z3, R.T], axis=0),
         jnp.concatenate([T, z3], axis=0)], axis=1
    )


def _Q_free3d(q, params):
    # JointFree3D (matlab-diff/+redmax/JointFree3D.m): composite of
    # JointTranslational (q[0:3]) then a ball joint (q[3:6], exp coords here
    # instead of the reference's Euler charts): Q = trans(p) * rot(exp(r)).
    R = se3.exp_so3(q[3:6])
    return se3.make_E(R, q[0:3])


def _S_free3d(q, params):
    # Q = [R | p]: translation cols k = [0; R^T e_k] (Q^-1 dQ/dp_k picks the
    # k-th row of R), rotation cols = [Jr col k; 0].
    R = se3.exp_so3(q[3:6])
    z3 = jnp.zeros((3, 3), dtype=q.dtype)
    return jnp.concatenate(
        [jnp.concatenate([z3, R.T], axis=0),
         jnp.concatenate([so3_right_jacobian(q[3:6]), z3], axis=0)], axis=1
    )


def _Q_free_st(q, params):
    # JointFree (matlab/+redmax/JointFree.m:33-46, gear GJointFreeST port):
    # Q = Q_spherical(q[0:3]) * Q_translational(q[3:6]) = SE3(R, R p) —
    # the translation acts in the ROTATED frame (unlike FREE3D).
    R = se3.exp_so3(q[0:3])
    return se3.make_E(R, R @ q[3:6])


def _S_free_st(q, params):
    # Composite identity S = [Ad(Q2^-1) S1, S2] with Q1 = rot(exp(r)),
    # Q2 = trans(p): rotation cols k = [Jr_k; -hat(p) Jr_k], translation
    # cols = [0; e_k].
    dtype = q.dtype
    Jr = so3_right_jacobian(q[0:3])
    z3 = jnp.zeros((3, 3), dtype=dtype)
    return jnp.concatenate(
        [jnp.concatenate([Jr, -se3.hat3(q[3:6]) @ Jr], axis=0),
         jnp.concatenate([z3, jnp.eye(3, dtype=dtype)], axis=0)], axis=1
    )


def _Q_composite_rp(q, params):
    # JointComposite (matlab/+redmax/JointComposite.m:38-72): Q = Q1 Q2 with
    # S = [Ad(Q2^{-1}) S1, S2] — here joint1 = revolute(axis1), joint2 =
    # prismatic(axis2) (the scene-19 composite); S and derivatives by AD.
    R = se3.exp_so3(params["axis1"] * q[0])
    Q1 = se3.make_E(R, jnp.zeros(3, dtype=q.dtype))
    Q2 = se3.make_E(jnp.eye(3, dtype=q.dtype), params["axis2"] * q[1])
    return Q1 @ Q2


def _S_composite_rp(q, params):
    # S = [Ad(Q2^-1) S1, S2], S1 = [a1; 0], S2 = [0; a2], Q2 = trans(a2 q1):
    # col0 = [a1; -q1 (a2 x a1)], col1 = [0; a2].
    a1, a2 = params["axis1"], params["axis2"]
    z3 = jnp.zeros(3, dtype=q.dtype)
    col0 = jnp.concatenate([a1, -q[1] * jnp.cross(a2, a1)])
    col1 = jnp.concatenate([z3, a2])
    return jnp.stack([col0, col1], axis=-1)


# Cubic B-spline coefficient matrix (JointSplineCurve.B, :15-20).
import numpy as _np

_BSPLINE = _np.array(
    [[1, -3, 3, -1], [4, 0, -6, 3], [1, 3, 3, -3], [0, 0, 0, 1]], dtype=_np.float64
) / 6.0
# Btilde row sums for i = 2, 3, 4 (Bsum, JointSplineCurve.m:187-201).
_BSUM_ROWS = {i: _BSPLINE[i - 1:].sum(axis=0) for i in (2, 3, 4)}
# Basis twists of the surface joint (JointSplineSurface.E, Eq. 25).
_SURF_E = _np.array(
    [
        [0, 0, 0, 1, 0, 0], [0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0],
    ],
    dtype=_np.float64,
)


def _Q_spline_curve(q, params):
    # JointSplineCurve.evalQ (matlab/+redmax/JointSplineCurve.m:112-139),
    # [Lee & Terzopoulos 2008]: cyclic cubic B-spline curve of control
    # frames. Q = C_k * prod_{i=2..4} exp(dC_{k+i} * Btilde_i(q - k)).
    # S, Sdot come from AD of this function (replacing evalS, :141-176);
    # floor() has zero derivative so the within-cell derivatives are exact.
    Cs = params["Cs"]                      # [ncfs, 4, 4]
    dCs = params["dCs"]                    # [ncfs, 6]
    ncfs = Cs.shape[0]
    dtype = q.dtype
    qq = jnp.mod(q[0], ncfs)
    k = jnp.clip(jnp.floor(qq), 0, ncfs - 1)
    ql = qq - k
    k = k.astype(jnp.int32)
    Q = Cs[k]
    qvec = jnp.stack([jnp.ones((), dtype), ql, ql * ql, ql**3])
    for i in (2, 3, 4):
        ki = jnp.mod(k + i - 1, ncfs)
        bsum = jnp.asarray(_BSUM_ROWS[i], dtype=dtype) @ qvec
        Q = Q @ se3.exp(dCs[ki] * bsum)
    return Q


def _Q_spline_surface(q, params):
    # JointSplineSurface.evalQ (matlab/+redmax/JointSplineSurface.m:85-95):
    # Q = prod_{i=1..6} exp(e_i * phi_i(q)), phi_i = q2^T B^T C_i B q1
    # over a single 4x4 patch of control values. S/Sdot by AD (evalS
    # replaced, :97-126).
    cs = params["cs"]                      # [4, 4, 6]
    dtype = q.dtype
    B = jnp.asarray(_BSPLINE, dtype=dtype)
    q1, q2 = q[0], q[1]
    q1v = jnp.stack([jnp.ones((), dtype), q1, q1 * q1, q1**3])
    q2v = jnp.stack([jnp.ones((), dtype), q2, q2 * q2, q2**3])
    E = jnp.asarray(_SURF_E, dtype=dtype)
    Q = jnp.eye(4, dtype=dtype)
    left = B @ q2v                        # (q2vec' B')' = B q2v
    right = B @ q1v
    for i in range(6):
        phi = left @ (cs[:, :, i] @ right)
        Q = Q @ se3.exp(E[:, i] * phi)
    return Q


# ---------------------------------------------------------------------------
# Reparameterization (post-step, keeps exp coordinates away from singularity)
# ---------------------------------------------------------------------------


def _make_exp_reparam(rot_slice):
    """Reparam for exp-coordinate rotation DOFs at q[rot_slice].

    Mirrors JointSphericalExp.reparam_ (matlab/+redmax/JointSphericalExp.m:31):
    rescale w when |w| > 1.5*pi, then remap qdot so the physical angular
    velocity is preserved: qdot_new = S(q_new)^{-1} S(q_old) qdot_old, using
    the rotational 3x3 blocks of the motion subspace.
    """

    def reparam(q, qdot, params):
        r = q[rot_slice]
        rdot = qdot[rot_slice]
        r_new = se3.reparam_exp(r)
        changed = jnp.any(jnp.abs(r_new - r) > 0)
        # Physical angular velocity preserved: omega = Jr(r) rdot, so
        # rdot_new = Jr(r_new)^-1 Jr(r) rdot — both closed forms. (The
        # r4 jnp.linalg.solve here was THE spherical-pipeline bottleneck:
        # a per-step batched 3x3 LU on TPU cost 8x the entire fused
        # forward solve, benchmarks/sph_profile.json.)
        rdot_new = jnp.where(
            changed,
            so3_right_jacobian_inv(r_new) @ (so3_right_jacobian(r) @ rdot),
            rdot,
        )
        q = q.at[rot_slice].set(r_new)
        qdot = qdot.at[rot_slice].set(rdot_new)
        return q, qdot

    return reparam


KERNELS: Dict[JointType, JointKernel] = {
    JointType.FIXED: JointKernel(_Q_fixed),
    JointType.REVOLUTE: JointKernel(_Q_revolute, _S_revolute),
    JointType.PRISMATIC: JointKernel(_Q_prismatic, _S_prismatic),
    JointType.PLANAR: JointKernel(_Q_planar, _S_planar),
    JointType.TRANSLATIONAL: JointKernel(_Q_translational, _S_translational),
    JointType.UNIVERSAL: JointKernel(_Q_universal, _S_universal),
    JointType.SPHERICAL: JointKernel(
        _Q_spherical, _S_spherical, reparam_fn=_make_exp_reparam(slice(0, 3))
    ),
    JointType.FREE2D: JointKernel(_Q_free2d, _S_free2d),
    JointType.FREE3D: JointKernel(
        _Q_free3d, _S_free3d, reparam_fn=_make_exp_reparam(slice(3, 6))
    ),
    # Chart switching is handled by model.reparam_all (needs previous-step
    # state and the chart aux), not by a per-kernel reparam_fn.
    JointType.SPHERICAL_EULER: JointKernel(_Q_spherical_euler,
                                           _S_spherical_euler),
    JointType.FREE3D_EULER: JointKernel(_Q_free3d_euler, _S_free3d_euler),
    JointType.SPLINE_CURVE: JointKernel(_Q_spline_curve),
    JointType.SPLINE_SURFACE: JointKernel(_Q_spline_surface),
    JointType.COMPOSITE_RP: JointKernel(_Q_composite_rp, _S_composite_rp),
    JointType.FREE_ST: JointKernel(
        _Q_free_st, _S_free_st, reparam_fn=_make_exp_reparam(slice(0, 3))
    ),
}


def make_composite(jt1: JointType, jt2: JointType) -> JointKernel:
    """General two-joint composition (matlab/+redmax/JointComposite.m:38-72):

        Q = Q1(q[:n1], p1) @ Q2(q[n1:], p2)

    The reference hand-assembles S = [Ad(Q2^{-1}) S1, S2] and its derivative
    stacks; here that identity is a THEOREM of derive_S applied to the
    composed Q — unhat6(Q^{-1} dQ/dq) over the product splits into exactly
    those blocks — so any (type1, type2) pair composes with exact S/Sdot and
    no per-pair code (verified against the hand-assembled formula for
    revolute∘spherical and prismatic∘universal in tests/test_derivatives.py).

    Sub-joint params live in params["p1"] / params["p2"]; the post-step
    reparameterizations of the sub-joints (e.g. exp-map rescale of a
    spherical member) compose slice-wise.

    Scene-level note: a composite joint is exactly equivalent to chaining
    joint1 (owning a massless body at the joint frame) and joint2 with
    E_pj = I — SceneBuilder.joint_composite desugars arbitrary pairs that
    way, so compiled scenes keep one static JointType per joint row.
    """
    k1, k2 = KERNELS[jt1], KERNELS[jt2]
    n1 = NDOF[jt1]

    def Q_fn(q, params):
        return k1.Q_fn(q[:n1], params.get("p1", {})) @ k2.Q_fn(
            q[n1:], params.get("p2", {})
        )

    reparam_fn = None
    if k1.reparam_fn is not None or k2.reparam_fn is not None:

        def reparam_fn(q, qdot, params):
            qa, qda = q[:n1], qdot[:n1]
            qb, qdb = q[n1:], qdot[n1:]
            if k1.reparam_fn is not None:
                qa, qda = k1.reparam_fn(qa, qda, params.get("p1", {}))
            if k2.reparam_fn is not None:
                qb, qdb = k2.reparam_fn(qb, qdb, params.get("p2", {}))
            return (
                jnp.concatenate([qa, qb]),
                jnp.concatenate([qda, qdb]),
            )

    return JointKernel(Q_fn, reparam_fn=reparam_fn)


def composite_S_reference(jt1: JointType, jt2: JointType, q, params):
    """The reference's hand-assembled composite subspace
    S = [Ad(Q2^{-1}) S1, S2] (JointComposite.m:56-60) — used as the oracle
    the derive_S-based composition is tested against."""
    k1, k2 = KERNELS[jt1], KERNELS[jt2]
    n1 = NDOF[jt1]
    S1f = k1.S_fn if k1.S_fn is not None else derive_S(k1.Q_fn)
    S2f = k2.S_fn if k2.S_fn is not None else derive_S(k2.Q_fn)
    p1 = params.get("p1", {})
    p2 = params.get("p2", {})
    S1 = S1f(q[:n1], p1)
    S2 = S2f(q[n1:], p2)
    Q2 = k2.Q_fn(q[n1:], p2)
    return jnp.concatenate([se3.Ad(se3.inv(Q2)) @ S1, S2], axis=-1)


def derive_S(Q_fn: Callable) -> Callable:
    """Exact motion subspace from Q alone: S_k = unhat6(Q^{-1} dQ/dq_k)."""

    def S_fn(q, params):
        d = q.shape[0]
        if d == 0:
            return jnp.zeros((6, 0), dtype=q.dtype)
        Q = Q_fn(q, params)
        dQ = jax.jacfwd(lambda qq: Q_fn(qq, params))(q)  # [4,4,d]
        Qinv = se3.inv(Q)
        cols = [se3.unhat6(Qinv @ dQ[:, :, k]) for k in range(d)]
        return jnp.stack(cols, axis=-1)

    return S_fn


def joint_QSSdot(jt: JointType, q, qdot, params):
    """Evaluate (Q [4,4], S [6,d], Sdot [6,d]) for one joint.

    Sdot = (dS/dq) qdot via one jvp — exact, replacing every hand-derived
    Sdot/dSdq in the reference joint classes.
    """
    kern = KERNELS[jt]
    d = NDOF[jt]
    S_fn = kern.S_fn if kern.S_fn is not None else derive_S(kern.Q_fn)
    Q = kern.Q_fn(q, params)
    if d == 0:
        S = jnp.zeros((6, 0), dtype=Q.dtype)
        Sdot = S
    elif kern.S_fn is not None and jt in (
        JointType.REVOLUTE,
        JointType.PRISMATIC,
        JointType.TRANSLATIONAL,
        JointType.PLANAR,
    ):
        # S constant in q for these types -> Sdot = 0.
        S = S_fn(q, params)
        Sdot = jnp.zeros_like(S)
    else:
        S, Sdot = jax.jvp(lambda qq: S_fn(qq, params), (q,), (qdot,))
    return Q, S, Sdot


def joint_reparam(jt: JointType, q, qdot, params):
    kern = KERNELS[jt]
    if kern.reparam_fn is None:
        return q, qdot
    return kern.reparam_fn(q, qdot, params)
