"""The 12 Euler-angle charts for ball joints, branchless and batched.

The reference implements these as ~1,500 lines of MATLAB symbolic codegen
(matlab-diff/+redmax/JointSpherical.m:342-1965: 12 chart functions XYX..ZYX
returning R, dRdq, Rdot, dRdotdq, T, detT, dTdq, Tdot, dTdotdq, plus 12
inverses). Here each chart is R = R_a(q1) R_b(q2) R_c(q3) for an axis triple
(a, b, c) from a static 12-row table; derivatives come from autodiff, and the
angle extraction (inverse) uses two generic closed forms:

  Tait-Bryan (a,b,c distinct), eps = parity of (a,b,c):
      beta  = asin(eps * R[a,c])
      alpha = atan2(-eps * R[b,c], R[c,c])
      gamma = atan2(-eps * R[a,b], R[a,a])
  Proper Euler (a == c), third axis n, eps = parity of (a,b,n):
      beta  = acos(R[a,a])
      alpha = atan2(R[b,a], -eps * R[n,a])
      gamma = atan2(R[a,b],  eps * R[a,n])

Chart order matches the reference constants (JointSpherical.m:4-17):
0 XYX, 1 XZX, 2 YZY, 3 YXY, 4 ZXZ, 5 ZYZ,
6 XYZ, 7 XZY, 8 YZX, 9 YXZ, 10 ZXY, 11 ZYX.
The default chart is XYZ (index 6; reference CHART_XYZ = 7, 1-based).
"""

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3

# Axis triples (a, b, c) per chart, 0-based axes x=0, y=1, z=2.
AXES = np.array(
    [
        [0, 1, 0], [0, 2, 0], [1, 2, 1], [1, 0, 1], [2, 0, 2], [2, 1, 2],
        [0, 1, 2], [0, 2, 1], [1, 2, 0], [1, 0, 2], [2, 0, 1], [2, 1, 0],
    ],
    dtype=np.int32,
)
# Parity eps of (a, b, c) for Tait-Bryan charts; for proper-Euler charts,
# parity of (a, b, n) where n is the third axis.
_THIRD = np.array([3 - (t[0] + t[1]) if t[0] == t[2] else t[2] for t in AXES])
_PROPER = np.array([t[0] == t[2] for t in AXES])


def _parity(a, b, c):
    return 1 if [a, b, c] in ([0, 1, 2], [1, 2, 0], [2, 0, 1]) else -1


EPS_SIGN = np.array(
    [
        _parity(t[0], t[1], int(_THIRD[i])) if _PROPER[i] else _parity(*t)
        for i, t in enumerate(AXES.tolist())
    ],
    dtype=np.int32,
)

DEFAULT_CHART = 6  # XYZ


def _axis_rot(axis_idx, theta):
    """Rotation about coordinate axis axis_idx (traced int) by theta."""
    e = jax.nn.one_hot(axis_idx, 3, dtype=theta.dtype)
    return se3.exp_so3(e * theta)


def euler_R(chart, q):
    """Chart rotation R_a(q1) R_b(q2) R_c(q3). chart: int scalar in [0, 12)."""
    t = jnp.asarray(AXES)[chart]
    return _axis_rot(t[0], q[0]) @ _axis_rot(t[1], q[1]) @ _axis_rot(t[2], q[2])


def euler_T(chart, q):
    """Body angular-velocity map T (the reference's T): w_body = T qdot.

    Closed form (replacing the symbolic T of JointSpherical.XYZ et al.):
    for R = Ra(q1) Rb(q2) Rc(q3), T[:, k] = unhat(R^T dR/dq_k) collapses to

        T = [ Rc^T Rb^T e_a,  Rc^T e_b,  e_c ]

    — each later factor conjugates the earlier axis into the body frame.
    Equal to the jacfwd identity to machine precision
    (tests/test_derivatives.py::test_euler_T_closed_form); keeping it
    closed-form keeps S/Sdot and the adjoint's residual VJP first-order
    instead of differentiating through jacfwd of the chart switch.
    """
    t = jnp.asarray(AXES)[chart]
    ea = jax.nn.one_hot(t[0], 3, dtype=q.dtype)
    eb = jax.nn.one_hot(t[1], 3, dtype=q.dtype)
    ec = jax.nn.one_hot(t[2], 3, dtype=q.dtype)
    Rb = _axis_rot(t[1], q[1])
    Rc = _axis_rot(t[2], q[2])
    return jnp.stack([Rc.T @ (Rb.T @ ea), Rc.T @ eb, ec], axis=-1)


def euler_detT(chart, q):
    return jnp.linalg.det(euler_T(chart, q))


def euler_inv_all(R):
    """Angle extraction for ALL 12 charts at once: R [3,3] -> q [12, 3].

    Evaluates the Tait-Bryan and proper-Euler closed forms over the static
    chart table, selecting per chart — fully branchless (the chart-switch
    logic in reparam needs all 12 anyway, JointSpherical.m:75-83).
    """
    dtype = R.dtype
    a, b, c = AXES[:, 0], AXES[:, 1], AXES[:, 2]
    n = _THIRD
    eps = jnp.asarray(EPS_SIGN, dtype=dtype)
    proper = jnp.asarray(_PROPER)

    # Tait-Bryan
    s_beta = jnp.clip(eps * R[a, c], -1.0, 1.0)
    beta_tb = jnp.arcsin(s_beta)
    alpha_tb = jnp.arctan2(-eps * R[b, c], R[c, c])
    gamma_tb = jnp.arctan2(-eps * R[a, b], R[a, a])

    # Proper Euler
    beta_pe = jnp.arccos(jnp.clip(R[a, a], -1.0, 1.0))
    alpha_pe = jnp.arctan2(R[b, a], -eps * R[n, a])
    gamma_pe = jnp.arctan2(R[a, b], eps * R[a, n])

    q_tb = jnp.stack([alpha_tb, beta_tb, gamma_tb], axis=-1)
    q_pe = jnp.stack([alpha_pe, beta_pe, gamma_pe], axis=-1)
    return jnp.where(proper[:, None], q_pe, q_tb).astype(dtype)


def euler_inv(chart, R):
    """Angle extraction for one chart (reference getEulerInv)."""
    return euler_inv_all(R)[chart]


def reparam_spherical(chart, q, qdot, q1, qdot1):
    """Chart-switching reparameterization (JointSpherical.reparam_, :63-103).

    If |det T(chart, q)| <= 0.5, re-express the current and previous rotations
    in the chart maximizing min(|detT(R)|, |detT(R1)|) over all 12 charts,
    remapping qdot via T_new^{-1} T_old qdot. Branchless: both paths are
    computed and selected by mask (the switch is rare but must be jittable).
    Returns (chart', q', qdot', q1', qdot1').
    """
    T_old = euler_T(chart, q)
    detT = jnp.linalg.det(T_old)
    keep = jnp.abs(detT) > 0.5

    R = euler_R(chart, q)
    R1 = euler_R(chart, q1)

    q_all = euler_inv_all(R)        # [12,3]
    q1_all = euler_inv_all(R1)

    detT_all = jax.vmap(lambda k, qq: euler_detT(k, qq))(jnp.arange(12), q_all)
    detT1_all = jax.vmap(lambda k, qq: euler_detT(k, qq))(jnp.arange(12), q1_all)
    score = jnp.minimum(
        jnp.nan_to_num(jnp.abs(detT_all)), jnp.nan_to_num(jnp.abs(detT1_all))
    )
    new_chart = jnp.argmax(score).astype(chart.dtype)

    q_new = q_all[new_chart]
    T_new = euler_T(new_chart, q_new)
    qdot_new = jnp.linalg.solve(T_new, T_old @ qdot)

    q1_new = q1_all[new_chart]
    T1_old = euler_T(chart, q1)
    T1_new = euler_T(new_chart, q1_new)
    qdot1_new = jnp.linalg.solve(T1_new, T1_old @ qdot1)

    sel = lambda new, old: jnp.where(keep, old, new)
    return (
        sel(new_chart, chart),
        sel(q_new, q),
        sel(qdot_new, qdot),
        sel(q1_new, q1),
        sel(qdot1_new, qdot1),
    )
