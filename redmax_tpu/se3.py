"""Batched SE(3)/se(3) operations.

Conventions (matching the reference se3 class, matlab-diff/se3.m, so that all
downstream formulas and certificates line up):

  * A twist is phi = [w; v] in R^6, ANGULAR part first.
  * Homogeneous transforms E in R^{4x4}.
  * Adjoint     Ad(E)  = [[R, 0], [hat(p) R, R]]              (se3.m:44)
  * Lie bracket ad(phi)= [[hat(w), 0], [hat(v), hat(w)]]      (se3.m:55)
  * Gamma(r)    = [hat(r)^T, I3] (3x6): x_dot = Gamma(r) phi  (se3.m:38)
  * d/dt Ad(E)  = Ad(E) ad(phi_body)  (equals se3.m:72 Addot)

Every function is written for arbitrary leading batch dimensions: an input of
shape (..., 4, 4) produces an output of shape (..., 6, 6) etc.  All branches
are branchless (jnp.where over Taylor fallbacks) so everything is jit/vmap
safe on TPU with static shapes.
"""

import jax
import jax.numpy as jnp

# Small-angle threshold. The reference uses 1e-9 with exact branching
# (se3.m:5); we use a Taylor-series switchover which keeps full accuracy in
# both regimes and is branchless.
_EPS = 1e-9


def hat3(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix. Reference: se3.brac (se3.m:89)."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def unhat3(S):
    """(..., 3, 3) -> (..., 3). Reference: se3.unbrac (se3.m:101)."""
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def hat6(phi):
    """(..., 6) twist -> (..., 4, 4) matrix [phi]. Reference: se3.brac 6-dof branch."""
    W = hat3(phi[..., :3])
    v = phi[..., 3:, None]
    top = jnp.concatenate([W, v], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :])
    return jnp.concatenate([top, bottom], axis=-2)


def unhat6(S):
    """(..., 4, 4) -> (..., 6)."""
    return jnp.concatenate([unhat3(S[..., :3, :3]), S[..., :3, 3]], axis=-1)


def inv(E):
    """SE(3) inverse. Reference: se3.inv (se3.m:11)."""
    R = E[..., :3, :3]
    p = E[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ p], axis=-1)
    return _with_bottom_row(top)


def _with_bottom_row(top):
    """Append the constant [0 0 0 1] row to a (..., 3, 4) block."""
    bottom = jnp.zeros_like(top[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def make_E(R, p):
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    top = jnp.concatenate([R, p[..., None]], axis=-1)
    return _with_bottom_row(top)


def eye_E(batch_shape=(), dtype=jnp.float64):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (*batch_shape, 4, 4))


def Ad(E):
    """(..., 4, 4) -> (..., 6, 6) adjoint. Reference: se3.Ad (se3.m:44)."""
    R = E[..., :3, :3]
    p = E[..., :3, 3]
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bottom = jnp.concatenate([hat3(p) @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad(phi):
    """(..., 6) -> (..., 6, 6) spatial cross product. Reference: se3.ad (se3.m:55)."""
    W = hat3(phi[..., :3])
    V = hat3(phi[..., 3:])
    Z = jnp.zeros_like(W)
    top = jnp.concatenate([W, Z], axis=-1)
    bottom = jnp.concatenate([V, W], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def Addot(E, phi):
    """Time derivative of Ad(E) given body twist phi: Ad(E) @ ad(phi).

    Identical to the reference's explicit form (se3.m:72):
      [[R hat(w), 0], [R hat(v) + hat(p) R hat(w), R hat(w)]].
    """
    return Ad(E) @ ad(phi)


def Gamma(r):
    """(..., 3) -> (..., 3, 6) point-velocity matrix [hat(r)^T, I3]. se3.m:38."""
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.asarray(r).dtype), (*r.shape[:-1], 3, 3))
    return jnp.concatenate([jnp.swapaxes(hat3(r), -1, -2), I3], axis=-1)


# The trig coefficient functions below take t = theta^2 (NOT theta) so that
# they are smooth functions of w through t = |w|^2 at w = 0. Taking
# jnp.linalg.norm(w) first would make jacfwd produce NaN at w = 0 (the norm
# is not differentiable there), which poisons the Newton Hessian for any
# joint sitting at q = 0.
_T_SMALL = 1e-8  # theta < 1e-4


def _sinc_sq(t):
    """sin(sqrt(t))/sqrt(t) as a smooth function of t = theta^2."""
    small = t < _T_SMALL
    ts = jnp.where(small, 1.0, t)  # keep sqrt away from 0 in the false branch
    th = jnp.sqrt(ts)
    return jnp.where(small, 1.0 - t / 6.0 + t * t / 120.0, jnp.sin(th) / th)


def _cosc_sq(t):
    """(1 - cos(sqrt(t)))/t as a smooth function of t = theta^2."""
    small = t < _T_SMALL
    ts = jnp.where(small, 1.0, t)
    th = jnp.sqrt(ts)
    return jnp.where(small, 0.5 - t / 24.0 + t * t / 720.0, (1.0 - jnp.cos(th)) / ts)


def _sincc_sq(t):
    """(sqrt(t) - sin(sqrt(t)))/t^{3/2} as a smooth function of t = theta^2."""
    small = t < _T_SMALL
    ts = jnp.where(small, 1.0, t)
    th = jnp.sqrt(ts)
    return jnp.where(
        small, 1.0 / 6.0 - t / 120.0 + t * t / 5040.0, (th - jnp.sin(th)) / (ts * th)
    )


def _sinc(x):
    """sin(x)/x, branchless (argument is an angle, not squared)."""
    return _sinc_sq(x * x)


def exp_so3(w):
    """Rodrigues' formula: (..., 3) -> (..., 3, 3). Reference: se3.exp rotational part.

    Smooth at w = 0 (including all jacfwd/jvp derivatives): the coefficients
    are functions of |w|^2 only.
    """
    t = jnp.sum(w * w, axis=-1)
    W = hat3(w)
    W2 = W @ W
    a = _sinc_sq(t)[..., None, None]
    b = _cosc_sq(t)[..., None, None]
    I3 = jnp.eye(3, dtype=w.dtype)
    return I3 + a * W + b * W2


def exp(phi):
    """SE(3) exponential: (..., 6) -> (..., 4, 4). Reference: se3.exp (se3.m:263)."""
    w = phi[..., :3]
    v = phi[..., 3:]
    t = jnp.sum(w * w, axis=-1)
    W = hat3(w)
    W2 = W @ W
    I3 = jnp.eye(3, dtype=phi.dtype)
    R = I3 + _sinc_sq(t)[..., None, None] * W + _cosc_sq(t)[..., None, None] * W2
    # Left Jacobian V = I + cosc * W + sincc * W^2 ; p = V v
    V = I3 + _cosc_sq(t)[..., None, None] * W + _sincc_sq(t)[..., None, None] * W2
    p = (V @ v[..., None])[..., 0]
    return make_E(R, p)


def log_so3(R):
    """SO(3) logarithm: (..., 3, 3) -> (..., 3). Reference: se3.log rotational part.

    Branchless and grad-safe at R = I: the atan2-based angle and the
    theta/(2 sin theta) scale are both expressed through s^2 = |vee(R-R^T)/2|^2,
    smooth at the identity. Near theta = pi accuracy degrades like the
    reference (same (R - R^T) formula, se3.m:309).
    """
    u = unhat3(0.5 * (R - jnp.swapaxes(R, -1, -2)))  # sin(theta) * axis
    s2 = jnp.sum(u * u, axis=-1)                      # sin(theta)^2
    c = 0.5 * (jnp.trace(R, axis1=-2, axis2=-1) - 1.0)  # cos(theta)
    small = s2 < _T_SMALL
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = jnp.arctan2(s, c)
    # scale = theta / sin(theta); near theta=0: 1 + s2/6 + 3 s2^2/40 (in sin^2)
    scale = jnp.where(small, 1.0 + s2 / 6.0 + 0.075 * s2 * s2, theta / s)
    return scale[..., None] * u


def log(E):
    """SE(3) logarithm: (..., 4, 4) -> (..., 6). Reference: se3.log (se3.m:309)."""
    R = E[..., :3, :3]
    p = E[..., :3, 3]
    w = log_so3(R)
    t = jnp.sum(w * w, axis=-1)
    W = hat3(w)
    W2 = W @ W
    I3 = jnp.eye(3, dtype=E.dtype)
    # V from exp(); v = V^{-1} p. Closed-form inverse:
    # V^{-1} = I - W/2 + (1/theta^2)(1 - sinc/(2 cosc)) W^2
    small = t < _T_SMALL
    ts = jnp.where(small, 1.0, t)
    coef = jnp.where(
        small,
        1.0 / 12.0 + t / 720.0,
        (1.0 - _sinc_sq(ts) / (2.0 * _cosc_sq(ts))) / ts,
    )
    Vinv = I3 - 0.5 * W + coef[..., None, None] * W2
    v = (Vinv @ p[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def reparam_exp(w):
    """Exp-map reparameterization away from the 2*pi singularity.

    If |w| > 1.5*pi, replace w by (1 - 2*pi/|w|) * w — same rotation, better
    derivatives. Reference: se3.reparam (se3.m:337), which loops; a single
    application suffices when applied every step (|w| grows by < pi/2 per
    step in practice), and we apply it twice for safety, branchlessly.
    Grad-safe at w = 0: the sqrt argument is clamped to 1 where unused.
    """
    def once(w):
        n2 = jnp.sum(w * w, axis=-1, keepdims=True)
        n = jnp.sqrt(jnp.where(n2 < 1.0, 1.0, n2))
        a = 1.0 - 2.0 * jnp.pi / n
        return jnp.where(n2 > (1.5 * jnp.pi) ** 2, a * w, w)

    return once(once(w))


def aa_to_mat(axis, angle):
    """Axis-angle -> rotation matrix, axis need not be unit. se3.m:111.

    The reference special-cases axis-aligned axes; Rodrigues on the
    normalized axis is identical mathematics (to rounding).
    """
    axis = jnp.asarray(axis)
    n = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    u = axis / jnp.where(n < _EPS, 1.0, n)
    return exp_so3(u * jnp.asarray(angle)[..., None])


def q_to_mat(q):
    """Quaternion [w x y z] -> rotation matrix. Reference: se3.qToMat (se3.m:179)."""
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0 / (qr * qr + qi * qi + qj * qj + qk * qk)
    r00 = 1 - s * (qj * qj + qk * qk)
    r01 = s * (qi * qj - qk * qr)
    r02 = s * (qi * qk + qj * qr)
    r10 = s * (qi * qj + qk * qr)
    r11 = 1 - s * (qi * qi + qk * qk)
    r12 = s * (qj * qk - qi * qr)
    r20 = s * (qi * qk - qj * qr)
    r21 = s * (qj * qk + qi * qr)
    r22 = 1 - s * (qi * qi + qj * qj)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_q(R):
    """Rotation matrix -> quaternion [w x y z], branchless (all four Shepperd
    candidates evaluated, best selected by mask). Reference: se3.matToQ
    (se3.m:202) uses exact branching; results agree up to sign convention.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    # Candidate 0: trace
    S0 = safe_sqrt(tr + 1.0) * 2
    q0 = jnp.stack([0.25 * S0, (m21 - m12) / S0, (m02 - m20) / S0, (m10 - m01) / S0], axis=-1)
    # Candidate 1: m00 dominant
    S1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / S1, 0.25 * S1, (m01 + m10) / S1, (m02 + m20) / S1], axis=-1)
    # Candidate 2: m11 dominant
    S2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / S2, (m01 + m10) / S2, 0.25 * S2, (m12 + m21) / S2], axis=-1)
    # Candidate 3: m22 dominant
    S3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / S3, (m02 + m20) / S3, (m12 + m21) / S3, 0.25 * S3], axis=-1)

    use0 = (tr > 0)[..., None]
    use1 = ((m00 > m11) & (m00 > m22) & ~(tr > 0))[..., None]
    use2 = ((m11 > m22) & ~((m00 > m11) & (m00 > m22)) & ~(tr > 0))[..., None]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q


def dq_to_mat(dq):
    """Dual quaternion [..., 4, 2] (columns: real q0, dual qe) -> SE(3).

    Reference: se3.dqToMat (matlab-diff/se3.m:238-247) after [Kavan et al.],
    t = 2 qe q0* expanded componentwise; the real part is normalized first.
    """
    dq = jnp.asarray(dq)
    q0 = dq[..., 0]
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    qe = dq[..., 1]
    w0, x0, y0, z0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    we, xe, ye, ze = qe[..., 0], qe[..., 1], qe[..., 2], qe[..., 3]
    t = jnp.stack(
        [
            2.0 * (-we * x0 + xe * w0 - ye * z0 + ze * y0),
            2.0 * (-we * y0 + xe * z0 + ye * w0 - ze * x0),
            2.0 * (-we * z0 - xe * y0 + ye * x0 + ze * w0),
        ],
        axis=-1,
    )
    return make_E(q_to_mat(q0), t)


def mat_to_dq(E):
    """SE(3) -> dual quaternion [..., 4, 2] (columns: real, dual).

    Reference: se3.matToDq (matlab-diff/se3.m:249-260): qe = 0.5 t q0 as a
    quaternion product with the pure-vector translation on the left.
    """
    E = jnp.asarray(E)
    t = E[..., :3, 3]
    q0 = mat_to_q(E[..., :3, :3])
    w0, x0, y0, z0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    qe = jnp.stack(
        [
            -0.5 * (tx * x0 + ty * y0 + tz * z0),
            0.5 * (tx * w0 + ty * z0 - tz * y0),
            0.5 * (-tx * z0 + ty * w0 + tz * x0),
            0.5 * (tx * y0 - ty * x0 + tz * w0),
        ],
        axis=-1,
    )
    return jnp.stack([q0, qe], axis=-1)


def rand_E(key, batch_shape=(), dtype=jnp.float64):
    """Random SE(3) transform(s): QR orthonormalization of a Gaussian 3x3
    (Z-axis flipped to force det=+1) and a Gaussian translation.

    Reference: se3.randE (matlab-diff/se3.m:355-363), used to randomize the
    per-joint FD derivative tests (Joint.m:650-784). JAX-idiomatic: explicit
    PRNG key, batchable.
    """
    kR, kt = jax.random.split(key)
    A = jax.random.normal(kR, batch_shape + (3, 3), dtype)
    Q, _ = jnp.linalg.qr(A)
    det = jnp.linalg.det(Q)[..., None]
    Q = Q.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    t = jax.random.normal(kt, batch_shape + (3,), dtype)
    return make_E(Q, t)


def inertia_cuboid(whd, density):
    """Diagonal 6-vector body inertia of a cuboid (w, h, d). se3.m:366.

    Order: [Ixx, Iyy, Izz, m, m, m] matching the [w; v] twist layout.
    """
    whd = jnp.asarray(whd)
    mass = density * jnp.prod(whd, axis=-1)
    w2 = whd * whd
    ixx = (1.0 / 12.0) * mass * (w2[..., 1] + w2[..., 2])
    iyy = (1.0 / 12.0) * mass * (w2[..., 2] + w2[..., 0])
    izz = (1.0 / 12.0) * mass * (w2[..., 0] + w2[..., 1])
    return jnp.stack([ixx, iyy, izz, mass, mass, mass], axis=-1)


def inertia_sphere(radius, density):
    """Diagonal inertia of a solid sphere. Reference: BodySphere (matlab/+redmax/BodySphere.m:18)."""
    radius = jnp.asarray(radius)
    mass = density * (4.0 / 3.0) * jnp.pi * radius**3
    i = 0.4 * mass * radius * radius
    return jnp.stack(jnp.broadcast_arrays(i, i, i, mass, mass, mass), axis=-1)


def inertia_cylinder(radius, height, density):
    """Diagonal inertia of a solid cylinder with axis along Z.

    Reference: BodyCylinder (matlab/+redmax/BodyCylinder.m:20).
    """
    radius = jnp.asarray(radius)
    mass = density * jnp.pi * radius * radius * height
    ix = mass * (3.0 * radius * radius + height * height) / 12.0
    iz = 0.5 * mass * radius * radius
    return jnp.stack(jnp.broadcast_arrays(ix, ix, iz, mass, mass, mass), axis=-1)
