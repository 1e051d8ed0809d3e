"""Force modules: point springs, spring-dampers, cables, penalty ground contact.

The reference Force hierarchy (matlab-diff/+redmax/Force*.m) accumulates
(fr, fm) plus hand-derived stiffness/damping blocks (Kr, Km, Dr, Dm). Here a
force is a pure closure

    fn(params, kin, J, phi, q, qdot) -> (fr_add [nr], fm_add [N, 6])

registered on the compiled scene; K/D blocks come from autodiff of the
assembly (dynamics.compute_values), so force authors write values only —
the reference's ~700 lines of hand-derived force Jacobians (e.g.
ForcePointPoint.m:95-141, ForceGroundCuboid.m:103-150) are replaced by exact
jacfwd at trace time. Each force also exposes .energy(params, kin, q, qdot)
for the potential used by the energy certificates.

Body points: a point r (body frame) on body b has world position
x = E_wi[b] @ [r;1] and world velocity xdot = R_wi[b] Gamma(r) phi[b]
(se3.Gamma, notes.pdf 1.2). World forces f scatter back as wrenches
Gamma(r)^T R^T f.

All contact/tension branches are branchless (jnp.where) so the kernels stay
jit/vmap-safe; division guards keep the inactive branch finite (a where over
an Inf/NaN branch would poison gradients).
"""

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3


class _ForceBase:
    """Force closure with a param slot in params['forces'][self.key]."""

    def __init__(self, key: str):
        self.key = key

    def p(self, params: Dict) -> Dict:
        return params["forces"][self.key]


def _point_state(kin, phi, b: int, r):
    """World position/velocity of body-frame point r on body b (b = -1: world)."""
    if b < 0:
        return r, jnp.zeros(3, dtype=r.dtype), None, None
    E = kin.E_wi[b]
    R = E[:3, :3]
    x = R @ r + E[:3, 3]
    G = se3.Gamma(r)                 # [3,6]
    v = R @ (G @ phi[b])
    return x, v, R, G


def _apply_world_force(fm, b: int, R, G, fW):
    """Scatter a world-frame point force into body b's wrench row."""
    if b < 0:
        return fm
    return fm.at[b].add(G.T @ (R.T @ fW))


class ForcePointPoint(_ForceBase):
    """Zero-rest-length linear spring+damper between two body points.

    Reference: matlab-diff/+redmax/ForcePointPoint.m:48-141.
      f = ks (x2 - x1) + kd (v2 - v1), applied +f at point 1, -f at point 2.
    params: xl1 [3], xl2 [3], k [], d [].  body = -1 means world-fixed point
    (xl in world coords), as in the reference's empty-body convention.
    """

    def __init__(self, key, body1: int, body2: int):
        super().__init__(key)
        self.body1 = body1
        self.body2 = body2

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        x1, v1, R1, G1 = _point_state(kin, phi, self.body1, fp["xl1"])
        x2, v2, R2, G2 = _point_state(kin, phi, self.body2, fp["xl2"])
        fW = fp["k"] * (x2 - x1) + fp["d"] * (v2 - v1)
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        fm = _apply_world_force(fm, self.body1, R1, G1, fW)
        fm = _apply_world_force(fm, self.body2, R2, G2, -fW)
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        # ForcePointPoint.computeEnergy_ (ForcePointPoint.m:118-133)
        fp = self.p(params)
        zero_phi = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        x1, _, _, _ = _point_state(kin, zero_phi, self.body1, fp["xl1"])
        x2, _, _, _ = _point_state(kin, zero_phi, self.body2, fp["xl2"])
        dx = x2 - x1
        return 0.5 * fp["k"] * jnp.dot(dx, dx)


class ForceSpringDamper(_ForceBase):
    """Finite-rest-length strain spring+damper between two body points.

    Reference: ForceSpringGeneric.computeValues_ (ForceSpringGeneric.m:37-83)
    with ForceSpringDamper.computeSpringForce (ForceSpringDamper.m:62-72):
      l = |x2 - x1|, ldot = (dx . dv)/l, strain = (l - L)/L
      fs = k strain + d ldot/L        (scalar tension)
      wrench_1 = (fs/l) Gamma1^T R1^T dx, wrench_2 = -(fs/l) Gamma2^T R2^T dx
    params: xl1, xl2, k, d, L (rest length; auto-initialized at compile from
    the initial configuration, ForceSpringDamper.init_ :38-59).
    """

    def __init__(self, key, body1: int, body2: int, tension_only: bool = False):
        super().__init__(key)
        self.body1 = body1
        self.body2 = body2
        self.tension_only = tension_only

    def _scalar_force(self, fp, l, ldot):
        strain = (l - fp["L"]) / fp["L"]
        fs = fp["k"] * strain + fp["d"] * ldot / fp["L"]
        if self.tension_only:
            fs = jnp.where(strain > 0, fs, 0.0)
        return fs

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        x1, v1, R1, G1 = _point_state(kin, phi, self.body1, fp["xl1"])
        x2, v2, R2, G2 = _point_state(kin, phi, self.body2, fp["xl2"])
        dx = x2 - x1
        dv = v2 - v1
        l = jnp.linalg.norm(dx)
        ldot = jnp.dot(dx, dv) / l
        fs = self._scalar_force(fp, l, ldot)
        fW = (fs / l) * dx
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        fm = _apply_world_force(fm, self.body1, R1, G1, fW)
        fm = _apply_world_force(fm, self.body2, R2, G2, -fW)
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        # V = (k/2) strain^2 L (ForceSpringDamper.m:66), gated for cables.
        fp = self.p(params)
        zero_phi = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        x1, _, _, _ = _point_state(kin, zero_phi, self.body1, fp["xl1"])
        x2, _, _, _ = _point_state(kin, zero_phi, self.body2, fp["xl2"])
        l = jnp.linalg.norm(x2 - x1)
        strain = (l - fp["L"]) / fp["L"]
        V = 0.5 * fp["k"] * strain * strain * fp["L"]
        if self.tension_only:
            V = jnp.where(strain > 0, V, 0.0)
        return V


class SpringDamperM(_ForceBase):
    """The feature-variant SpringDamper with ITS sign conventions
    (matlab/+redmax/SpringDamper.m computeFKD):
        fs = k (l - L)/L - d ldot / L       (note the MINUS on damping)
        wrench_1 = (fs/l) Gamma1^T R1^T dx  (pull toward body2 when fs > 0)
    and, unlike joint/body damping, the damping FORCE stays in fm in the
    euler path (computeForceStiffnessDamping adds f including damping)
    while the D matrix also enters the LHS — so this force keeps
    strip_damping = False. params: xl1, xl2, k, d, L (0 -> auto init).
    """

    strip_damping = False
    implicit_KD = False   # K/D supplied analytically below, not by autodiff
    custom_KD = True

    def __init__(self, key, body1: int, body2: int):
        super().__init__(key)
        self.body1 = body1
        self.body2 = body2

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        x1, v1, R1, G1 = _point_state(kin, phi, self.body1, fp["xl1"])
        x2, v2, R2, G2 = _point_state(kin, phi, self.body2, fp["xl2"])
        dx = x2 - x1
        l = jnp.linalg.norm(dx)
        ldot = jnp.dot(dx, v2 - v1) / l
        fs = fp["k"] * (l - fp["L"]) / fp["L"] - fp["d"] * ldot / fp["L"]
        fW = (fs / l) * dx
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        fm = _apply_world_force(fm, self.body1, R1, G1, fW)
        fm = _apply_world_force(fm, self.body2, R2, G2, -fW)
        return jnp.zeros_like(q), fm

    def matlab_KD(self, params, kin, phi, q, qdot):
        """The reference's OWN truncated stiffness/damping blocks
        (SpringDamper.computeFKD, :137-157): K = -sym(fn * dfs/dE) — the
        -fs d(fn)/dE geometric term is deliberately dropped — and
        D = -fn * dfm/dphi. Returned in OUR euler sign convention
        (contributions to Km/Dm with Mrtilde = ... - h Dm - h^2 Km),
        scattered to [6N, 6N].
        """
        fp = self.p(params)
        N = kin.E_wi.shape[0]
        dtype = q.dtype
        x1, v1, R1, G1 = _point_state(kin, phi, self.body1, fp["xl1"])
        x2, v2, R2, G2 = _point_state(kin, phi, self.body2, fp["xl2"])
        dx = x2 - x1
        l = jnp.linalg.norm(dx)
        dhat = dx / l
        # fn = (1/l) [ -G1^T R1^T dx ; G2^T R2^T dx ]
        fn1 = -(G1.T @ (R1.T @ dx)) / l
        fn2 = (G2.T @ (R2.T @ dx)) / l
        fn = jnp.concatenate([fn1, fn2])                    # [12]
        dfsdx1 = -(fp["k"] / fp["L"]) * dhat                # row 3-vec
        row = jnp.concatenate([dfsdx1 @ (R1 @ G1), -(dfsdx1 @ (R2 @ G2))])
        Kblk = jnp.outer(fn, row)
        Kblk = -0.5 * (Kblk + Kblk.T)                       # their K
        dfmdv1 = (fp["d"] / fp["L"]) * dhat
        drow = jnp.concatenate([dfmdv1 @ (R1 @ G1), -(dfmdv1 @ (R2 @ G2))])
        Dblk = -jnp.outer(fn, drow)                         # their D
        # Sign mapping: the reference LHS is Mr + J^T(h D_ref - h^2 K_ref)J,
        # ours is Mr - h J^T Dm J - h^2 J^T Km J => Km = +K_ref, Dm = -D_ref.
        Km = jnp.zeros((6 * N, 6 * N), dtype=dtype)
        Dm = jnp.zeros((6 * N, 6 * N), dtype=dtype)
        idx = jnp.concatenate([
            jnp.arange(6 * self.body1, 6 * self.body1 + 6),
            jnp.arange(6 * self.body2, 6 * self.body2 + 6),
        ])
        Km = Km.at[jnp.ix_(idx, idx)].add(Kblk)
        Dm = Dm.at[jnp.ix_(idx, idx)].add(-Dblk)
        return Km, Dm

    def energy(self, params, kin, q, qdot):
        # SpringDamper.computeEnergy_ (:98-117): V = 1/2 k ((l-L)/L)^2
        fp = self.p(params)
        zero_phi = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        x1, _, _, _ = _point_state(kin, zero_phi, self.body1, fp["xl1"])
        x2, _, _, _ = _point_state(kin, zero_phi, self.body2, fp["xl2"])
        l = jnp.linalg.norm(x2 - x1)
        e = (l - fp["L"]) / fp["L"]
        return 0.5 * fp["k"] * e * e


class ForceCable(_ForceBase):
    """Tension-only spring routed through a sequence of body points.

    Reference: ForceSpringMultiPointGeneric.computeValues_
    (ForceSpringMultiPointGeneric.m:28-95) + ForceCable.computeSpringForce
    (ForceCable.m:66-84): total length l = sum |dx_k|, total ldot; one scalar
    tension fs = k strain + d ldot/L when strain > 0, else slack (0); each
    segment contributes unit-direction wrenches at both endpoints.
    params: xls [P,3], k, d, L.
    """

    def __init__(self, key, bodies):
        super().__init__(key)
        self.bodies = tuple(bodies)  # static body indices, -1 = world

    def _geometry(self, params, kin, phi):
        fp = self.p(params)
        pts = []
        for i, b in enumerate(self.bodies):
            pts.append(_point_state(kin, phi, b, fp["xls"][i]))
        return pts

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        pts = self._geometry(params, kin, phi)
        l = 0.0
        ldot = 0.0
        seg = []
        for k in range(len(pts) - 1):
            x1, v1, _, _ = pts[k]
            x2, v2, _, _ = pts[k + 1]
            dx = x2 - x1
            dv = v2 - v1
            dlen = jnp.linalg.norm(dx)
            l = l + dlen
            ldot = ldot + jnp.dot(dx, dv) / dlen
            seg.append((dx, dlen))
        strain = (l - fp["L"]) / fp["L"]
        fs = fp["k"] * strain + fp["d"] * ldot / fp["L"]
        fs = jnp.where(strain > 0, fs, 0.0)
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        for k in range(len(pts) - 1):
            dx, dlen = seg[k]
            fW = (fs / dlen) * dx
            _, _, R1, G1 = pts[k]
            _, _, R2, G2 = pts[k + 1]
            fm = _apply_world_force(fm, self.bodies[k], R1, G1, fW)
            fm = _apply_world_force(fm, self.bodies[k + 1], R2, G2, -fW)
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        fp = self.p(params)
        zero_phi = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        pts = self._geometry(params, kin, zero_phi)
        l = 0.0
        for k in range(len(pts) - 1):
            l = l + jnp.linalg.norm(pts[k + 1][0] - pts[k][0])
        strain = (l - fp["L"]) / fp["L"]
        V = 0.5 * fp["k"] * strain * strain * fp["L"]
        return jnp.where(strain > 0, V, 0.0)


# The 8 cuboid corner signs, matching the column order of
# ForceGroundCuboid.m:72-81.
_CORNERS = np.array(
    [
        [-1, -1, -1],
        [-1, -1, 1],
        [-1, 1, -1],
        [-1, 1, 1],
        [1, -1, -1],
        [1, -1, 1],
        [1, 1, -1],
        [1, 1, 1],
    ],
    dtype=np.float64,
)


class ForcePointDirection(_ForceBase):
    """Constant-direction force k*d_w applied at a body point.

    Reference: SpringPointDirection (matlab/+redmax/SpringPointDirection.m):
    wrench = Gamma(x)^T R^T (k d_w). NOTE the reference's computeEnergy_ is
    commented out, so the certificate energy EXCLUDES this force's work —
    energy() returns 0 to match.
    The reference also DISABLES this force's stiffness matrix
    (SpringPointDirection.m:84: K = 0*K) — so implicit_KD is False here.
    params: xl [3], d [3] (world direction), k [].
    """

    implicit_KD = False

    def __init__(self, key, body: int):
        super().__init__(key)
        self.body = body

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        E = kin.E_wi[self.body]
        R = E[:3, :3]
        G = se3.Gamma(fp["xl"])
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        fm = fm.at[self.body].add(G.T @ (R.T @ (fp["k"] * fp["d"])))
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        return jnp.zeros((), dtype=q.dtype)


class ForceGroundCuboid(_ForceBase):
    """Penalty frictional ground contact on the 8 corners of a cuboid.

    Reference: ForceGroundCuboid.computeValues_ (ForceGroundCuboid.m:54-153),
    Geilinger et al. 2020-style smooth contact:
      per penetrating corner (d = n.(x - xg) <= 0):
        normal:   fc = -kn n d - kd N v            (N = n n^T)
        friction: a = T v (tangential velocity, T = I - N)
          static  (mu |kn d| >  kt |a|):  fs = -kt a
          dynamic (otherwise):            fd = -mu kn d a/|a|
    All 8 corners evaluated branchlessly with where-masks.
    params: E [4,4] ground frame (z-up), sides [3], kn, kt, kd, mu.
    """

    def __init__(self, key, body: int):
        super().__init__(key)
        self.body = body

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        dtype = q.dtype
        E_g = fp["E"]
        xg = E_g[:3, 3]
        ng = E_g[:3, 2]
        Nmat = jnp.outer(ng, ng)
        Tmat = jnp.eye(3, dtype=dtype) - Nmat
        E = kin.E_wi[self.body]
        R = E[:3, :3]
        p = E[:3, 3]
        ph = phi[self.body]
        kn, kt, kd, mu = fp["kn"], fp["kt"], fp["kd"], fp["mu"]

        xl = 0.5 * fp["sides"] * _CORNERS.astype(dtype)       # [8,3] body-frame
        xw = xl @ R.T + p                                      # [8,3] world
        d = (xw - xg) @ ng                                     # [8] depth
        active = (d <= 0).astype(dtype)

        G = se3.Gamma(xl)                                      # [8,3,6]
        Gphi = jnp.einsum("cij,j->ci", G, ph)                  # [8,3] body-frame vel
        vw = Gphi @ R.T                                        # [8,3] world vel

        # Normal contact force (world frame), per corner
        fc = -kn * d[:, None] * ng[None, :] - kd * (vw @ Nmat.T)

        # Friction
        a = vw @ Tmat.T                                        # tangential vel
        # Grad-safe norm: clamp inside the sqrt so the untaken where-branch
        # (dynamic friction at a ~ 0) stays finite under jacfwd.
        a2 = jnp.sum(a * a, axis=-1)
        anorm = jnp.sqrt(jnp.where(a2 < 1e-24, 1e-24, a2))
        safe = anorm
        static = (mu * jnp.abs(kn * d) > kt * anorm).astype(dtype)
        f_static = -kt * a
        f_dynamic = -mu * kn * d[:, None] * (a / safe[:, None])
        have_fric = (mu > 0).astype(dtype)
        ff = have_fric * (static[:, None] * f_static + (1 - static)[:, None] * f_dynamic)

        fW = active[:, None] * (fc + ff)                       # [8,3] world force
        # Scatter: wrench = sum_c G_c^T R^T fW_c
        wrench = jnp.einsum("cij,ci->j", G, fW @ R)
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=dtype)
        fm = fm.at[self.body].add(wrench)
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        # ForceGroundCuboid.computeEnergy_ (:156-183): V = 1/2 kn d^2 per
        # penetrating corner.
        fp = self.p(params)
        dtype = q.dtype
        E_g = fp["E"]
        xg = E_g[:3, 3]
        ng = E_g[:3, 2]
        E = kin.E_wi[self.body]
        xl = 0.5 * fp["sides"] * _CORNERS.astype(dtype)
        xw = xl @ E[:3, :3].T + E[:3, 3]
        d = (xw - xg) @ ng
        return 0.5 * fp["kn"] * jnp.sum(jnp.where(d <= 0, d * d, 0.0))


def ground_contact_blocks(E_wi_b, phi_b, fp, h=None, gmag=None):
    """Closed-form per-body (K [6,6], D [6,6]) blocks of ForceGroundCuboid,
    vectorized over the 8 corners — the VALUES equal
    pallas_step._ground_contact(want_blocks=True) (gated in
    tests/test_pallas_step.py) but trace as a handful of batched einsums
    instead of ~26k scalar ops, keeping structured_hessian's compile time
    flat. K = d(wrench)/d(xi) under E <- E exp(xi^), D = d(wrench)/d(phi),
    with the one-step proximity-margin H activation when (h, gmag) given
    (see pallas_step._ground_contact / benchmarks/CONTACT_NOTES.md).
    """
    dtype = phi_b.dtype
    E_g = fp["E"]
    xg = E_g[:3, 3]
    ng = E_g[:3, 2]
    kn, kt, kd, mu = fp["kn"], fp["kt"], fp["kd"], fp["mu"]
    R = E_wi_b[:3, :3]
    p = E_wi_b[:3, 3]
    w, v = phi_b[:3], phi_b[3:]

    r = 0.5 * fp["sides"] * _CORNERS.astype(dtype)            # [8,3]
    xc = r @ R.T + p
    d = (xc - xg) @ ng                                        # [8]
    active = (d <= 0).astype(dtype)
    u = jnp.cross(jnp.broadcast_to(w, (8, 3)), r) + v         # Gamma(r) phi
    vw = u @ R.T
    vn = vw @ ng
    a = vw - vn[:, None] * ng
    a2 = jnp.sum(a * a, axis=-1)
    flow = (a2 >= 1e-24).astype(dtype)
    anorm = jnp.sqrt(jnp.maximum(a2, 1e-24))
    ainv = 1.0 / anorm
    st = (mu * jnp.abs(kn * d) > kt * anorm).astype(dtype)
    hf = (mu > 0).astype(dtype)
    dyn = hf * (1.0 - st) * active
    sta = hf * st * active

    fc = -kn * d[:, None] * ng - kd * vn[:, None] * ng
    fW = active[:, None] * fc + sta[:, None] * (-kt * a) \
        + dyn[:, None] * (-mu * kn) * d[:, None] * a * ainv[:, None]
    fb = fW @ R                                               # R^T fW rows

    act_h = active
    if h is not None:
        margin = h * jnp.abs(vn) + h * h * gmag
        act_h = active + (1.0 - active) * ((d - margin) <= 0).astype(dtype)

    nn = jnp.outer(ng, ng)
    T = jnp.eye(3, dtype=dtype) - nn
    A3 = act_h[:, None, None] * (-kn) * nn \
        + dyn[:, None, None] * (-mu * kn) * jnp.einsum(
            "ci,j->cij", a * ainv[:, None], ng)
    cdyn = dyn * (-mu * kn) * d * ainv
    B3 = act_h[:, None, None] * (-kd) * nn \
        + (sta * (-kt) + cdyn)[:, None, None] * T \
        - (cdyn * flow * ainv * ainv)[:, None, None] * jnp.einsum(
            "ci,cj->cij", a, a)

    P = jnp.einsum("ki,ckl,lj->cij", R, A3, R)                # R^T A R
    Q = jnp.einsum("ki,ckl,lj->cij", R, B3, R)
    hr = se3.hat3(r)                                          # [8,3,3]
    hfb = se3.hat3(fb)
    hu = se3.hat3(u)
    ML = hfb - P @ hr - Q @ hu
    DL = -(Q @ hr)
    K = jnp.concatenate([
        jnp.concatenate([hr @ ML, hr @ P], axis=-1),
        jnp.concatenate([ML, P], axis=-1),
    ], axis=-2).sum(axis=0)
    D = jnp.concatenate([
        jnp.concatenate([hr @ DL, hr @ Q], axis=-1),
        jnp.concatenate([DL, Q], axis=-1),
    ], axis=-2).sum(axis=0)
    return K, D


class ForceDeformableSegments(_ForceBase):
    """Serial mass-spring segment forces for a DeformableSpring.

    Reference: DeformableSpring.computeMassGrav_ (matlab/+redmax/
    DeformableSpring.m:163-187): per segment fs = K e (1/L) dx/l applied
    +fs at node i, -fs at node i+1, with e = (l - L)/L. Node bodies are
    translational-joint point masses, so the wrench is [0; f].
    params: K [], L [nnodes-1] (rest lengths, set at compile).
    """

    # The reference integrates deformable elastic forces EXPLICITLY in the
    # euler path (they enter via computeMassGrav_, not the spring Km;
    # matlab/testRedMax.m:476-482), so this force opts out of the implicit
    # stiffness/damping derivatives.
    implicit_KD = False

    def __init__(self, key, node_bodies):
        super().__init__(key)
        self.nodes = tuple(node_bodies)

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        fm = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        xs = kin.E_wi[jnp.asarray(self.nodes), :3, 3]      # [n,3]
        for i in range(len(self.nodes) - 1):
            dx = xs[i + 1] - xs[i]
            l = jnp.linalg.norm(dx)
            L = fp["L"][i]
            e = (l - L) / L
            fs = fp["K"] * e * (1.0 / L) * dx / l
            fm = fm.at[self.nodes[i], 3:].add(fs)
            fm = fm.at[self.nodes[i + 1], 3:].add(-fs)
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        fp = self.p(params)
        xs = kin.E_wi[jnp.asarray(self.nodes), :3, 3]
        V = 0.0
        for i in range(len(self.nodes) - 1):
            l = jnp.linalg.norm(xs[i + 1] - xs[i])
            e = (l - fp["L"][i]) / fp["L"][i]
            V = V + 0.5 * fp["K"] * e * e
        return V


FORCE_TYPES = {
    "point_point": ForcePointPoint,
    "spring_damper": ForceSpringDamper,
    "cable": ForceCable,
    "ground_cuboid": ForceGroundCuboid,
}
