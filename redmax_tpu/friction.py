"""Bilateral Staggered Projections friction (notes.pdf section 2.12).

Port of the reference's eulerFric path (matlab/testRedMax.m:544-759):
alternating (a) contact passes — maximal vs reduced solves whose velocity
difference yields the joint-reaction force fam = Mmtilde (v_con - v_unc)/h —
and (b) friction passes — a boxed QP over tangent-matrix rows with
|b| <= mu * a, where the contact multipliers a come from small per-joint
regularized solves (Joint.computeContactMultiplier, Joint.m:682-720).

Supports INTERNAL (joint) friction via revolute contact rings
(JointRevolute.generateContacts_, JointRevolute.m:35-80) and EXTERNAL
(floor) friction via ConstraintFloor contacts, with separate mu values
(Scene.mu, matlab/+redmax/Scene.m:44).

TPU mapping: contact rings are compile-time constants per joint (16 points
on the joint cylinder in child-body frame); the SP loop runs under
lax.while_loop with the reference's relative Mm^{-1}-norm convergence test;
quadprog is replaced by the dual PGS kernel (qp.qp_pgs) with box
projections.
"""

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3
from redmax_tpu.constraints import ConstraintFloor
from redmax_tpu.types import Topology

NTHETA = 4
RING_C = 4 * NTHETA  # 2 contacts x 2 ends x NTHETA


def _aa_to_mat_np(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    n = np.linalg.norm(axis)
    if n < 1e-12:
        return np.eye(3)
    u = axis / n
    K = np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    return np.eye(3) + math.sin(angle) * K + (1 - math.cos(angle)) * (K @ K)


def revolute_ring(axis, E_ij, radius=1.0, height=1.0):
    """Static contact ring for one revolute joint in CHILD-BODY frame.

    Mirrors JointRevolute.generateContacts_ (JointRevolute.m:35-80):
    returns (pos_i [C,3], nor_i [C,3], tan_i [C,3]) with C = 16.
    """
    axis = np.asarray(axis, dtype=np.float64)
    z = np.array([0.0, 0.0, 1.0])
    angle = math.acos(max(-1.0, min(float(axis @ z), 1.0)))
    E_ja = np.eye(4)
    E_ja[:3, :3] = _aa_to_mat_np(np.cross(axis, z), angle)
    E_ia = np.asarray(E_ij, dtype=np.float64) @ E_ja

    pos, nor, tan = [], [], []
    for k in range(NTHETA):
        theta = 2 * math.pi * k / NTHETA
        s, c = math.sin(theta), math.cos(theta)
        n3 = np.array([c, s, 0.0])
        t3 = np.array([-s, c, 0.0])
        p3 = radius * n3.copy()
        for i in range(2):
            zz = height * (i - 0.5)
            p = p3.copy()
            p[2] = zz
            b3 = np.cross(t3, n3)
            R_ac = np.stack([t3, n3, b3], axis=1)
            E_ac = np.eye(4)
            E_ac[:3, :3] = R_ac
            E_ac[:3, 3] = p
            E_ic = E_ia @ E_ac
            t = E_ic[:3, 0]
            n = E_ic[:3, 1]
            b = E_ic[:3, 2]
            x = E_ic[:3, 3]
            pos.append(x); nor.append(-n); tan.append(t)
            bb = -b if i == 0 else b
            pos.append(x); nor.append(bb); tan.append(t)
    return np.stack(pos), np.stack(nor), np.stack(tan)


class Ring(NamedTuple):
    """Static contact-ring data for one joint.

    pos/nor: [C,3] contact points/normals (child-body frame).
    tan: [R,3] tangent per T-row; row_pos [R,3] the row's contact point.
    limit_map: ((row, (contact ids summed for the bound)), ...) — rows not
    listed get zero-width boxes (the reference's idx exclusion).
    """

    joint: int
    pos: np.ndarray
    nor: np.ndarray
    tan: np.ndarray
    row_pos: np.ndarray
    limit_map: Tuple


def revolute_ring_obj(j, axis, E_ij, radius=1.0, height=1.0) -> Ring:
    pos, nor, tan = revolute_ring(axis, E_ij, radius, height)
    lm = tuple((2 * k, (2 * k, 2 * k + 1)) for k in range(len(pos) // 2))
    return Ring(j, pos, nor, tan, pos.copy(), lm)


def prismatic_ring_obj(j, axis, E_ij, sides=(0.5, 0.5, 0.5)) -> Ring:
    """JointPrismatic.generateContacts_ (matlab/+redmax/JointPrismatic.m:35-95):
    16 contacts on a scaled unit box aligned with the slide axis; all rows
    share the axis tangent; pairs share positions."""
    axis = np.asarray(axis, dtype=np.float64)
    z = np.array([0.0, 0.0, 1.0])
    angle = math.acos(max(-1.0, min(float(axis @ z), 1.0)))
    E_ja = np.eye(4)
    E_ja[:3, :3] = _aa_to_mat_np(np.cross(axis, z), angle)
    S = np.diag(list(sides) + [1.0])
    E_ia = np.asarray(E_ij) @ S @ E_ja
    tan_i = E_ia[:3, :3] @ z
    tan_i = tan_i / np.linalg.norm(tan_i)
    pos, nor, tan = [], [], []
    corners = {
        (0, 0): ([-0.5, -0.5], [1, 0, 0], [0, 1, 0]),
        (0, 1): ([-0.5, 0.5], [1, 0, 0], [0, -1, 0]),
        (1, 0): ([0.5, -0.5], [-1, 0, 0], [0, 1, 0]),
        (1, 1): ([0.5, 0.5], [-1, 0, 0], [0, -1, 0]),
    }
    for kz in (0, 1):
        zz = kz - 0.5
        for (kx, ky), (xy, n1, n2) in corners.items():
            pa = np.array([xy[0], xy[1], zz])
            pi = E_ia[:3, :3] @ pa + E_ia[:3, 3]
            for na in (n1, n2):
                ni = E_ia[:3, :3] @ np.asarray(na, dtype=np.float64)
                ni = ni / np.linalg.norm(ni)
                pos.append(pi)
                nor.append(ni)
                tan.append(tan_i)
    pos = np.stack(pos)
    lm = tuple((2 * k, (2 * k, 2 * k + 1)) for k in range(len(pos) // 2))
    return Ring(-1, pos, np.stack(nor), np.stack(tan), pos.copy(), lm)._replace()


def spherical_ring_obj(j, E_ij, radius=1.0) -> Ring:
    """JointSphericalExp.generateContacts_ (:93-118): 6 contacts on the
    sphere (3 axes x +-), TWO tangent rows per contact."""
    E_ij = np.asarray(E_ij)
    pos, nor, tan, row_pos = [], [], [], []
    for k in range(3):
        R_jc = np.eye(3)
        if k == 1:
            R_jc = R_jc[:, [1, 2, 0]]
        elif k == 2:
            R_jc = R_jc[:, [2, 0, 1]]
        for sgn in (-1.0, 1.0):
            R = sgn * R_jc
            x = -radius * R[:, 0]
            E_jc = np.eye(4)
            E_jc[:3, :3] = R
            E_jc[:3, 3] = x
            E_ic = E_ij @ E_jc
            p = E_ic[:3, 3]
            pos.append(p)
            nor.append(E_ic[:3, 0])
            tan.append(E_ic[:3, 1]); row_pos.append(p)
            tan.append(E_ic[:3, 2]); row_pos.append(p)
    lm = tuple(x for i in range(6) for x in ((2 * i, (i,)), (2 * i + 1, (i,))))
    return Ring(j, np.stack(pos), np.stack(nor), np.stack(tan),
                np.stack(row_pos), lm)


class LoopRing(NamedTuple):
    """Contact ring of a loop-closure constraint (revolute geometry between
    two non-tree bodies; ConstraintLoop.generateContactsJoint_,
    matlab/+redmax/ConstraintLoop.m:79-118)."""

    bodyA: int
    bodyB: int
    pos: np.ndarray        # [C,3] in bodyA frame
    nor: np.ndarray
    tan: np.ndarray        # [C,3] row tangents (one per contact)
    limit_map: Tuple
    eq_offset: int         # first row of this constraint in the stacked Gm
    n_rows: int


def loop_ring_obj(bodyA, bodyB, xA, axisA, eq_offset,
                  radius=1.0, height=1.0) -> LoopRing:
    axis = np.asarray(axisA, dtype=np.float64)
    z = np.array([0.0, 0.0, 1.0])
    angle = math.acos(max(-1.0, min(float(axis @ z), 1.0)))
    E_ac = np.eye(4)
    E_ac[:3, :3] = _aa_to_mat_np(np.cross(axis, z), angle)
    E_ac[:3, 3] = np.asarray(xA, dtype=np.float64)
    pos, nor, tan = [], [], []
    for k in range(NTHETA):
        theta = 2 * math.pi * k / NTHETA
        s_, c_ = math.sin(theta), math.cos(theta)
        nor_c = np.array([c_, s_, 0.0])
        tan_c = np.array([-s_, c_, 0.0])
        for i in range(2):
            p_c = radius * nor_c.copy()
            p_c[2] = height * (i - 0.5)
            bin_c = np.cross(tan_c, nor_c)
            pa = E_ac[:3, :3] @ p_c + E_ac[:3, 3]
            pos.append(pa); nor.append(-(E_ac[:3, :3] @ nor_c))
            tan.append(E_ac[:3, :3] @ tan_c)
            bb = -bin_c if i == 0 else bin_c
            pos.append(pa); nor.append(E_ac[:3, :3] @ bb)
            tan.append(E_ac[:3, :3] @ tan_c)
    pos = np.stack(pos)
    lm = tuple((2 * k, (2 * k, 2 * k + 1)) for k in range(len(pos) // 2))
    return LoopRing(bodyA, bodyB, pos, np.stack(nor), np.stack(tan), lm,
                    eq_offset, 2)


class FrictionModel(NamedTuple):
    """Static friction data: joint rings + loop rings + floor constraints."""

    rings: Tuple  # of Ring
    loop_rings: Tuple  # of LoopRing
    floor_cons: Tuple
    eq_cons: Tuple  # equality-maximal constraints in stacking order


def build_friction_model(
    topo: Topology, joint_specs, body_specs, constraint_fns
) -> FrictionModel:
    """Collect contact rings for revolute/prismatic/spherical joints +
    floor constraints with external friction."""
    from redmax_tpu.types import JointType

    from redmax_tpu.constraints import ConstraintLoop

    rings = []
    for j, spec in enumerate(joint_specs):
        E_ij = np.linalg.inv(np.asarray(body_specs[j].E_ji))
        if spec.jtype == JointType.REVOLUTE:
            r = revolute_ring_obj(
                j, spec.params["axis"], E_ij,
                getattr(spec, "contact_radius", 1.0),
                getattr(spec, "contact_height", 1.0),
            )
            rings.append(r)
        elif spec.jtype == JointType.PRISMATIC:
            r = prismatic_ring_obj(j, spec.params["axis"], E_ij,
                                   getattr(spec, "contact_sides", (0.5, 0.5, 0.5)))
            rings.append(r._replace(joint=j))
        elif spec.jtype == JointType.SPHERICAL:
            rings.append(spherical_ring_obj(j, E_ij))
    floor = tuple(c for c in constraint_fns if isinstance(c, ConstraintFloor))
    eq_cons = tuple(c for c in constraint_fns if c.n_eq_m)
    loop_rings = []
    off = 0
    for c in eq_cons:
        if isinstance(c, ConstraintLoop):
            cp = c.static_params  # set by SceneBuilder.constraint_loop
            loop_rings.append(
                loop_ring_obj(c.bodyA, c.bodyB, cp["xA"], cp["axisA"], off,
                              cp.get("radius", 1.0), cp.get("height", 1.0))
            )
        off += c.n_eq_m
    return FrictionModel(rings=tuple(rings), loop_rings=tuple(loop_rings),
                         floor_cons=floor, eq_cons=eq_cons)


def _gamma_rows(vec, pos):
    """rows v^T Gamma(p): [C,3],[C,3] -> [C,6]."""
    G = se3.Gamma(pos)                       # [C,3,6]
    return jnp.einsum("ci,cij->cj", vec, G)


def tangent_matrix(fm: FrictionModel, topo: Topology, kin, params, q, qdot):
    """T [nt, 6N]: per-ring rows + 2 rows per floor contact."""
    N = topo.njoints
    dtype = q.dtype
    rows = []
    for ring in fm.rings:
        j = ring.joint
        tan = jnp.asarray(ring.tan, dtype=dtype)
        rpos = jnp.asarray(ring.row_pos, dtype=dtype)
        R = tan.shape[0]
        Tj = jnp.zeros((R, 6 * N), dtype=dtype)
        Tj = Tj.at[:, 6 * j: 6 * j + 6].set(_gamma_rows(tan, rpos))
        p = topo.parent[j]
        if p >= 0:
            E_pi = se3.inv(kin.E_wi[p]) @ kin.E_wi[j]
            R_pi = E_pi[:3, :3]
            tan_p = tan @ R_pi.T
            pos_p = rpos @ R_pi.T + E_pi[:3, 3]
            Tj = Tj.at[:, 6 * p: 6 * p + 6].set(-_gamma_rows(tan_p, pos_p))
        rows.append(Tj)
    for lr in fm.loop_rings:
        tan = jnp.asarray(lr.tan, dtype=dtype)
        pos = jnp.asarray(lr.pos, dtype=dtype)
        R = tan.shape[0]
        Tj = jnp.zeros((R, 6 * N), dtype=dtype)
        Tj = Tj.at[:, 6 * lr.bodyA: 6 * lr.bodyA + 6].set(_gamma_rows(tan, pos))
        E_ba = se3.inv(kin.E_wi[lr.bodyB]) @ kin.E_wi[lr.bodyA]
        R_ba = E_ba[:3, :3]
        tan_b = tan @ R_ba.T
        pos_b = pos @ R_ba.T + E_ba[:3, 3]
        Tj = Tj.at[:, 6 * lr.bodyB: 6 * lr.bodyB + 6].set(
            -_gamma_rows(tan_b, pos_b)
        )
        rows.append(Tj)
    for con in fm.floor_cons:
        cp = con.p(params)
        E_wi = kin.E_wi[con.body]
        E_f = cp["E"]
        r_s = cp["radius"]
        x_w = E_wi[:3, 3]
        x_f = se3.inv(E_f) @ jnp.concatenate([x_w, jnp.ones(1, dtype=dtype)])
        x_c = x_f.at[2].add(-r_s)
        x_b = (se3.inv(E_wi) @ (E_f @ x_c))[:3]
        R_wi = E_wi[:3, :3]
        tan_a = R_wi.T @ E_f[:3, :2]
        Tc = jnp.zeros((2, 6 * N), dtype=dtype)
        rows2 = _gamma_rows(tan_a.T, jnp.broadcast_to(x_b, (2, 3)))
        Tc = Tc.at[:, 6 * con.body: 6 * con.body + 6].set(rows2)
        rows.append(Tc)
    if not rows:
        return jnp.zeros((0, 6 * N), dtype=dtype)
    return jnp.concatenate(rows, axis=0)


def scatter_contact_force(fm: FrictionModel, topo: Topology, kin, fam):
    """fam [6N] -> per-joint reaction wrenches fc [N, 6] (backward traversal,
    Joint.scatterContactForce, Joint.m:652-679)."""
    N = topo.njoints
    f = fam.reshape(N, 6)
    fc = jnp.zeros((N, 6), dtype=fam.dtype)
    for j in reversed(range(N)):
        fcj = f[j]
        fc = fc.at[j].set(fcj)
        p = topo.parent[j]
        if p >= 0:
            Ad = se3.Ad(se3.inv(kin.E_wi[j]) @ kin.E_wi[p])
            f = f.at[p].add(Ad.T @ fcj)
    return fc


def contact_multipliers(
    fm: FrictionModel, topo: Topology, params, kin, fc, h, SPreg
):
    """Per-ring multipliers: list of a [C] (Joint.computeContactMultiplier)."""
    dtype = fc.dtype
    outs = []
    for ring in fm.rings:
        j = ring.joint
        pos = jnp.asarray(ring.pos, dtype=dtype)
        nor = jnp.asarray(ring.nor, dtype=dtype)
        C = pos.shape[0]
        p = topo.parent[j]
        Nrows_child = _gamma_rows(nor, pos)
        if p >= 0:
            E_pi = se3.inv(kin.E_wi[p]) @ kin.E_wi[j]
            R_pi = E_pi[:3, :3]
            nor_p = nor @ R_pi.T
            pos_p = pos @ R_pi.T + E_pi[:3, 3]
            Nmat = jnp.concatenate([Nrows_child, -_gamma_rows(nor_p, pos_p)], axis=1)
            Minv = jnp.concatenate([1.0 / params["I_i"][j], 1.0 / params["I_i"][p]])
            E_ip = se3.inv(kin.E_wi[j]) @ kin.E_wi[p]
            fvec = jnp.concatenate([fc[j], -se3.Ad(E_ip).T @ fc[j]])
        else:
            Nmat = Nrows_child
            Minv = 1.0 / params["I_i"][j]
            fvec = fc[j]
        H = jnp.einsum("ck,k,dk->cd", Nmat, Minv, Nmat) + SPreg * jnp.eye(C, dtype=dtype)
        H = 0.5 * (H + H.T)
        fq = (Nmat @ (Minv * fvec)) * h
        outs.append(jnp.linalg.solve(H, fq))
    return outs


def loop_multipliers(fm: FrictionModel, topo, params, kin, Gm, lam_eq, h, SPreg):
    """Per-loop-ring multipliers a [C]
    (ConstraintLoop.computeContactMultiplier_, ConstraintLoop.m:120-146):
    fcon = Gm_rows^T lam / h on the two bodies; a solves
    (N Minv N^T + reg) a = (N Minv fcon) h."""
    dtype = lam_eq.dtype if lam_eq.size else jnp.float64
    outs = []
    for lr in fm.loop_rings:
        pos = jnp.asarray(lr.pos, dtype=Gm.dtype)
        nor = jnp.asarray(lr.nor, dtype=Gm.dtype)
        C = pos.shape[0]
        rows = Gm[lr.eq_offset: lr.eq_offset + lr.n_rows]
        lam = lam_eq[lr.eq_offset: lr.eq_offset + lr.n_rows]
        fcon_full = rows.T @ lam / h                       # [6N]
        fA = fcon_full[6 * lr.bodyA: 6 * lr.bodyA + 6]
        fB = fcon_full[6 * lr.bodyB: 6 * lr.bodyB + 6]
        NA = _gamma_rows(nor, pos)                          # [C,6] on A
        E_ba = se3.inv(kin.E_wi[lr.bodyB]) @ kin.E_wi[lr.bodyA]
        R_ba = E_ba[:3, :3]
        nor_b = nor @ R_ba.T
        pos_b = pos @ R_ba.T + E_ba[:3, 3]
        NB = -_gamma_rows(nor_b, pos_b)
        Nmat = jnp.concatenate([NA, NB], axis=1)            # [C,12]
        Minv = jnp.concatenate(
            [1.0 / params["I_i"][lr.bodyA], 1.0 / params["I_i"][lr.bodyB]]
        )
        fvec = jnp.concatenate([fA, fB])
        H = jnp.einsum("ck,k,dk->cd", Nmat, Minv, Nmat) + SPreg * jnp.eye(
            C, dtype=Gm.dtype
        )
        H = 0.5 * (H + H.T)
        fq = (Nmat @ (Minv * fvec)) * h
        outs.append(jnp.linalg.solve(H, fq))
    return outs


def friction_bounds(fm: FrictionModel, a_rings, a_floor, mu_int, mu_ext, dtype):
    """Box bounds bl/bu [nt] from per-ring limit maps + floor rows."""
    bls, bus = [], []
    for ring, a in zip(fm.rings, a_rings):
        R = ring.tan.shape[0]
        lim = jnp.zeros(R, dtype=dtype)
        for row, cids in ring.limit_map:
            s = sum(jnp.abs(a[c]) for c in cids)
            lim = lim.at[row].set(mu_int * s)
        bls.append(-lim)
        bus.append(lim)
    for i, con in enumerate(fm.floor_cons):
        lim = jnp.broadcast_to(mu_ext * a_floor[i], (2,)).astype(dtype)
        bls.append(-lim)
        bus.append(lim)
    if not bls:
        return jnp.zeros(0, dtype), jnp.zeros(0, dtype)
    return jnp.concatenate(bls), jnp.concatenate(bus)


def friction_bounds_full(
    fm: FrictionModel, a_rings, a_loops, a_floor, mu_int, mu_ext, dtype
):
    """Bounds over [joint rings | loop rings | floor rows]."""
    bls, bus = [], []
    for ring, a in zip(fm.rings, a_rings):
        R = ring.tan.shape[0]
        lim = jnp.zeros(R, dtype=dtype)
        for row, cids in ring.limit_map:
            ssum = sum(jnp.abs(a[c]) for c in cids)
            lim = lim.at[row].set(mu_int * ssum)
        bls.append(-lim)
        bus.append(lim)
    for lr, a in zip(fm.loop_rings, a_loops):
        R = lr.tan.shape[0]
        lim = jnp.zeros(R, dtype=dtype)
        for row, cids in lr.limit_map:
            ssum = sum(jnp.abs(a[c]) for c in cids)
            lim = lim.at[row].set(mu_int * ssum)  # "Use internal mu"
        bls.append(-lim)
        bus.append(lim)
    for i, con in enumerate(fm.floor_cons):
        lim = jnp.broadcast_to(mu_ext * a_floor[i], (2,)).astype(dtype)
        bls.append(-lim)
        bus.append(lim)
    if not bls:
        return jnp.zeros(0, dtype), jnp.zeros(0, dtype)
    return jnp.concatenate(bls), jnp.concatenate(bus)


# ---------------------------------------------------------------------------
# The staggered-projections Euler step (eulerFric, testRedMax.m:544-759)
# ---------------------------------------------------------------------------


def make_euler_fric_step(
    topo: Topology,
    force_fns: Tuple,
    fm_model: FrictionModel,
    sp_iter_max: int = 100,
    sp_conv: float = 1e-3,
    sp_reg: float = 1e-6,
    pgs_iters: int = 3000,
):
    """One semi-implicit Euler step with staggered-projections friction.

    Covers the reference's eulerFric branches (testRedMax.m:544-759):
    no external constraints, inequality-only (floors), equality-only
    (loop closures / maximal prescriptions), and mixed — with internal
    joint rings, loop-constraint rings, and floor external friction.
    """
    from redmax_tpu.model import (
        closure_forces,
        forward_kinematics,
        jacobians,
        joint_space_force,
        maximal_force,
        maximal_force_KD,
        reparam_all,
    )
    from redmax_tpu.qp import qp_pgs
    from redmax_tpu.types import State

    floors = fm_model.floor_cons
    eq_cons = fm_model.eq_cons
    nem = sum(c.n_eq_m for c in eq_cons)

    def step(params: Dict, state):
        q0, qdot0, aux = state.q, state.qdot, state.aux
        fbm_prev = aux.get("fbm")
        h = params["h"]
        dtype = q0.dtype
        N = topo.njoints
        nm = 6 * N
        mu_int = params["mu"][0]
        mu_ext = params["mu"][1]
        baum3 = params["baumgarte"][2]

        kin = forward_kinematics(topo, params, q0, qdot0, aux)
        J, Jdot, phi = jacobians(topo, params, kin, qdot0)

        fr_full = joint_space_force(topo, params, q0, qdot0)
        Kr = jax.jacfwd(lambda qq: joint_space_force(topo, params, qq, qdot0))(q0)
        Dr = jax.jacfwd(lambda qd: joint_space_force(topo, params, q0, qd))(qdot0)
        f0_r = fr_full - Dr @ qdot0

        fm_grav = maximal_force(topo, params, kin, phi)
        _, fm_cl = closure_forces(topo, params, kin, phi, q0, qdot0, force_fns)
        Km, Dm = maximal_force_KD(topo, params, kin, phi, q0, qdot0, force_fns)
        Km = 0.5 * (Km + Km.T)
        f0_m = fm_grav.reshape(-1) + fm_cl.reshape(-1) - Dm @ phi.reshape(-1)
        bd = params.get("body_damping")
        if bd is not None:
            bd6 = jnp.repeat(bd, 6)
            f0_m = f0_m + bd6 * phi.reshape(-1)
            Dm = Dm - jnp.diag(bd6)

        Ivec = params["I_i"].reshape(-1)
        Mm = jnp.diag(Ivec)
        MmJ = Ivec[:, None] * J
        Mr = J.T @ MmJ
        Mr = 0.5 * (Mr + Mr.T)
        frtilde = Mr @ qdot0 + h * (J.T @ (f0_m - Ivec * (Jdot @ qdot0)) + f0_r)
        Mrtilde = Mr - h * (J.T @ (Dm @ J)) - h * h * (J.T @ (Km @ J)) \
            - h * Dr - h * h * Kr
        fmtilde = MmJ @ qdot0 + h * f0_m
        Mmtilde = Mm - h * Dm - h * h * Km

        T = tangent_matrix(fm_model, topo, kin, params, q0, qdot0)

        # Floor inequality rows (maximal, masked).
        nim = len(floors)
        if nim:
            Cm_rows, cm_vals, acts = [], [], []
            for con in floors:
                C, c, a = con.ineq_m(params, topo, kin, phi, q0, qdot0)
                Cm_rows.append(C); cm_vals.append(c); acts.append(a)
            Cm = jnp.concatenate(Cm_rows) * jnp.concatenate(acts).astype(dtype)[:, None]
            act = jnp.concatenate(acts)
            rhsC = jnp.where(act, -baum3 * jnp.concatenate(cm_vals), 0.0)
            CmJ = Cm @ J
            lo_c = jnp.zeros(nim, dtype)
            hi_c = jnp.where(act, jnp.inf, 0.0)

        # Maximal equality rows (loops, maximal prescriptions).
        if nem:
            Gm_rows, gm_vals, gmd_vals = [], [], []
            for con in eq_cons:
                G, g, gd = con.eq_m(params, topo, kin, phi, q0, qdot0)
                Gm_rows.append(G); gm_vals.append(g); gmd_vals.append(gd)
            Gm = jnp.concatenate(Gm_rows)
            rhsG = -jnp.concatenate(gmd_vals) - baum3 * jnp.concatenate(gm_vals)
            GmJ = Gm @ J
            lo_g = jnp.full(nem, -jnp.inf, dtype)
            hi_g = jnp.full(nem, jnp.inf, dtype)

        Mmt_inv = jnp.linalg.inv(Mmtilde)
        Mrt_lu = jax.scipy.linalg.lu_factor(Mrtilde)
        r_solve = lambda b: jax.scipy.linalg.lu_solve(Mrt_lu, b)

        def _stack():
            """[Cm; Gm] rows for the dual (matlab CGm ordering)."""
            As, bs, los, his = [], [], [], []
            if nim:
                As.append(Cm); bs.append(rhsC); los.append(lo_c); his.append(hi_c)
            if nem:
                As.append(Gm); bs.append(rhsG); los.append(lo_g); his.append(hi_g)
            return (jnp.concatenate(As), jnp.concatenate(bs),
                    jnp.concatenate(los), jnp.concatenate(his))

        def _stack_red():
            As, bs, los, his = [], [], [], []
            if nim:
                As.append(CmJ); bs.append(rhsC); los.append(lo_c); his.append(hi_c)
            if nem:
                As.append(GmJ); bs.append(rhsG); los.append(lo_g); his.append(hi_g)
            return (jnp.concatenate(As), jnp.concatenate(bs),
                    jnp.concatenate(los), jnp.concatenate(his))

        def contact_pass(fbm):
            """-> (fam [6N], a_floor [nim], lam_eq [nem])."""
            rhsM = fmtilde + h * fbm
            if nim or nem:
                Am, bm, lom, him = _stack()
                vuncb, _ = qp_pgs(Mmtilde, rhsM, Am, bm, lom, him, pgs_iters)
                Ar, br, lor, hir = _stack_red()
                solr, lam = qp_pgs(
                    Mrtilde, frtilde + h * (J.T @ fbm), Ar, br, lor, hir,
                    pgs_iters,
                )
                vconb = J @ solr
                a_floor = lam[:nim] if nim else jnp.zeros(0, dtype)
                lam_eq = lam[nim:] if nem else jnp.zeros(0, dtype)
            else:
                vuncb = Mmt_inv @ rhsM
                vconb = J @ r_solve(frtilde + h * (J.T @ fbm))
                a_floor = jnp.zeros(0, dtype)
                lam_eq = jnp.zeros(0, dtype)
            fam = Mmtilde @ (vconb - vuncb) / h
            return fam, a_floor, lam_eq

        def friction_pass(fam, a_floor, lam_eq):
            fc = scatter_contact_force(fm_model, topo, kin, fam)
            a_rings = contact_multipliers(fm_model, topo, params, kin, fc, h, sp_reg)
            a_loops = (
                loop_multipliers(fm_model, topo, params, kin, Gm, lam_eq, h, sp_reg)
                if fm_model.loop_rings
                else []
            )
            bl, bu = friction_bounds_full(
                fm_model, a_rings, a_loops, a_floor, mu_int, mu_ext, dtype
            )
            Hf = T @ (Mmt_inv @ T.T)
            Hf = 0.5 * (Hf + Hf.T)
            ff = T @ (Mmt_inv @ (fmtilde + h * fam))
            m = Hf.shape[0]
            diag = jnp.diagonal(Hf)
            safe = jnp.where(jnp.abs(diag) < 1e-12, 1.0, diag)

            def row(b_, i):
                resid = ff[i] - Hf[i] @ b_ + diag[i] * b_[i]
                return b_.at[i].set(jnp.clip(resid / safe[i], bl[i], bu[i])), None

            def sweep(b_, _):
                b_, _ = jax.lax.scan(row, b_, jnp.arange(m))
                return b_, None

            b0 = jnp.zeros(m, dtype)
            b_, _ = jax.lax.scan(sweep, b0, None, length=pgs_iters)
            return -(T.T @ b_) / h

        def sp_cond(carry):
            it, done, fbm, fam, a_floor, lam_eq, fam0 = carry
            return (~done) & (it < sp_iter_max)

        def sp_body(carry):
            it, done, fbm, fam_prev, afl_prev, lam_prev, fam0 = carry
            fam, a_floor, lam_eq = contact_pass(fbm)
            dfam = fam - fam0
            num = dfam @ (Mmt_inv @ dfam)
            den = fam @ (Mmt_inv @ fam)
            conv = num / jnp.where(den == 0, 1.0, den) < sp_conv
            fbm_new = jnp.where(
                conv, fbm, friction_pass(fam, a_floor, lam_eq)
            )
            return (it + 1, conv, fbm_new, fam, a_floor, lam_eq, fam)

        fbm0 = fbm_prev if fbm_prev is not None else jnp.zeros(nm, dtype)
        init = (
            jnp.zeros((), jnp.int32), jnp.asarray(False), fbm0,
            jnp.zeros(nm, dtype), jnp.zeros(nim if nim else 0, dtype),
            jnp.zeros(nem if nem else 0, dtype), jnp.zeros(nm, dtype),
        )
        it, done, fbm, fam, a_floor, lam_eq, _ = jax.lax.while_loop(
            sp_cond, sp_body, init
        )

        rhs_final = frtilde + h * (J.T @ (fam + fbm))
        if nim or nem:
            Ar, br, lor, hir = _stack_red()
            qdot1, _ = qp_pgs(Mrtilde, rhs_final, Ar, br, lor, hir, pgs_iters)
        else:
            qdot1 = r_solve(rhs_final)
        q1 = q0 + h * qdot1
        q1, qdot1, aux2, _, _ = reparam_all(topo, params, q1, qdot1, aux)
        aux2 = {**aux2, "fbm": fbm}
        return State(q=q1, qdot=qdot1, aux=aux2)

    return step
