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


class FrictionModel(NamedTuple):
    """Static friction data for a compiled scene.

    ring_joints: joint indices with internal-friction rings (static tuple).
    pos/nor/tan: [R, C, 3] ring geometry in child-body frame.
    floor_cons: tuple of ConstraintFloor objects with external friction.
    nt: total tangent rows = R*C + 2*len(floor_cons).
    """

    ring_joints: Tuple[int, ...]
    pos: np.ndarray
    nor: np.ndarray
    tan: np.ndarray
    floor_cons: Tuple


def build_friction_model(
    topo: Topology, joint_specs, body_specs, constraint_fns
) -> FrictionModel:
    """Collect rings for all revolute joints + floor constraints with
    external friction. joint_specs/body_specs: SceneBuilder spec lists
    (joint i owns body i; E_ij = inv(body.E_ji))."""
    from redmax_tpu.types import JointType

    ring_joints, pos, nor, tan = [], [], [], []
    for j, spec in enumerate(joint_specs):
        if spec.jtype == JointType.REVOLUTE:
            E_ij = np.linalg.inv(np.asarray(body_specs[j].E_ji))
            p, n, t = revolute_ring(spec.params["axis"], E_ij)
            ring_joints.append(j)
            pos.append(p); nor.append(n); tan.append(t)
    floor = tuple(c for c in constraint_fns if isinstance(c, ConstraintFloor))
    return FrictionModel(
        ring_joints=tuple(ring_joints),
        pos=np.stack(pos) if pos else np.zeros((0, RING_C, 3)),
        nor=np.stack(nor) if nor else np.zeros((0, RING_C, 3)),
        tan=np.stack(tan) if tan else np.zeros((0, RING_C, 3)),
        floor_cons=floor,
    )


def _gamma_rows(vec, pos):
    """rows v^T Gamma(p): [C,3],[C,3] -> [C,6]."""
    G = se3.Gamma(pos)                       # [C,3,6]
    return jnp.einsum("ci,cij->cj", vec, G)


def tangent_matrix(fm: FrictionModel, topo: Topology, kin, params, q, qdot):
    """T [nt, 6N] (Joint.computeTangentMatrix, JointRevolute.m:83-96 +
    ConstraintFloor.computeTangentMatrix_)."""
    N = topo.njoints
    dtype = q.dtype
    rows = []
    for r, j in enumerate(fm.ring_joints):
        pos = jnp.asarray(fm.pos[r], dtype=dtype)
        tan = jnp.asarray(fm.tan[r], dtype=dtype)
        Tj = jnp.zeros((RING_C, 6 * N), dtype=dtype)
        Tj = Tj.at[:, 6 * j: 6 * j + 6].set(_gamma_rows(tan, pos))
        p = topo.parent[j]
        if p >= 0:
            E_pi = se3.inv(kin.E_wi[p]) @ kin.E_wi[j]
            R_pi = E_pi[:3, :3]
            tan_p = tan @ R_pi.T
            pos_p = pos @ R_pi.T + E_pi[:3, 3]
            Tj = Tj.at[:, 6 * p: 6 * p + 6].set(-_gamma_rows(tan_p, pos_p))
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
        tan_a = R_wi.T @ E_f[:3, :2]          # [3,2] floor x/y in body frame
        Tc = jnp.zeros((2, 6 * N), dtype=dtype)
        rows2 = _gamma_rows(tan_a.T, jnp.broadcast_to(x_b, (2, 3)))
        Tc = Tc.at[:, 6 * con.body: 6 * con.body + 6].set(rows2)
        rows.append(Tc)
    if not rows:
        return jnp.zeros((0, 6 * N), dtype=dtype)
    return jnp.concatenate(rows, axis=0)


def scatter_contact_force(fm: FrictionModel, topo: Topology, kin, fam):
    """fam [6N] -> per-joint reaction wrenches fc [N, 6].

    Backward traversal (Joint.scatterContactForce, Joint.m:652-679):
    in reverse topological order, take the body's accumulated force as the
    joint reaction, then add its parent-transformed negation to the parent.
    """
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
    """Per-ring multipliers a [R, C] (Joint.computeContactMultiplier)."""
    dtype = fc.dtype
    outs = []
    for r, j in enumerate(fm.ring_joints):
        pos = jnp.asarray(fm.pos[r], dtype=dtype)
        nor = jnp.asarray(fm.nor[r], dtype=dtype)
        p = topo.parent[j]
        Nrows_child = _gamma_rows(nor, pos)             # [C,6]
        if p >= 0:
            E_pi = se3.inv(kin.E_wi[p]) @ kin.E_wi[j]
            R_pi = E_pi[:3, :3]
            nor_p = nor @ R_pi.T
            pos_p = pos @ R_pi.T + E_pi[:3, 3]
            Nrows_par = -_gamma_rows(nor_p, pos_p)
            Nmat = jnp.concatenate([Nrows_child, Nrows_par], axis=1)  # [C,12]
            Minv = jnp.concatenate(
                [1.0 / params["I_i"][j], 1.0 / params["I_i"][p]]
            )
            E_ip = se3.inv(kin.E_wi[j]) @ kin.E_wi[p]
            fvec = jnp.concatenate([fc[j], -se3.Ad(E_ip).T @ fc[j]])
        else:
            Nmat = Nrows_child
            Minv = 1.0 / params["I_i"][j]
            fvec = fc[j]
        H = jnp.einsum("ck,k,dk->cd", Nmat, Minv, Nmat) + SPreg * jnp.eye(
            RING_C, dtype=dtype
        )
        H = 0.5 * (H + H.T)
        fq = (Nmat @ (Minv * fvec)) * h
        outs.append(jnp.linalg.solve(H, fq))
    return jnp.stack(outs) if outs else jnp.zeros((0, RING_C), dtype=dtype)


def friction_bounds(fm: FrictionModel, a_ring, a_floor, mu_int, mu_ext, dtype):
    """Box bounds bl/bu [nt] (computeFrictionLimits; pairs combined)."""
    bls, bus = [], []
    for r in range(len(fm.ring_joints)):
        a = a_ring[r]
        pair = jnp.abs(a[0::2]) + jnp.abs(a[1::2])      # [C/2]
        lim = jnp.zeros(RING_C, dtype=dtype).at[0::2].set(mu_int * pair)
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

    Handles the reference's nem == 0 branches (no equality constraints):
    pure internal friction (testRedMax.m:713-750) and floor-contact external
    friction (testRedMax.m:607-711 with nim > 0).
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
    n_ring = len(fm_model.ring_joints)
    nt = n_ring * RING_C + 2 * len(floors)

    def step(params: Dict, state):
        q0, qdot0, aux = state.q, state.qdot, state.aux
        # fbm (friction force) warm-starts ACROSS steps: the reference
        # initializes it once outside the time loop (testRedMax.m:562).
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

        # Floor inequality rows (maximal) with active masks.
        nim = len(floors)
        if nim:
            Cm_rows, cm_vals, acts = [], [], []
            for con in floors:
                C, c, a = con.ineq_m(params, topo, kin, phi, q0, qdot0)
                Cm_rows.append(C); cm_vals.append(c); acts.append(a)
            Cm = jnp.concatenate(Cm_rows)                  # [nim, 6N]
            cm = jnp.concatenate(cm_vals)
            act = jnp.concatenate(acts)
            Cm = Cm * act.astype(dtype)[:, None]
            rhsC = jnp.where(act, -baum3 * cm, 0.0)
            CmJ = Cm @ J
            lo_c = jnp.zeros(nim, dtype)
            hi_c = jnp.where(act, jnp.inf, 0.0)

        Mmt_inv = jnp.linalg.inv(Mmtilde)
        Mrt_lu = jax.scipy.linalg.lu_factor(Mrtilde)
        r_solve = lambda b: jax.scipy.linalg.lu_solve(Mrt_lu, b)

        def contact_pass(fbm):
            """-> (fam [6N], a_floor [nim])."""
            rhsM = fmtilde + h * fbm
            if nim:
                vuncb, _ = qp_pgs(Mmtilde, rhsM, Cm, rhsC, lo_c, hi_c, pgs_iters)
                solr, lam = qp_pgs(
                    Mrtilde, frtilde + h * (J.T @ fbm), CmJ, rhsC,
                    lo_c, hi_c, pgs_iters,
                )
                vconb = J @ solr
                a_floor = lam
            else:
                vuncb = Mmt_inv @ rhsM
                vconb = J @ r_solve(frtilde + h * (J.T @ fbm))
                a_floor = jnp.zeros(0, dtype)
            fam = Mmtilde @ (vconb - vuncb) / h
            return fam, a_floor

        def friction_pass(fam, a_floor):
            fc = scatter_contact_force(fm_model, topo, kin, fam)
            a_ring = contact_multipliers(
                fm_model, topo, params, kin, fc, h, sp_reg
            )
            bl, bu = friction_bounds(
                fm_model, a_ring, a_floor, mu_int, mu_ext, dtype
            )
            Hf = T @ (Mmt_inv @ T.T)
            Hf = 0.5 * (Hf + Hf.T)
            ff = T @ (Mmt_inv @ (fmtilde + h * fam))
            # Boxed QP: min 1/2 b^T Hf b - ff^T b, bl <= b <= bu. Dual PGS
            # with A = I reduces to PGS on Hf itself with box projection.
            m = Hf.shape[0]
            diag = jnp.diagonal(Hf)
            safe = jnp.where(jnp.abs(diag) < 1e-12, 1.0, diag)

            def row(b, i):
                resid = ff[i] - Hf[i] @ b + diag[i] * b[i]
                return b.at[i].set(jnp.clip(resid / safe[i], bl[i], bu[i])), None

            def sweep(b, _):
                b, _ = jax.lax.scan(row, b, jnp.arange(m))
                return b, None

            b0 = jnp.zeros(m, dtype)
            b, _ = jax.lax.scan(sweep, b0, None, length=pgs_iters)
            return -(T.T @ b) / h

        def sp_cond(carry):
            it, done, fbm, fam, a_floor, fam0 = carry
            return (~done) & (it < sp_iter_max)

        def sp_body(carry):
            it, done, fbm, fam_prev, a_floor_prev, fam0 = carry
            fam, a_floor = contact_pass(fbm)
            dfam = fam - fam0
            num = dfam @ (Mmt_inv @ dfam)
            den = fam @ (Mmt_inv @ fam)
            conv = num / jnp.where(den == 0, 1.0, den) < sp_conv
            fbm_new = jnp.where(conv, fbm, friction_pass(fam, a_floor))
            return (it + 1, conv, fbm_new, fam, a_floor, fam)

        fbm0 = fbm_prev if fbm_prev is not None else jnp.zeros(nm, dtype)
        init = (
            jnp.zeros((), jnp.int32), jnp.asarray(False), fbm0,
            jnp.zeros(nm, dtype), jnp.zeros(nim if nim else 0, dtype),
            jnp.zeros(nm, dtype),
        )
        it, done, fbm, fam, a_floor, _ = jax.lax.while_loop(
            sp_cond, sp_body, init
        )

        rhs_final = frtilde + h * (J.T @ (fam + fbm))
        if nim:
            qdot1, _ = qp_pgs(Mrtilde, rhs_final, CmJ, rhsC, lo_c, hi_c, pgs_iters)
        else:
            qdot1 = r_solve(rhs_final)
        q1 = q0 + h * qdot1
        q1, qdot1, aux2, _, _ = reparam_all(topo, params, q1, qdot1, aux)
        aux2 = {**aux2, "fbm": fbm}
        return State(q=q1, qdot=qdot1, aux=aux2)

    return step
