"""Constraint subsystem: equality/inequality x maximal/reduced rows.

Mirrors the reference Constraint hierarchy (matlab/+redmax/Constraint.m:80-199
— computeJacEqM/EqR/IneqM/IneqR and the scatter-backs) as pure closures over
the compiled scene. Each constraint contributes FIXED-size row blocks
(static counts set at scene compile); inequality activity becomes a boolean
mask instead of MATLAB's dynamic active lists (getActiveList, :62), so the
whole constrained solve jits and vmaps.

Row protocol — a constraint object exposes any of:

    eq_m(params, topo, kin, phi, q, qdot)   -> (G [k,6N], g [k], gdot [k])
    eq_r(params, topo, kin, phi, q, qdot)   -> (G [k,nr], g [k], gdot [k])
    ineq_m(...)                             -> (C [k,6N], c [k], act [k] bool)
    ineq_r(...)                             -> (C [k,nr], c [k], act [k] bool)

with static row counts in .n_eq_m / .n_eq_r / .n_ineq_m / .n_ineq_r.
Per-constraint parameters live in params["constraints"][key].
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3


class _ConstraintBase:
    n_eq_m = 0
    n_eq_r = 0
    n_ineq_m = 0
    n_ineq_r = 0

    def __init__(self, key: str):
        self.key = key

    def p(self, params: Dict) -> Dict:
        return params["constraints"][self.key]


class ConstraintLoop(_ConstraintBase):
    """Loop-closure 'spherical-lite' constraint between two body points.

    Reference: matlab/+redmax/ConstraintLoop.m:44-76 — two rows along the
    directions v1, v2 orthonormal to body A's hinge axis in world frame:
        Gm[A] =  v12^T R_wa Gamma(xA),  Gm[B] = -v12^T R_wb Gamma(xB)
        g = v12^T (x_wA - x_wB)
    params: xA [3], xB [3], axisA [3] (the hinge axis of A's joint).
    """

    n_eq_m = 2

    def __init__(self, key, bodyA: int, bodyB: int):
        super().__init__(key)
        self.bodyA = bodyA
        self.bodyB = bodyB

    def _v12(self, R_wa, axis):
        v0 = R_wa @ axis
        # Branchless argmin-onehot of |v0| (ConstraintLoop.m picks the
        # world axis least aligned with the hinge to build the basis).
        imin = jnp.argmin(jnp.abs(v0))
        v1 = jax.nn.one_hot(imin, 3, dtype=v0.dtype)
        v2 = jnp.cross(v0, v1)
        v2 = v2 / jnp.linalg.norm(v2)
        v1 = jnp.cross(v2, v0)
        v1 = v1 / jnp.linalg.norm(v1)
        return jnp.stack([v1, v2], axis=-1)  # [3,2]

    def eq_m(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        N = topo.njoints
        E_wa = kin.E_wi[self.bodyA]
        E_wb = kin.E_wi[self.bodyB]
        R_wa, R_wb = E_wa[:3, :3], E_wb[:3, :3]
        v12 = self._v12(R_wa, cp["axisA"])
        GA = se3.Gamma(cp["xA"])                 # [3,6]
        GB = se3.Gamma(cp["xB"])
        G = jnp.zeros((2, 6 * N), dtype=q.dtype)
        G = G.at[:, 6 * self.bodyA: 6 * self.bodyA + 6].set(v12.T @ R_wa @ GA)
        G = G.at[:, 6 * self.bodyB: 6 * self.bodyB + 6].set(-(v12.T @ R_wb @ GB))
        xwA = R_wa @ cp["xA"] + E_wa[:3, 3]
        xwB = R_wb @ cp["xB"] + E_wb[:3, 3]
        g = v12.T @ (xwA - xwB)
        gdot = jnp.zeros_like(g)
        return G, g, gdot


class ConstraintJointLimit(_ConstraintBase):
    """Inequality revolute joint limit (matlab/+redmax/ConstraintJointLimit.m:30-47).

    Active-set switching becomes a mask; the row sign selects which bound.
    params: ql [], qu [].
    """

    n_ineq_r = 1

    def __init__(self, key, joint_dof: int):
        super().__init__(key)
        self.dof = joint_dof  # index into the flat q

    def ineq_r(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        qj = q[self.dof]
        at_lower = qj <= cp["ql"]
        at_upper = qj >= cp["qu"]
        act = at_lower | at_upper
        sign = jnp.where(at_lower, -1.0, 1.0)
        C = jnp.zeros((1, topo.nr), dtype=q.dtype).at[0, self.dof].set(sign)
        c = jnp.where(at_lower, cp["ql"] - qj, cp["qu"] - qj)[None]
        return C, c, act[None]


class ConstraintFloor(_ConstraintBase):
    """Unilateral sphere-vs-plane contact (matlab/+redmax/ConstraintFloor.m:16-45).

    params: E [4,4] floor frame (z-up), radius [].
    """

    n_ineq_m = 1

    def __init__(self, key, body: int):
        super().__init__(key)
        self.body = body

    def ineq_m(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        N = topo.njoints
        E_wi = kin.E_wi[self.body]
        r = cp["radius"]
        E_f = cp["E"]
        x_w = E_wi[:3, 3]
        x_f = se3.inv(E_f) @ jnp.concatenate([x_w, jnp.ones(1, dtype=q.dtype)])
        z = x_f[2]
        act = z < r
        # Contact point in body frame (ConstraintFloor.m:31-37)
        x_c = x_f.at[2].add(-r)
        x_b = se3.inv(E_wi) @ (E_f @ x_c)
        G = se3.Gamma(x_b[:3])
        nor = E_f[:3, 2]
        R = E_wi[:3, :3]
        row = -(nor @ R @ G)
        C = jnp.zeros((1, 6 * N), dtype=q.dtype)
        C = C.at[0, 6 * self.body: 6 * self.body + 6].set(row)
        c = (r - z)[None]
        return C, c, act[None]


class ConstraintMultQ(_ConstraintBase):
    """Gear coupling qB = factor * qA (matlab/+redmax/ConstraintMultQ.m:14-45)."""

    n_eq_r = 1

    def __init__(self, key, dofA: int, dofB: int):
        super().__init__(key)
        self.dofA = dofA
        self.dofB = dofB

    def eq_r(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        C = jnp.zeros((1, topo.nr), dtype=q.dtype)
        C = C.at[0, self.dofA].set(cp["factor"]).at[0, self.dofB].set(-1.0)
        g = (cp["factor"] * q[self.dofA] - q[self.dofB])[None]
        return C, g, jnp.zeros_like(g)


class ConstraintPrescJoint(_ConstraintBase):
    """Prescribed joint velocity (matlab/+redmax/ConstraintPrescJoint.m:16-42,
    velocity-level): row -I on the joint DOFs, target grdot = -qdot_target
    so the KKT row enforces qdot = qdot_target. params: qdot_target [d].
    """

    def __init__(self, key, dofs: Sequence[int]):
        super().__init__(key)
        self.dofs = tuple(dofs)
        self.n_eq_r = len(self.dofs)

    def eq_r(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        d = len(self.dofs)
        C = jnp.zeros((d, topo.nr), dtype=q.dtype)
        for k, dof in enumerate(self.dofs):
            C = C.at[k, dof].set(-1.0)
        # Position feedback when a q_target is prescribed (the reference's
        # gr = presc.q - joint.q enters rhsG via baumgarte,
        # ConstraintPrescJoint.m:22-28).
        qt = cp.get("q_target")
        if qt is not None:
            g = qt - q[jnp.asarray(self.dofs)]
        else:
            g = jnp.zeros(d, dtype=q.dtype)
        gdot = cp["qdot_target"]
        return C, g, gdot

    def eq_r_acc(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        qddt = cp.get("qddot_target")
        if qddt is None:
            return jnp.zeros(len(self.dofs), dtype=q.dtype)
        return qddt


class ConstraintPrescBody(_ConstraintBase):
    """Prescribed body motion on selected twist components
    (matlab/+redmax/ConstraintPrescBody.m:17-45, velocity level).
    params: phi_target [len(comps)]. comps are 0-based twist indices.
    """

    def __init__(self, key, body: int, comps: Sequence[int]):
        super().__init__(key)
        self.body = body
        self.comps = tuple(comps)
        self.n_eq_m = len(self.comps)

    def eq_m(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        N = topo.njoints
        d = len(self.comps)
        G = jnp.zeros((d, 6 * N), dtype=q.dtype)
        for k, comp in enumerate(self.comps):
            G = G.at[k, 6 * self.body + comp].set(-1.0)
        g = jnp.zeros(d, dtype=q.dtype)
        gdot = cp["phi_target"]
        return G, g, gdot


class ConstraintPrescJointM(_ConstraintBase):
    """Prescribe a revolute joint purely via maximal rows
    (matlab/+redmax/ConstraintPrescJointM.m:31-60): one row selecting the
    joint-frame angular component along the hinge axis,
        Gm[child] = row_a(Ad_ji),  Gm[parent] = -row_a(Ad_ji Ad_iw Ad_wp),
    gdot = qdot_target (velocity-level only, as the reference enforces).
    axis_idx: 0/1/2 for x/y/z hinge axes. params: qdot_target [].
    """

    n_eq_m = 1

    def __init__(self, key, joint: int, parent_joint: int, axis_idx: int):
        super().__init__(key)
        self.joint = joint
        self.parent = parent_joint
        self.axis_idx = axis_idx

    def eq_m(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        N = topo.njoints
        dtype = q.dtype
        Ad_ji = se3.Ad(params["E0_ji"][self.joint])
        row_I = Ad_ji[self.axis_idx]
        E_ip = se3.inv(kin.E_wi[self.joint]) @ kin.E_wi[self.parent]
        row_P = -(Ad_ji @ se3.Ad(E_ip))[self.axis_idx]
        G = jnp.zeros((1, 6 * N), dtype=dtype)
        G = G.at[0, 6 * self.joint: 6 * self.joint + 6].set(row_I)
        G = G.at[0, 6 * self.parent: 6 * self.parent + 6].set(row_P)
        g = jnp.zeros(1, dtype=dtype)
        gdot = jnp.reshape(cp["qdot_target"], (1,))
        return G, g, gdot


class ConstraintPrescBodyW(_ConstraintBase):
    """Prescribed body motion with WORLD-frame linear targets
    (ConstraintPrescBody + the sceneFcn13/20 transform,
    testRedMaxScenes.m:1237-1279): targets vt_w (world linear velocity) and
    wt_i (body angular velocity) become body-twist targets
        phi_t = [wt_i; R^T vt_w]
    and acceleration targets
        phidot_t = [wtdot_i; R^T vtdot_w - w x (R^T vt_w)].
    params: vt_w, wt_i, vtdot_w, wtdot_i (all [3], typically time-varying
    via scene_fn). comps: 0-based twist component indices.
    """

    def __init__(self, key, body: int, comps: Sequence[int]):
        super().__init__(key)
        self.body = body
        self.comps = tuple(comps)
        self.n_eq_m = len(self.comps)

    def _targets(self, params, kin, phi):
        cp = self.p(params)
        R = kin.E_wi[self.body][:3, :3]
        vt_i = R.T @ cp["vt_w"]
        phi_t = jnp.concatenate([cp["wt_i"], vt_i])
        w = phi[self.body][:3]
        phidot_t = jnp.concatenate(
            [cp["wtdot_i"], R.T @ cp["vtdot_w"] - jnp.cross(w, vt_i)]
        )
        sel = jnp.asarray(self.comps)
        return phi_t[sel], phidot_t[sel]

    def eq_m(self, params, topo, kin, phi, q, qdot):
        N = topo.njoints
        d = len(self.comps)
        G = jnp.zeros((d, 6 * N), dtype=q.dtype)
        for k, comp in enumerate(self.comps):
            G = G.at[k, 6 * self.body + comp].set(-1.0)
        g = jnp.zeros(d, dtype=q.dtype)
        gdot, _ = self._targets(params, kin, phi)
        return G, g, gdot

    def eq_m_acc(self, params, topo, kin, phi, q, qdot):
        """gddot rows for the acceleration-level (ode45) path."""
        _, gddot = self._targets(params, kin, phi)
        return gddot


class ConstraintAttachPoint(_ConstraintBase):
    """Welds a point-mass node body to a point on a rigid body (or world).

    Reference: ConstraintAttachSpring (matlab/+redmax/ConstraintAttachSpring.m:23-60):
    g = E r - x, G = [R Gamma(r), -I]. body = -1 attaches to a fixed world
    point params["r"]. params: r [3] (body-local or world point).
    """

    n_eq_m = 3

    def __init__(self, key, body: int, node_body: int):
        super().__init__(key)
        self.body = body
        self.node = node_body

    def eq_m(self, params, topo, kin, phi, q, qdot):
        cp = self.p(params)
        N = topo.njoints
        dtype = q.dtype
        G = jnp.zeros((3, 6 * N), dtype=dtype)
        # node world velocity = [0 I] phi_node (node rotation is identity)
        G = G.at[:, 6 * self.node + 3: 6 * self.node + 6].set(
            -jnp.eye(3, dtype=dtype)
        )
        x_node = kin.E_wi[self.node, :3, 3]
        if self.body >= 0:
            E_b = kin.E_wi[self.body]
            R_b = E_b[:3, :3]
            G = G.at[:, 6 * self.body: 6 * self.body + 6].set(
                R_b @ se3.Gamma(cp["r"])
            )
            x_pt = R_b @ cp["r"] + E_b[:3, 3]
        else:
            x_pt = cp["r"]
        g = x_pt - x_node
        return G, g, jnp.zeros_like(g)


def assemble_constraints(
    constraint_fns: Tuple,
    params: Dict,
    topo,
    kin,
    phi,
    q,
    qdot,
    J,
):
    """Stack all constraint rows into reduced-space (G, rhs-pieces, masks).

    Returns dict with:
      Geq [me, nr], geq [me], geqdot [me]   (maximal rows premultiplied by J,
                                             matlab/testRedMax.m:492: G = [Gm*J; Gr])
      Cin [mi, nr], cin [mi], act [mi]
    me/mi are static totals over all constraints (0 if none).
    """
    nr = topo.nr
    dtype = q.dtype
    Geq: List = []
    geq: List = []
    geqdot: List = []
    geqddot: List = []
    Cin: List = []
    cin: List = []
    act: List = []

    def acc_rows(con, nrows):
        if hasattr(con, "eq_m_acc"):
            return con.eq_m_acc(params, topo, kin, phi, q, qdot)
        if hasattr(con, "eq_r_acc"):
            return con.eq_r_acc(params, topo, kin, phi, q, qdot)
        return jnp.zeros(nrows, dtype=dtype)

    for con in constraint_fns:
        if con.n_eq_m:
            G, g, gd = con.eq_m(params, topo, kin, phi, q, qdot)
            Geq.append(G @ J)
            geq.append(g)
            geqdot.append(gd)
            geqddot.append(acc_rows(con, con.n_eq_m))
        if con.n_eq_r:
            G, g, gd = con.eq_r(params, topo, kin, phi, q, qdot)
            Geq.append(G)
            geq.append(g)
            geqdot.append(gd)
            geqddot.append(acc_rows(con, con.n_eq_r))
        if con.n_ineq_m:
            C, c, a = con.ineq_m(params, topo, kin, phi, q, qdot)
            Cin.append(C @ J)
            cin.append(c)
            act.append(a)
        if con.n_ineq_r:
            C, c, a = con.ineq_r(params, topo, kin, phi, q, qdot)
            Cin.append(C)
            cin.append(c)
            act.append(a)

    def cat(lst, width):
        if not lst:
            return jnp.zeros((0, width), dtype=dtype) if width else jnp.zeros(
                (0,), dtype=dtype
            )
        return jnp.concatenate(lst, axis=0)

    return {
        "Geq": cat(Geq, nr),
        "geq": cat(geq, 0),
        "geqdot": cat(geqdot, 0),
        "geqddot": cat(geqddot, 0),
        "Cin": cat(Cin, nr),
        "cin": cat(cin, 0),
        "act": (
            jnp.concatenate(act, axis=0)
            if act
            else jnp.zeros((0,), dtype=bool)
        ),
    }
