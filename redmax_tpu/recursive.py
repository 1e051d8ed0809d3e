"""Recursive O(n) hybrid dynamics (RHD) — [Kim & Pollard 2011] as implemented
by the reference (matlab/+redmax/Joint.m:263-361, rhdPass1/2/3), plus the
O(n) M^{-1}x product used as the 'projected block Jacobi' PCG preconditioner
(Joint.m:364-450; C++ ConstraintJoint.cpp:1236-1280).

TPU mapping: the tree recursions run LEVEL-SYNCHRONOUSLY — all joints at one
depth update in parallel with one gather + batched 6x6 algebra per level
(sequential depth is the critical path; everything else is batched). Joint
quantities live in padded arrays: S [N,6,dmax] with zero columns beyond each
joint's ndof; the Psi inverse pads the singular block with identity and
masks it back out.

Quantities are in each joint's JOINT frame:
    I_j   = Ad_ij^T diag(I_i) Ad_ij          (joint-frame inertia)
    Ad_jp = Ad((E0_pj Q)^{-1})               (parent-joint -> joint)
Prescribed joints (hybrid dynamics: known qddot, solve for tau) follow the
presc branches of rhdPass2/3.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3
from redmax_tpu.model import (
    Kinematics,
    closure_forces,
    forward_kinematics,
    jacobians,
    joint_space_force,
)
from redmax_tpu.types import MAX_NDOF, Topology


def _dof_mask(topo: Topology, dtype):
    m = np.zeros((topo.njoints, MAX_NDOF))
    for j in range(topo.njoints):
        m[j, : topo.ndof[j]] = 1.0
    return jnp.asarray(m, dtype=dtype)


def _pad_q(topo: Topology, x):
    """Flat [nr] -> padded [N, dmax]."""
    out = jnp.zeros((topo.njoints, MAX_NDOF), dtype=x.dtype)
    for j in range(topo.njoints):
        d = topo.ndof[j]
        if d:
            out = out.at[j, :d].set(jax.lax.dynamic_slice(x, (topo.qstart[j],), (d,)))
    return out


def _unpad_q(topo: Topology, xp):
    """Padded [N, dmax] -> flat [nr]."""
    parts = [xp[j, : topo.ndof[j]] for j in range(topo.njoints) if topo.ndof[j]]
    return jnp.concatenate(parts) if parts else jnp.zeros(0, dtype=xp.dtype)


def _joint_frames(topo: Topology, params: Dict, kin: Kinematics):
    """(I_j [N,6,6], Ad_jp [N,6,6]) in joint frames."""
    Ad_ij = se3.Ad(se3.inv(params["E0_ji"]))           # body -> joint
    Mi = params["I_i"][:, :, None] * jnp.eye(6, dtype=Ad_ij.dtype)
    I_j = jnp.swapaxes(Ad_ij, -1, -2) @ Mi @ Ad_ij
    E_pj = params["E0_pj"] @ kin.Q
    Ad_jp = se3.Ad(se3.inv(E_pj))
    return I_j, Ad_jp


def rhd_qddot(
    topo: Topology,
    params: Dict,
    q,
    qdot,
    force_fns: Tuple = (),
    aux=None,
    presc: Tuple[int, ...] = (),
    presc_qddot=None,
):
    """Forward/hybrid dynamics: qddot [nr] (and tau at prescribed joints).

    presc: static tuple of prescribed joint indices; presc_qddot [nr] holds
    their known accelerations (rows of free joints ignored).
    Returns (qddot [nr], tau_presc [nr]).
    """
    N = topo.njoints
    dtype = q.dtype
    kin = forward_kinematics(topo, params, q, qdot, aux)
    I_j, Ad_jp = _joint_frames(topo, params, kin)
    Ad_jpT = jnp.swapaxes(Ad_jp, -1, -2)
    S, Sdot = kin.S, kin.Sdot                          # [N,6,dmax], joint frame
    dmask = _dof_mask(topo, dtype)
    qp = _pad_q(topo, q)
    qdotp = _pad_q(topo, qdot)

    # tauTotal: the reduced joint force (tau + stiffness - damping [+limits]),
    # padded per joint (rhdPass2: tauTotal = tau - Kr(q-qInit) - Dr qdot).
    frp = _pad_q(topo, joint_space_force(topo, params, q, qdot))

    # External wrenches (springs etc.) in body frame -> joint frame.
    Ad_ij = se3.Ad(se3.inv(params["E0_ji"]))
    Ad_ijT = jnp.swapaxes(Ad_ij, -1, -2)
    bd = params.get("body_damping")
    if force_fns or bd is not None:
        _, _, phi_b = jacobians(topo, params, kin, qdot)
        if force_fns:
            _, fm_cl = closure_forces(topo, params, kin, phi_b, q, qdot, force_fns)
        else:
            fm_cl = jnp.zeros((N, 6), dtype=dtype)
        if bd is not None:
            fm_cl = fm_cl - bd[:, None] * phi_b
    else:
        fm_cl = jnp.zeros((N, 6), dtype=dtype)
    R_wi = kin.E_wi[:, :3, :3]
    m = params["I_i"][:, 3]
    grav_b = jnp.einsum("nji,j->ni", R_wi, params["g"]) * m[:, None]
    Fgrav_b = jnp.concatenate([jnp.zeros_like(grav_b), grav_b], axis=-1)
    Fext = jnp.einsum("nij,nj->ni", Ad_ijT, Fgrav_b + fm_cl)  # joint frame

    levels = topo.levels
    parent = np.array([p if p >= 0 else 0 for p in topo.parent], dtype=np.int32)
    presc_mask = np.zeros(N, dtype=bool)
    for j in presc:
        presc_mask[j] = True
    qddot_presc_p = (
        _pad_q(topo, presc_qddot)
        if presc_qddot is not None
        else jnp.zeros((N, MAX_NDOF), dtype=dtype)
    )

    # ---- Pass 1 (root -> leaf): V, eta -----------------------------------
    Sqdot = jnp.einsum("nkd,nd->nk", S, qdotp)
    V = jnp.zeros((N, 6), dtype=dtype)
    for level in levels:
        lv = np.array(level, dtype=np.int32)
        Vl = Sqdot[lv]
        if topo.parent[level[0]] >= 0:
            Vl = Vl + jnp.einsum("nkl,nl->nk", Ad_jp[lv], V[parent[lv]])
        V = V.at[lv].set(Vl)
    eta = jnp.einsum("nkl,nl->nk", se3.ad(V), Sqdot) + jnp.einsum(
        "nkd,nd->nk", Sdot, qdotp
    )

    # ---- Pass 2 (leaf -> root): Ihat, Bhat, Psi, Pi, beta ----------------
    Ihat = jnp.zeros((N, 6, 6), dtype=dtype)
    Bhat = jnp.zeros((N, 6), dtype=dtype)
    Psi = jnp.zeros((N, MAX_NDOF, MAX_NDOF), dtype=dtype)
    Pi = jnp.zeros((N, 6, 6), dtype=dtype)
    beta = jnp.zeros((N, 6), dtype=dtype)
    adVT = jnp.swapaxes(se3.ad(V), -1, -2)
    Bself = -jnp.einsum("nkl,nl->nk", adVT @ I_j, V) - Fext

    eye_d = jnp.eye(MAX_NDOF, dtype=dtype)
    for level in reversed(levels):
        lv = np.array(level, dtype=np.int32)
        Ih = I_j[lv]
        Bh = Bself[lv]
        # Gather child contributions: children of lv are at deeper levels,
        # already computed. Accumulate via segment_sum over all joints whose
        # parent is in lv (static sets).
        child_idx = [i for i in range(N) if topo.parent[i] in level]
        if child_idx:
            ci = np.array(child_idx, dtype=np.int32)
            pos = np.array([level.index(topo.parent[i]) for i in child_idx], np.int32)
            contrib_I = Ad_jpT[ci] @ Pi[ci] @ Ad_jp[ci]
            contrib_B = jnp.einsum("nij,nj->ni", Ad_jpT[ci], beta[ci])
            Ih = Ih.at[pos].add(contrib_I)
            Bh = Bh.at[pos].add(contrib_B)
        Ihat = Ihat.at[lv].set(Ih)
        Bhat = Bhat.at[lv].set(Bh)

        Sl = S[lv]
        SIS = jnp.einsum("nkd,nkl,nle->nde", Sl, Ih, Sl)
        dm = dmask[lv]
        pad_fix = eye_d[None] * (1.0 - dm[:, :, None] * dm[:, None, :])
        Psil = jnp.linalg.inv(SIS + pad_fix) * (dm[:, :, None] * dm[:, None, :])
        IS = Ih @ Sl                                    # [n,6,dmax]
        Pil_free = Ih - jnp.einsum("nkd,nde,nle->nkl", IS, Psil, IS)
        tauT = frp[lv]
        Seta_B = jnp.einsum("nkd,nk->nd", Sl, jnp.einsum(
            "nkl,nl->nk", Ih, eta[lv]) + Bh)
        inner = jnp.einsum("nde,ne->nd", Psil, tauT - Seta_B)
        beta_free = Bh + jnp.einsum("nkl,nl->nk", Ih, eta[lv] + jnp.einsum(
            "nkd,nd->nk", Sl, inner))
        # Prescribed branch (hybrid): Pi = Ihat, beta = Bhat + Ihat(eta + S qddot)
        beta_presc = Bh + jnp.einsum(
            "nkl,nl->nk",
            Ih,
            eta[lv] + jnp.einsum("nkd,nd->nk", Sl, qddot_presc_p[lv]),
        )
        pm = jnp.asarray(presc_mask[lv])
        Pil = jnp.where(pm[:, None, None], Ih, Pil_free)
        betal = jnp.where(pm[:, None], beta_presc, beta_free)
        Psi = Psi.at[lv].set(Psil)
        Pi = Pi.at[lv].set(Pil)
        beta = beta.at[lv].set(betal)

    # ---- Pass 3 (root -> leaf): qddot, Vdot, (tau for prescribed) --------
    qddotp = jnp.zeros((N, MAX_NDOF), dtype=dtype)
    taup = jnp.zeros((N, MAX_NDOF), dtype=dtype)
    Vdot = jnp.zeros((N, 6), dtype=dtype)
    for level in levels:
        lv = np.array(level, dtype=np.int32)
        if topo.parent[level[0]] >= 0:
            tmp = jnp.einsum("nkl,nl->nk", Ad_jp[lv], Vdot[parent[lv]])
        else:
            tmp = jnp.zeros((len(level), 6), dtype=dtype)
        Sl = S[lv]
        Ih = Ihat[lv]
        tauT = frp[lv]
        SIte = jnp.einsum(
            "nkd,nk->nd", Sl, jnp.einsum("nkl,nl->nk", Ih, tmp + eta[lv])
        )
        SB = jnp.einsum("nkd,nk->nd", Sl, Bhat[lv])
        qdd_free = jnp.einsum("nde,ne->nd", Psi[lv], tauT - SIte - SB)
        pm = jnp.asarray(presc_mask[lv])
        qddl = jnp.where(pm[:, None], qddot_presc_p[lv], qdd_free)
        Vdl = jnp.einsum("nkd,nd->nk", Sl, qddl) + eta[lv] + tmp
        Fl = jnp.einsum("nkl,nl->nk", Ih, Vdl) + Bhat[lv]
        taul = jnp.einsum("nkd,nk->nd", Sl, Fl)
        qddotp = qddotp.at[lv].set(qddl)
        taup = taup.at[lv].set(jnp.where(pm[:, None], taul, jnp.zeros_like(taul)))
        Vdot = Vdot.at[lv].set(Vdl)

    return _unpad_q(topo, qddotp), _unpad_q(topo, taup)


def make_minv_product(topo: Topology, params: Dict, kin: Kinematics):
    """O(n) y = M^{-1} x via the 3-pass preconditioner solve
    (Joint.computeMinvProdInit/2/3, matlab/+redmax/Joint.m:364-450).

    Returns minv(x [nr]) -> [nr]. The init pass (Ihat/Psi/Pi, no velocity
    terms) is precomputed here; each call runs passes 2-3.
    """
    N = topo.njoints
    dtype = kin.S.dtype
    I_j, Ad_jp = _joint_frames(topo, params, kin)
    Ad_jpT = jnp.swapaxes(Ad_jp, -1, -2)
    S = kin.S
    dmask = _dof_mask(topo, dtype)
    levels = topo.levels
    parent = np.array([p if p >= 0 else 0 for p in topo.parent], dtype=np.int32)
    eye_d = jnp.eye(MAX_NDOF, dtype=dtype)

    Ihat = jnp.zeros((N, 6, 6), dtype=dtype)
    Psi = jnp.zeros((N, MAX_NDOF, MAX_NDOF), dtype=dtype)
    Pi = jnp.zeros((N, 6, 6), dtype=dtype)
    for level in reversed(levels):
        lv = np.array(level, dtype=np.int32)
        Ih = I_j[lv]
        child_idx = [i for i in range(N) if topo.parent[i] in level]
        if child_idx:
            ci = np.array(child_idx, dtype=np.int32)
            pos = np.array([level.index(topo.parent[i]) for i in child_idx], np.int32)
            Ih = Ih.at[pos].add(Ad_jpT[ci] @ Pi[ci] @ Ad_jp[ci])
        Sl = S[lv]
        SIS = jnp.einsum("nkd,nkl,nle->nde", Sl, Ih, Sl)
        dm = dmask[lv]
        pad_fix = eye_d[None] * (1.0 - dm[:, :, None] * dm[:, None, :])
        Psil = jnp.linalg.inv(SIS + pad_fix) * (dm[:, :, None] * dm[:, None, :])
        IS = Ih @ Sl
        Pil = Ih - jnp.einsum("nkd,nde,nle->nkl", IS, Psil, IS)
        Ihat = Ihat.at[lv].set(Ih)
        Psi = Psi.at[lv].set(Psil)
        Pi = Pi.at[lv].set(Pil)

    def minv(x):
        xp = _pad_q(topo, x)
        # Pass 2 (leaf -> root): Bhat, beta
        Bhat = jnp.zeros((N, 6), dtype=dtype)
        beta = jnp.zeros((N, 6), dtype=dtype)
        for level in reversed(levels):
            lv = np.array(level, dtype=np.int32)
            Bh = jnp.zeros((len(level), 6), dtype=dtype)
            child_idx = [i for i in range(N) if topo.parent[i] in level]
            if child_idx:
                ci = np.array(child_idx, dtype=np.int32)
                pos = np.array(
                    [level.index(topo.parent[i]) for i in child_idx], np.int32
                )
                Bh = Bh.at[pos].add(
                    jnp.einsum("nij,nj->ni", Ad_jpT[ci], beta[ci])
                )
            Sl = S[lv]
            SB = jnp.einsum("nkd,nk->nd", Sl, Bh)
            inner = jnp.einsum("nde,ne->nd", Psi[lv], xp[lv] - SB)
            betal = Bh + jnp.einsum(
                "nkl,nl->nk", Ihat[lv], jnp.einsum("nkd,nd->nk", Sl, inner)
            )
            Bhat = Bhat.at[lv].set(Bh)
            beta = beta.at[lv].set(betal)
        # Pass 3 (root -> leaf): qddot, Vdot
        yp = jnp.zeros((N, MAX_NDOF), dtype=dtype)
        Vdot = jnp.zeros((N, 6), dtype=dtype)
        for level in levels:
            lv = np.array(level, dtype=np.int32)
            if topo.parent[level[0]] >= 0:
                tmp = jnp.einsum("nkl,nl->nk", Ad_jp[lv], Vdot[parent[lv]])
            else:
                tmp = jnp.zeros((len(level), 6), dtype=dtype)
            Sl = S[lv]
            SIt = jnp.einsum(
                "nkd,nk->nd", Sl, jnp.einsum("nkl,nl->nk", Ihat[lv], tmp)
            )
            SB = jnp.einsum("nkd,nk->nd", Sl, Bhat[lv])
            qddl = jnp.einsum("nde,ne->nd", Psi[lv], xp[lv] - SIt - SB)
            Vdl = jnp.einsum("nkd,nd->nk", Sl, qddl) + tmp
            yp = yp.at[lv].set(qddl)
            Vdot = Vdot.at[lv].set(Vdl)
        return _unpad_q(topo, yp)

    return minv
