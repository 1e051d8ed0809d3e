"""Kinematics and dynamics assembly: the RedMax core, TPU-first.

Replaces the reference's recursive linked-list sweeps with dense batched
block algebra:

  * Forward kinematics: ONE level-synchronous product chain over tree depth
    (vs. Joint.update's root-to-leaf pointer walk, Joint.m:382-434).
  * Jacobian: the reference propagates J(i,a) = A_BiBp J(p,a) down the tree
    (Joint.m:490-613, O(n^2) sequential). Here it is the closed form

        J[i,a] = Ad(E_i<-a) A0_ij(a) S_a          for a ancestor-or-self of i

    evaluated for ALL (i,a) pairs at once as masked [N,N,6,6] block products
    — two dense einsums that map straight onto the MXU.
  * Jdot: closed form via body twists phi = J qdot and
        d/dt Ad(E_ia) = Ad(E_ia) ad(phi_a) - ad(phi_i) Ad(E_ia),
    equivalent to the reference's Adot_BiBp propagation (Joint.m:545-552).
  * Assembly (computeValues, driverRedMaxBDF1.m:190-243):
        M = J^T Mm J,  fqvv = -J^T Mm Jdot qdot,  f = fr + J^T fm + fqvv
    with Mm block-diagonal so Mm @ J is an elementwise scale, and the single
    big contraction J^T (Mm J) is one [nr x 6N] @ [6N x nr] matmul.

All functions take a static Topology (closed over / passed as Python object)
plus a SceneParams pytree and flat (q, qdot); they are pure, jit-safe, and
vmap cleanly over leading batch dimensions of (params, q, qdot).
"""

from functools import partial
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3
from redmax_tpu.joints import KERNELS, joint_QSSdot, joint_reparam
from redmax_tpu.types import EULER_CHART_TYPES, MAX_NDOF, NDOF, JointType, Topology


class Kinematics(NamedTuple):
    Q: Any        # [N,4,4] local joint transforms
    E_wj: Any     # [N,4,4] joint frames in world
    E_wi: Any     # [N,4,4] body frames in world
    S: Any        # [N,6,MAX_NDOF] padded motion subspaces (joint frame)
    Sdot: Any     # [N,6,MAX_NDOF]


def _type_q_indices(topo: Topology, jt: int, members: Tuple[int, ...]) -> np.ndarray:
    d = NDOF[JointType(jt)]
    return np.array(
        [[topo.qstart[m] + k for k in range(d)] for m in members], dtype=np.int32
    ).reshape(len(members), d)


def joint_params_for(params: Dict, jt: int) -> Dict:
    return params.get("joint", {}).get(str(int(jt)), {})


def forward_kinematics(topo: Topology, params: Dict, q, qdot, aux=None) -> Kinematics:
    """Evaluate all joint kernels + the world-transform chain.

    aux: State.aux dict; delivers per-joint dynamic chart indices to the
    SPHERICAL_EULER kernel (JointSpherical chart state).
    """
    N = topo.njoints
    dtype = q.dtype
    Q = jnp.zeros((N, 4, 4), dtype=dtype)
    S = jnp.zeros((N, 6, MAX_NDOF), dtype=dtype)
    Sdot = jnp.zeros((N, 6, MAX_NDOF), dtype=dtype)

    for jt, members in topo.type_groups().items():
        jt_enum = JointType(jt)
        d = NDOF[jt_enum]
        idx = _type_q_indices(topo, jt, members)
        qg = q[idx]          # [G, d]
        qdotg = qdot[idx]    # [G, d]
        pg = joint_params_for(params, jt)
        if jt_enum in EULER_CHART_TYPES:
            ej = topo.euler_joints()
            sel = np.array([ej.index(m) for m in members], dtype=np.int32)
            pg = {**pg, "chart": aux["euler_chart"][sel]}
        Qg, Sg, Sdotg = jax.vmap(
            partial(joint_QSSdot, jt_enum), in_axes=(0, 0, 0 if pg else None)
        )(qg, qdotg, pg)
        mem = np.array(members, dtype=np.int32)
        Q = Q.at[mem].set(Qg)
        if d > 0:
            pad = ((0, 0), (0, 0), (0, MAX_NDOF - d))
            S = S.at[mem].set(jnp.pad(Sg, pad))
            Sdot = Sdot.at[mem].set(jnp.pad(Sdotg, pad))

    # E_pj = E0_pj @ Q (Joint.m:404: E_pj = E0_pj * Q)
    E_pj = params["E0_pj"] @ Q

    # World chain by static pointer doubling: O(log depth) rounds of one
    # gather + one batched 4x4 matmul each (see Topology.doubling_rounds).
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (1, 4, 4))
    E_ext = jnp.concatenate([E_pj, eye], axis=0)       # node N = world (I)
    for ptr in topo.doubling_rounds():
        E_ext = E_ext[ptr] @ E_ext
    E_wj = E_ext[:N]

    E_wi = E_wj @ params["E0_ji"]
    return Kinematics(Q=Q, E_wj=E_wj, E_wi=E_wi, S=S, Sdot=Sdot)


def jacobians(topo: Topology, params: Dict, kin: Kinematics, qdot):
    """Dense J, Jdot in [nm, nr], plus body twists phi [N, 6].

    Closed-form replacement for Joint.computeJacobian (Joint.m:490-613),
    in world-frame column form (no O(N^2) pairwise tensors — the hot path
    under jacfwd, where every intermediate is multiplied by nr tangents):

        column r (DOF d of joint a):  W[:, r] = Ad(E_w,body_a) Sb_a[:, d]
        J[i, r] = anc(i, a) * Ad(E_i<-w) W[:, r]

    and the time derivatives follow from d/dt Ad(E_wa) = Ad(E_wa) ad(phi_a),
    d/dt Ad(E_iw) = -ad(phi_i) Ad(E_iw):

        Wdot[:, r] = Ad(E_w,body_a) (ad(phi_a) Sb + Sbdot)[:, d]
        Jdot[i, r] = anc * (Ad_iw Wdot[:, r]) - ad(phi_i) J[i, r].
    """
    N = topo.njoints
    dtype = kin.S.dtype
    dofj = topo.dof_joint()                            # [nr] owning joint
    dofd = np.concatenate(
        [np.arange(topo.ndof[j]) for j in range(N) if topo.ndof[j]]
    ).astype(np.int32) if topo.nr else np.zeros(0, np.int32)
    ancd = jnp.asarray(topo.ancestor_mask()[:, dofj], dtype=dtype)  # [N, nr]

    A0_ij = se3.Ad(se3.inv(params["E0_ji"]))          # Body.m: A0_ij = Ad(E0_ij)
    Sb = A0_ij @ kin.S                                # [N,6,dmax] body-frame S
    Sbdot = A0_ij @ kin.Sdot

    Ad_wb = se3.Ad(kin.E_wi)                          # [N,6,6] body->world
    Ad_bw = se3.Ad(se3.inv(kin.E_wi))                 # [N,6,6] world->body

    # World-frame subspace columns: W[r] = Ad_wb[dofj[r]] @ Sb[dofj[r], :, dofd[r]]
    Sb_cols = Sb[dofj, :, dofd]                       # [nr,6]
    W = jnp.einsum("rkl,rl->rk", Ad_wb[dofj], Sb_cols)  # [nr,6]

    Jblk = ancd[:, None, :] * jnp.einsum("ikl,rl->ikr", Ad_bw, W)  # [N,6,nr]
    J = Jblk.reshape(6 * N, topo.nr)

    phi = (J @ qdot).reshape(N, 6)                    # body twists (Body.m:79)
    adphi = se3.ad(phi)                               # [N,6,6]

    Sbdot_eff = jnp.einsum("akl,ald->akd", adphi, Sb) + Sbdot
    Wdot = jnp.einsum(
        "rkl,rl->rk", Ad_wb[dofj], Sbdot_eff[dofj, :, dofd]
    )                                                 # [nr,6]
    Jdotblk = ancd[:, None, :] * jnp.einsum("ikl,rl->ikr", Ad_bw, Wdot) - jnp.einsum(
        "ikl,ilr->ikr", adphi, Jblk
    )
    Jdot = Jdotblk.reshape(6 * N, topo.nr)
    return J, Jdot, phi


def joint_space_force(topo: Topology, params: Dict, q, qdot):
    """Reduced-space joint forces fr [nr]: torque, stiffness, damping, limits.

    Mirrors Joint.computeForce (matlab-diff/+redmax/Joint.m:437-487). The
    per-joint scalars are pre-expanded to per-DOF arrays at compile time.
    """
    fr = (
        params["tau"]
        + params["stiffness"] * (params["qrest"] - q)
        - params["damping"] * qdot
    )
    hitL = (q < params["qlimL"]).astype(q.dtype)
    hitU = (q > params["qlimU"]).astype(q.dtype)
    fr = fr + hitL * (params["qlimK"] * (params["qlimL"] - q) - params["qlimD"] * qdot)
    fr = fr + hitU * (params["qlimK"] * (params["qlimU"] - q) - params["qlimD"] * qdot)
    return fr


def joint_space_KD_diag(topo: Topology, params: Dict, q, qdot):
    """Diagonals of Kr = dfr/dq and Dr = dfr/dqdot in closed form.

    joint_space_force is elementwise per DOF, so its Jacobians are diagonal;
    the limit-penalty indicators (hitL/hitU) pass through .astype and have
    zero derivative, so these diagonals equal jacfwd(joint_space_force)
    exactly — without spending nr forward tangents on a diagonal matrix.
    """
    hit = (q < params["qlimL"]).astype(q.dtype) + (q > params["qlimU"]).astype(q.dtype)
    Kd = -params["stiffness"] - hit * params["qlimK"]
    Dd = -params["damping"] - hit * params["qlimD"]
    return Kd, Dd


def local_force_blocks(topo: Topology, params: Dict, kin: Kinematics, phi):
    """[N,6,6] per-body stiffness/damping blocks of the LOCAL maximal forces
    (Coriolis + gravity + body viscous damping, Body.computeMassGrav).

    fm_i depends only on body i's own pose and twist, so dfm/dxi and dfm/dphi
    are block-diagonal: a vmapped 6-tangent jacfwd per body replaces the
    6N-tangent whole-system jacfwd (12x fewer tangents on the 12-link chain,
    and [N,6,6] materialized instead of [6N,6N]).
    """
    g = params["g"]
    bd = params.get("body_damping")
    dtype = phi.dtype
    z6 = jnp.zeros(6, dtype=dtype)
    z3 = jnp.zeros(3, dtype=dtype)

    def f_one(E, Ii, phii, bdi, xi, dphi):
        R = (E @ se3.exp(xi))[:3, :3]
        ph = phii + dphi
        fcor = se3.ad(ph).T @ (Ii * ph)
        f = fcor + jnp.concatenate([z3, Ii[3] * (R.T @ g)])
        if bd is not None:
            f = f - bdi * ph
        return f

    def blocks(E, Ii, phii, bdi):
        K = jax.jacfwd(lambda xi: f_one(E, Ii, phii, bdi, xi, z6))(z6)
        D = jax.jacfwd(lambda dp: f_one(E, Ii, phii, bdi, z6, dp))(z6)
        return K, D

    bdv = bd if bd is not None else jnp.zeros(phi.shape[0], dtype=dtype)
    return jax.vmap(blocks)(kin.E_wi, params["I_i"], phi, bdv)


def maximal_force(topo: Topology, params: Dict, kin: Kinematics, phi):
    """Maximal (per-body wrench) forces fm [N, 6]: Coriolis + gravity.

    Mirrors Body.computeMassGrav (matlab-diff/+redmax/Body.m:83-135):
      fcor  = ad(phi)^T M_i phi
      fgrav = [0; m R_iw g]  (gravity wrench in body frame)
    """
    I = params["I_i"]                                  # [N,6] diagonal inertia
    Mphi = I * phi
    fcor = jnp.einsum("nji,nj->ni", se3.ad(phi), Mphi)  # ad(phi)^T (M phi)
    R_wi = kin.E_wi[:, :3, :3]
    grav_i = jnp.einsum("nji,j->ni", R_wi, params["g"])  # R_iw @ g
    mass = I[:, 3]
    fgrav = jnp.concatenate([jnp.zeros_like(grav_i), mass[:, None] * grav_i], axis=-1)
    out = fcor + fgrav
    bd = params.get("body_damping")
    if bd is not None:
        # Body viscous damping (matlab/+redmax/Body.m:160-180: -damping*phi)
        out = out - bd[:, None] * phi
    return out


def closure_forces(
    topo: Topology, params: Dict, kin: Kinematics, phi, q, qdot, force_fns: Tuple
):
    """Sum of the registered force closures: (fr_cl [nr], fm_cl [N,6])."""
    N = topo.njoints
    fr = jnp.zeros(topo.nr, dtype=q.dtype)
    fm = jnp.zeros((N, 6), dtype=q.dtype)
    for fn in force_fns:
        fr_a, fm_a = fn(params, kin, None, phi, q, qdot)
        fr = fr + fr_a
        fm = fm + fm_a
    return fr, fm


def maximal_force_KD(
    topo: Topology, params: Dict, kin: Kinematics, phi, q, qdot, force_fns: Tuple
):
    """Maximal stiffness/damping of the force closures: Km, Dm [6N, 6N].

    Km = d fm / d xi with the body pose perturbed in its own frame
    (E_wi <- E_wi exp(hat xi)) — the maximal-coordinate variation of
    notes.pdf section 1.8; Dm = d fm / d phi. This replaces the hand-derived
    spring Hessians (SpringPointPoint.computeFK dw blocks,
    matlab/+redmax/SpringPointPoint.m:121-170) with exact jacfwd.
    """
    N = topo.njoints
    dtype = q.dtype
    z = jnp.zeros((N, 6), dtype=dtype)
    # Forces marked implicit_KD=False (deformable segments) stay explicit,
    # matching the reference euler path (testRedMax.m:476-482).
    fns = tuple(f for f in force_fns if getattr(f, "implicit_KD", True))

    def fm_of(xi, dphi):
        kin2 = kin._replace(E_wi=kin.E_wi @ se3.exp(xi))
        _, fm = closure_forces(topo, params, kin2, phi + dphi, q, qdot, fns)
        return fm

    Km = jax.jacfwd(fm_of, argnums=0)(z, z).reshape(6 * N, 6 * N)
    Dm = jax.jacfwd(fm_of, argnums=1)(z, z).reshape(6 * N, 6 * N)
    return Km, Dm


def structured_hessian(
    topo: Topology, params: Dict, q, qdot, cK, cD, force_fns: Tuple = (), aux=None
):
    """Cheap structured Newton matrix H = M + cK*K~ + cD*D~.

    K~/D~ keep every term that does NOT require differentiating the
    kinematic geometry (J, Jdot, FK): joint-space Kr/Dr, the maximal force
    derivatives contracted through a FROZEN J (J^T Km J, J^T Dm J), and the
    exact quadratic-velocity damping -2 J^T Mm Jdot (fqvv is quadratic in
    qdot). Dropping the dJ/dq terms leaves an O(h^2)-relative error in the
    Newton matrix only — the residual stays exact, so chord iterations
    converge to the true solution; this removes the [B, nr, N, 6, nr]
    tangent blowup that made jacfwd Hessians HBM-bound on TPU.

    Reference analogue: the linearly-implicit Euler LHS
    Mr + J^T(h Dm - h^2 Km)J + h Dr - h^2 Kr (matlab/testRedMax.m:487),
    which makes the same truncation.
    """
    kin = forward_kinematics(topo, params, q, qdot, aux)
    J, Jdot, phi = jacobians(topo, params, kin, qdot)

    N = topo.njoints
    nr = topo.nr
    dtype = q.dtype

    # Joint-space Kr/Dr are diagonal — closed form, no tangents.
    Krd, Drd = joint_space_KD_diag(topo, params, q, qdot)

    # Local maximal forces (Coriolis/gravity/body damping) have block-diagonal
    # Km/Dm: per-body 6-tangent jacfwd, contracted per block.
    Kmb, Dmb = local_force_blocks(topo, params, kin, phi)
    Jblk = J.reshape(N, 6, nr)
    KJ = jnp.einsum("nij,njr->nir", Kmb, Jblk)
    DJ = jnp.einsum("nij,njr->nir", Dmb, Jblk)
    Kt = jnp.diag(Krd) + jnp.einsum("nir,nis->rs", Jblk, KJ)
    Dt = jnp.diag(Drd) + jnp.einsum("nir,nis->rs", Jblk, DJ)

    # Closure forces may couple bodies (point-point springs, cables, ...):
    # their Km/Dm keep the whole-system jacfwd — only when any are present.
    # Ground contact takes the CLOSED-FORM path instead (the same
    # pallas_step._ground_contact code the fused kernel runs, with the
    # one-step proximity-margin H activation) so the fallback and the kernel
    # build bit-matching Newton matrices and both survive contact
    # activation: the jacfwd blocks' (d <= 0) masks give the chord H zero
    # contact stiffness at an out-of-contact predictor, and the first
    # Newton step at impact overshoots by orders of magnitude.
    from redmax_tpu.forces import ForceGroundCuboid

    fns = tuple(f for f in force_fns if getattr(f, "implicit_KD", True))
    gnd = tuple(f for f in fns if isinstance(f, ForceGroundCuboid))
    fns = tuple(f for f in fns if not isinstance(f, ForceGroundCuboid))
    if fns:
        z = jnp.zeros((N, 6), dtype=dtype)

        def fm_of(xi, dphi):
            kin2 = kin._replace(E_wi=kin.E_wi @ se3.exp(xi))
            ph = phi + dphi
            fm = jnp.zeros((N, 6), dtype=dtype)
            for fn in fns:
                _, fm_a = fn(params, kin2, None, ph, q, qdot)
                fm = fm + fm_a
            return fm

        Km = jax.jacfwd(fm_of, argnums=0)(z, z).reshape(6 * N, 6 * N)
        Dm = jax.jacfwd(fm_of, argnums=1)(z, z).reshape(6 * N, 6 * N)
        Kt = Kt + J.T @ (Km @ J)
        Dt = Dt + J.T @ (Dm @ J)
    if gnd:
        from redmax_tpu.forces import ground_contact_blocks

        hh = params["h"]
        gmag = jnp.sqrt(jnp.sum(params["g"] * params["g"]))
        Jblk3 = J.reshape(N, 6, nr)
        for fn in gnd:
            b = fn.body
            Kc, Dc = ground_contact_blocks(
                kin.E_wi[b], phi[b], params["forces"][fn.key], hh, gmag
            )
            Jb = Jblk3[b]                                   # [6, nr]
            Kt = Kt + Jb.T @ (Kc.astype(dtype) @ Jb)
            Dt = Dt + Jb.T @ (Dc.astype(dtype) @ Jb)

    Ivec = params["I_i"].reshape(-1)
    MmJ = Ivec[:, None] * J
    M = J.T @ MmJ
    Dt = Dt - 2.0 * (MmJ.T @ Jdot)
    return M + cK * Kt + cD * Dt


def assemble(topo: Topology, params: Dict, q, qdot, force_fns: Tuple = (), aux=None):
    """Full reduced assembly: returns (M [nr,nr], f [nr], aux dict).

    The reference equivalent is computeValues (driverRedMaxBDF1.m:190-243)
    restricted to values; derivatives (dMdq, K, D) are obtained by jacfwd of
    this function where needed (see dynamics.py) — exactly, not by FD.

    force_fns: static tuple of force closures, each
        fn(params, kin, J, phi, q, qdot) -> (fr_add [nr], fm_add [N,6])
    compiled from the scene's force list (forces.py).
    """
    kin = forward_kinematics(topo, params, q, qdot, aux)
    J, Jdot, phi = jacobians(topo, params, kin, qdot)

    fr = joint_space_force(topo, params, q, qdot)
    fm = maximal_force(topo, params, kin, phi)
    for fn in force_fns:
        fr_add, fm_add = fn(params, kin, J, phi, q, qdot)
        fr = fr + fr_add
        fm = fm + fm_add

    Ivec = params["I_i"].reshape(-1)                   # [6N] block-diag Mm
    MmJ = Ivec[:, None] * J
    M = J.T @ MmJ                                      # Mr = J^T Mm J
    fqvv = -MmJ.T @ (Jdot @ qdot)                      # -J^T Mm Jdot qdot
    f = fr + J.T @ fm.reshape(-1) + fqvv
    aux = {"kin": kin, "J": J, "Jdot": Jdot, "phi": phi, "fm": fm, "fr": fr}
    return M, f, aux


def energies(topo: Topology, params: Dict, q, qdot, force_fns: Tuple = (), aux=None):
    """Kinetic and potential energy (T, V).

    Mirrors Joint/Body.computeEnergies (Joint.m:616-637, Body.m:167-173):
      T = 1/2 sum_i phi_i^T M_i phi_i
      V = -sum_i m_i g . p_wi + 1/2 k (q - qrest)^2 + limit penalties
        + force energies.
    """
    kin = forward_kinematics(topo, params, q, qdot, aux)
    J, _, phi = jacobians(topo, params, kin, qdot)
    I = params["I_i"]
    T = 0.5 * jnp.sum(phi * (I * phi))
    p_wi = kin.E_wi[:, :3, 3]
    V = -jnp.sum(I[:, 3] * (p_wi @ params["g"]))
    dq = q - params["qrest"]
    V = V + 0.5 * jnp.sum(params["stiffness"] * dq * dq)
    hitL = (q < params["qlimL"]).astype(q.dtype)
    hitU = (q > params["qlimU"]).astype(q.dtype)
    dqL = hitL * (params["qlimL"] - q)
    dqU = hitU * (params["qlimU"] - q)
    V = V + 0.5 * jnp.sum(params["qlimK"] * (dqL * dqL + dqU * dqU))
    for fn in force_fns:
        if hasattr(fn, "energy"):
            V = V + fn.energy(params, kin, q, qdot)
    return T, V


def reparam_all(
    topo: Topology, params: Dict, q, qdot, aux=None, q_prev=None, qdot_prev=None
):
    """Post-step reparameterization sweep (Joint.reparam, Joint.m:372-379).

    Exp-coordinate joints rescale in place; SPHERICAL_EULER joints run the
    12-chart switch (euler.reparam_spherical), which also remaps the
    previous-step state (q_prev/qdot_prev, for BDF2 — JointSpherical.m:96-103)
    and updates the chart in aux. Returns (q, qdot, aux, q_prev, qdot_prev).
    """
    from redmax_tpu import euler as euler_mod

    for jt, members in topo.type_groups().items():
        jt_enum = JointType(jt)
        idx = _type_q_indices(topo, jt, members)
        if jt_enum in EULER_CHART_TYPES:
            rot = EULER_CHART_TYPES[jt_enum]
            ridx = idx[:, rot]
            ej = topo.euler_joints()
            sel = np.array([ej.index(m) for m in members], dtype=np.int32)
            qp = q[ridx] if q_prev is None else q_prev[ridx]
            qdp = qdot[ridx] if qdot_prev is None else qdot_prev[ridx]
            ch, qg, qdotg, qpg, qdpg = jax.vmap(euler_mod.reparam_spherical)(
                aux["euler_chart"][sel], q[ridx], qdot[ridx], qp, qdp
            )
            aux = {**aux, "euler_chart": aux["euler_chart"].at[sel].set(ch)}
            q = q.at[ridx].set(qg)
            qdot = qdot.at[ridx].set(qdotg)
            if q_prev is not None:
                q_prev = q_prev.at[ridx].set(qpg)
                qdot_prev = qdot_prev.at[ridx].set(qdpg)
            continue
        if KERNELS[jt_enum].reparam_fn is None:
            continue
        pg = joint_params_for(params, jt)
        qg, qdotg = jax.vmap(
            partial(joint_reparam, jt_enum), in_axes=(0, 0, 0 if pg else None)
        )(q[idx], qdot[idx], pg)
        q = q.at[idx].set(qg)
        qdot = qdot.at[idx].set(qdotg)
    return q, qdot, aux, q_prev, qdot_prev
