"""Matrix-free PCG with the projected-block-Jacobi (RHD) preconditioner.

Port of the reference's C++ performance layer (c++/PCG/src/Solver.cpp +
ConstraintJoint.cpp, SURVEY.md section 2.8):

  * O(n) operator products without forming J (ConstraintJoint::computeJ_x /
    computeJT_x, ConstraintJoint.h:49-56): J x by a root->leaf world-twist
    sweep, J^T y by a leaf->root subtree-wrench accumulation;
  * LHS(x) = J^T (Mm + h Dm~ - h^2 Km~)(J x) + (h Dr - h^2 Kr) x — the
    linearly-implicit Euler system applied matrix-free
    (Solver::solvePCG, Solver.cpp:567-875);
  * preconditioner z = Mhat^{-1} r via the RHD 3-pass
    (Solver::pcdSaad2003, Solver.cpp:81-168; preprocess_PCG_preconditioner,
    ConstraintJoint.cpp:1236-1280) — recursive.make_minv_product;
  * the CG loop itself ([Saad 2003] Alg 9.1) with iteration counters kept
    as first-class metrics (SolverDataTracker role, Solver.h:19-22).

For the small reduced sizes of the MPC regime the dense solve wins (one
batched LU on the MXU); this path is the large-scene tier where nr grows
into the hundreds — the level-synchronous sweeps are O(depth) sequential
with all per-level work batched.
"""

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import se3
from redmax_tpu.model import Kinematics, jacobians
from redmax_tpu.types import Topology


def make_J_products(topo: Topology, params: Dict, kin: Kinematics):
    """(J_x, JT_y): matrix-free Jacobian products via tree sweeps.

    J x: t_w[j] = t_w[parent] + W_j x_j (root->leaf), phi_i = Ad_iw t_w[i].
    J^T y: u_w[i] = Ad_iw^T y_i; s_w[j] = subtree sum (leaf->root);
           z_j = W_j^T s_w[j],
    where W_j = Ad(E_w,body_j) Sb_j are the world-frame subspace columns.
    """
    N = topo.njoints
    dtype = kin.S.dtype
    A0_ij = se3.Ad(se3.inv(params["E0_ji"]))
    Sb = A0_ij @ kin.S                                 # [N,6,dmax]
    Ad_wb = se3.Ad(kin.E_wi)
    Ad_bw = se3.Ad(se3.inv(kin.E_wi))
    W = Ad_wb @ Sb                                     # [N,6,dmax] world cols
    levels = topo.levels
    parent = np.array([p if p >= 0 else 0 for p in topo.parent], dtype=np.int32)

    # padded local dof gather/scatter
    from redmax_tpu.recursive import _dof_mask, _pad_q, _unpad_q

    dmask = _dof_mask(topo, dtype)

    def J_x(x):
        xp = _pad_q(topo, x) * dmask
        tw = jnp.zeros((N, 6), dtype=dtype)
        own = jnp.einsum("nkd,nd->nk", W, xp)
        for level in levels:
            lv = np.array(level, dtype=np.int32)
            t = own[lv]
            if topo.parent[level[0]] >= 0:
                t = t + tw[parent[lv]]
            tw = tw.at[lv].set(t)
        phi = jnp.einsum("nkl,nl->nk", Ad_bw, tw)
        return phi.reshape(-1)

    def JT_y(y):
        u = jnp.einsum("nlk,nl->nk", Ad_bw, y.reshape(N, 6))  # Ad_bw^T y
        s = u
        for level in reversed(levels):
            child_idx = [i for i in range(N) if topo.parent[i] in level]
            if child_idx:
                ci = np.array(child_idx, dtype=np.int32)
                pos = np.array([topo.parent[i] for i in child_idx], np.int32)
                s = s.at[pos].add(s[ci])
        z = jnp.einsum("nkd,nk->nd", W, s) * dmask
        return _unpad_q(topo, z)

    return J_x, JT_y


class PcgResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def pcg(lhs: Callable, b, precond: Optional[Callable] = None,
        tol: float = 1e-6, maxit: int = 1000) -> PcgResult:
    """Preconditioned CG ([Saad 2003] Alg 9.1; Solver::pcdSaad2003).

    Matches the reference loop: absolute residual tolerance on ||r||
    (Solver.h:43 cg_tol = 1e-6), zero-curvature guard.
    """
    z0 = precond(b) if precond else b
    x0 = jnp.zeros_like(b)

    def cond(c):
        x, r, z, p, rz, it, done = c
        return (~done) & (it < maxit)

    def body(c):
        x, r, z, p, rz, it, done = c
        Ap = lhs(p)
        pAp = p @ Ap
        ok = jnp.abs(pAp) > 1e-300                    # zero-curvature guard
        alpha = jnp.where(ok, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r) if precond else r
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        conv = jnp.linalg.norm(r) < tol
        return (x, r, z, p, rz_new, it + 1, done | conv | (~ok))

    init = (x0, b, z0, z0, b @ z0, jnp.zeros((), jnp.int32),
            jnp.linalg.norm(b) < tol)
    x, r, _, _, _, it, _ = jax.lax.while_loop(cond, body, init)
    return PcgResult(x=x, iters=it, resnorm=jnp.linalg.norm(r))


def make_euler_pcg_solver(topo: Topology, force_fns: Tuple = (),
                          tol: float = 1e-6, maxit: int = 1000):
    """Matrix-free linearly-implicit Euler velocity solve:

        (Mr + h Dr~ - ...) qdot1 = frtilde

    solved by PCG with the RHD preconditioner. Returns
    solve(params, kin, q, qdot) -> (qdot1, PcgResult). Currently covers the
    unconstrained stiffness/damping-free LHS (Mm diagonal); joint K/D fold
    into the preconditioner exactly as ConstraintJoint.cpp:1258-1262 when
    present via the dense path.
    """
    from redmax_tpu.model import (
        forward_kinematics, joint_space_force, maximal_force,
    )
    from redmax_tpu.recursive import make_minv_product

    def solve(params: Dict, q, qdot, aux=None):
        h = params["h"]
        kin = forward_kinematics(topo, params, q, qdot, aux)
        J_x, JT_y = make_J_products(topo, params, kin)
        J, Jdot, phi = jacobians(topo, params, kin, qdot)
        Ivec = params["I_i"].reshape(-1)

        fr = joint_space_force(topo, params, q, qdot)
        fm = maximal_force(topo, params, kin, phi)
        Dr = jax.jacfwd(lambda qd: joint_space_force(topo, params, q, qd))(qdot)
        Kr = jax.jacfwd(lambda qq: joint_space_force(topo, params, qq, qdot))(q)
        f0_r = fr - Dr @ qdot

        Mr_qdot = JT_y(Ivec * J_x(qdot))
        frt = Mr_qdot + h * (JT_y(fm.reshape(-1) - Ivec * (Jdot @ qdot)) + f0_r)

        def lhs(x):
            return JT_y(Ivec * J_x(x)) - h * (Dr @ x) - h * h * (Kr @ x)

        minv = make_minv_product(topo, params, kin)
        res = pcg(lhs, frt, minv, tol, maxit)
        return res.x, res

    return solve
