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


def _euler_matfree(topo: Topology, force_fns: Tuple, params: Dict, q, qdot, aux):
    """Shared setup for the PCG Euler tiers: assemble the system pieces with
    integrators.euler_system (same semantics as the dense step — spring
    Km/Dm folding, one-sided implicit damping, body damping) and return
    (lhs matvec, frtilde, minv preconditioner, sys dict).

    The CG operator applies Mm (diagonal) and the maximal spring blocks
    against J x via tree-sweep products (ConstraintJoint::computeLHS_x +
    computeStiffnessDampingJoint, ConstraintJoint.h:49-58) — Mr is never
    formed for the matvec; the dense Mr in sys is only used by frtilde.
    """
    from redmax_tpu.integrators import euler_system
    from redmax_tpu.recursive import make_minv_product

    h = params["h"]
    sys = euler_system(topo, force_fns, params, q, qdot, aux)
    kin = sys["kin"]
    J_x, JT_y = make_J_products(topo, params, kin)
    Ivec = params["I_i"].reshape(-1)
    Km, Dm, Kr, Dr = sys["Km"], sys["Dm"], sys["Kr"], sys["Dr"]
    # Static sparsity: with no closure forces and no body damping the
    # maximal blocks are exactly zero — skip their matvecs.
    have_maximal_KD = bool(force_fns) or params.get("body_damping") is not None

    def lhs(x):
        Jx = J_x(x)
        w = Ivec * Jx
        if have_maximal_KD:
            w = w - h * (Dm @ Jx) - h * h * (Km @ Jx)
        return JT_y(w) - h * (Dr @ x) - h * h * (Kr @ x)

    minv = make_minv_product(topo, params, kin)
    return lhs, sys["frtilde"], minv, sys


def make_euler_pcg_solver(topo: Topology, force_fns: Tuple = (),
                          tol: float = 1e-6, maxit: int = 1000):
    """Matrix-free linearly-implicit Euler velocity solve:

        Mrtilde qdot1 = frtilde   (pieces from integrators.euler_system)

    applied matrix-free (Solver::solvePCG, Solver.cpp:567-875) and solved by
    PCG with the RHD projected-block-Jacobi preconditioner. Returns
    solve(params, q, qdot, aux) -> (qdot1, PcgResult).
    """

    def solve(params: Dict, q, qdot, aux=None):
        lhs, frt, minv, _ = _euler_matfree(topo, force_fns, params, q, qdot, aux)
        res = pcg(lhs, frt, minv, tol, maxit)
        return res.x, res

    return solve


def make_euler_pcg_constrained_solver(
    topo: Topology,
    force_fns: Tuple = (),
    constraint_fns: Tuple = (),
    tol: float = 1e-6,
    maxit: int = 1000,
    mesh=None,
):
    """Loop-closure (equality) constraints on the matrix-free Euler solve via
    the Schur complement (Solver::solvePCG constrained paths,
    Solver.cpp:654-746):

        S = G Mrtilde^{-1} G^T,   S lam = G qdot1_unc - rhsG,
        qdot1 = qdot1_unc - (Mrtilde^{-1} G^T) lam

    with rhsG = -gdot - baum3 g (the dense KKT semantics of
    integrators.make_euler_step, so both tiers solve the same system).

    TPU mapping: the reference runs ONE PCG PER CONSTRAINT ROW under OpenMP
    (#pragma omp parallel for, Solver.cpp:714, with thread-local RHD scratch
    State::local_mt, State.h:106-113) plus one for the unconstrained solve;
    here all me+1 right-hand sides are ONE vmapped batched CG sharing the
    operator and preconditioner — the batch axis is the parallelism, no
    scratch aliasing to manage. The reference's final PCG on
    (frtilde - G^T lam) is algebraically the linear combination
    qdot1_unc - MiGt lam already solved for, so it is not re-run.

    mesh: optional ("rollout", "model") jax.sharding.Mesh — the per-row CG
    fan-out then SHARDS over the "model" axis (rows padded with zero RHS,
    which the CG resolves at init for free), putting real within-scene work
    on the model axis: the device-parallel form of the reference's OpenMP
    row loop. Results are bit-identical to the unsharded solve (each row's
    CG is an independent program; tests/test_pcg.py asserts equality).

    Returns solve(params, q, qdot, aux) -> (qdot1, lam, PcgResult [me+1]).
    """
    from redmax_tpu.constraints import assemble_constraints

    if mesh is not None:
        from functools import partial as _partial

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as _P

    def solve(params: Dict, q, qdot, aux=None):
        dtype = q.dtype
        lhs, frt, minv, sys = _euler_matfree(
            topo, force_fns, params, q, qdot, aux
        )
        rows = assemble_constraints(
            constraint_fns, params, topo, sys["kin"], sys["phi"], q, qdot,
            sys["J"],
        )
        Geq = rows["Geq"]                       # [me, nr] reduced rows
        baum3 = params.get("baumgarte", jnp.array([5.0, 5.0, 5.0], dtype))[2]
        rhsG = -rows["geqdot"] - baum3 * rows["geq"]

        # One batched CG over [frtilde; G^T columns] (me+1 lanes).
        B = jnp.concatenate([frt[None, :], Geq], axis=0)
        if mesh is None:
            res = jax.vmap(lambda b: pcg(lhs, b, minv, tol, maxit))(B)
        else:
            m = mesh.shape["model"]
            rows = B.shape[0]
            rp = ((rows + m - 1) // m) * m
            Bp = jnp.concatenate(
                [B, jnp.zeros((rp - rows, B.shape[1]), B.dtype)], axis=0
            )

            @_partial(
                shard_map, mesh=mesh,
                in_specs=(_P("model"),), out_specs=_P("model"),
                check_vma=False,
            )
            def rows_cg(Bl):
                return jax.vmap(lambda b: pcg(lhs, b, minv, tol, maxit))(Bl)

            resp = rows_cg(Bp)
            res = jax.tree_util.tree_map(lambda a: a[:rows], resp)
        qdot1_unc = res.x[0]
        MiGt = res.x[1:].T                      # [nr, me] = Mrtilde^{-1} G^T

        S = Geq @ MiGt                          # [me, me] Schur complement
        lam = jnp.linalg.solve(S, Geq @ qdot1_unc - rhsG)
        qdot1 = qdot1_unc - MiGt @ lam
        return qdot1, lam, res

    return solve


def make_euler_pcg_step(
    topo: Topology,
    force_fns: Tuple = (),
    constraint_fns: Tuple = (),
    tol: float = 1e-6,
    maxit: int = 1000,
    mesh=None,
):
    """Full linearly-implicit Euler step through the PCG tier (the C++
    performance path's step loop, RigidBodyMain.cpp:412-431): velocity solve
    (Schur-constrained when equality constraints are present), position
    update, reparameterization. State -> State, same contract as
    integrators.make_euler_step.
    """
    from redmax_tpu.model import reparam_all
    from redmax_tpu.types import State

    eq_only = tuple(
        c for c in constraint_fns if (c.n_eq_m or c.n_eq_r)
    )
    if constraint_fns and len(eq_only) != len(constraint_fns):
        raise NotImplementedError(
            "PCG tier handles equality (loop-closure) constraints only; "
            "inequality rows need the dense QP path (make_euler_step)."
        )
    if eq_only:
        vel_solve = make_euler_pcg_constrained_solver(
            topo, force_fns, eq_only, tol, maxit, mesh=mesh
        )
    else:
        unc = make_euler_pcg_solver(topo, force_fns, tol, maxit)

        def vel_solve(params, q, qdot, aux=None):
            qdot1, res = unc(params, q, qdot, aux)
            return qdot1, None, res

    def step(params: Dict, state):
        q0, qdot0, aux = state.q, state.qdot, state.aux
        h = params["h"]
        qdot1 = vel_solve(params, q0, qdot0, aux)[0]
        q1 = q0 + h * qdot1
        q1, qdot1, aux, _, _ = reparam_all(topo, params, q1, qdot1, aux)
        return State(q=q1, qdot=qdot1, aux=aux)

    return step
