"""Batched dense QP / KKT kernels — the TPU replacement for quadprog.

The reference calls MATLAB quadprog (interior point) for every constrained
solve (testRedMax.m:513-530, :615-697) and backslash for pure-equality KKT
systems. On TPU everything must run in fixed iterations with static shapes:

  * ``kkt_solve`` — equality-constrained quadratic minimization via one
    dense symmetric-indefinite solve of [[H, G^T], [G, 0]].
  * ``qp_pgs`` — projected Gauss-Seidel on the DUAL of
        min 1/2 x^T H x - f^T x   s.t.  C x <= d,  G x = e
    with per-row projection: equality rows free, inequality rows
    lambda >= 0, boxed rows clipped to [lo, hi] (friction). PGS is the
    classic LCP solver for contact (it is what most game/robotics engines
    run); row count is small and static here, so the sequential row sweep
    is a lax.fori over a static-size scan — fully batchable with vmap.

Inactive (masked) rows are encoded with a zero row, unit diagonal and zero
rhs so they solve to lambda = 0 and do not perturb the others.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def kkt_solve(H, G, f, e, reg: float = 0.0):
    """Solve min 1/2 x^T H x - f^T x s.t. G x = e. Returns (x, lam).

    Matches the reference's LHS = [Mrtilde G'; G zeros] \\ [frtilde; rhsG]
    (matlab/testRedMax.m:518-521).
    """
    n = H.shape[-1]
    m = G.shape[-2]
    Z = -reg * jnp.eye(m, dtype=H.dtype)
    KKT = jnp.block([[H, jnp.swapaxes(G, -1, -2)], [G, Z]])
    rhs = jnp.concatenate([f, e], axis=-1)
    sol = jnp.linalg.solve(KKT, rhs)
    return sol[..., :n], sol[..., n:]


def qp_pgs(
    H,
    f,
    A,
    b,
    lo,
    hi,
    iters: int = 40,
    reg: float = 1e-10,
):
    """Dual projected Gauss-Seidel for min 1/2 x^T H x - f^T x, rows A x (<=|=) b.

    A [m, n] stacks ALL constraint rows (equalities first by convention, but
    any order works); the row type is encoded purely by its projection box:
      equality row:      lo = -inf, hi = +inf
      inequality A x <= b:  lo = 0,  hi = +inf   (lambda >= 0)
      boxed friction row:   lo = -mu a, hi = mu a
    Masked (inactive) rows: pass a zero row with b = 0 and lo = hi = 0.

    Solves the dual  D lam = r with D = A H^{-1} A^T, r = A H^{-1} f - b,
    by PGS with per-row clipping, then x = H^{-1} (f - A^T lam).
    Returns (x, lam).
    """
    m = A.shape[-2]
    Hf = jnp.linalg.solve(H, f[..., None])[..., 0]
    HinvAT = jnp.linalg.solve(H, jnp.swapaxes(A, -1, -2))     # [n, m]
    D = A @ HinvAT                                            # [m, m]
    r = A @ Hf - b
    diag = jnp.diagonal(D, axis1=-2, axis2=-1)
    safe_diag = jnp.where(jnp.abs(diag) < reg, 1.0, diag)

    def row_update(lam, i):
        resid = r[i] - D[i] @ lam + diag[i] * lam[i]
        lam_i = jnp.clip(resid / safe_diag[i], lo[i], hi[i])
        return lam.at[i].set(lam_i), None

    def sweep(lam, _):
        lam, _ = jax.lax.scan(row_update, lam, jnp.arange(m))
        return lam, None

    lam0 = jnp.zeros(m, dtype=H.dtype)
    lam, _ = jax.lax.scan(sweep, lam0, None, length=iters)
    x = Hf - HinvAT @ lam
    return x, lam


def qp_pgs_batched(H, f, A, b, lo, hi, iters: int = 40, reg: float = 1e-10):
    """Explicitly-batched dual projected Gauss-Seidel: lanes = scenes.

    All args carry a leading batch dim ([B,n,n], [B,n], [B,m,n], [B,m], ...).
    The TPU layout: the dual setup (H^{-1}f, H^{-1}A^T, D = A H^{-1} A^T)
    is batched dense algebra on the MXU; the PGS sweep UNROLLS the (static,
    small) row loop so each row update is one [B]-wide fused VPU op chain —
    batch-as-tile, the same layout decision as pallas_step — with only the
    sweep counter as a sequential scan. Gauss-Seidel is inherently
    sequential in ROWS (each row update reads the freshest neighbors), so
    rows cannot be vectorized without changing the iteration (to Jacobi);
    the batch axis is where the parallelism is.

    Matches jax.vmap(qp_pgs) lane-for-lane (same update order, same
    projection boxes) up to reassociation — gated in tests/test_linalg.py.
    Replaces the reference's per-scene quadprog calls
    (matlab/testRedMax.m:513-530, 682-697) for batched rollouts.
    Returns (x [B,n], lam [B,m]).
    """
    m = A.shape[-2]
    Hf = jnp.linalg.solve(H, f[..., None])[..., 0]            # [B,n]
    HinvAT = jnp.linalg.solve(H, jnp.swapaxes(A, -1, -2))     # [B,n,m]
    D = jnp.einsum("bmn,bnk->bmk", A, HinvAT)                 # [B,m,m]
    r = jnp.einsum("bmn,bn->bm", A, Hf) - b
    diag = jnp.diagonal(D, axis1=-2, axis2=-1)
    safe_diag = jnp.where(jnp.abs(diag) < reg, 1.0, diag)

    def sweep(lam, _):
        for i in range(m):                                    # unrolled
            resid = (r[:, i] - jnp.einsum("bm,bm->b", D[:, i, :], lam)
                     + diag[:, i] * lam[:, i])
            lam = lam.at[:, i].set(
                jnp.clip(resid / safe_diag[:, i], lo[:, i], hi[:, i])
            )
        return lam, None

    lam0 = jnp.zeros(r.shape, dtype=H.dtype)
    lam, _ = jax.lax.scan(sweep, lam0, None, length=iters)
    x = Hf - jnp.einsum("bnm,bm->bn", HinvAT, lam)
    return x, lam
