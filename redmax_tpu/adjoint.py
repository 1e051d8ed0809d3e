"""Differentiability layer: adjoint gradients through implicit integration.

The reference implements the adjoint method by hand (matlab-diff/+redmax/
TaskBDF1.m:45-81, TaskBDF2.m:45-108): a backward sweep over the horizon that
reuses the per-step LU factors of the Newton Hessian H to solve H^T z = y.

Here the same mathematics falls out of reverse-mode AD through the rollout
scan, provided each implicit solve has the implicit-function-theorem VJP:

    g(x*, theta) = 0   =>   dx*/dtheta = -H^{-1} dg/dtheta,  H = dg/dx at x*

so for an incoming cotangent xbar the pullback is

    thetabar = -(dg/dtheta)^T H^{-T} xbar

i.e. ONE transposed linear solve against the forward Hessian per step —
exactly the reference's z_k = H_k^T \\ y_k (TaskBDF1.m:66), with the banded
y_k recursion produced automatically by scan's reverse accumulation through
the (q, qdot, q_prev, qdot_prev) carry.

``implicit_solve`` wraps the damped-Newton solver from integrators.py with
this custom VJP; the Newton iteration itself (a lax.while_loop) is never
differentiated through. ``hess_fn`` optionally supplies a structured
approximation of H for the backward solve (model.structured_hessian) —
exact residual VJP against an approximate H^T gives gradients with
O(||H - H~||/||H||) relative bias, the fast path for MPC at scale.
"""

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def implicit_solve(
    res_fn: Callable,
    newton_fn: Callable,
    hess_fn: Optional[Callable],
    solve_T_fn: Optional[Callable],
    theta: Any,
    x0,
):
    """Solve res_fn(theta, x) = 0 by Newton, with implicit-function VJP.

    res_fn: (theta pytree, x [nr]) -> residual [nr]; must be differentiable.
    newton_fn: (fn: x -> g, jac_or_None, x0) -> x* — the inner solver.
    hess_fn: optional (theta, x) -> H approximation used for the backward
        transposed solve; None -> exact jacfwd of res_fn.
    solve_T_fn: optional (H, xbar) -> H^-T xbar backward solve kernel
        (linalg.py GJ path on TPU); None -> jnp.linalg.solve(H.T, .).
    theta: all differentiable inputs of the residual (params, q0, qdot0, ...).
    x0: initial guess (no gradient — the solution is independent of it).
    """
    jac = (lambda x: hess_fn(theta, x)) if hess_fn is not None else None
    return newton_fn(lambda x: res_fn(theta, x), jac, x0)


def _fwd(res_fn, newton_fn, hess_fn, solve_T_fn, theta, x0):
    jac = (lambda x: hess_fn(theta, x)) if hess_fn is not None else None
    xstar = newton_fn(lambda x: res_fn(theta, x), jac, x0)
    return xstar, (theta, xstar)


def _bwd(res_fn, newton_fn, hess_fn, solve_T_fn, saved, xbar):
    theta, xstar = saved
    # H = dg/dx at the solution; one transposed solve per step, the
    # reference's LU-transpose reuse (TaskBDF1.m:66: z = U'\\(L'\\y)).
    if hess_fn is None:
        H = jax.jacfwd(lambda x: res_fn(theta, x))(xstar)
    else:
        H = hess_fn(theta, xstar)
    z = solve_T_fn(H, xbar) if solve_T_fn is not None else jnp.linalg.solve(H.T, xbar)
    # thetabar = -(dg/dtheta)^T z via one VJP of the residual in theta.
    _, vjp_theta = jax.vjp(lambda th: res_fn(th, xstar), theta)
    (thetabar,) = vjp_theta(-z)
    x0bar = jax.tree_util.tree_map(jnp.zeros_like, xstar)
    return (thetabar, x0bar)


implicit_solve.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def implicit_solve_factored(
    res_fn: Callable,
    newton_factored_fn: Callable,
    solve_T_factor_fn: Callable,
    theta: Any,
    x0,
):
    """implicit_solve variant that REUSES the forward factorization.

    newton_factored_fn: (theta, x0) -> (x*, F) where F is the live
    factorization of the Newton matrix (chord: at the predictor) — the exact
    analogue of the reference's Scene.saveHistory LU store consumed by
    TaskBDF1.calcFinal (TaskBDF1.m:66 z = U'\\(L'\\y)). The backward pass is
    then one transposed solve against F plus one residual VJP; no Hessian
    re-assembly, no re-factorization.

    Bias: F is evaluated at the predictor, not the solution — an extra
    O(|x*-x0|) relative perturbation of H, the same class as the structured-
    Hessian truncation already accepted on this path. The residual VJP stays
    exact.
    """
    x, _ = newton_factored_fn(theta, x0)
    return x


def _ffwd(res_fn, newton_factored_fn, solve_T_factor_fn, theta, x0):
    x, F = newton_factored_fn(theta, x0)
    return x, (theta, x, F)


def _fbwd(res_fn, newton_factored_fn, solve_T_factor_fn, saved, xbar):
    theta, xstar, F = saved
    z = solve_T_factor_fn(F, xbar)
    _, vjp_theta = jax.vjp(lambda th: res_fn(th, xstar), theta)
    (thetabar,) = vjp_theta(-z)
    x0bar = jax.tree_util.tree_map(jnp.zeros_like, xstar)
    return (thetabar, x0bar)


implicit_solve_factored.defvjp(_ffwd, _fbwd)
