"""Implicit integrators: damped-Newton BDF1, SDIRK2-bootstrapped BDF2, and
linearly-implicit Euler.

Semantics mirror the reference drivers exactly so their energy certificates
transfer:

  * BDF1 residual g = M (q1 - q0 - h qdot0) - h^2 f with qdot1 = (q1-q0)/h
    (driverRedMaxBDF1.m:160-187).
  * SDIRK2 bootstrap with alpha = (2 - sqrt(2))/2, two substeps, then BDF2
    g = M (q2 - 4/3 q1 + 1/3 q0 - 8/9 h qdot1 + 2/9 h qdot0) - 4/9 h^2 f
    (driverRedMaxBDF2.m:64-293).
  * Damped Newton with backtracking line search on 1/2 ||g||^2, tol 1e-9,
    iterMax 10*nr, 20 halvings, divergence guard |dx| > 1e3
    (driverRedMaxBDF1.m:94-157).

TPU-first differences: the Newton Hessian is jax.jacfwd of the residual
(provably equal to the reference's M - h D - h^2 K + dMdq . dqtmp, see
dynamics.py); iteration uses lax.while_loop with per-sample done masks so the
whole solver vmaps over batches of scenes; the linear solve is a batched
dense solve on the MXU.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from redmax_tpu.adjoint import implicit_solve
from redmax_tpu.model import assemble, reparam_all
from redmax_tpu.types import State, Topology

SDIRK_ALPHA = (2.0 - math.sqrt(2.0)) / 2.0


@dataclass(frozen=True)
class NewtonConfig:
    """Matches the reference newton() (driverRedMaxBDF1.m:94-98)."""

    tol: float = 1e-9
    dx_max: float = 1e3
    iter_max: int = 0        # 0 -> 10 * nr, set at make time
    ls_max: int = 20
    # Perf-path alternative: fixed iteration count, full steps, no line search
    # (the adjoint driver already does this, driverRedMaxAdjointBDF1.m:133).
    fixed_iters: int = 0     # >0 enables fixed-iteration mode
    # Chord (modified) Newton: evaluate the Hessian ONCE at the predictor and
    # reuse it for all fixed iterations — one jacfwd per solve instead of one
    # per iteration. Linear convergence, ample for h ~ 1e-2 with a good
    # predictor; the adjoint VJP still uses the exact Hessian at the solution.
    chord: bool = False


class _NewtonCarry(NamedTuple):
    x: jnp.ndarray
    g: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    diverged: jnp.ndarray


def newton(res_fn: Callable, x0, cfg: NewtonConfig):
    """Damped Newton with backtracking line search; vmap-safe via done masks.

    res_fn: x [nr] -> g [nr]. Returns (x, info dict).
    """
    iter_max = cfg.iter_max if cfg.iter_max > 0 else 10 * x0.shape[-1]
    jac_fn = jax.jacfwd(res_fn)

    if cfg.fixed_iters > 0:
        # Unrolled (fixed_iters is static and small) so XLA fuses freely.
        x = x0
        if cfg.chord:
            lu, piv = jax.scipy.linalg.lu_factor(jac_fn(x0))
            for _ in range(cfg.fixed_iters):
                x = x - jax.scipy.linalg.lu_solve((lu, piv), res_fn(x))
        else:
            for _ in range(cfg.fixed_iters):
                x = x - jnp.linalg.solve(jac_fn(x), res_fn(x))
        return x, {"iters": jnp.asarray(cfg.fixed_iters), "diverged": jnp.asarray(False)}

    def cond(c: _NewtonCarry):
        return jnp.logical_not(c.done)

    def body(c: _NewtonCarry):
        H = jac_fn(c.x)
        dx = -jnp.linalg.solve(H, c.g)
        diverged = jnp.linalg.norm(dx) > cfg.dx_max

        # Backtracking line search (evaluates res once per halving, like the
        # reference's inner while at driverRedMaxBDF1.m:123-144).
        f0 = 0.5 * jnp.dot(c.g, c.g)

        class LS(NamedTuple):
            alpha: jnp.ndarray
            x: jnp.ndarray
            g: jnp.ndarray
            it: jnp.ndarray
            stop: jnp.ndarray

        def ls_cond(s: LS):
            return jnp.logical_not(s.stop)

        def ls_body(s: LS):
            x_try = c.x + s.alpha * dx
            g_try = res_fn(x_try)
            f_try = 0.5 * jnp.dot(g_try, g_try)
            accept = f_try < f0
            exhausted = s.it + 1 >= cfg.ls_max
            return LS(
                alpha=jnp.where(accept | exhausted, s.alpha, 0.5 * s.alpha),
                x=x_try,
                g=g_try,
                it=s.it + 1,
                stop=accept | exhausted,
            )

        ls0 = LS(
            alpha=jnp.ones((), dtype=c.x.dtype),
            x=c.x,
            g=c.g,
            it=jnp.zeros((), dtype=jnp.int32),
            stop=diverged,  # skip line search entirely on divergence
        )
        ls = jax.lax.while_loop(ls_cond, ls_body, ls0)

        x_new = jnp.where(diverged, c.x, ls.x)
        g_new = jnp.where(diverged, c.g, ls.g)
        converged = jnp.linalg.norm(g_new) < cfg.tol
        done_new = diverged | converged | (c.it + 1 >= iter_max)
        # Mask: never update samples that were already done (vmap batching of
        # while_loop keeps stepping all lanes until every lane's cond fails).
        return _NewtonCarry(
            x=jnp.where(c.done, c.x, x_new),
            g=jnp.where(c.done, c.g, g_new),
            it=jnp.where(c.done, c.it, c.it + 1),
            done=c.done | done_new,
            diverged=c.diverged | (~c.done & diverged),
        )

    g0 = res_fn(x0)
    init = _NewtonCarry(
        x=x0,
        g=g0,
        it=jnp.zeros((), dtype=jnp.int32),
        done=jnp.linalg.norm(g0) < cfg.tol,
        diverged=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.x, {"iters": out.it, "diverged": out.diverged}


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------


def _Mf(topo, params, q, qdot, force_fns):
    M, f, _ = assemble(topo, params, q, qdot, force_fns)
    return M, f


def residual_bdf1(topo, force_fns, params: Dict, q1, q0, qdot0):
    h = params["h"]
    dqtmp = q1 - q0 - h * qdot0
    qdot1 = (q1 - q0) / h
    M, f = _Mf(topo, params, q1, qdot1, force_fns)
    return M @ dqtmp - h * h * f


def residual_sdirk2a(topo, force_fns, params: Dict, qa, q0, qdot0):
    ah = SDIRK_ALPHA * params["h"]
    dqtmp = qa - q0 - ah * qdot0
    qdota = (qa - q0) / ah
    M, f = _Mf(topo, params, qa, qdota, force_fns)
    return M @ dqtmp - ah * ah * f


def residual_sdirk2b(topo, force_fns, params: Dict, q1, q0, qdot0, qdota):
    a = SDIRK_ALPHA
    h = params["h"]
    ah = a * h
    dqtmp = q1 - q0 - (2 * a - 1) * h * qdot0 - 2 * (1 - a) * h * qdota
    qdot1 = (q1 - q0 - (1 - a) * h * qdota) / ah
    M, f = _Mf(topo, params, q1, qdot1, force_fns)
    return M @ dqtmp - ah * ah * f


def residual_bdf2(topo, force_fns, params: Dict, q2, q0, qdot0, q1, qdot1):
    h = params["h"]
    dqtmp = q2 - (4 / 3) * q1 + (1 / 3) * q0 - (8 / 9) * h * qdot1 + (2 / 9) * h * qdot0
    qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
    M, f = _Mf(topo, params, q2, qdot2, force_fns)
    return M @ dqtmp - (4 / 9) * h * h * f


# ---------------------------------------------------------------------------
# Step factories
# ---------------------------------------------------------------------------


def make_bdf1_step(
    topo: Topology,
    force_fns: Tuple = (),
    cfg: NewtonConfig = NewtonConfig(),
    differentiable: bool = False,
):
    """One BDF1 step: State -> State. Mirrors simLoop (driverRedMaxBDF1.m:57-92).

    differentiable=True routes the Newton solve through the implicit-function
    custom VJP (adjoint.py), enabling exact reverse-mode gradients through
    rollouts — the TPU equivalent of the reference adjoint (TaskBDF1.m:45-81).
    """
    newton_fn = lambda fn, x0: newton(fn, x0, cfg)[0]

    def _res(theta, q1):
        params, q0, qdot0 = theta
        return residual_bdf1(topo, force_fns, params, q1, q0, qdot0)

    def step(params: Dict, state: State) -> State:
        q0, qdot0 = state.q, state.qdot
        h = params["h"]
        if differentiable:
            q1 = implicit_solve(_res, newton_fn, (params, q0, qdot0), q0 + h * qdot0)
        else:
            res = lambda q1: residual_bdf1(topo, force_fns, params, q1, q0, qdot0)
            q1, _ = newton(res, q0 + h * qdot0, cfg)
        qdot1 = (q1 - q0) / h
        q1, qdot1 = reparam_all(topo, q1, qdot1, params)
        return State(q=q1, qdot=qdot1)

    return step


class Bdf2State(NamedTuple):
    """BDF2 needs two history levels (q0/qdot0 = k-1, q1/qdot1 = k)."""

    q: jnp.ndarray
    qdot: jnp.ndarray
    q_prev: jnp.ndarray
    qdot_prev: jnp.ndarray
    k: jnp.ndarray  # step counter (0 -> SDIRK2 bootstrap)


def make_bdf2_step(
    topo: Topology,
    force_fns: Tuple = (),
    cfg: NewtonConfig = NewtonConfig(),
    differentiable: bool = False,
):
    """One BDF2 step with SDIRK2 bootstrap at k=0 (driverRedMaxBDF2.m:64-124).

    differentiable=True: implicit-function custom VJP per solve (the
    reference's 4-band backward recursion, TaskBDF2.m:55-106, emerges from
    reverse-mode through the two-level Bdf2State carry).
    """
    newton_fn = lambda fn, x0: newton(fn, x0, cfg)[0]

    def _solve(res_theta_fn, theta, x0):
        if differentiable:
            return implicit_solve(res_theta_fn, newton_fn, theta, x0)
        return newton(lambda x: res_theta_fn(theta, x), x0, cfg)[0]

    def _res_a(theta, qa):
        params, q0, qdot0 = theta
        return residual_sdirk2a(topo, force_fns, params, qa, q0, qdot0)

    def _res_b(theta, q1):
        params, q0, qdot0, qdota = theta
        return residual_sdirk2b(topo, force_fns, params, q1, q0, qdot0, qdota)

    def _res_2(theta, q2):
        params, q0, qdot0, q1, qdot1 = theta
        return residual_bdf2(topo, force_fns, params, q2, q0, qdot0, q1, qdot1)

    def sdirk_step(params: Dict, s: Bdf2State) -> Bdf2State:
        q0, qdot0 = s.q, s.qdot
        h = params["h"]
        a = SDIRK_ALPHA
        qa = _solve(_res_a, (params, q0, qdot0), q0 + a * h * qdot0)
        qdota = (qa - q0) / (a * h)
        q1 = _solve(_res_b, (params, q0, qdot0, qdota), qa + (1 - a) * h * qdota)
        qdot1 = (q1 - q0 - (1 - a) * h * qdota) / (a * h)
        return Bdf2State(q=q1, qdot=qdot1, q_prev=q0, qdot_prev=qdot0, k=s.k + 1)

    def bdf2_inner(params: Dict, s: Bdf2State) -> Bdf2State:
        q0, qdot0 = s.q_prev, s.qdot_prev
        q1, qdot1 = s.q, s.qdot
        h = params["h"]
        q2 = _solve(_res_2, (params, q0, qdot0, q1, qdot1), q1 + h * qdot1)
        qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
        return Bdf2State(q=q2, qdot=qdot2, q_prev=q1, qdot_prev=qdot1, k=s.k + 1)

    def _reparam(params, s_new):
        q, qdot = reparam_all(topo, s_new.q, s_new.qdot, params)
        return s_new._replace(q=q, qdot=qdot)

    def step(params: Dict, s: Bdf2State) -> Bdf2State:
        s_new = jax.lax.cond(
            s.k == 0,
            lambda: sdirk_step(params, s),
            lambda: bdf2_inner(params, s),
        )
        return _reparam(params, s_new)

    # Split-phase access (make_simulate hoists the SDIRK bootstrap out of the
    # scan: under vmap a lax.cond lowers to select and EXECUTES both branches
    # every step — 3x the solves. See make_simulate(bdf2_parts=...)).
    step.bootstrap = lambda params, s: _reparam(params, sdirk_step(params, s))
    step.inner = lambda params, s: _reparam(params, bdf2_inner(params, s))
    return step


def bdf2_init(state: State) -> Bdf2State:
    return Bdf2State(
        q=state.q,
        qdot=state.qdot,
        q_prev=state.q,
        qdot_prev=state.qdot,
        k=jnp.zeros((), dtype=jnp.int32),
    )


def make_simulate(step_fn: Callable, nsteps: int, record: bool = False):
    """Roll a step function with lax.scan. Returns final state (and optional
    per-step (q, qdot) history when record=True).

    If step_fn exposes .bootstrap/.inner (BDF2), the first step runs the
    SDIRK2 bootstrap OUTSIDE the scan and the scan body is the pure BDF2
    step — avoiding the both-branches cost of vmapped lax.cond.
    """
    split = hasattr(step_fn, "bootstrap") and nsteps >= 1

    def simulate(params: Dict, state0):
        inner = step_fn.inner if split else step_fn

        def body(s, _):
            s_new = inner(params, s)
            out = (s_new.q, s_new.qdot) if record else None
            return s_new, out

        if split:
            state1 = step_fn.bootstrap(params, state0)
            final, hist = jax.lax.scan(body, state1, None, length=nsteps - 1)
            if record:
                hist = jax.tree_util.tree_map(
                    lambda first, rest: jnp.concatenate([first[None], rest]),
                    (state1.q, state1.qdot),
                    hist,
                )
        else:
            final, hist = jax.lax.scan(body, state0, None, length=nsteps)
        return (final, hist) if record else final

    return simulate
