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

from redmax_tpu.adjoint import implicit_solve, implicit_solve_factored
from redmax_tpu.linalg import make_solver
from redmax_tpu.model import (
    assemble,
    closure_forces,
    forward_kinematics,
    jacobians,
    joint_space_force,
    maximal_force,
    maximal_force_KD,
    reparam_all,
    structured_hessian,
)
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
    # Newton-matrix mode: "exact" (jacfwd of the residual) or "structured"
    # (model.structured_hessian — no dJ/dq terms, no tangent blowup; residual
    # stays exact so the solution is unchanged, only the convergence rate).
    # Applies to the chord matrix AND the adjoint backward solve.
    hessian: str = "exact"
    # Linear-solve kernel: "lu" (XLA LU — reference semantics, best on
    # CPU/f64) or "gj" / "gj_pivot" (unrolled Gauss-Jordan inverse — 5x
    # faster on TPU for batched nr<=32 systems; see linalg.py). Applies to
    # the Newton solve AND the adjoint transposed backward solve.
    linsolve: str = "lu"
    # BDF2 inner-step initial guess. "linear" = q1 + h qdot1 (the reference's,
    # driverRedMaxBDF2.m:103 — it iterates to tol 1e-9 so the guess is moot).
    # "quadratic" adds the constant-acceleration term 0.5 h (qdot1 - qdot0):
    # under fixed-iteration chord Newton the per-step error scales with the
    # predictor error times the contraction factor^iters, so the better
    # predictor buys ~1 chord iteration for free.
    predictor: str = "linear"
    # Per-iteration trust-region clamp on the Newton step norm (0 = off).
    # Fixed-iteration (chord) solves have no line search; on violent
    # transients (whip configurations of long chains) an overshooting step
    # feeds the quadratic-velocity force and the iteration squares itself to
    # overflow within a few steps. Clamping |dx| <= dx_clamp keeps diverged
    # rollouts FINITE so they can be masked per-lane (the reference only
    # `break`s with a message, driverRedMaxBDF1.m:118-121; under vmap a NaN
    # lane would poison pmean-reduced objectives instead).
    dx_clamp: float = 0.0
    # Guarded solve: after each fixed iteration, accept the full step if the
    # trial residual improved, else the half step if IT improved, else stay
    # put — branchless over lanes. Works with chord=True (frozen H) and
    # chord=False (H re-evaluated each iteration), matching the fused kernel
    # in both modes. Both trial residuals are evaluated each iteration (TWO
    # extra residual assemblies — lax.select has no short circuit); turns
    # the n>=20-link chain from NaN into a converged solve while keeping
    # static control flow. Rejection semantics: a lane that hit the
    # stay-put branch is only REJECTED (NaN-poisoned) when the solve never
    # meaningfully improved — final |g| > 0.5 * initial |g| (the stall
    # threshold); lanes that stalled after the residual already dropped
    # below half keep their half-resolved step.
    guarded: bool = False
    # Affordable robust mode (r5): plain chord iterations with ONE guarded
    # final iteration (full/half/stay-put on the last step only). Costs 2
    # extra residual evaluations per SOLVE instead of per ITERATION — the
    # middle option between plain chord and the full guard, whose
    # select-heavy loop executes ~27x slower on TPU under Mosaic
    # (benchmarks/robust_mode.json measures all three). The final-iteration
    # stall check uses the same 0.5*g0n threshold as `guarded`, with g0n
    # the first measured residual of the solve. Requires chord=True and
    # guarded=False.
    guard_last: bool = False
    # Fixed-iteration failure detection (none of these run a line search, so
    # a solve can end finite but far from the root; such lanes must not pass
    # downstream isfinite masks as valid states). A lane is rejected when
    #   * the final iterate or residual is non-finite, or
    #   * (guarded) an iteration hit the stay-put branch (both trial steps
    #     non-finite), or
    #   * the last measured residual norm grew by more than growth_reject
    #     relative to the initial residual norm (0 disables; chord Newton
    #     contracts monotonically on healthy lanes, so 10x growth over the
    #     whole solve is unambiguous divergence), or
    #   * tol_reject > 0 and the last measured |g| exceeds it (absolute).
    # Rejected lanes are poisoned to NaN so every downstream mask
    # (jnp.isfinite in mpc.py / parallel.py) treats them as diverged.
    growth_reject: float = 10.0
    tol_reject: float = 0.0
    # Adjoint factor reuse (differentiable fixed-iteration solves only): the
    # backward H^-T solve reuses the factorization the FORWARD chord solve
    # already built at the predictor, instead of re-assembling + re-factoring
    # H at the solution (the reference reuses its forward LU the same way,
    # TaskBDF1.m:66 via Scene.saveHistory). With a structured H this adds a
    # second O(|x*-x0|) = O(h^2) relative bias term of the same class as the
    # structured truncation itself; the exact-residual VJP is untouched.
    # Measured (tests/test_adjoint.py, scene 100 at tau~3e3): the reuse
    # increment moves the gradient by <2%, on top of the ~8% bias the
    # structured-H^T backward + unconverged chord residual already carry at
    # that stiffness; with hessian="exact" and full fixed iterations the
    # factored gradient is FD-tight (<2e-4). Saves one Hessian assembly +
    # factorization per step in backward. Memory tradeoff: the VJP residuals
    # keep the nr x nr factor live per step per lane until backward (vs
    # recomputing H from (theta, x*)); for long horizons or nr ~ 32 the
    # recompute path (adjoint_reuse_factor=False) has lower peak memory.
    adjoint_reuse_factor: bool = True


class _NewtonCarry(NamedTuple):
    x: jnp.ndarray
    g: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    diverged: jnp.ndarray


def newton(res_fn: Callable, x0, cfg: NewtonConfig, jac_fn: Callable = None):
    """Damped Newton with backtracking line search; vmap-safe via done masks.

    res_fn: x [nr] -> g [nr]. Returns (x, info dict).
    jac_fn: optional Newton-matrix override (structured Hessian).
    """
    iter_max = cfg.iter_max if cfg.iter_max > 0 else 10 * x0.shape[-1]
    if jac_fn is None:
        jac_fn = jax.jacfwd(res_fn)

    if cfg.fixed_iters > 0:
        # Unrolled (fixed_iters is static and small) so XLA fuses freely.
        if cfg.guard_last:
            assert cfg.chord and not cfg.guarded, (
                "guard_last requires chord=True, guarded=False"
            )
        factor, solve, _ = make_solver(cfg.linsolve)

        def clamp(dx):
            if not cfg.dx_clamp:
                return dx
            nrm = jnp.linalg.norm(dx)
            scale = jnp.minimum(1.0, cfg.dx_clamp / jnp.maximum(nrm, 1e-30))
            return dx * scale.astype(dx.dtype)

        x = x0
        g0n = None       # initial residual norm (set at first residual eval)
        gln = None       # last measured residual norm
        stayput = jnp.asarray(False)
        if cfg.guarded:
            # Guarded solve (chord OR re-evaluated-H — identical guard flow
            # to the fused kernel, so kernel-on/off stays behavior-equal).
            F = factor(jac_fn(x0))
            g = res_fn(x)
            gn = jnp.linalg.norm(g)
            g0n = gn
            for it in range(cfg.fixed_iters):
                if not cfg.chord and it > 0:
                    F = factor(jac_fn(x))
                dx = clamp(solve(F, g))
                g_full = res_fn(x - dx)
                # NaN-safe acceptance: a non-finite trial residual must
                # count as "grew" (NaN comparisons are False, so test
                # improvement, not growth).
                gfn = jnp.linalg.norm(g_full)
                ok_full = gfn <= gn
                x_half = x - 0.5 * dx
                g_half = res_fn(x_half)
                # the half step must IMPROVE too: accepting any finite
                # half walks straight into an exploding residual at a
                # contact/regime flip (observed |g| ~ 6e17 accepted).
                ghn = jnp.linalg.norm(g_half)
                ok_half = ghn <= gn
                # full step if it improved; else half step if improved;
                # else stay put (non-fatal when the solve already
                # improved — see the stalled test below).
                stayput = stayput | (~ok_full & ~ok_half)
                x = jnp.where(ok_full, x - dx, jnp.where(ok_half, x_half, x))
                g = jnp.where(ok_full, g_full, jnp.where(ok_half, g_half, g))
                gn = jnp.where(ok_full, gfn, jnp.where(ok_half, ghn, gn))
            gln = gn  # exact: g tracks the final iterate
        elif cfg.chord:
            F = factor(jac_fn(x0))
            plain = cfg.fixed_iters - (1 if cfg.guard_last else 0)
            for _ in range(plain):
                g = res_fn(x)
                gn = jnp.linalg.norm(g)
                g0n = gn if g0n is None else g0n
                gln = gn  # residual at the PRE-update iterate (1 stale)
                x = x - clamp(solve(F, g))
            if cfg.guard_last:
                # One guarded final iteration (see guard_last docstring).
                g = res_fn(x)
                gn = jnp.linalg.norm(g)
                g0n = gn if g0n is None else g0n
                dx = clamp(solve(F, g))
                g_full = res_fn(x - dx)
                gfn = jnp.linalg.norm(g_full)
                ok_full = gfn <= gn
                x_half = x - 0.5 * dx
                ghn = jnp.linalg.norm(res_fn(x_half))
                ok_half = ghn <= gn
                stayput = ~ok_full & ~ok_half
                x = jnp.where(ok_full, x - dx, jnp.where(ok_half, x_half, x))
                gln = jnp.where(ok_full, gfn, jnp.where(ok_half, ghn, gn))
        else:
            F = None
            for _ in range(cfg.fixed_iters):
                g = res_fn(x)
                gn = jnp.linalg.norm(g)
                g0n = gn if g0n is None else g0n
                gln = gn
                F = factor(jac_fn(x))
                x = x - clamp(solve(F, g))
        # A stay-put iteration only signals failure when the solve never
        # meaningfully improved: at a contact/regime flip the guard often
        # stalls AFTER the residual already dropped several-fold (the frozen
        # chord direction goes bad near the root), and rejecting such a lane
        # throws away a perfectly usable half-resolved step.
        stalled = stayput & (gln > 0.5 * g0n)
        diverged = ~jnp.all(jnp.isfinite(x)) | ~jnp.isfinite(gln) | stalled
        if cfg.growth_reject:
            diverged = diverged | (gln > cfg.growth_reject * g0n)
        if cfg.tol_reject:
            diverged = diverged | (gln > cfg.tol_reject)
        x = jnp.where(diverged, jnp.full_like(x, jnp.nan), x)
        # "factor": the live factorization (chord: at the predictor; plain
        # fixed-iters: at the last iterate) — reusable by the adjoint
        # backward solve (cfg.adjoint_reuse_factor).
        return x, {
            "iters": jnp.asarray(cfg.fixed_iters),
            "diverged": diverged,
            "factor": F,
        }

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


def _Mf(topo, params, q, qdot, force_fns, aux=None):
    M, f, _ = assemble(topo, params, q, qdot, force_fns, aux)
    return M, f


def residual_bdf1(topo, force_fns, params: Dict, q1, q0, qdot0, aux=None):
    h = params["h"]
    dqtmp = q1 - q0 - h * qdot0
    qdot1 = (q1 - q0) / h
    M, f = _Mf(topo, params, q1, qdot1, force_fns, aux)
    return M @ dqtmp - h * h * f


def residual_sdirk2a(topo, force_fns, params: Dict, qa, q0, qdot0, aux=None):
    ah = SDIRK_ALPHA * params["h"]
    dqtmp = qa - q0 - ah * qdot0
    qdota = (qa - q0) / ah
    M, f = _Mf(topo, params, qa, qdota, force_fns, aux)
    return M @ dqtmp - ah * ah * f


def residual_sdirk2b(topo, force_fns, params: Dict, q1, q0, qdot0, qdota, aux=None):
    a = SDIRK_ALPHA
    h = params["h"]
    ah = a * h
    dqtmp = q1 - q0 - (2 * a - 1) * h * qdot0 - 2 * (1 - a) * h * qdota
    qdot1 = (q1 - q0 - (1 - a) * h * qdota) / ah
    M, f = _Mf(topo, params, q1, qdot1, force_fns, aux)
    return M @ dqtmp - ah * ah * f


def residual_bdf2(topo, force_fns, params: Dict, q2, q0, qdot0, q1, qdot1, aux=None):
    h = params["h"]
    dqtmp = q2 - (4 / 3) * q1 + (1 / 3) * q0 - (8 / 9) * h * qdot1 + (2 / 9) * h * qdot0
    qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
    M, f = _Mf(topo, params, q2, qdot2, force_fns, aux)
    return M @ dqtmp - (4 / 9) * h * h * f


# ---------------------------------------------------------------------------
# Structured Newton matrices (see model.structured_hessian)
# ---------------------------------------------------------------------------


def _hess_bdf1(topo, force_fns):
    def hess(theta, q1):
        params, q0, qdot0, aux = theta
        h = params["h"]
        return structured_hessian(
            topo, params, q1, (q1 - q0) / h, -h * h, -h, force_fns, aux
        )

    return hess


def _hess_sdirk2a(topo, force_fns):
    def hess(theta, qa):
        params, q0, qdot0, aux = theta
        ah = SDIRK_ALPHA * params["h"]
        return structured_hessian(
            topo, params, qa, (qa - q0) / ah, -ah * ah, -ah, force_fns, aux
        )

    return hess


def _hess_sdirk2b(topo, force_fns):
    def hess(theta, q1):
        params, q0, qdot0, qdota, aux = theta
        a = SDIRK_ALPHA
        h = params["h"]
        ah = a * h
        qdot1 = (q1 - q0 - (1 - a) * h * qdota) / ah
        return structured_hessian(
            topo, params, q1, qdot1, -ah * ah, -ah, force_fns, aux
        )

    return hess


def _hess_bdf2(topo, force_fns):
    def hess(theta, q2):
        params, q0, qdot0, q1, qdot1, aux = theta
        h = params["h"]
        qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
        return structured_hessian(
            topo, params, q2, qdot2, -(4 / 9) * h * h, -(2 / 3) * h, force_fns, aux
        )

    return hess


# ---------------------------------------------------------------------------
# Step factories
# ---------------------------------------------------------------------------


def _make_solve_T(cfg: NewtonConfig):
    """Backward (H^-T xbar) kernel for the adjoint VJP, matching cfg.linsolve.

    None for "lu" (adjoint falls back to jnp.linalg.solve(H.T, .)); the GJ
    inverse path makes the transposed solve a single matvec.
    """
    if cfg.linsolve == "lu":
        return None
    factor, _, solve_T = make_solver(cfg.linsolve)
    return lambda H, xbar: solve_T(factor(H), xbar)


def _factored_adjoint_parts(cfg: NewtonConfig):
    """(newton_factored maker, solve_T_factor) for implicit_solve_factored,
    or None when the solver config produces no reusable factorization
    (fixed_iters == 0) or reuse is disabled."""
    if not (cfg.fixed_iters > 0 and cfg.adjoint_reuse_factor):
        return None
    _, _, solve_T = make_solver(cfg.linsolve)

    def make_newton_factored(res_theta_fn, hess_fn):
        def run(theta, x0):
            res = lambda x: res_theta_fn(theta, x)
            jac = (lambda x: hess_fn(theta, x)) if hess_fn else None
            x, info = newton(res, x0, cfg, jac_fn=jac)
            return x, info["factor"]

        return run

    return make_newton_factored, solve_T


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
    newton_fn = lambda fn, jac, x0: newton(fn, x0, cfg, jac_fn=jac)[0]
    hess_fn = _hess_bdf1(topo, force_fns) if cfg.hessian == "structured" else None
    solve_T = _make_solve_T(cfg)
    fac_parts = _factored_adjoint_parts(cfg)

    def _res(theta, q1):
        params, q0, qdot0, aux = theta
        return residual_bdf1(topo, force_fns, params, q1, q0, qdot0, aux)

    if fac_parts is not None:
        make_nf, solve_T_fac = fac_parts
        _newton_fac = make_nf(_res, hess_fn)

    def step(params: Dict, state: State) -> State:
        q0, qdot0, aux = state.q, state.qdot, state.aux
        h = params["h"]
        theta = (params, q0, qdot0, aux)
        if differentiable and fac_parts is not None:
            q1 = implicit_solve_factored(
                _res, _newton_fac, solve_T_fac, theta, q0 + h * qdot0
            )
        elif differentiable:
            q1 = implicit_solve(_res, newton_fn, hess_fn, solve_T, theta, q0 + h * qdot0)
        else:
            jac = (lambda x: hess_fn(theta, x)) if hess_fn else None
            res = lambda q1: residual_bdf1(topo, force_fns, params, q1, q0, qdot0, aux)
            q1, _ = newton(res, q0 + h * qdot0, cfg, jac_fn=jac)
        qdot1 = (q1 - q0) / h
        q1, qdot1, aux, _, _ = reparam_all(topo, params, q1, qdot1, aux)
        return State(q=q1, qdot=qdot1, aux=aux)

    return step


class Bdf2State(NamedTuple):
    """BDF2 needs two history levels (q0/qdot0 = k-1, q1/qdot1 = k)."""

    q: jnp.ndarray
    qdot: jnp.ndarray
    q_prev: jnp.ndarray
    qdot_prev: jnp.ndarray
    k: jnp.ndarray  # step counter (0 -> SDIRK2 bootstrap)
    aux: Dict = {}  # per-joint discrete state (euler charts)


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
    newton_fn = lambda fn, jac, x0: newton(fn, x0, cfg, jac_fn=jac)[0]
    structured = cfg.hessian == "structured"
    hess_a = _hess_sdirk2a(topo, force_fns) if structured else None
    hess_b = _hess_sdirk2b(topo, force_fns) if structured else None
    hess_2 = _hess_bdf2(topo, force_fns) if structured else None
    solve_T = _make_solve_T(cfg)
    fac_parts = _factored_adjoint_parts(cfg)

    def _res_a(theta, qa):
        params, q0, qdot0, aux = theta
        return residual_sdirk2a(topo, force_fns, params, qa, q0, qdot0, aux)

    def _res_b(theta, q1):
        params, q0, qdot0, qdota, aux = theta
        return residual_sdirk2b(topo, force_fns, params, q1, q0, qdot0, qdota, aux)

    def _res_2(theta, q2):
        params, q0, qdot0, q1, qdot1, aux = theta
        return residual_bdf2(topo, force_fns, params, q2, q0, qdot0, q1, qdot1, aux)

    # One newton_factored closure per (res, hess) pair, built EAGERLY at make
    # time (as make_bdf1_step does) so repeated scan steps share the same
    # custom-VJP nondiff identity without caching by id(closure).
    if fac_parts is not None:
        make_nf, solve_T_fac = fac_parts
        _nf = {"a": make_nf(_res_a, hess_a), "b": make_nf(_res_b, hess_b),
               "2": make_nf(_res_2, hess_2)}

    def _solve(res_theta_fn, hess_fn, nf_key, theta, x0):
        if differentiable and fac_parts is not None:
            return implicit_solve_factored(
                res_theta_fn, _nf[nf_key], solve_T_fac, theta, x0
            )
        if differentiable:
            return implicit_solve(res_theta_fn, newton_fn, hess_fn, solve_T, theta, x0)
        jac = (lambda x: hess_fn(theta, x)) if hess_fn else None
        return newton(lambda x: res_theta_fn(theta, x), x0, cfg, jac_fn=jac)[0]

    def sdirk_step(params: Dict, s: Bdf2State) -> Bdf2State:
        q0, qdot0, aux = s.q, s.qdot, s.aux
        h = params["h"]
        a = SDIRK_ALPHA
        qa = _solve(_res_a, hess_a, "a", (params, q0, qdot0, aux), q0 + a * h * qdot0)
        qdota = (qa - q0) / (a * h)
        q1 = _solve(
            _res_b, hess_b, "b", (params, q0, qdot0, qdota, aux),
            qa + (1 - a) * h * qdota,
        )
        qdot1 = (q1 - q0 - (1 - a) * h * qdota) / (a * h)
        return Bdf2State(
            q=q1, qdot=qdot1, q_prev=q0, qdot_prev=qdot0, k=s.k + 1, aux=aux
        )

    def bdf2_inner(params: Dict, s: Bdf2State) -> Bdf2State:
        q0, qdot0 = s.q_prev, s.qdot_prev
        q1, qdot1, aux = s.q, s.qdot, s.aux
        h = params["h"]
        guess = q1 + h * qdot1
        if cfg.predictor == "quadratic":
            guess = guess + 0.5 * h * (qdot1 - qdot0)
        q2 = _solve(_res_2, hess_2, "2", (params, q0, qdot0, q1, qdot1, aux), guess)
        qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
        return Bdf2State(
            q=q2, qdot=qdot2, q_prev=q1, qdot_prev=qdot1, k=s.k + 1, aux=aux
        )

    def _reparam(params, s_new):
        q, qdot, aux, q_prev, qdot_prev = reparam_all(
            topo, params, s_new.q, s_new.qdot, s_new.aux,
            s_new.q_prev, s_new.qdot_prev,
        )
        return s_new._replace(
            q=q, qdot=qdot, aux=aux, q_prev=q_prev, qdot_prev=qdot_prev
        )

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
        aux=state.aux,
    )


# Per-lane physical parameters in the batched pipeline (r5): any of these
# params may carry a leading batch dim [B, ...] — the scenario-sampling /
# system-identification dimension of BASELINE.json (domain-randomized
# inertia, timestep, gravity, contact and spring coefficients). The base
# (unbatched) ndim is listed; a leaf with ndim == base + 1 is per-lane.
_BATCHABLE = {"tau": 1, "I_i": 2, "g": 1, "h": 0, "body_damping": 1}
# Scalar per-force coefficients that may be [B] (params["forces"][key][p]).
_FORCE_BATCHABLE = ("kn", "kt", "kd", "mu", "k", "d", "L")


def split_batched_params(params: Dict):
    """(shared, batched): split params into lane-shared leaves and the
    per-lane [B, ...] leaves declared in _BATCHABLE / _FORCE_BATCHABLE."""
    shared = dict(params)
    batched = {}
    for k, nd in _BATCHABLE.items():
        v = params.get(k)
        if v is not None and getattr(v, "ndim", None) == nd + 1:
            batched[k] = shared.pop(k)
    forces = params.get("forces")
    if forces:
        bf, sf = {}, {}
        for key, fp in forces.items():
            bsub = {p: v for p, v in fp.items()
                    if p in _FORCE_BATCHABLE and getattr(v, "ndim", 0) == 1}
            sf[key] = {p: v for p, v in fp.items() if p not in bsub}
            if bsub:
                bf[key] = bsub
        if bf:
            batched["forces"] = bf
            shared["forces"] = sf
    return shared, batched


def merge_batched_params(shared: Dict, lane: Dict) -> Dict:
    """Re-assemble one lane's params from (shared, per-lane slice)."""
    out = {**shared, **{k: v for k, v in lane.items() if k != "forces"}}
    if "forces" in lane:
        f = dict(shared.get("forces", {}))
        for key, sub in lane["forces"].items():
            f[key] = {**f.get(key, {}), **sub}
        out["forces"] = f
    return out


def make_bdf2_step_batched(
    topo: Topology,
    force_fns: Tuple = (),
    cfg: NewtonConfig = NewtonConfig(),
    differentiable: bool = False,
    use_pallas: bool = None,
    interpret: bool = None,
    kernel_impl: str = "pallas",
    backward: str = "reuse",
):
    """Batched BDF2 step over [B, nr] states — the TPU performance tier.

    Routes the inner BDF2 chord solve through the fused Pallas kernel
    (pallas_step.make_chord_bdf2: the batch is the tile) when the scene and
    config qualify, filling the role of the reference's *used* performance
    implementation (c++/PCG/src/Solver.cpp:567-875); falls back to jax.vmap
    of make_bdf2_step otherwise. Semantics are identical to vmapping
    make_bdf2_step up to f32 reassociation (tests/test_pallas_step.py).

    Conventions: every Bdf2State leaf carries a leading batch dim (k may stay
    scalar — lanes step in lock-step); params["tau"] may be [nr] (shared) or
    [B, nr] (per-lane, the MPC case); all other params are shared.

    LOCK-STEP REQUIREMENT: step() dispatches bootstrap-vs-inner on
    jnp.all(s.k == 0) — a batch whose lanes carry MIXED k values (some 0,
    some >0) is outside the contract: the k=0 lanes would take an inner BDF2
    step against bdf2_init's duplicated history instead of bootstrapping.
    Every in-repo producer (bdf2_init + make_simulate's split-phase scan)
    keeps k scalar or uniform; if you construct batched states by hand, keep
    k uniform or use the vmapped fallback (use_pallas=False), whose per-lane
    lax.cond handles mixed k correctly.

    differentiable=True wires the implicit-function custom VJP: the backward
    transposed solve reuses the H^-1 the forward kernel already materialized
    (TaskBDF1.m:66 factor reuse), and the residual VJP runs through the pure
    JAX residual — the kernel itself is never differentiated.

    use_pallas: None = auto (kernel when supported), False = force vmap
    fallback, True = require the kernel (raises if unsupported).
    interpret: forwarded to pallas_call (None = auto: interpret off-TPU).
    Exposes .bootstrap/.inner like make_bdf2_step for make_simulate.

    backward (kernel pipeline only — the fallback's escape hatch is
    cfg.hessian="exact"): the adjoint backward transposed solve runs against
      "reuse"   (default, production) — the chord factor H^-1 the forward
                kernel materialized at the predictor x0 (fastest; carries
                the measured ~8% FD bias on stiff scenes, test_adjoint.py);
      "refresh" — a structured H re-evaluated AT THE SOLUTION x*
                (TaskBDF1.m:45-81 solves against H at the solution);
      "exact"   — the exact jacfwd Hessian at x* (FD-tight gradients at
                the cost of the dJ/dq tangent blowup per backward step).
    """
    from redmax_tpu import pallas_step

    qualifies = (
        pallas_step.supports(topo, force_fns)
        and cfg.fixed_iters > 0
        and cfg.hessian == "structured" and cfg.linsolve == "gj"
    )
    if use_pallas is None:
        use_pallas = qualifies
    elif use_pallas and not qualifies:
        raise ValueError("scene/config not supported by the pallas fast path")

    # Validate `backward` up front: silently falling back to the biased
    # reuse-path gradients when the kernel path is not taken would hand a
    # user who explicitly requested FD-tight gradients the wrong thing.
    if backward not in ("reuse", "refresh", "exact"):
        raise ValueError(f"backward={backward!r}")
    if differentiable and backward != "reuse" and not use_pallas:
        raise ValueError(
            f"backward={backward!r} only applies to the kernel pipeline; "
            "this scene/config routes to the vmapped fallback — use "
            "cfg.hessian='exact' (with full fixed iterations) for FD-tight "
            "fallback gradients instead"
        )

    base = make_bdf2_step(topo, force_fns, cfg, differentiable=differentiable)

    def _vmap_params(fn):
        """vmap fn(params, s) over the batch dim of s plus every per-lane
        [B, ...] param (split_batched_params: tau, I_i, h, g, contact/spring
        coefficients); the step counter k may be scalar (lanes in lock-step)."""

        def run(params: Dict, s: Bdf2State):
            ax = Bdf2State(
                q=0, qdot=0, q_prev=0, qdot_prev=0,
                k=None if s.k.ndim == 0 else 0,
                aux=jax.tree_util.tree_map(lambda _: 0, s.aux),
            )
            shared, lane = split_batched_params(params)
            if lane:
                return jax.vmap(
                    lambda lp, ss: fn(merge_batched_params(shared, lp), ss),
                    in_axes=(0, ax), out_axes=ax,
                )(lane, s)
            return jax.vmap(lambda ss: fn(params, ss), in_axes=(ax,), out_axes=ax)(s)

        return run

    bootstrap = _vmap_params(base.bootstrap)

    if not use_pallas:
        step = _vmap_params(base)
        step.bootstrap = bootstrap
        step.inner = _vmap_params(base.inner)
        return step

    solve_k = pallas_step.make_chord_bdf2(
        topo, cfg, interpret=interpret, impl=kernel_impl, force_fns=force_fns
    )

    def _res2b(theta, x):
        """Batched BDF2 residual: theta = (params, q0, qd0, q1, qd1) with
        [B, nr] state levels; x [B, nr]. Exact (pure JAX) — this is what the
        adjoint differentiates, not the kernel. Per-lane params (tau, I_i,
        h, ...) vmap alongside the state."""
        params, q0, qd0, q1, qd1 = theta
        shared, lane = split_batched_params(params)

        def one(lp, q0i, qd0i, q1i, qd1i, xi):
            p = merge_batched_params(shared, lp)
            return residual_bdf2(topo, force_fns, p, xi, q0i, qd0i, q1i, qd1i)

        if lane:
            return jax.vmap(one)(lane, q0, qd0, q1, qd1, x)
        return jax.vmap(partial(one, {}))(q0, qd0, q1, qd1, x)

    def _plain(theta, x0):
        params, q0, qd0, q1, qd1 = theta
        x, _ = solve_k(params, x0, q0, qd0, q1, qd1)
        return x

    if differentiable:
        assert backward in ("reuse", "refresh", "exact"), backward
        psolve = jax.custom_vjp(_plain)
        _hessb = _hess_bdf2(topo, force_fns)
        _solve_T = _make_solve_T(cfg)

        def _z_of(theta, x, Hinv, xbar):
            """Adjoint solve z = H^-T xbar per lane (see `backward` above)."""
            if backward == "reuse":
                return jnp.einsum("bsr,bs->br", Hinv, xbar.astype(Hinv.dtype))
            params, q0, qd0, q1, qd1 = theta
            shared, lane = split_batched_params(params)

            def Hof(lp, a, b, c, d, xi):
                p = merge_batched_params(shared, lp)
                if backward == "refresh":
                    return _hessb((p, a, b, c, d, {}), xi)
                return jax.jacfwd(lambda xx: residual_bdf2(
                    topo, force_fns, p, xx, a, b, c, d, {}
                ))(xi)

            if lane:
                H = jax.vmap(Hof)(lane, q0, qd0, q1, qd1, x)
            else:
                H = jax.vmap(partial(Hof, {}))(q0, qd0, q1, qd1, x)
            if _solve_T is not None:
                return jax.vmap(_solve_T)(H, xbar.astype(H.dtype))
            return jnp.linalg.solve(
                jnp.swapaxes(H, -1, -2), xbar.astype(H.dtype)[..., None]
            )[..., 0]

        def _pfwd(theta, x0):
            params, q0, qd0, q1, qd1 = theta
            x, Hinv = solve_k(params, x0, q0, qd0, q1, qd1)
            return x, (theta, x, Hinv)

        def _pbwd(saved, xbar):
            theta, x, Hinv = saved
            # z = H^-T xbar per lane, reusing the forward chord factor
            # (implicit_solve_factored semantics; TaskBDF1.m:66) or a
            # refreshed/exact H at x* per `backward`.
            z = _z_of(theta, x, Hinv, xbar)
            res_out, vjp_theta = jax.vjp(lambda th: _res2b(th, x), theta)
            (thetabar,) = vjp_theta((-z).astype(res_out.dtype))
            x0bar = jax.tree_util.tree_map(
                lambda a: jnp.zeros_like(a), saved[0][1]
            )
            return (thetabar, x0bar)

        psolve.defvjp(_pfwd, _pbwd)

    # Exp-map joints (SPHERICAL / FREE3D) need the post-step rescale reparam
    # (JointSphericalExp.m:31-46); it runs OUTSIDE the kernel, vmapped over
    # lanes, exactly where the fallback's _reparam applies reparam_all
    # (exp-type reparam touches q/qdot only, never the BDF2 history).
    from redmax_tpu.joints import KERNELS as _JK
    from redmax_tpu.types import JointType as _JT

    needs_reparam = any(_JK[_JT(t)].reparam_fn is not None for t in topo.jtype)

    def inner(params: Dict, s: Bdf2State) -> Bdf2State:
        q0, qd0 = s.q_prev, s.qdot_prev
        q1, qd1 = s.q, s.qdot
        h = params["h"]
        if getattr(h, "ndim", 0) == 1:
            h = h[:, None]               # per-lane timestep [B] -> [B, 1]
        guess = q1 + h * qd1
        if cfg.predictor == "quadratic":
            guess = guess + 0.5 * h * (qd1 - qd0)
        theta = (params, q0, qd0, q1, qd1)
        q2 = (psolve if differentiable else _plain)(theta, guess)
        q2 = q2.astype(q1.dtype)  # kernel is f32; keep the carry dtype stable
        qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
        if needs_reparam:
            q2, qdot2 = jax.vmap(
                lambda qq, qd: reparam_all(topo, params, qq, qd, s.aux)[:2]
            )(q2, qdot2)
        return Bdf2State(
            q=q2, qdot=qdot2, q_prev=q1, qdot_prev=qd1, k=s.k + 1, aux=s.aux
        )

    def step(params: Dict, s: Bdf2State) -> Bdf2State:
        # Lanes step in lock-step (k starts at 0 everywhere), so the
        # bootstrap/inner split is a scalar cond, not a per-lane select.
        return jax.lax.cond(
            jnp.all(s.k == 0),
            lambda: bootstrap(params, s),
            lambda: inner(params, s),
        )

    step.bootstrap = bootstrap
    step.inner = inner
    return step


def make_simulate(
    step_fn: Callable, nsteps: int, record: bool = False, scene_fn: Callable = None
):
    """Roll a step function with lax.scan. Returns final state (and optional
    per-step (q, qdot) history when record=True).

    scene_fn(params, t) -> params: jittable time-dependent parameter hook
    (the reference's sceneFcn, called with the END time of each step,
    matlab/testRedMax.m:569: sceneFcn(t(k))). Must be branchless
    (jnp.where over time windows).

    If step_fn exposes .bootstrap/.inner (BDF2), the first step runs the
    SDIRK2 bootstrap OUTSIDE the scan and the scan body is the pure BDF2
    step — avoiding the both-branches cost of vmapped lax.cond.
    """
    split = hasattr(step_fn, "bootstrap") and nsteps >= 1

    def simulate(params: Dict, state0):
        inner = step_fn.inner if split else step_fn
        h = params["h"]

        def at_t(k):
            return scene_fn(params, (k + 1) * h) if scene_fn else params

        def body(s, k):
            s_new = inner(at_t(k), s)
            out = (s_new.q, s_new.qdot) if record else None
            return s_new, out

        ks = jnp.arange(nsteps)
        if split:
            state1 = step_fn.bootstrap(at_t(0), state0)
            final, hist = jax.lax.scan(body, state1, ks[1:])
            if record:
                hist = jax.tree_util.tree_map(
                    lambda first, rest: jnp.concatenate([first[None], rest]),
                    (state1.q, state1.qdot),
                    hist,
                )
        else:
            final, hist = jax.lax.scan(body, state0, ks)
        return (final, hist) if record else final

    return simulate


# ---------------------------------------------------------------------------
# Linearly-implicit (semi-implicit) Euler with constraints
# ---------------------------------------------------------------------------


def euler_system(topo: Topology, force_fns: Tuple, params: Dict, q0, qdot0, aux=None):
    """Assemble the linearly-implicit Euler system pieces (shared by the
    dense step and the matrix-free PCG tier so their semantics cannot drift):

        Mrtilde qdot1 = frtilde
        frtilde = Mr qdot0 + h (J^T (f0_m - Mm Jdot qdot0) + f0_r)
        Mrtilde = Mr - h J^T Dm J - h^2 J^T Km_sym J - h Dr - h^2 Kr

    where f0 excludes damping forces (damping is one-sidedly implicit, the
    reference discards the damping force and keeps only D: testRedMax.m:476
    "use implicit damping"), Km is the SYMMETRIZED closure stiffness
    (SpringPointPoint.m:169 symmetrizes), and Kr/Dr/Dm are raw jacfwd
    derivatives (matching the reference's sign conventions after mapping
    Dm_ref = -Dm_auto etc.).

    Returns a dict of the assembled pieces: kin, J, Jdot, phi, Mr, frtilde,
    Mrtilde, and the maximal/reduced derivative blocks (Km, Dm, Kr, Dr) the
    PCG tier applies matrix-free against J x.
    """
    h = params["h"]

    kin = forward_kinematics(topo, params, q0, qdot0, aux)
    J, Jdot, phi = jacobians(topo, params, kin, qdot0)

    fr_full = joint_space_force(topo, params, q0, qdot0)
    Kr = jax.jacfwd(lambda qq: joint_space_force(topo, params, qq, qdot0))(q0)
    Dr = jax.jacfwd(lambda qd: joint_space_force(topo, params, q0, qd))(qdot0)
    f0_r = fr_full - Dr @ qdot0          # strip (linear) damping forces

    fm_grav = maximal_force(topo, params, kin, phi)      # coriolis+gravity
    _, fm_cl = closure_forces(topo, params, kin, phi, q0, qdot0, force_fns)
    Km, Dm = maximal_force_KD(topo, params, kin, phi, q0, qdot0, force_fns)
    Km = 0.5 * (Km + Km.T)
    # Damping forces are one-sidedly implicit (reference discards them
    # from f0) EXCEPT for forces with strip_damping=False (SpringDamperM,
    # whose damping force stays in fm per computeForceStiffnessDamping).
    # NOTE: the strip matrix is the PRE-custom autodiff Dm.
    strip_fns = tuple(
        f for f in force_fns
        if getattr(f, "implicit_KD", True) and getattr(f, "strip_damping", True)
    )
    if strip_fns == tuple(f for f in force_fns if getattr(f, "implicit_KD", True)):
        Dm_strip = Dm
    else:
        _, Dm_strip = maximal_force_KD(
            topo, params, kin, phi, q0, qdot0, strip_fns
        )
    fm_el = fm_cl.reshape(-1) - Dm_strip @ phi.reshape(-1)
    f0_m = fm_grav.reshape(-1) + fm_el
    bd = params.get("body_damping")
    if bd is not None:
        # Body damping is one-sidedly implicit (Body.computeForceDamping
        # force discarded in euler; D enters the LHS).
        bd6 = jnp.repeat(bd, 6)
        f0_m = f0_m + bd6 * phi.reshape(-1)
        Dm = Dm - jnp.diag(bd6)
    for fcn in force_fns:
        if getattr(fcn, "custom_KD", False):
            Kc, Dc = fcn.matlab_KD(params, kin, phi, q0, qdot0)
            Km = Km + Kc
            Dm = Dm + Dc

    Ivec = params["I_i"].reshape(-1)
    MmJ = Ivec[:, None] * J
    Mr = J.T @ MmJ
    Mr = 0.5 * (Mr + Mr.T)
    frtilde = Mr @ qdot0 + h * (
        J.T @ (f0_m - Ivec * (Jdot @ qdot0)) + f0_r
    )
    Mrtilde = (
        Mr
        - h * (J.T @ (Dm @ J))
        - h * h * (J.T @ (Km @ J))
        - h * Dr
        - h * h * Kr
    )
    return {
        "kin": kin, "J": J, "Jdot": Jdot, "phi": phi,
        "Mr": Mr, "frtilde": frtilde, "Mrtilde": Mrtilde,
        "Km": Km, "Dm": Dm, "Kr": Kr, "Dr": Dr,
    }


def make_euler_step(
    topo: Topology,
    force_fns: Tuple = (),
    constraint_fns: Tuple = (),
    pgs_iters: int = 40,
):
    """One linearly-implicit Euler step (matlab/testRedMax.m:447-541); the
    system assembly lives in euler_system (docstring there).

    Constraints: equality rows G qdot1 = -gdot - baum3 g via dense KKT;
    with inequalities active, the dual PGS QP (qp.qp_pgs) replaces
    quadprog (testRedMax.m:513-530). Baumgarte factors from
    params["baumgarte"] (Scene.m:42, default [5 5 5]).
    """
    from redmax_tpu.constraints import assemble_constraints
    from redmax_tpu.qp import kkt_solve, qp_pgs

    def step(params: Dict, state: State) -> State:
        q0, qdot0, aux = state.q, state.qdot, state.aux
        h = params["h"]
        dtype = q0.dtype

        sys = euler_system(topo, force_fns, params, q0, qdot0, aux)
        kin, J, phi = sys["kin"], sys["J"], sys["phi"]
        Mrtilde, frtilde = sys["Mrtilde"], sys["frtilde"]

        if constraint_fns:
            rows = assemble_constraints(
                constraint_fns, params, topo, kin, phi, q0, qdot0, J
            )
            baum3 = params.get("baumgarte", jnp.array([5.0, 5.0, 5.0], dtype))[2]
            me = rows["Geq"].shape[0]
            mi = rows["Cin"].shape[0]
            rhsG = -rows["geqdot"] - baum3 * rows["geq"]
            if mi == 0:
                qdot1, lam = kkt_solve(Mrtilde, rows["Geq"], frtilde, rhsG)
            else:
                act = rows["act"].astype(dtype)[:, None]
                Cin = rows["Cin"] * act
                rhsC = jnp.where(rows["act"], -baum3 * rows["cin"], 0.0)
                A = jnp.concatenate([rows["Geq"], Cin], axis=0)
                b = jnp.concatenate([rhsG, rhsC], axis=0)
                inf = jnp.inf
                lo = jnp.concatenate(
                    [jnp.full(me, -inf, dtype), jnp.zeros(mi, dtype)]
                )
                hi_i = jnp.where(rows["act"], inf, 0.0)
                hi = jnp.concatenate([jnp.full(me, inf, dtype), hi_i])
                qdot1, lam = qp_pgs(Mrtilde, frtilde, A, b, lo, hi, pgs_iters)
        else:
            qdot1 = jnp.linalg.solve(Mrtilde, frtilde)

        q1 = q0 + h * qdot1
        q1, qdot1, aux, _, _ = reparam_all(topo, params, q1, qdot1, aux)
        return State(q=q1, qdot=qdot1, aux=aux)

    return step


def make_euler_step_batched(
    topo: Topology,
    force_fns: Tuple = (),
    constraint_fns: Tuple = (),
    pgs_iters: int = 40,
    qp_impl: str = "xla",
):
    """Batched linearly-implicit Euler step with constraints over [B, nr]
    states — the TPU contact-QP tier (SURVEY §7 step 8: "batched boxed-QP/
    projected solver replacing quadprog").

    Assembly (euler_system + constraint rows) vmaps per lane; the
    constrained solve then runs ONE explicitly-batched program:
    qp.qp_pgs_batched (lanes = scenes, dual-PGS rows unrolled) for
    inequality/boxed rows, a vmapped dense KKT for pure-equality scenes.
    qp_impl="pallas" routes the inequality solve through the FUSED
    pallas_qp.make_dual_pgs kernel instead (one pallas_call for GJ
    inverse + Schur setup + sweeps — wins when the XLA op-chain launch
    latency dominates, benchmarks/bench_qp.json).
    Per-lane params follow split_batched_params (tau, I_i, h, g, contact
    coefficients may be [B, ...]). Semantics match jax.vmap of
    make_euler_step lane-for-lane (tests/test_euler_constraints.py).

    Scope: scenes whose discrete aux state is empty (no Euler-chart
    joints) — exp-map reparams are applied vmapped; chart scenes should
    vmap make_euler_step directly.
    """
    from redmax_tpu.constraints import assemble_constraints
    from redmax_tpu.qp import kkt_solve, qp_pgs_batched

    def assemble_one(params, q0, qdot0):
        sys = euler_system(topo, force_fns, params, q0, qdot0, {})
        if constraint_fns:
            rows = assemble_constraints(
                constraint_fns, params, topo, sys["kin"], sys["phi"],
                q0, qdot0, sys["J"]
            )
            return sys["Mrtilde"], sys["frtilde"], rows
        return sys["Mrtilde"], sys["frtilde"]

    def step(params: Dict, state: State) -> State:
        q0, qdot0 = state.q, state.qdot
        dtype = q0.dtype
        B = q0.shape[0]
        shared, lane = split_batched_params(params)
        if lane:
            res = jax.vmap(
                lambda lp, q, qd: assemble_one(
                    merge_batched_params(shared, lp), q, qd)
            )(lane, q0, qdot0)
        else:
            res = jax.vmap(lambda q, qd: assemble_one(params, q, qd))(
                q0, qdot0)
        h = params["h"]
        hB = h[:, None] if getattr(h, "ndim", 0) == 1 else h
        if constraint_fns:
            Mrt, frt, rows = res
            baum3 = params.get(
                "baumgarte", jnp.array([5.0, 5.0, 5.0], dtype))[2]
            me = rows["Geq"].shape[1]
            mi = rows["Cin"].shape[1]
            rhsG = -rows["geqdot"] - baum3 * rows["geq"]
            if mi == 0:
                qdot1, _ = jax.vmap(kkt_solve)(Mrt, rows["Geq"], frt, rhsG)
            else:
                act = rows["act"].astype(dtype)[..., None]
                Cin = rows["Cin"] * act
                rhsC = jnp.where(rows["act"], -baum3 * rows["cin"], 0.0)
                A = jnp.concatenate([rows["Geq"], Cin], axis=1)
                bq = jnp.concatenate([rhsG, rhsC], axis=1)
                inf = jnp.inf
                lo = jnp.concatenate(
                    [jnp.full((B, me), -inf, dtype),
                     jnp.zeros((B, mi), dtype)], axis=1)
                hi = jnp.concatenate(
                    [jnp.full((B, me), inf, dtype),
                     jnp.where(rows["act"], inf, 0.0)], axis=1)
                if qp_impl == "pallas":
                    from redmax_tpu import pallas_qp

                    solver = pallas_qp.make_dual_pgs(
                        topo.nr, me + mi, iters=pgs_iters
                    )
                    qdot1, _ = solver(Mrt, frt, A, bq, lo, hi)
                else:
                    qdot1, _ = qp_pgs_batched(
                        Mrt, frt, A, bq, lo, hi, pgs_iters
                    )
        else:
            Mrt, frt = res
            qdot1 = jnp.linalg.solve(Mrt, frt)
        q1 = q0 + hB * qdot1
        q1, qdot1 = jax.vmap(
            lambda qq, qd: reparam_all(topo, params, qq, qd, {})[:2]
        )(q1, qdot1)
        return State(q=q1, qdot=qdot1, aux=state.aux)

    return step
