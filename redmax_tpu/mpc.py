"""Trajectory optimization / MPC engine.

The reference couples the adjoint method to MATLAB's fminunc for parameter
optimization (driverRedMaxAdjointBDF1.m:15-62): params p are per-joint
constant torques (TaskBDF1PointPos.applyStep, TaskBDF1PointPos.m:58-64), the
objective is a terminal point-position cost plus regularization
(TaskBDF1PointPos.m:67-107), and gradients come from the backward adjoint
sweep (TaskBDF1.m:45-81).

Here the whole pipeline is a pure jitted function: rollout = lax.scan of
custom-VJP implicit steps (adjoint.py), objective = terminal cost, gradient
= jax.grad, optimizer = fixed-iteration Adam / gradient descent (fminunc's
quasi-Newton role), and everything vmaps over batches of tasks and shards
over device meshes (parallel.py). One "MPC solve" = one forward rollout +
one adjoint backward pass + one parameter update.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from redmax_tpu import integrators
from redmax_tpu.model import forward_kinematics
from redmax_tpu.types import State, Topology


@dataclass(frozen=True)
class PointPosTask:
    """Terminal point-position task (TaskBDF1PointPos.m).

    Objective: 0.5 * wp * |x_world(body, xlocal; T) - x_target|^2
             + 0.5 * wreg * |p|^2
    where p scales per-DOF constant torques: tau = pscale * p
    (TaskBDF1PointPos.m:58-64 writes p * pscale into joint.tau each step).
    """

    body: int                      # body carrying the tracked point
    wp: float = 1.0                # terminal position weight (wp in the ref)
    wreg: float = 1e-6             # regularization weight (wreg)
    pscale: float = 1.0            # torque scale (pscale)


def make_rollout(
    topo: Topology,
    force_fns: Tuple,
    nsteps: int,
    integrator: str = "bdf2",
    cfg: Optional[integrators.NewtonConfig] = None,
):
    """(params, p, state0) -> final State after nsteps with tau = pscale*p.

    Returns the reduced State regardless of integrator (Bdf2State unwrapped).
    """
    cfg = cfg or integrators.NewtonConfig()
    if integrator == "bdf1":
        step = integrators.make_bdf1_step(topo, force_fns, cfg, differentiable=True)
        init = lambda s0: s0
        unwrap = lambda s: s
    elif integrator == "bdf2":
        step = integrators.make_bdf2_step(topo, force_fns, cfg, differentiable=True)
        init = integrators.bdf2_init
        unwrap = lambda s: State(q=s.q, qdot=s.qdot, aux=s.aux)
    else:
        raise ValueError(integrator)

    def rollout(params: Dict, tau, state0: State):
        params = dict(params)
        params["tau"] = tau
        sim = integrators.make_simulate(step, nsteps)
        final = sim(params, init(state0))
        return unwrap(final)

    return rollout


def make_objective(
    topo: Topology,
    force_fns: Tuple,
    task: PointPosTask,
    xlocal,
    nsteps: int,
    integrator: str = "bdf2",
    cfg: Optional[integrators.NewtonConfig] = None,
):
    """(params, p, state0, x_target) -> scalar objective P.

    Mirrors TaskBDF1PointPos.calcStep at the final step only (the reference
    task also evaluates only at t* = tEnd; TaskBDF1PointPos.m:73-78).
    """
    rollout = make_rollout(topo, force_fns, nsteps, integrator, cfg)

    def objective(params: Dict, p, state0: State, x_target):
        final = rollout(params, task.pscale * p, state0)
        kin = forward_kinematics(topo, params, final.q, final.qdot, final.aux)
        E = kin.E_wi[task.body]
        xw = E[:3, :3] @ jnp.asarray(xlocal, dtype=final.q.dtype) + E[:3, 3]
        dx = xw - x_target
        return 0.5 * task.wp * jnp.dot(dx, dx) + 0.5 * task.wreg * jnp.dot(p, p)

    return objective


def make_rollout_batched(
    topo: Topology,
    force_fns: Tuple,
    nsteps: int,
    cfg: Optional[integrators.NewtonConfig] = None,
    use_pallas: bool = None,
    interpret: bool = None,
    kernel_impl: str = "pallas",
    backward: str = "reuse",
):
    """(params, tau [B,nr] or [nr], state0 [B,...]) -> final batched State.

    Explicitly-batched BDF2 rollout: the batch axis is visible at the step so
    the fused Pallas chord kernel (pallas_step.py) can tile it; the vmapped
    path (make_rollout + outer jax.vmap) cannot expose it. Gradients flow
    through the factor-reusing custom VJP (integrators.make_bdf2_step_batched).
    """
    cfg = cfg or integrators.NewtonConfig()
    step = integrators.make_bdf2_step_batched(
        topo, force_fns, cfg, differentiable=True,
        use_pallas=use_pallas, interpret=interpret, kernel_impl=kernel_impl,
        backward=backward,
    )

    def rollout(params: Dict, tau, state0: State):
        params = dict(params)
        params["tau"] = tau
        sim = integrators.make_simulate(step, nsteps)
        final = sim(params, integrators.bdf2_init(state0))
        return State(q=final.q, qdot=final.qdot, aux=final.aux)

    return rollout


def make_objective_batched(
    topo: Topology,
    force_fns: Tuple,
    task: PointPosTask,
    xlocal,
    nsteps: int,
    cfg: Optional[integrators.NewtonConfig] = None,
    use_pallas: bool = None,
    interpret: bool = None,
    kernel_impl: str = "pallas",
    backward: str = "reuse",
):
    """(params, P [B,nr], state0 [B,...], x_targets [B,3]) -> objectives [B].

    Batched form of make_objective (same per-lane math: terminal point
    position + regularization, TaskBDF1PointPos.m:67-107)."""
    rollout = make_rollout_batched(
        topo, force_fns, nsteps, cfg, use_pallas, interpret, kernel_impl,
        backward=backward,
    )
    xl = jnp.asarray(xlocal)

    def objective(params: Dict, P, state0: State, x_targets):
        final = rollout(params, task.pscale * P, state0)

        def tip(q, qdot, aux):
            kin = forward_kinematics(topo, params, q, qdot, aux)
            E = kin.E_wi[task.body]
            return E[:3, :3] @ xl.astype(q.dtype) + E[:3, 3]

        xw = jax.vmap(tip)(final.q, final.qdot, final.aux)
        dx = xw - x_targets
        return 0.5 * task.wp * jnp.sum(dx * dx, axis=-1) + \
            0.5 * task.wreg * jnp.sum(P * P, axis=-1)

    return objective


class MpcResult(NamedTuple):
    p: Any          # optimized torque parameters
    objective: Any  # final objective value
    grad_norm: Any  # final gradient norm


def make_mpc_solver(
    objective_fn: Callable,
    iters: int = 1,
    lr: float = 1e-2,
    method: str = "adam",
):
    """Fixed-iteration gradient MPC solve (fminunc role, adjoint gradients).

    (params, p0, state0, x_target) -> MpcResult, with fixed iteration count
    so the solver jits/vmaps/shards with static control flow.

    method "adam" is the production path (one cheap update per adjoint
    gradient). method "lbfgs" is the parity path for the reference's
    quasi-Newton fminunc coupling (driverRedMaxAdjointBDF1.m:17-23:
    'quasi-newton' + SpecifyObjectiveGradient) — optax L-BFGS with zoom
    linesearch, so each iteration may re-evaluate the rollout several times.
    """
    import optax

    grad_fn = jax.value_and_grad(objective_fn, argnums=1)

    if method == "lbfgs":
        opt = optax.lbfgs(memory_size=8)

        def solve(params: Dict, p0, state0: State, x_target) -> MpcResult:
            value_fn = lambda pp: objective_fn(params, pp, state0, x_target)

            def body(carry, _):
                p, opt_state = carry
                val, g = grad_fn(params, p, state0, x_target)
                updates, opt_state = opt.update(
                    g, opt_state, p, value=val, grad=g, value_fn=value_fn
                )
                p = optax.apply_updates(p, updates)
                return (p, opt_state), (val, jnp.linalg.norm(g))

            (p, _), (vals, gnorms) = jax.lax.scan(
                body, (p0, opt.init(p0)), None, length=iters
            )
            return MpcResult(p=p, objective=vals[-1], grad_norm=gnorms[-1])

        return solve

    opt = optax.adam(lr)

    def solve(params: Dict, p0, state0: State, x_target) -> MpcResult:
        def body(carry, _):
            p, opt_state = carry
            val, g = grad_fn(params, p, state0, x_target)
            updates, opt_state = opt.update(g, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state), (val, jnp.linalg.norm(g))

        (p, _), (vals, gnorms) = jax.lax.scan(
            body, (p0, opt.init(p0)), None, length=iters
        )
        return MpcResult(p=p, objective=vals[-1], grad_norm=gnorms[-1])

    return solve


def make_mpc_solver_batched(
    objective_fn: Callable,
    iters: int = 1,
    lr: float = 1e-2,
):
    """Adam MPC solve over an explicitly-batched objective ([B] values).

    Lanes are independent, so grad of the SUM is the per-lane gradient, and
    Adam's elementwise moments on the [B, nr] tensor reproduce the vmapped
    per-lane Adam trajectories exactly. A NaN (diverged) lane poisons only
    its own rows of P — same isolation as the vmapped path.
    """
    import optax

    def val_and_grad(params, P, s0, tgt):
        def total(PP):
            v = objective_fn(params, PP, s0, tgt)
            return jnp.sum(v), v

        (_, v), g = jax.value_and_grad(total, has_aux=True)(P)
        return v, g

    opt = optax.adam(lr)

    def solve(params: Dict, P0, state0: State, x_targets) -> MpcResult:
        def body(carry, _):
            P, opt_state = carry
            v, g = val_and_grad(params, P, state0, x_targets)
            updates, opt_state = opt.update(g, opt_state, P)
            P = optax.apply_updates(P, updates)
            return (P, opt_state), (v, jnp.linalg.norm(g, axis=-1))

        (P, _), (vals, gnorms) = jax.lax.scan(
            body, (P0, opt.init(P0)), None, length=iters
        )
        return MpcResult(p=P, objective=vals[-1], grad_norm=gnorms[-1])

    return solve


def _mppi_combine(costs, cand, p0, temperature):
    """Softmax-average candidates by cost with per-rollout failure masking
    (SURVEY §5): a diverged (non-finite) candidate gets zero weight; if every
    candidate diverged, fall back to p0 and report inf."""
    finite = jnp.isfinite(costs)
    costs = jnp.where(finite, costs, jnp.inf)
    any_ok = jnp.any(finite)
    w = jax.nn.softmax(jnp.where(any_ok, -costs / temperature,
                                 jnp.zeros_like(costs)))
    cand = jnp.where(any_ok, cand, p0[None])
    p_new = jnp.einsum("s,s...->...", w, cand)
    # Masked-lane weights are exactly 0 but their costs are inf, and
    # 0 * inf = NaN — sum only the finite lanes, and report inf (not
    # NaN) when every candidate diverged.
    mean_cost = jnp.sum(jnp.where(finite, w * costs, 0.0))
    return p_new, jnp.where(any_ok, mean_cost, jnp.inf)


def make_mppi_solver(
    rollout_cost: Callable,
    n_samples: int = 256,
    sigma: float = 0.3,
    temperature: float = 1.0,
):
    """Sampling-based MPC (MPPI): perturb the parameter vector with
    Gaussian noise, roll out all samples (one vmap — the batch axis the
    TPU wants), and softmax-average by cost.

    rollout_cost(params, p, state0, x_target) -> scalar cost.
    Returns solve(key, params, p0, state0, x_target) -> (p, mean_cost).
    The candidate batch dimension composes with an outer vmap over tasks
    and shard_map over the ("rollout", "model") mesh (parallel.py), which
    is where the thousands-of-rollouts scale of BASELINE.json lives.

    This vmapped form runs the op-soup step; make_mppi_solver_batched is
    the production form that tiles the fused Pallas kernel.
    """

    def solve(key, params: Dict, p0, state0: State, x_target):
        eps = sigma * jax.random.normal(key, (n_samples,) + p0.shape, p0.dtype)
        cand = p0[None] + eps
        costs = jax.vmap(lambda p: rollout_cost(params, p, state0, x_target))(cand)
        return _mppi_combine(costs, cand, p0, temperature)

    return solve


def make_mppi_solver_batched(
    objective_batched: Callable,
    n_samples: int = 256,
    sigma: float = 0.3,
    temperature: float = 1.0,
):
    """MPPI over an explicitly-batched objective (make_objective_batched):
    the candidate axis IS the batch axis, so the forward rollouts tile the
    fused Pallas chord kernel instead of running the vmapped op-soup step.

    objective_batched(params, P [S,nr], state0 [S,...], x_targets [S,3])
    -> costs [S]. solve(key, params, p0 [nr], state0 (unbatched), x_target
    [3]) -> (p_new [nr], mean_cost) — same semantics (and same RNG draw
    shape) as make_mppi_solver, gated equal in tests/test_mpc features.
    """

    def solve(key, params: Dict, p0, state0: State, x_target):
        eps = sigma * jax.random.normal(key, (n_samples,) + p0.shape, p0.dtype)
        cand = p0[None] + eps
        s0b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_samples,) + jnp.shape(x)),
            state0,
        )
        tgts = jnp.broadcast_to(x_target, (n_samples,) + jnp.shape(x_target))
        costs = objective_batched(params, cand, s0b, tgts)
        return _mppi_combine(costs, cand, p0, temperature)

    return solve
