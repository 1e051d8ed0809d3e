"""Adjoint-gradient checks, mirroring the reference's FD gradient test in
driverRedMaxAdjointBDF1.m:47-61 (testGrad: adjoint dP/dp vs central FD).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import mpc
from redmax_tpu.scenes import build_scene

RNG = np.random.default_rng(7)


def _setup(integrator, nsteps=10):
    sc = build_scene(100)
    task = mpc.PointPosTask(body=1, wp=1.0, wreg=1e-5, pscale=1e4)
    xlocal = jnp.array([5.0, 0.0, 0.0])
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task, xlocal, nsteps, integrator
    )
    p = jnp.asarray(RNG.normal(size=sc.topo.nr))
    target = jnp.array([8.0, 0.0, 4.0])
    return sc, obj, p, target


@pytest.mark.parametrize("integrator", ["bdf1", "bdf2"])
def test_adjoint_grad_vs_fd(integrator):
    sc, obj, p, target = _setup(integrator)
    g = jax.grad(obj, argnums=1)(sc.params, p, sc.state0, target)
    h = 1e-6
    for i in range(sc.topo.nr):
        dp = jnp.zeros_like(p).at[i].set(h)
        fp = obj(sc.params, p + dp, sc.state0, target)
        fm = obj(sc.params, p - dp, sc.state0, target)
        fd = (fp - fm) / (2 * h)
        assert abs(float(g[i]) - float(fd)) / max(abs(float(fd)), 1.0) < 1e-5


def test_grad_wrt_physical_params():
    """Differentiability extends to physical parameters (gravity) — beyond
    the reference's torque-only tasks; enabled by full autodiff assembly."""
    sc, obj, p, target = _setup("bdf1", nsteps=5)

    def f(g3):
        params = dict(sc.params)
        params["g"] = g3
        return obj(params, p, sc.state0, target)

    g = jax.grad(f)(sc.params["g"])
    h = 1e-5
    for i in range(3):
        dg = jnp.zeros(3).at[i].set(h)
        fd = (f(sc.params["g"] + dg) - f(sc.params["g"] - dg)) / (2 * h)
        assert abs(float(g[i]) - float(fd)) / max(abs(float(fd)), 1.0) < 1e-4


def test_mpc_solver_reduces_objective():
    sc, obj, p, target = _setup("bdf2", nsteps=10)
    solve = mpc.make_mpc_solver(obj, iters=20, lr=0.05)
    res = jax.jit(solve)(sc.params, p, sc.state0, target)
    obj0 = obj(sc.params, p, sc.state0, target)
    assert float(res.objective) < float(obj0)


def test_mppi_solver_reduces_objective():
    """Sampling MPC (MPPI): softmax-averaged candidates reduce the cost."""
    sc, obj, p, target = _setup("bdf2", nsteps=5)
    solve = mpc.make_mppi_solver(obj, n_samples=32, sigma=0.3)
    key = jax.random.PRNGKey(0)
    p1, c1 = jax.jit(solve)(key, sc.params, p, sc.state0, target)
    c0 = obj(sc.params, p, sc.state0, target)
    assert float(c1) <= float(c0) + 1e-9


def test_mppi_batched_matches_vmapped():
    """make_mppi_solver_batched (candidates = lanes of the explicitly
    batched objective, the pipeline that tiles the Pallas kernel on TPU)
    == make_mppi_solver (vmapped op-soup rollout) for the same key."""
    sc = build_scene(100)
    task = mpc.PointPosTask(body=1, wp=1.0, wreg=1e-5, pscale=1e4)
    xlocal = jnp.array([5.0, 0.0, 0.0])
    nsteps = 5
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task, xlocal, nsteps, "bdf2"
    )
    obj_b = mpc.make_objective_batched(
        sc.topo, sc.force_fns, task, xlocal, nsteps, use_pallas=False
    )
    p = jnp.asarray(RNG.normal(size=sc.topo.nr))
    target = jnp.array([8.0, 0.0, 4.0])
    key = jax.random.PRNGKey(1)
    s_v = mpc.make_mppi_solver(obj, n_samples=16, sigma=0.3)
    s_b = mpc.make_mppi_solver_batched(obj_b, n_samples=16, sigma=0.3)
    p_v, c_v = jax.jit(s_v)(key, sc.params, p, sc.state0, target)
    p_b, c_b = jax.jit(s_b)(key, sc.params, p, sc.state0, target)
    assert np.isfinite(float(c_v))
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_v), atol=1e-8)
    np.testing.assert_allclose(float(c_b), float(c_v), atol=1e-8)


def test_lbfgs_solver_reduces_objective():
    """Quasi-Newton path (fminunc parity, driverRedMaxAdjointBDF1.m:17-23)."""
    sc, obj, p, target = _setup("bdf1", nsteps=8)
    solve = mpc.make_mpc_solver(obj, iters=4, method="lbfgs")
    res = jax.jit(solve)(sc.params, p, sc.state0, target)
    f0 = obj(sc.params, p, sc.state0, target)
    f1 = obj(sc.params, res.p, sc.state0, target)
    assert float(f1) < float(f0)


def _fixed_iter_grad(cfg_kw, p, sc, task, target, nsteps=8):
    from redmax_tpu import integrators

    cfg = integrators.NewtonConfig(**cfg_kw)
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task, jnp.array([5.0, 0.0, 0.0]), nsteps,
        "bdf2", cfg,
    )
    g = jax.grad(obj, argnums=1)(sc.params, p, sc.state0, target)
    return obj, np.asarray(g)


def test_adjoint_grad_fixed_iteration_configs_vs_fd():
    """FD-vs-adjoint at the fixed-iteration configs (ADVICE r2: the factored
    custom VJP had no FD coverage; test_adjoint_grad_vs_fd runs at
    fixed_iters=0 where the factored path never engages).

    Measured bias structure on scene 100 (stiff: tau ~ 3e3):
      * exact Hessian + 4 full fixed iterations + factor reuse: FD-tight
        (<2e-4 rel) — the factored VJP mathematics is exact.
      * production chord+structured (fixed_iters=3): ~8% relative error vs
        FD. The dominant term is the STRUCTURED truncation of H^T in the
        backward solve plus the unconverged forward residual (the IFT-VJP
        differentiates the exact solution map; 3 chord iterations leave
        O(|g|) residual at this torque scale) — NOT the factor reuse:
        disabling adjoint_reuse_factor moves the gradient by <2%.
    The production bound below (rel < 0.15, cosine > 0.99 vs FD) is the
    documented bias budget; a regression that breaks descent directions
    fails it.
    """
    sc = build_scene(100)
    task = mpc.PointPosTask(body=1, wp=1.0, wreg=1e-5, pscale=1e4)
    p = jnp.asarray(0.3 * np.random.default_rng(11).normal(size=sc.topo.nr))
    target = jnp.array([8.0, 0.0, 4.0])

    def fd_of(obj):
        h = 1e-6
        out = []
        for i in range(sc.topo.nr):
            dp = jnp.zeros_like(p).at[i].set(h)
            fp = obj(sc.params, p + dp, sc.state0, target)
            fm = obj(sc.params, p - dp, sc.state0, target)
            out.append((float(fp) - float(fm)) / (2 * h))
        return np.asarray(out)

    # exact Hessian, plain fixed iterations: FD-tight.
    obj_e, g_e = _fixed_iter_grad(
        dict(fixed_iters=4, chord=False, hessian="exact", linsolve="gj"),
        p, sc, task, target,
    )
    fd_e = fd_of(obj_e)
    assert np.all(np.isfinite(g_e))
    np.testing.assert_allclose(g_e, fd_e, rtol=2e-4)

    # production config: bounded bias, descent-preserving.
    prod = dict(fixed_iters=3, predictor="quadratic", chord=True,
                hessian="structured", linsolve="gj")
    obj_p, g_p = _fixed_iter_grad(prod, p, sc, task, target)
    fd_p = fd_of(obj_p)
    rel = np.abs(g_p - fd_p) / np.maximum(np.abs(fd_p), 1e-3)
    cos = float(g_p @ fd_p / (np.linalg.norm(g_p) * np.linalg.norm(fd_p)))
    assert rel.max() < 0.15, rel
    assert cos > 0.99, cos

    # factor reuse adds only a small increment on top of the structured
    # truncation (the reference reuses its forward LU the same way,
    # TaskBDF1.m:66).
    _, g_n = _fixed_iter_grad({**prod, "adjoint_reuse_factor": False},
                              p, sc, task, target)
    inc = np.linalg.norm(g_p - g_n) / np.linalg.norm(g_n)
    assert inc < 0.02, inc
