"""Ablation profile of the MPC solve on the real TPU.

Times, at bench.py's exact configuration (12-link chain, horizon 50, BDF2,
fixed_iters=3 quadratic chord, structured Hessian, GJ solve, B=1024, f32):

  * fwd        — forward rollout only (no gradient)
  * fwd+bwd    — objective value+grad (the adjoint backward pass)
  * solve      — full MPC solve (fwd+bwd+Adam update) == bench.py
  * res        — one batched residual assembly (the chord inner op)
  * hess       — one batched structured-Hessian assembly + GJ inverse

Prints one JSON line per ablation.  Run on the TPU: python benchmarks/profile_mpc.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_bench")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from redmax_tpu import integrators, mpc
    from redmax_tpu.integrators import Bdf2State, bdf2_init, residual_bdf2, _hess_bdf2
    from redmax_tpu.linalg import gj_inverse
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    nlinks, horizon, B = 12, 50, 1024
    dtype = jnp.float32
    sc = scene_chain(nlinks=nlinks).compile(dtype=dtype)
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    task = mpc.PointPosTask(body=nlinks - 1, wp=1.0, wreg=1e-6, pscale=1e3)
    target = jnp.array([0.5, 0.0, 0.0], dtype=dtype)
    obj = mpc.make_objective(sc.topo, sc.force_fns, task, target, horizon, "bdf2", cfg)
    solve = mpc.make_mpc_solver(obj, iters=1, lr=0.05)

    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), dtype=dtype)
    s0 = State(q=jnp.tile(sc.state0.q, (B, 1)), qdot=jnp.tile(sc.state0.qdot, (B, 1)))
    targets = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), dtype=dtype)

    results = {}

    # full solve (== bench.py)
    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))
    dt = timeit(lambda: vsolve(sc.params, p0, s0, targets).p, reps=3)
    results["solve"] = dt

    # value+grad only
    vg = jax.jit(jax.vmap(jax.value_and_grad(obj, argnums=1),
                          in_axes=(None, 0, 0, 0)))
    dt = timeit(lambda: vg(sc.params, p0, s0, targets)[0], reps=3)
    results["fwd+bwd"] = dt

    # forward-only rollout (non-differentiable step; no custom-VJP machinery)
    step = integrators.make_bdf2_step(sc.topo, sc.force_fns, cfg, differentiable=False)
    sim = integrators.make_simulate(step, horizon)

    def fwd(params, p, state0):
        prm = dict(params)
        prm["tau"] = p * task.pscale
        return sim(prm, bdf2_init(state0)).q

    vfwd = jax.jit(jax.vmap(fwd, in_axes=(None, 0, 0)))
    dt = timeit(lambda: vfwd(sc.params, p0, s0), reps=3)
    results["fwd"] = dt

    # one batched residual assembly
    q = jnp.tile(sc.state0.q, (B, 1))
    qd = jnp.tile(sc.state0.qdot, (B, 1))

    def res1(qq, qdd):
        return residual_bdf2(sc.topo, sc.force_fns, sc.params, qq, qq, qdd, qq, qdd)

    vres = jax.jit(jax.vmap(res1))
    results["res_x1"] = timeit(vres, q, qd, reps=10)

    # one batched structured hessian + GJ inverse
    hess = _hess_bdf2(sc.topo, sc.force_fns)

    def h1(qq, qdd):
        theta = (sc.params, qq, qdd, qq, qdd, {})
        return gj_inverse(hess(theta, qq))

    vh = jax.jit(jax.vmap(h1))
    results["hess+inv_x1"] = timeit(vh, q, qd, reps=10)

    # GJ inverse alone
    H = vh(q, qd)
    vinv = jax.jit(jax.vmap(gj_inverse))
    results["gjinv_x1"] = timeit(vinv, H, reps=10)

    per_step = {
        "steps": horizon,
        "est_fwd_per_step_ms": results["fwd"] / horizon * 1e3,
        "est_res_ms": results["res_x1"] * 1e3,
        "est_hess_ms": results["hess+inv_x1"] * 1e3,
    }
    for k, v in results.items():
        print(json.dumps({"ablation": k, "ms": round(v * 1e3, 3),
                          "solves_per_s": round(B / v, 1)}))
    print(json.dumps(per_step))


if __name__ == "__main__":
    main()
