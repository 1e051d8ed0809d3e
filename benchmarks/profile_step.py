"""Component-level timing of the MPC hot path on the real TPU.

Times, at the bench configuration (12-link chain, B=1024, f32):
  * one residual evaluation (FK + jacobians + assemble)
  * one structured Hessian evaluation
  * one GJ factor (inverse)
  * one full BDF2 chord step (hess + factor + 3 residual-solve iters)
  * forward-only rollout (50 steps)
  * objective + grad (fwd + adjoint)
so optimization choices are evidence-driven, not guessed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_bench")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from redmax_tpu import integrators, mpc
    from redmax_tpu.integrators import _hess_bdf2, residual_bdf2
    from redmax_tpu.linalg import gj_inverse
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    nlinks, horizon, B = 12, 50, 1024
    dtype = jnp.float32
    sc = scene_chain(nlinks=nlinks).compile(dtype=dtype)
    topo, params = sc.topo, sc.params
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 0.3, size=(B, topo.nr)), dtype)
    qdot = jnp.asarray(rng.normal(0, 0.3, size=(B, topo.nr)), dtype)
    q0, qdot0 = q, qdot
    q1 = q + 0.01 * qdot
    qdot1 = qdot

    hess = _hess_bdf2(topo, ())

    res1 = jax.jit(jax.vmap(
        lambda q2, q0, qd0, q1, qd1: residual_bdf2(
            topo, (), params, q2, q0, qd0, q1, qd1, None)))
    hes1 = jax.jit(jax.vmap(
        lambda q2, q0, qd0, q1, qd1: hess(
            (params, q0, qd0, q1, qd1, None), q2)))
    fac1 = jax.jit(gj_inverse)

    t_res = timeit(res1, q1, q0, qdot0, q1, qdot1)
    H = hes1(q1, q0, qdot0, q1, qdot1)
    t_hes = timeit(hes1, q1, q0, qdot0, q1, qdot1)
    t_fac = timeit(fac1, H)

    step = integrators.make_bdf2_step(topo, (), cfg, differentiable=True)
    inner = jax.jit(jax.vmap(lambda s: step.inner(params, s)))
    s = integrators.Bdf2State(q=q1, qdot=qdot1, q_prev=q0, qdot_prev=qdot0,
                              k=jnp.ones((B,), jnp.int32), aux={})
    t_step = timeit(inner, s)

    task = mpc.PointPosTask(body=nlinks - 1, wp=1.0, wreg=1e-6, pscale=1e3)
    obj = mpc.make_objective(
        topo, sc.force_fns, task, jnp.array([0.5, 0.0, 0.0], dtype),
        horizon, "bdf2", cfg)
    rollout = mpc.make_rollout(topo, sc.force_fns, horizon, "bdf2", cfg)
    p0 = jnp.asarray(rng.normal(size=(B, topo.nr)), dtype)
    s0 = State(q=jnp.tile(sc.state0.q, (B, 1)), qdot=jnp.tile(sc.state0.qdot, (B, 1)))
    tgt = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), dtype)

    fwd = jax.jit(jax.vmap(lambda p, s: rollout(params, p, s), in_axes=(0, 0)))
    t_fwd = timeit(fwd, p0, s0, reps=5)

    g = jax.jit(jax.vmap(
        jax.value_and_grad(lambda p, s, t: obj(params, p, s, t), argnums=0),
        in_axes=(0, 0, 0)))
    t_grad = timeit(g, p0, s0, tgt, reps=5)

    print(f"B={B} nlinks={nlinks} horizon={horizon}")
    print(f"residual eval       : {t_res*1e3:8.3f} ms")
    print(f"structured hessian  : {t_hes*1e3:8.3f} ms")
    print(f"GJ factor           : {t_fac*1e3:8.3f} ms")
    print(f"BDF2 chord step     : {t_step*1e3:8.3f} ms "
          f"(hess+fac+3res-solve ~= {(t_hes+t_fac+3*t_res)*1e3:.3f})")
    print(f"fwd rollout (50)    : {t_fwd*1e3:8.3f} ms ({t_fwd/horizon*1e6:.1f} us/step)")
    print(f"value_and_grad      : {t_grad*1e3:8.3f} ms (bwd ~= "
          f"{(t_grad-t_fwd)*1e3:.3f})")


if __name__ == "__main__":
    main()
