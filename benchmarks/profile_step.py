"""Timing breakdown of the bench hot path: forward rollout vs fwd+adjoint,
assembly vs factor vs solve, batch-size scaling.

Run on the real TPU: python benchmarks/profile_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from redmax_tpu import integrators, mpc
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    nlinks, horizon = 12, 50
    dtype = jnp.float32
    sc = scene_chain(nlinks=nlinks).compile(dtype=dtype)
    cfg = integrators.NewtonConfig(fixed_iters=3, predictor="quadratic", chord=True, hessian="structured", linsolve="gj")
    task = mpc.PointPosTask(body=nlinks - 1, wp=1.0, wreg=1e-6, pscale=1e3)
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task,
        jnp.array([0.5, 0.0, 0.0], dtype=dtype), horizon, "bdf2", cfg,
    )

    B = 1024
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), dtype=dtype)
    s0 = State(
        q=jnp.broadcast_to(sc.state0.q, (B, sc.topo.nr)),
        qdot=jnp.broadcast_to(sc.state0.qdot, (B, sc.topo.nr)),
        aux=jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), sc.state0.aux
        ),
    )
    tgt = jnp.broadcast_to(jnp.array([0.5, 0.0, 0.0], dtype=dtype), (B, 3))

    fwd = jax.jit(jax.vmap(obj, in_axes=(None, 0, 0, 0)))
    t_fwd = timeit(fwd, sc.params, p0, s0, tgt)
    print(f"forward objective only: {t_fwd*1e3:8.2f} ms  -> {B/t_fwd:8.0f} rollouts/s")

    vg = jax.jit(jax.vmap(jax.value_and_grad(obj, argnums=1), in_axes=(None, 0, 0, 0)))
    t_vg = timeit(vg, sc.params, p0, s0, tgt)
    print(f"value_and_grad:         {t_vg*1e3:8.2f} ms  -> {B/t_vg:8.0f} solves/s")
    print(f"backward/forward ratio: {t_vg/t_fwd:.2f}")

    # ---- inner pieces: one BDF2 step batched ----
    from redmax_tpu.model import structured_hessian
    from redmax_tpu.integrators import residual_bdf2

    step = integrators.make_bdf2_step(sc.topo, sc.force_fns, cfg)
    st = integrators.bdf2_init(sc.state0)
    bst = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    inner = jax.jit(jax.vmap(lambda s: step.inner(sc.params, s)))
    t_step = timeit(inner, bst)
    print(f"one BDF2 inner step:    {t_step*1e3:8.2f} ms  ({t_step*1e6/1:8.1f} us/batch-step)")

    q = bst.q
    qd = bst.qdot

    def hess_only(q, qd):
        return jax.vmap(
            lambda qq, dd: structured_hessian(
                sc.topo, sc.params, qq, dd, -4/9*1e-4, -2/3*1e-2, sc.force_fns, None
            )
        )(q, qd)

    hj = jax.jit(hess_only)
    t_h = timeit(hj, q, qd)
    H = hj(q, qd)
    print(f"structured hessian:     {t_h*1e3:8.2f} ms")

    def res_only(q, qd):
        return jax.vmap(
            lambda qq, dd: residual_bdf2(
                sc.topo, sc.force_fns, sc.params, qq, qq, dd, qq, dd, None
            )
        )(q, qd)

    rj = jax.jit(res_only)
    t_r = timeit(rj, q, qd)
    print(f"residual eval:          {t_r*1e3:8.2f} ms")

    g = rj(q, qd)

    lu_fac = jax.jit(jax.vmap(jax.scipy.linalg.lu_factor))
    t_lu = timeit(lu_fac, H)
    print(f"batched lu_factor 12x12:{t_lu*1e3:8.2f} ms")

    lu, piv = lu_fac(H)
    lu_sol = jax.jit(jax.vmap(lambda l, p, b: jax.scipy.linalg.lu_solve((l, p), b)))
    t_ls = timeit(lu_sol, lu, piv, g)
    print(f"batched lu_solve:       {t_ls*1e3:8.2f} ms")

    inv = jax.jit(jnp.linalg.inv)
    t_inv = timeit(inv, H)
    print(f"batched inv 12x12:      {t_inv*1e3:8.2f} ms")

    slv = jax.jit(jnp.linalg.solve)
    t_s = timeit(slv, H, g[..., None])
    print(f"batched solve 12x12:    {t_s*1e3:8.2f} ms")

    est = t_h + t_lu + 4 * (t_r + t_ls)
    print(f"sum(1 hess + 1 lu + 4(res+solve)) = {est*1e3:.2f} ms vs step {t_step*1e3:.2f} ms")


if __name__ == "__main__":
    main()
