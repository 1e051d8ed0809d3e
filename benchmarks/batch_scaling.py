"""Throughput vs batch size for the full MPC solve (bench.py config).

Finds the B that saturates the chip: solves/s should grow until the
per-step work stops being dispatch/latency-bound.
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


def main():
    from redmax_tpu import integrators, mpc
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    nlinks, horizon = 12, 50
    dtype = jnp.float32
    sc = scene_chain(nlinks=nlinks).compile(dtype=dtype)
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    task = mpc.PointPosTask(body=nlinks - 1, wp=1.0, wreg=1e-6, pscale=1e3)
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task,
        jnp.array([0.5, 0.0, 0.0], dtype=dtype), horizon, "bdf2", cfg,
    )
    solve = mpc.make_mpc_solver(obj, iters=1, lr=0.05)
    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))

    rng = np.random.default_rng(0)
    for B in (128, 256, 512, 768, 1024):
        p0 = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), dtype=dtype)
        s0 = State(q=jnp.tile(sc.state0.q, (B, 1)),
                   qdot=jnp.tile(sc.state0.qdot, (B, 1)))
        targets = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), dtype=dtype)
        res = vsolve(sc.params, p0, s0, targets)
        jax.block_until_ready(res.p)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            res = vsolve(sc.params, p0, s0, targets)
            jax.block_until_ready(res.p)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"B": B, "ms": round(dt * 1e3, 2),
                          "solves_per_s": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
