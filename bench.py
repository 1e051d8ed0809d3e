"""Benchmark: batched MPC solves/s on the 12-DOF chain (BASELINE.json).

One "MPC solve" = one full horizon-50 BDF2 trajectory optimization step:
forward rollout (50 implicit BDF2 steps, quadratic-predictor chord Newton
with 3 iterations — measured per-step/trajectory accuracy equal or better
than the 4-iteration linear-predictor config, benchmarks/proto_predictor.py)
+ the adjoint backward pass (one transposed Hessian solve per step,
TaskBDF1.m:66 semantics via custom VJP) + one Adam parameter update.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the BASELINE.json target of 1000 solves/s.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the vmapped horizon-50 custom-VJP MPC solve
# is a large XLA program (~10 min cold compile on the TPU backend); cache it
# across bench invocations so the measured number reflects execution.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_bench")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
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

    B = 1024
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), dtype=dtype)
    s0 = State(
        q=jnp.tile(sc.state0.q, (B, 1)),
        qdot=jnp.tile(sc.state0.qdot, (B, 1)),
    )
    targets = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(B, 3)), dtype=dtype
    )

    # Warmup / compile.
    res = vsolve(sc.params, p0, s0, targets)
    jax.block_until_ready(res.p)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = vsolve(sc.params, p0, s0, targets)
        jax.block_until_ready(res.p)
    dt = (time.perf_counter() - t0) / reps

    solves_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "batched_mpc_solves_per_s",
                "value": round(solves_per_s, 2),
                "unit": "solves/s (12-DOF chain, horizon 50, BDF2, fwd+adjoint+update)",
                "vs_baseline": round(solves_per_s / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
