"""Spring-MPC A/B bench: fused Pallas kernel vs vmapped XLA fallback on a
scene-12-class spring-damper chain (ForceSpringDamper / ForcePointPoint —
matlab-diff/+redmax/ForceSpringGeneric.m / ForcePointPoint.m roles).

Same pipeline as bench.py (batched horizon-50 BDF2 MPC solve: forward
rollout + factor-reusing adjoint + Adam update) on a 12-link revolute chain
with three two-point spring closures: a world->tip spring-damper, a
mid-chain body-body spring-damper, and a body-body zero-rest point-point
spring. Before round 5 ANY spring closure dropped the scene off the fast
path (pallas_step.supports required all-ForceGroundCuboid); now the spring
wrenches and their closed-form PAIRWISE K/D blocks — including the cross
blocks coupling the two endpoint bodies — run inside the kernel
(pallas_step._spring_force), and the solve runs the production chord config.

Writes benchmarks/bench_spring_ab.json and prints it.

Usage: python benchmarks/bench_spring_ab.py [--batch 1024] [--horizon 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_bench"
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def spring_chain(nlinks=12, h=1e-2):
    """12 revolute links + 3 spring closures (scene-12 class, MPC scale)."""
    from redmax_tpu.scene import SceneBuilder
    from redmax_tpu.types import JointType

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="spring-chain-%d" % nlinks, h=h, tEnd=0.5,
                     grav=(0.0, 0.0, -980.0))
    for i in range(nlinks):
        body = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        j = b.joint(JointType.REVOLUTE, None if i == 0 else i - 1, body,
                    E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]),
                    axis=(0, 1, 0) if i % 2 == 0 else (0, 0, 1))
        b.set_damping(j, 1.0)
    # world anchor above the base -> tip (suspension), mid-chain brace,
    # and a zero-rest point-point coupler.
    b.force_spring_damper(-1, nlinks - 1, [0.0, 0.0, 6.0], [0.5, 0, 0],
                          k=2e3, d=20.0)
    b.force_spring_damper(2, 8, [0.5, 0, 0.05], [0.5, 0, -0.05],
                          k=1e3, d=10.0)
    b.force_point_point(5, 11, xl1=(0.5, 0, 0.05), xl2=(0.5, 0, -0.05),
                        k=50.0, d=2.0)
    return b.compile(dtype=jnp.float32)


def run_path(sc, cfg, use_pallas, B, horizon, reps=3):
    from redmax_tpu import mpc
    from redmax_tpu.types import State

    task = mpc.PointPosTask(body=sc.topo.njoints - 1, wp=1.0, wreg=1e-6,
                            pscale=1e3)
    obj = mpc.make_objective_batched(
        sc.topo, sc.force_fns, task, jnp.array([0.5, 0.0, 0.0], jnp.float32),
        horizon, cfg, use_pallas=use_pallas,
    )
    solve = jax.jit(mpc.make_mpc_solver_batched(obj, iters=1, lr=0.05))

    rng = np.random.default_rng(0)
    p0 = jnp.asarray(0.003 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    s0 = State(
        q=jnp.tile(sc.state0.q, (B, 1)),
        qdot=jnp.tile(sc.state0.qdot, (B, 1)),
        aux={},
    )
    targets = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), jnp.float32)

    res = solve(sc.params, p0, s0, targets)
    jax.block_until_ready(res.p)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solve(sc.params, p0, s0, targets)
        jax.block_until_ready(res.p)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    finite = float(np.isfinite(np.asarray(res.objective)).mean())
    return {
        "solves_per_s": round(B / dt, 2),
        "vs_baseline": round(B / dt / 1000.0, 4),
        "finite_frac": round(finite, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlinks", type=int, default=12)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=50)
    args = ap.parse_args()

    from redmax_tpu import integrators, pallas_step

    sc = spring_chain(nlinks=args.nlinks)
    assert pallas_step.supports(sc.topo, sc.force_fns)
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )

    out = {
        "metric": "batched_spring_mpc_solves_per_s "
                  "(spring-chain-%d, horizon %d, kernel on/off)"
                  % (args.nlinks, args.horizon),
        "device": jax.devices()[0].device_kind,
        "nsprings": len(sc.force_fns),
    }
    out["pallas"] = run_path(sc, cfg, True, args.batch, args.horizon)
    out["vmap_xla"] = run_path(sc, cfg, False, args.batch, args.horizon)
    out["speedup_end_to_end"] = round(
        out["pallas"]["solves_per_s"] / out["vmap_xla"]["solves_per_s"], 3
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_spring_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
