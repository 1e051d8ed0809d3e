"""Contact-MPC A/B bench: fused Pallas kernel vs vmapped XLA fallback on the
ground-contact chain (differentiable penalty contact, the matlab-diff
flagship use case — ForceGroundCuboid.m:54-153 + scene 11's role).

Same pipeline as bench.py (batched horizon-50 BDF2 MPC solve: forward
rollout + factor-reusing adjoint + Adam update) but on scene_chain_ground —
12 revolute links RESTING ON the floor (sliding/pushing under torques, all
three contact regimes active throughout) with 8-corner penalty contact on
every link. Before round 4 this scene class silently dropped off the fast
path (pallas_step.supports returned False for any force closure); now the
contact force and its closed-form K/D blocks run inside the kernel
(pallas_step._ground_contact) with the proximity-margin H activation, and
the solve runs the production chord config. Workload scales
(kn=100 for the m=0.01 links; kt/kn ~ 1e-3 like the reference's
1e2/1e5): see benchmarks/CONTACT_NOTES.md for the full calibration
investigation — stiffer penalties are unresolved at h=1e-2 for these
link masses and ratchet energy under ANY fixed-iteration f32 solve.

Writes benchmarks/bench_contact_ab.json and prints it.

Usage: python benchmarks/bench_contact.py [--batch 1024] [--horizon 50]
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
    from redmax_tpu.scenes import scene_chain_ground

    sc = scene_chain_ground(
        nlinks=args.nlinks, kn=100.0, kt=0.1, kd=10.0, mu=0.5,
        h=1e-2, floor_z=-0.06,
    ).compile(dtype=jnp.float32)
    assert pallas_step.supports(sc.topo, sc.force_fns)
    # The PRODUCTION config (unguarded chord3): at the calibrated workload
    # it is 100% convergent over the horizon (CONTACT_NOTES.md), and the
    # guarded kernel executes ~27x slower on v5e (24ms vs 0.87ms per solve
    # at B=1024 — Mosaic schedules the select-heavy guard loop poorly), so
    # guarded remains a robustness option, not the bench config.
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )

    out = {
        "metric": "batched_contact_mpc_solves_per_s "
                  "(chain_ground-%d, horizon %d, kernel on/off)"
                  % (args.nlinks, args.horizon),
        "device": jax.devices()[0].device_kind,
        "ncontacts": len(sc.force_fns),
    }
    out["pallas"] = run_path(sc, cfg, True, args.batch, args.horizon)
    out["vmap_xla"] = run_path(sc, cfg, False, args.batch, args.horizon)
    out["speedup_end_to_end"] = round(
        out["pallas"]["solves_per_s"] / out["vmap_xla"]["solves_per_s"], 3
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_contact_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
