"""Measured q-dependent-S ablation: every joint tier on the fused kernel.

r4 measured the scope CUT: SPHERICAL (exp-map) forced the vmapped fallback
at a 4.46x penalty (2103 vs 9388 solves/s). r5 put the exp-map S — the
SO(3) right Jacobian, closed form per lane (pallas_step._so3_exp_S,
JointSphericalExp.m:49-91) — inside the kernel, plus the per-step rescale
reparam outside it. This script now measures all tiers in the IDENTICAL
batched MPC pipeline:

  rev12_kernel    12 revolute joints (nr=12), fused kernel
  rev12_vmap      12 revolute joints,          vmapped fallback
  uni6_kernel     6 universal joints (nr=12),  fused kernel (S(q) per lane)
  uni6_vmap       6 universal joints,          vmapped fallback
  sph4_kernel     4 spherical(exp) joints (nr=12), fused kernel (r5)
  sph4_vmap       4 spherical(exp) joints,     vmapped fallback

Writes benchmarks/qdep_ablation.json.

Usage: python benchmarks/qdep_ablation.py [--batch 1024] [--horizon 50]
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


def _chain(jtype_name, njoints):
    """Serial chain of njoints joints of the given type, link length 1."""
    from redmax_tpu.scene import SceneBuilder
    from redmax_tpu.types import JointType

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name=f"{jtype_name}-chain-{njoints}", h=1e-2, tEnd=0.5,
                     grav=(0.0, 0.0, -980.0))
    jt = {"revolute": JointType.REVOLUTE,
          "spherical": JointType.SPHERICAL,
          "universal": JointType.UNIVERSAL}[jtype_name]
    for i in range(njoints):
        body = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        kw = {}
        if jt == JointType.REVOLUTE:
            kw["axis"] = (0, 1, 0) if i % 2 == 0 else (0, 0, 1)
        j = b.joint(jt, None if i == 0 else i - 1, body,
                    E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]), **kw)
        b.set_damping(j, 1.0)
    return b.compile(dtype=jnp.float32)


def run(sc, use_pallas, B, horizon, tau_sigma=3.0, reps=3):
    from redmax_tpu import integrators, mpc
    from redmax_tpu.types import State

    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    task = mpc.PointPosTask(body=sc.topo.njoints - 1, wp=1.0, wreg=1e-6,
                            pscale=1e3)
    obj = mpc.make_objective_batched(
        sc.topo, sc.force_fns, task, jnp.array([0.5, 0.0, 0.0], jnp.float32),
        horizon, cfg, use_pallas=use_pallas,
    )
    solve = jax.jit(mpc.make_mpc_solver_batched(obj, iters=1, lr=0.05))
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(tau_sigma / 1e3 * rng.normal(size=(B, sc.topo.nr)),
                     jnp.float32)
    s0 = State(q=jnp.tile(sc.state0.q, (B, 1)),
               qdot=jnp.tile(sc.state0.qdot, (B, 1)), aux={})
    tgt = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), jnp.float32)
    res = solve(sc.params, p0, s0, tgt)
    jax.block_until_ready(res.p)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solve(sc.params, p0, s0, tgt)
        jax.block_until_ready(res.p)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    return {
        "solves_per_s": round(B / dt, 2),
        "finite_frac": round(
            float(np.isfinite(np.asarray(res.objective)).mean()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=50)
    args = ap.parse_args()

    rows = {}
    sc = _chain("revolute", 12)
    rows["rev12_kernel"] = run(sc, True, args.batch, args.horizon)
    rows["rev12_vmap"] = run(sc, False, args.batch, args.horizon)
    scu = _chain("universal", 6)
    rows["uni6_kernel"] = run(scu, True, args.batch, args.horizon)
    rows["uni6_vmap"] = run(scu, False, args.batch, args.horizon)
    scs = _chain("spherical", 4)
    rows["sph4_kernel"] = run(scs, True, args.batch, args.horizon)
    rows["sph4_vmap"] = run(scs, False, args.batch, args.horizon)

    out = {
        "metric": "q-dependent-S scope-cut ablation "
                  "(nr=12 chains, horizon %d, B=%d)" % (args.horizon,
                                                        args.batch),
        "device": jax.devices()[0].device_kind,
        "rows": rows,
        "rev12_kernel_gain": round(
            rows["rev12_kernel"]["solves_per_s"]
            / rows["rev12_vmap"]["solves_per_s"], 3),
        "uni6_kernel_gain": round(
            rows["uni6_kernel"]["solves_per_s"]
            / rows["uni6_vmap"]["solves_per_s"], 3),
        "sph4_kernel_gain": round(
            rows["sph4_kernel"]["solves_per_s"]
            / rows["sph4_vmap"]["solves_per_s"], 3),
        "spherical_penalty_vs_rev_kernel_r4": round(
            rows["rev12_kernel"]["solves_per_s"]
            / rows["sph4_vmap"]["solves_per_s"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "qdep_ablation.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
