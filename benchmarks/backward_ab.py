"""Adjoint backward A/B: the measured cost/quality tradeoff of
make_bdf2_step_batched(backward="reuse" | "refresh" | "exact").

The production adjoint reuses the chord factor H^{-1} materialized by the
forward kernel at the PREDICTOR (backward="reuse" — TaskBDF1.m:66's LU
reuse); on stiff scenes this carries a measured ~8% FD bias
(tests/test_adjoint.py). r4 added the escape hatches: "refresh" rebuilds a
structured H at the solution x*, "exact" uses the full jacfwd Hessian at
x*. This artifact turns the default into a measured tradeoff on the BENCH
workload (12-link chain, horizon 50, B lanes, tau ~ N(0,3^2)):

  * solves/s of the full MPC iteration (fwd + backward + Adam) per mode
  * gradient quality per mode: cosine + norm ratio against the
    exact-Hessian backward, and a central-FD directional-derivative check
    of sum(objective) along 3 random directions (f32, eps tuned by scale)

Writes benchmarks/backward_ab.json and prints it.

Usage: python benchmarks/backward_ab.py [--batch 1024] [--horizon 50]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--fd-batch", type=int, default=8)
    args = ap.parse_args()

    from redmax_tpu import integrators, mpc
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    sc = scene_chain(nlinks=12).compile(dtype=jnp.float32)
    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    task = mpc.PointPosTask(body=11, wp=1.0, wreg=1e-6, pscale=1e3)
    xl = jnp.array([0.5, 0.0, 0.0], jnp.float32)
    rng = np.random.default_rng(0)

    def setup(B):
        p0 = jnp.asarray(0.003 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
        s0 = State(q=jnp.tile(sc.state0.q, (B, 1)),
                   qdot=jnp.tile(sc.state0.qdot, (B, 1)), aux={})
        tgt = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), jnp.float32)
        return p0, s0, tgt

    out = {
        "metric": "adjoint backward A/B (chain-12, horizon %d, B=%d)"
                  % (args.horizon, args.batch),
        "device": jax.devices()[0].device_kind,
        "modes": {},
    }

    objs = {}
    for mode in ("reuse", "refresh", "exact"):
        objs[mode] = mpc.make_objective_batched(
            sc.topo, sc.force_fns, task, xl, args.horizon, cfg,
            use_pallas=True, backward=mode,
        )

    # --- throughput: full MPC iteration per mode --------------------------
    B = args.batch
    p0, s0, tgt = setup(B)
    for mode, obj in objs.items():
        solve = jax.jit(mpc.make_mpc_solver_batched(obj, iters=1, lr=0.05))
        res = solve(sc.params, p0, s0, tgt)
        jax.block_until_ready(res.p)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve(sc.params, p0, s0, tgt)
            jax.block_until_ready(res.p)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out["modes"][mode] = {
            "solves_per_s": round(B / dt, 2),
            "finite_frac": round(
                float(np.isfinite(np.asarray(res.objective)).mean()), 4),
        }

    # --- gradient quality at a smaller batch and SHORT horizon ------------
    # At horizon 50 the 12-link chain is past its Lyapunov horizon: the
    # gradient through the rollout is dominated by exponential error
    # amplification (measured: reuse/exact norm ratios ~1e6 and FD
    # failures for EVERY mode, exact included), so long-horizon gradient
    # comparisons measure chaos, not backward-solve bias. The bias
    # question is well-posed per step / short horizon — quality metrics
    # run at horizon `fd_horizon` (throughput stays at the bench horizon).
    fd_h = 5
    qobjs = {
        mode: mpc.make_objective_batched(
            sc.topo, sc.force_fns, task, xl, fd_h, cfg,
            use_pallas=True, backward=mode,
        )
        for mode in ("reuse", "refresh", "exact")
    }
    out["fd_horizon"] = fd_h
    # Diverged lanes are NaN by design (poisoning masks); restrict the
    # gradient comparison and the FD objective to the finite lanes so one
    # diverged rollout doesn't erase the metric.
    Bf = args.fd_batch
    pf, sf, tf = setup(Bf)
    objs = qobjs
    v0 = np.asarray(objs["reuse"](sc.params, pf, sf, tf))
    fin = np.isfinite(v0)
    out["fd_lanes_finite"] = int(fin.sum())
    mask = jnp.asarray(fin.astype(np.float32))
    grads = {}
    for mode, obj in objs.items():
        g = jax.jit(jax.grad(lambda P: jnp.sum(jnp.where(
            jnp.isfinite(v := obj(sc.params, P, sf, tf)), v, 0.0) * mask
        )))(pf)
        grads[mode] = np.asarray(g, np.float64)[fin]
    ge = grads["exact"]
    for mode in ("reuse", "refresh", "exact"):
        gm = grads[mode]
        cos = float((gm * ge).sum()
                    / max(np.linalg.norm(gm) * np.linalg.norm(ge), 1e-30))
        out["modes"][mode]["cos_vs_exact"] = round(cos, 6)
        out["modes"][mode]["norm_ratio_vs_exact"] = round(
            float(np.linalg.norm(gm) / max(np.linalg.norm(ge), 1e-30)), 4)

    # --- true-IFT oracle: f64 fallback, converged re-evaluated-H Newton
    # with the EXACT Hessian, implicit-function VJP at the root. (A raw FD
    # check of the f32 kernel objective is structurally uninformative here:
    # the fixed-iteration chord map's derivative differs from the IFT
    # derivative of the root it approximates, and central differences of
    # the f32 objective disagree with BOTH at every eps — measured while
    # building this artifact. The oracle sidesteps that by differentiating
    # the converged solve.)
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    ocfg = integrators.NewtonConfig(
        fixed_iters=10, chord=False, hessian="exact", linsolve="lu",
        predictor="quadratic", growth_reject=0.0,
    )
    oobj = mpc.make_objective_batched(
        sc.topo, sc.force_fns, task, xl, fd_h, ocfg, use_pallas=False,
    )
    with jax.default_device(cpu):
        f64 = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
        p64 = {k: (f64(v) if hasattr(v, "astype") else v)
               for k, v in sc.params.items()}
        sf64 = State(q=f64(sf.q), qdot=f64(sf.qdot), aux={})
        m64 = f64(fin.astype(np.float64))
        go = jax.jit(jax.grad(lambda P: jnp.sum(jnp.where(
            jnp.isfinite(v := oobj(p64, P, sf64, f64(tf))),
            v, 0.0) * m64)))(f64(pf))
    go = np.asarray(go, np.float64)[fin]
    for m, gm in grads.items():
        cos = float((gm * go).sum()
                    / max(np.linalg.norm(gm) * np.linalg.norm(go), 1e-30))
        out["modes"][m]["cos_vs_f64_ift_oracle"] = round(cos, 6)
        out["modes"][m]["norm_ratio_vs_f64_ift_oracle"] = round(
            float(np.linalg.norm(gm) / max(np.linalg.norm(go), 1e-30)), 4)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "backward_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
