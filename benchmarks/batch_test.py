"""Batch benchmark harness — the Scene::batchTest equivalent
(c++/PCG/src/Scene.cpp:121-415): per scene size, measure total wall time,
per-step solve time, solver iteration counts, and record final-qdot and
leaf-body-position certificates to a JSON report.

Usage: python benchmarks/batch_test.py [--sizes 5 10 20 40] [--out report.json]

Runs chains of increasing size through the three solver tiers (dense
linearly-implicit Euler, matrix-free PCG, BDF2 structured-chord Newton)
on the default JAX backend.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import os

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_bench")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _median_time(fn, reps: int = 5):
    """Per-rep block_until_ready median (CLAUDE.md timing rule)."""
    ts = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def _marginal_step_ms(make_sim, params, s0, nsteps):
    """Marginal per-step cost: (t(4N) - t(N)) / 3N, per-rep medians.

    The r4 report divided one total by nsteps; on this host a ~25 ms FIXED
    dispatch overhead dominates mid-size programs while the smallest
    executables dodge it entirely (measured: chain-5 euler 100 steps =
    0.14 ms total but 400 steps = 31 ms; chain-10 100 steps = 25 ms and
    400 steps = 30 ms) — which produced the two-orders-off-trend
    0.0012 ms/step row. Differencing two horizon lengths cancels the
    fixed term. Returns (marginal_ms_per_step, overhead_ms, final_state)."""
    sim1 = jax.jit(make_sim(nsteps))
    sim4 = jax.jit(make_sim(4 * nsteps))
    t1, final = _median_time(lambda: sim1(params, s0))
    t4, _ = _median_time(lambda: sim4(params, s0))
    step_ms = max((t4 - t1) / (3 * nsteps) * 1e3, 0.0)
    overhead = max(t1 * 1e3 - step_ms * nsteps, 0.0)
    return step_ms, overhead, final


def bench_scene(nlinks: int, nsteps: int = 100):
    from redmax_tpu import integrators, model, pcg
    from redmax_tpu.scenes import scene_chain

    # Damped chain: the undamped whip amplifies the explicitly-integrated
    # quadratic-velocity force until the linearly-implicit step (and any
    # fixed-iteration Newton) diverges — physically expected, the reference
    # euler path treats fqvv explicitly too (testRedMax.m:447-541).
    damping = 1.0
    sc = scene_chain(nlinks=nlinks, damping=damping).compile(dtype=jnp.float64)
    # Provenance: certificates below depend on the scene damping and on
    # which integrator produced them; record both so cross-round comparisons
    # of this report (BENCH_r*.json) can tell real drift from a harness
    # configuration change.
    out = {
        "nlinks": nlinks,
        "nsteps": nsteps,
        "damping": damping,
        "certificate_integrator": "bdf2_full_newton(tol=1e-9)",
    }

    # --- dense linearly-implicit euler ---
    step = integrators.make_euler_step(sc.topo, sc.force_fns)
    t0 = time.perf_counter()
    final = jax.jit(integrators.make_simulate(step, nsteps))(
        sc.params, sc.state0)
    jax.block_until_ready(final.q)
    out["euler_compile_s"] = round(time.perf_counter() - t0, 3)
    ms, ovh, final = _marginal_step_ms(
        lambda n: integrators.make_simulate(step, n),
        sc.params, sc.state0, nsteps)
    out["euler_step_ms"] = round(ms, 4)
    out["euler_dispatch_overhead_ms"] = round(ovh, 2)
    out["euler_stable"] = bool(np.all(np.isfinite(np.asarray(final.qdot))))

    # Certificates from the robust path: full damped Newton BDF2 (reference
    # newton() semantics) — the fixed-chord perf config is a timing row only.
    stepN = integrators.make_bdf2_step(sc.topo, sc.force_fns, integrators.NewtonConfig())
    simN = jax.jit(integrators.make_simulate(stepN, nsteps))
    finalN = simN(sc.params, sc.initial_state("bdf2"))
    jax.block_until_ready(finalN.q)
    out["qdot_certificate"] = np.asarray(finalN.qdot).tolist()

    # leaf body world position (leaf_pos_certificates, Scene.cpp:200-240)
    kin = model.forward_kinematics(sc.topo, sc.params, finalN.q, finalN.qdot)
    out["leaf_pos_certificate"] = np.asarray(kin.E_wi[-1, :3, 3]).tolist()

    # --- matrix-free PCG velocity solve (one step, iteration counter) ---
    solve = pcg.make_euler_pcg_solver(sc.topo, sc.force_fns)
    _, res = solve(sc.params, sc.state0.q, sc.state0.qdot)
    out["pcg_iters"] = int(res.iters)
    out["pcg_resnorm"] = float(res.resnorm)

    # --- BDF2 structured chord ---
    cfg = integrators.NewtonConfig(fixed_iters=3, predictor="quadratic", chord=True, hessian="structured", linsolve="gj")
    step2 = integrators.make_bdf2_step(sc.topo, sc.force_fns, cfg)
    s0 = sc.initial_state("bdf2")
    ms, ovh, _ = _marginal_step_ms(
        lambda n: integrators.make_simulate(step2, n), sc.params, s0, nsteps)
    out["bdf2_step_ms"] = round(ms, 4)
    out["bdf2_dispatch_overhead_ms"] = round(ovh, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[5, 10, 20, 40])
    ap.add_argument("--nsteps", type=int, default=100)
    ap.add_argument("--out", default="benchmarks/batch_report.json")
    args = ap.parse_args()
    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "scenes": [bench_scene(n, args.nsteps) for n in args.sizes],
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    for s in report["scenes"]:
        print(
            f"nlinks={s['nlinks']:3d}: euler {s['euler_step_ms']:.3f} ms/step, "
            f"bdf2 {s['bdf2_step_ms']:.3f} ms/step, pcg iters {s['pcg_iters']}"
        )
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
