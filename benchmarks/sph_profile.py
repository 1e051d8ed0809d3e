"""Diagnose the spherical-kernel gap (qdep_ablation.json: sph4 kernel gain
1.44x vs rev12's 2.75x; CLAUDE.md flags "select-heavy Taylor guards,
not yet diagnosed").

Decomposes the sph4 MPC pipeline cost on the real TPU into:

  fwd_only       jit(scan of step.inner, horizon H) — the kernel forward
                 alone (includes the per-step vmapped rescale reparam)
  fwd_noreparam  same with the post-step reparam disabled (measures the
                 outside-the-kernel reparam's share: extra HBM round trip
                 + scheduling break between pallas calls)
  mpc_iter       the full value_and_grad + Adam iteration qdep_ablation
                 measures (adds the per-step residual-VJP backward)

for rev12 / uni6 / sph4 (identical nr=12, B, horizon), so the gap can be
attributed to (a) kernel arithmetic, (b) the reparam seam, or (c) the
pure-JAX residual VJP in the backward.

Writes benchmarks/sph_profile.json.
"""

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

from qdep_ablation import _chain  # noqa: E402  (same scene builders)


def _timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile(sc, B, horizon, tau_sigma=3.0):
    from redmax_tpu import integrators, mpc
    from redmax_tpu.types import State

    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    rng = np.random.default_rng(0)
    tau = jnp.asarray(tau_sigma * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    params = dict(sc.params)
    params["tau"] = tau

    step = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, cfg, differentiable=False
    )
    s0 = integrators.bdf2_init(State(
        q=jnp.tile(sc.state0.q, (B, 1)),
        qdot=jnp.tile(sc.state0.qdot, (B, 1)), aux={}))

    def roll(inner_fn):
        def body(s, _):
            s = inner_fn(params, s)
            return s, None
        def run(s):
            s, _ = jax.lax.scan(body, s, None, length=horizon)
            return s.q
        return jax.jit(run)

    out = {}
    t = _timed(roll(step.inner), s0)
    out["fwd_only_ms"] = round(t * 1e3, 3)

    # reparam share: rebuild the step with reparam disabled (exp-map scenes
    # only; identity for rev/uni where needs_reparam is already False).
    from redmax_tpu import integrators as I
    from redmax_tpu.joints import KERNELS as JK
    from redmax_tpu.types import JointType as JT
    needs = any(JK[JT(tt)].reparam_fn is not None for tt in sc.topo.jtype)
    if needs:
        saved = {jt: JK[jt].reparam_fn for jt in JK}
        try:
            for jt in JK:
                JK[jt] = JK[jt]._replace(reparam_fn=None)
            step_nr = I.make_bdf2_step_batched(
                sc.topo, sc.force_fns, cfg, differentiable=False)
            t2 = _timed(roll(step_nr.inner), s0)
        finally:
            for jt in JK:
                JK[jt] = JK[jt]._replace(reparam_fn=saved[jt])
        out["fwd_noreparam_ms"] = round(t2 * 1e3, 3)

    # full MPC iteration (the qdep_ablation workload)
    task = mpc.PointPosTask(body=sc.topo.njoints - 1, wp=1.0, wreg=1e-6,
                            pscale=1e3)
    obj = mpc.make_objective_batched(
        sc.topo, sc.force_fns, task, jnp.array([0.5, 0.0, 0.0], jnp.float32),
        horizon, cfg, use_pallas=True,
    )
    solve = jax.jit(mpc.make_mpc_solver_batched(obj, iters=1, lr=0.05))
    p0 = jnp.asarray(tau_sigma / 1e3 * rng.normal(size=(B, sc.topo.nr)),
                     jnp.float32)
    st0 = State(q=jnp.tile(sc.state0.q, (B, 1)),
                qdot=jnp.tile(sc.state0.qdot, (B, 1)), aux={})
    tgt = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, 3)), jnp.float32)
    t3 = _timed(lambda: solve(sc.params, p0, st0, tgt).p)
    out["mpc_iter_ms"] = round(t3 * 1e3, 3)
    out["mpc_solves_per_s"] = round(B / t3, 1)
    out["bwd_share_ms"] = round((t3 - t) * 1e3, 3)
    return out


def main():
    B, horizon = 1024, 50
    rows = {}
    for name, jt, nj in (("rev12", "revolute", 12), ("uni6", "universal", 6),
                         ("sph4", "spherical", 4)):
        sc = _chain(jt, nj)
        rows[name] = profile(sc, B, horizon)
        print(name, json.dumps(rows[name]))
    out = {
        "metric": "sph kernel-gap decomposition (nr=12, B=%d, horizon=%d)"
                  % (B, horizon),
        "device": jax.devices()[0].device_kind,
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sph_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
