"""Mesh scaling-efficiency harness (BASELINE.json: >= 80% multi-host
scaling efficiency, 1 chip -> 1 host -> N hosts).

Weak scaling: per-device batch held constant while the mesh grows; the
sharded MPC solve (forward rollout + adjoint + update + pmean reduction)
should take near-constant wall time per step, so
efficiency(n) = t(1) / t(n). On a multi-chip/multi-host slice this runs
unchanged over the real mesh (collectives ride ICI/DCN); with a single
local device it demonstrates methodology on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python benchmarks/scaling.py --devices 1 2 4 8
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def measure(n_devices: int, per_device_batch: int, nlinks=4, nsteps=5, iters=1):
    from redmax_tpu import integrators, mpc, parallel
    from redmax_tpu.scenes import scene_chain
    from redmax_tpu.types import State

    mesh = parallel.make_mesh(n_devices, model=1)
    sc = scene_chain(nlinks=nlinks).compile(dtype=jnp.float32)
    cfg = integrators.NewtonConfig(fixed_iters=2, chord=True, hessian="structured", linsolve="gj")
    task = mpc.PointPosTask(body=nlinks - 1, pscale=1e3)
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task, jnp.array([0.5, 0, 0], jnp.float32),
        nsteps, "bdf2", cfg,
    )
    solve = mpc.make_mpc_solver(obj, iters=iters, lr=0.05)
    run = jax.jit(parallel.sharded_batch(solve, mesh))

    B = per_device_batch * n_devices
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    s0 = State(q=jnp.tile(sc.state0.q, (B, 1)), qdot=jnp.tile(sc.state0.qdot, (B, 1)))
    tg = jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32)
    args = parallel.shard_batch_arrays(mesh, (p0, s0, tg))

    res, m = run(sc.params, *args)
    jax.block_until_ready(res.p)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        res, m = run(sc.params, *args)
    jax.block_until_ready(res.p)
    return (time.perf_counter() - t0) / reps, B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--out", default=None, help="also write the JSON report here")
    args = ap.parse_args()
    avail = len(jax.devices())
    sizes = args.devices or [n for n in (1, 2, 4, 8) if n <= avail]
    rows = []
    t1 = None
    for n in sizes:
        t, B = measure(n, args.per_device_batch)
        t1 = t if t1 is None else t1
        eff = t1 / t
        rows.append({"devices": n, "batch": B, "time_s": round(t, 4),
                     "weak_scaling_eff": round(eff, 3)})
        print(f"devices={n}: B={B} t={t*1e3:.1f} ms eff={eff:.2%}")
    import os as _os

    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "mode": "weak scaling, per-device batch %d" % args.per_device_batch,
              "physical_cores": _os.cpu_count(),
              "rows": rows}
    if jax.default_backend() == "cpu":
        report["note"] = (
            "virtual CPU devices share %d physical cores: weak scaling "
            "must degrade (compute grows with the mesh on fixed silicon); "
            "this validates the sharded program, not hardware efficiency — "
            "the >=80%% criterion applies to real multi-chip meshes"
            % _os.cpu_count()
        )
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
