"""Batched contact-QP tier benchmark + cost model — the first perf evidence
for BASELINE.md's "QP kernels at speed-of-light per chip" row.

Workload: an mscene-24-class unilateral-contact scene — a revolute chain
with penalty-free FLOOR constraints (ConstraintFloor spheres, ineq-M rows,
matlab/+redmax/ConstraintFloor.m:16-45) and JOINT LIMITS (ineq-R rows,
ConstraintJointLimit.m:30-47) — stepped by the linearly-implicit Euler +
dual-PGS pipeline at B lanes (testRedMax.m:497-530's quadprog role).

Measured tiers (per-rep block_until_ready medians, CLAUDE.md timing rule):

  euler_qp_batched  integrators.make_euler_step_batched — vmapped assembly
                    + ONE explicitly-batched qp.qp_pgs_batched solve
                    (lanes = scenes, PGS rows unrolled, batch-as-tile)
  euler_qp_vmap     jax.vmap(make_euler_step) — the r4 status quo (the
                    per-lane lax.scan PGS under vmap)
  qp_kernel         qp_pgs_batched alone on pre-assembled systems — the
                    QP kernel itself, vs its static cost model:
                      setup  = batched H^{-1}[f, A^T] + A(H^{-1}A^T)
                               (dense MXU algebra, ~2/3 n^3 + 2 n^2 (m+1)
                               + 2 n m^2 flops/lane)
                      sweep  = iters unrolled-row GS passes, per row one
                               m-MAC dot + scalar update (VPU f32,
                               batch-wide)
                    and the v5e roofline constants of kernel_roofline.py.

Writes benchmarks/bench_qp.json and prints it.

Usage: python benchmarks/bench_qp.py [--batch 1024] [--nlinks 6] [--iters 40]
"""

import argparse
import json
import math
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

VPU_PEAK = 8 * 128 * 4 * 0.94e9          # ~3.85 TF/s f32 (v5e, 1 core)


def floor_chain(nlinks=6, h=1e-2):
    """Revolute chain, every joint limited, a floor sphere on each link —
    nlinks ineq-R rows + nlinks ineq-M rows."""
    from redmax_tpu.scene import SceneBuilder
    from redmax_tpu.types import JointType

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="floor-chain-%d" % nlinks, h=h, tEnd=0.5,
                     grav=(0.0, 0.0, -980.0))
    for i in range(nlinks):
        # bodies/joints interleave link (2i) and floor sphere (2i+1)
        body = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        j = b.joint(JointType.REVOLUTE, None if i == 0 else 2 * (i - 1), body,
                    E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]),
                    axis=(0, 1, 0))
        b.set_damping(j, 1.0)
        b.constraint_joint_limit(j, -0.6 * math.pi, 0.6 * math.pi)
        s = b.body_sphere(0.1, 0.1)
        b.joint(JointType.FIXED, j, s, E_pj=transl([0.5, 0, 0]))
        b.constraint_floor(s, E=transl([0, 0, -2.0]))
    return b.compile(dtype=jnp.float32)


def _states(sc, B, seed=0):
    from redmax_tpu.types import State

    rng = np.random.default_rng(seed)
    q = jnp.asarray(np.asarray(sc.state0.q)[None]
                    + 0.3 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    qd = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    return State(q=q, qdot=qd, aux={})


def _timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--nlinks", type=int, default=6)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    B, iters = args.batch, args.iters

    from redmax_tpu import integrators
    from redmax_tpu.qp import qp_pgs_batched

    sc = floor_chain(nlinks=args.nlinks)
    s0 = _states(sc, B)
    out = {
        "metric": "batched contact-QP tier (floor-chain-%d, B=%d, "
                  "pgs_iters=%d)" % (args.nlinks, B, iters),
        "device": jax.devices()[0].device_kind,
        "n_ineq_rows": len(sc.constraint_fns),
    }

    # --- end-to-end euler steps/s, batched vs vmapped ---------------------
    stepb = integrators.make_euler_step_batched(
        sc.topo, sc.force_fns, sc.constraint_fns, pgs_iters=iters)
    stepv_one = integrators.make_euler_step(
        sc.topo, sc.force_fns, sc.constraint_fns, pgs_iters=iters)
    simb = jax.jit(integrators.make_simulate(stepb, args.steps))
    simv = jax.jit(integrators.make_simulate(
        lambda p, s: jax.vmap(lambda ss: stepv_one(p, ss))(s), args.steps))
    dtb, outb = _timeit(lambda s: simb(sc.params, s), s0)
    dtv, outv = _timeit(lambda s: simv(sc.params, s), s0)
    fin_b = float(np.isfinite(np.asarray(outb.q)).all(axis=-1).mean())
    out["euler_qp_batched"] = {
        "steps_per_s": round(B * args.steps / dtb, 1),
        "finite_frac": round(fin_b, 4),
    }
    out["euler_qp_vmap"] = {
        "steps_per_s": round(B * args.steps / dtv, 1),
        "finite_frac": round(
            float(np.isfinite(np.asarray(outv.q)).all(axis=-1).mean()), 4),
    }
    out["speedup_batched_vs_vmap"] = round(dtv / dtb, 3)
    stepp = integrators.make_euler_step_batched(
        sc.topo, sc.force_fns, sc.constraint_fns, pgs_iters=iters,
        qp_impl="pallas")
    simp = jax.jit(integrators.make_simulate(stepp, args.steps))
    dtpz, outp = _timeit(lambda s: simp(sc.params, s), s0)
    out["euler_qp_batched_pallas"] = {
        "steps_per_s": round(B * args.steps / dtpz, 1),
        "finite_frac": round(
            float(np.isfinite(np.asarray(outp.q)).all(axis=-1).mean()), 4),
    }

    # --- the QP kernel alone vs its cost model ----------------------------
    # PHYSICAL systems (not random matrices — a random m>n QP is degenerate
    # / infeasible and its PGS iterate path wanders, making cross-path
    # comparison meaningless): assemble the euler Mrtilde/frtilde +
    # constraint rows once at the bench states and time the dual solve on
    # them, exactly what make_euler_step_batched dispatches.
    from redmax_tpu.constraints import assemble_constraints
    from redmax_tpu.model import assemble  # noqa: F401 (docs)
    from redmax_tpu import integrators as _ig

    n = sc.topo.nr
    m = len(sc.constraint_fns)

    def _sys(q, qd):
        sys = _ig.euler_system(sc.topo, sc.force_fns, sc.params, q, qd, {})
        rows = assemble_constraints(
            sc.constraint_fns, sc.params, sc.topo, sys["kin"], sys["phi"],
            q, qd, sys["J"])
        baum3 = jnp.float32(5.0)
        act = rows["act"].astype(jnp.float32)[..., None]
        Cin = rows["Cin"] * act
        rhsC = jnp.where(rows["act"], -baum3 * rows["cin"], 0.0)
        hi_i = jnp.where(rows["act"], jnp.inf, 0.0)
        return (sys["Mrtilde"], sys["frtilde"], Cin, rhsC,
                jnp.zeros_like(rhsC), hi_i)

    H, f, A, bq, lo, hi = jax.jit(jax.vmap(_sys))(s0.q, s0.qdot)
    jax.block_until_ready(H)
    qp = jax.jit(lambda *a: qp_pgs_batched(*a, iters=iters))
    dtq, _ = _timeit(lambda: qp(H, f, A, bq, lo, hi))
    # static cost model (flops per lane)
    setup = (2 / 3) * n**3 + 2 * n * n * (m + 1) + 2 * n * m * m + 2 * n * m
    sweep = iters * m * (2 * m + 4)
    out["qp_kernel"] = {
        "n": n, "m": m,
        "solves_per_s": round(B / dtq, 1),
        "us_per_solve": round(dtq / B * 1e6, 3),
        "model_flops_per_lane": int(setup + sweep),
        "model_sweep_flops_per_lane": int(sweep),
        "achieved_gflops": round(B * (setup + sweep) / dtq / 1e9, 1),
        "sweep_time_at_vpu_peak_us": round(
            B * sweep / VPU_PEAK * 1e6, 3),
        "note": "sweep is GS-sequential in rows (iters*m dependent row "
                "updates); the batch axis carries the parallelism — "
                "sweep_time_at_vpu_peak assumes perfect [B]-wide VPU "
                "utilization of the unrolled row chain",
    }

    # --- the FUSED pallas QP kernel (whole dual solve in one pallas_call:
    # GJ inverse + A H^-1 A^T setup + unrolled GS sweeps + primal recovery,
    # batch-as-tile) ------------------------------------------------------
    from redmax_tpu import pallas_qp

    pq = jax.jit(pallas_qp.make_dual_pgs(n, m, iters=iters))
    dtp, xp_out = _timeit(lambda: pq(H, f, A, bq, lo, hi))
    # fused model: GJ 2n^2(2n) + setup products + sweep (all lane-ops)
    gj = 2.0 * n * n * 2 * n
    fused = gj + 2 * n * n * (m + 1) + 2 * n * m * m + 2 * n * m + sweep
    # Cross-check the fused kernel against the XLA path on-device. With
    # m > n the dual D = A H^-1 A^T is singular, so PGS lambda ITERATE
    # PATHS legitimately diverge between implementations under f32
    # reassociation (the quadprog-vs-PGS scene-30 band, again); the
    # well-posed equivalence is the PRIMAL objective and feasibility.
    xq, _ = qp(H, f, A, bq, lo, hi)

    def pobj(x):
        return (0.5 * jnp.einsum("bi,bij,bj->b", x, H, x)
                - jnp.einsum("bi,bi->b", f, x))

    gap = np.asarray(
        jnp.abs(pobj(xp_out[0]) - pobj(xq)) / (jnp.abs(pobj(xq)) + 1e-9))
    out["qp_kernel_pallas"] = {
        "solves_per_s": round(B / dtp, 1),
        "us_per_solve": round(dtp / B * 1e6, 3),
        "speedup_vs_xla_batched": round(dtq / dtp, 3),
        "model_flops_per_lane": int(fused),
        "time_at_vpu_peak_us": round(B * fused / VPU_PEAK * 1e6, 3),
        "primal_obj_rel_gap_vs_xla": {
            "p50": float(np.quantile(gap, 0.5)),
            "p99": float(np.quantile(gap, 0.99)),
            "max": float(gap.max()),
        },
        "note": "p50 gap at f32 noise level: the two implementations walk "
                "matching GS paths on almost every lane; the max-tail lanes sit on "
                "an active-set boundary where a clip flips differently "
                "under f32 reassociation and the FIXED-iteration iterates "
                "land apart (inherent to PGS path-dependence, the scene-30 "
                "band phenomenon — not a kernel defect). The isolated "
                "micro-bench is input-packing bound ([B,P] transposes); "
                "the end-to-end win is euler_qp_batched_pallas above, "
                "where packing fuses into the assembly",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_qp.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
