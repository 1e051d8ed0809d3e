"""Generate versioned f64 reference-semantics trajectory dumps, scenes 0-14.

BASELINE.md row 2 asks for trajectory-level <= 1e-5 match against
matlab-diff; no MATLAB runtime exists on this box (or in CI), so the
closest closable artifact is a committed PER-STEP dump produced by THIS
framework's reference-semantics solver — full damped-Newton BDF1/BDF2 at
tol 1e-9 in f64 (the exact driverRedMaxBDF1.m:94-157 /
driverRedMaxBDF2.m:194-293 replication whose ~90 energy certificates
already match the reference at 1e-8..1e-12) — against which the PRODUCTION
f32 fixed-iteration pipeline is gated per step (tests/test_ref_traj.py).
The MATLAB cross-dump itself remains the one unverifiable BASELINE row;
these dumps pin the f32-vs-reference-semantics half of it and freeze the
reference trajectories against regressions.

Writes tests/data/ref_traj_{sid:02d}.npz with full [T+1, nr] (q, qdot)
histories for bdf1 and bdf2 (post-reparam states, as simLoop records).

Usage: python benchmarks/make_ref_traj.py [--sids 0 1 ... ] [--max-steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def dump_scene(sid: int, max_steps: int):
    from redmax_tpu import integrators
    from redmax_tpu.scenes import build_scene

    sc = build_scene(sid)
    nsteps = min(sc.nsteps, max_steps)
    out = {"h": np.float64(sc.params["h"]), "nsteps": np.int64(nsteps),
           "sid": np.int64(sid)}
    for integ in ("bdf1", "bdf2"):
        step = sc.make_step(integ)          # full Newton, tol 1e-9, f64
        s = sc.initial_state(integ)
        sim = jax.jit(integrators.make_simulate(step, nsteps, record=True))
        _, (qs, qdots) = sim(sc.params, s)
        q0 = s.q[None]
        qd0 = s.qdot[None]
        out[f"q_{integ}"] = np.concatenate([q0, np.asarray(qs)])
        out[f"qdot_{integ}"] = np.concatenate([qd0, np.asarray(qdots)])
        assert np.isfinite(out[f"q_{integ}"]).all(), (sid, integ)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sids", type=int, nargs="+",
                    default=list(range(15)))
    ap.add_argument("--max-steps", type=int, default=400)
    args = ap.parse_args()
    ddir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    os.makedirs(ddir, exist_ok=True)
    for sid in args.sids:
        out = dump_scene(sid, args.max_steps)
        path = os.path.join(ddir, f"ref_traj_{sid:02d}.npz")
        np.savez_compressed(path, **out)
        print(f"scene {sid:3d}: {out['nsteps']} steps, nr="
              f"{out['q_bdf2'].shape[1]} -> {path}")


if __name__ == "__main__":
    main()
