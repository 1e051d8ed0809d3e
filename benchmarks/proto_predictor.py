"""Experiment: BDF2 predictor quality vs fixed chord-iteration count.

Measures trajectory error (vs a tol-1e-12 damped-Newton reference) of the
fixed-iteration chord solver for linear vs quadratic predictors, on the
flagship 12-link chain over 50 steps. CPU f64.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from redmax_tpu import integrators
from redmax_tpu.scenes import scene_chain


def rollout(sc, cfg, nsteps=50):
    step = integrators.make_bdf2_step(sc.topo, sc.force_fns, cfg)
    sim = jax.jit(integrators.make_simulate(step, nsteps))
    return sim(sc.params, integrators.bdf2_init(sc.initial_state("bdf2")))


def main():
    sc = scene_chain(nlinks=12).compile(dtype=jnp.float64)
    ref_cfg = integrators.NewtonConfig(tol=1e-12)
    ref = rollout(sc, ref_cfg)

    variants = [
        ("linear  fixed4", dict(fixed_iters=4, predictor="linear")),
        ("quad    fixed4", dict(fixed_iters=4, predictor="quadratic")),
        ("linear  fixed3", dict(fixed_iters=3, predictor="linear")),
        ("quad    fixed3", dict(fixed_iters=3, predictor="quadratic")),
        ("quad    fixed2", dict(fixed_iters=2, predictor="quadratic")),
        ("linear  fixed2", dict(fixed_iters=2, predictor="linear")),
    ]
    print(f"{'variant':16s}  {'|q - q_ref|_inf':>14s}  {'|qd - qd_ref|_inf':>16s}")
    for name, kw in variants:
        cfg = integrators.NewtonConfig(chord=True, hessian="structured", **kw)
        out = rollout(sc, cfg)
        eq = float(jnp.abs(out.q - ref.q).max())
        ed = float(jnp.abs(out.qdot - ref.qdot).max())
        print(f"{name:16s}  {eq:14.3e}  {ed:16.3e}")


if __name__ == "__main__":
    main()
