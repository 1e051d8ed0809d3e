"""Accuracy gate for the PRODUCTION f32 TPU config (VERDICT r2 item 3).

The f64 CPU certificate suite gates a different numeric regime than the one
bench.py measures; this test pins the per-step error of the production
NewtonConfig(fixed_iters=3, predictor="quadratic", chord=True,
hessian="structured", linsolve="gj") in f32 against the f64 full-Newton
oracle (tol 1e-9 damped Newton with line search — the reference solver,
driverRedMaxBDF1.m:94-157) on the flagship 12-link chain:

  * per-step |dq|: from each ORACLE state (q_k, qdot_k, q_{k-1}, qdot_{k-1}),
    take one production inner BDF2 step and compare q_{k+1} against the
    oracle's — the per-step accuracy CLAUDE.md quotes (median ~7e-5, spikes
    to ~2e-2 during whip transients for EVERY fixed-iteration config).

A regression that doubles the f32 per-step error fails this gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import integrators
from redmax_tpu.integrators import Bdf2State, NewtonConfig
from redmax_tpu.scenes import scene_chain

PROD = NewtonConfig(
    fixed_iters=3, predictor="quadratic", chord=True,
    hessian="structured", linsolve="gj",
)
HORIZON = 50


def test_f32_production_per_step_error_vs_f64_oracle():
    sc64 = scene_chain(nlinks=12).compile(dtype=jnp.float64)
    sc32 = scene_chain(nlinks=12).compile(dtype=jnp.float32)

    # f64 oracle trajectory (reference-grade solver).
    oracle_step = integrators.make_bdf2_step(sc64.topo, (), NewtonConfig())
    sim = integrators.make_simulate(oracle_step, HORIZON, record=True)
    _, (qs, qds) = jax.jit(sim)(
        sc64.params, integrators.bdf2_init(sc64.state0)
    )
    qs = np.asarray(qs)            # [T, nr] oracle states after steps 1..T
    qds = np.asarray(qds)
    assert np.isfinite(qs).all()

    # One production f32 inner step from each oracle state pair
    # (k >= 1 so (q_prev, q) are both oracle-accurate).
    prod_step = integrators.make_bdf2_step_batched(
        sc32.topo, (), PROD, use_pallas=False
    )
    T = qs.shape[0]
    f32 = jnp.float32
    s = Bdf2State(
        q=jnp.asarray(qs[1:T - 1], f32),
        qdot=jnp.asarray(qds[1:T - 1], f32),
        q_prev=jnp.asarray(qs[0:T - 2], f32),
        qdot_prev=jnp.asarray(qds[0:T - 2], f32),
        k=jnp.ones(T - 2, jnp.int32),
        aux={},
    )
    out = jax.jit(prod_step.inner)(sc32.params, s)
    dq = np.linalg.norm(np.asarray(out.q, np.float64) - qs[2:T], axis=-1)

    assert np.isfinite(dq).all(), "production config diverged on oracle states"
    med = float(np.median(dq))
    p95 = float(np.percentile(dq, 95))
    mx = float(np.max(dq))
    # CLAUDE.md-measured: median ~7e-5, spikes ~2e-2 at whip transients.
    # Gate at ~2x those so a real regression (e.g. a dropped Hessian term
    # or a broken predictor) fails while f32 noise does not.
    assert med < 2e-4, f"median per-step |dq| regressed: {med:.3e}"
    assert p95 < 1e-2, f"p95 per-step |dq| regressed: {p95:.3e}"
    assert mx < 5e-2, f"max per-step |dq| regressed: {mx:.3e}"
