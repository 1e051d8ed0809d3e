"""Matrix-free PCG tier: O(n) J/J^T products vs dense J, and the full
linearly-implicit solve vs the dense euler step (Solver::solvePCG parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import integrators, model, pcg
from redmax_tpu.scenes import build_scene, scene_chain

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("sid", [0, 2, 8])
def test_J_products_match_dense(sid):
    sc = build_scene(sid)
    nr = sc.topo.nr
    q = sc.state0.q + 0.1 * jnp.asarray(RNG.normal(size=nr))
    qd = jnp.asarray(RNG.normal(size=nr))
    kin = model.forward_kinematics(sc.topo, sc.params, q, qd)
    J, _, _ = model.jacobians(sc.topo, sc.params, kin, qd)
    J_x, JT_y = pcg.make_J_products(sc.topo, sc.params, kin)
    x = jnp.asarray(RNG.normal(size=nr))
    y = jnp.asarray(RNG.normal(size=6 * sc.topo.njoints))
    assert float(jnp.abs(J_x(x) - J @ x).max()) < 1e-12
    assert float(jnp.abs(JT_y(y) - J.T @ y).max()) < 1e-12


def test_pcg_euler_matches_dense():
    sc = scene_chain(nlinks=30, damping=0.0).compile()
    solve = pcg.make_euler_pcg_solver(sc.topo, sc.force_fns)
    qdot1, res = solve(sc.params, sc.state0.q, sc.state0.qdot)
    step = integrators.make_euler_step(sc.topo, sc.force_fns)
    s1 = step(sc.params, sc.state0)
    assert float(jnp.abs(qdot1 - s1.qdot).max()) < 1e-8
    # The RHD preconditioner is the exact inverse for the pure-inertia LHS.
    assert int(res.iters) <= 3
