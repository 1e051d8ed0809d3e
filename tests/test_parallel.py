"""Mesh-sharding tests on the virtual 8-device CPU mesh (conftest.py).

Criterion from SURVEY.md section 4: a sharded batch must equal the
single-device batch bit-for-bit (deterministic reductions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import mpc, parallel
from redmax_tpu.scenes import scene_chain
from redmax_tpu.types import State

RNG = np.random.default_rng(3)


def _batch_problem(B, nsteps=3, nlinks=4):
    sc = scene_chain(nlinks=nlinks, tEnd=nsteps * 1e-2).compile()
    task = mpc.PointPosTask(body=nlinks - 1, wp=1.0, wreg=1e-6, pscale=1e3)
    obj = mpc.make_objective(
        sc.topo, sc.force_fns, task, jnp.array([0.5, 0.0, 0.0]), nsteps, "bdf2"
    )
    solve = mpc.make_mpc_solver(obj, iters=2, lr=0.05)
    p0 = jnp.asarray(RNG.normal(size=(B, sc.topo.nr)))
    q0 = jnp.tile(sc.state0.q, (B, 1)) + 0.01 * jnp.asarray(
        RNG.normal(size=(B, sc.topo.nr))
    )
    s0 = State(q=q0, qdot=jnp.tile(sc.state0.qdot, (B, 1)))
    targets = jnp.asarray(RNG.normal(size=(B, 3)))
    return sc, solve, p0, s0, targets


@pytest.mark.parametrize("model", [1, 2])
def test_sharded_equals_single_device(model):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    B = 16
    sc, solve, p0, s0, targets = _batch_problem(B)

    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))
    ref = vsolve(sc.params, p0, s0, targets)

    mesh = parallel.make_mesh(8, model=model)
    run = jax.jit(parallel.sharded_batch(solve, mesh))
    res, mean_obj = run(sc.params, p0, s0, targets)

    np.testing.assert_array_equal(np.asarray(ref.p), np.asarray(res.p))
    assert abs(float(mean_obj) - float(jnp.mean(ref.objective))) < 1e-9
