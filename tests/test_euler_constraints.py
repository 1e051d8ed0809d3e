"""Semi-implicit Euler + constraint certificates from the matlab variant.

Each scene's REDMAX_EULER Hexpected (testRedMaxScenes.m) must match to 1e-2
(matlab/testRedMax.m:170-177). Covers: plain chains, ConstraintLoop (KKT),
ConstraintMultQ (gears), ConstraintJointLimit (PGS QP vs quadprog).
"""

import jax
import pytest

from redmax_tpu import integrators
from redmax_tpu.scenes_matlab import M_SCENES, build_mscene


@pytest.mark.parametrize("sid", sorted(set(M_SCENES) - {27, 28, 29, 30, 31, 33}))
def test_euler_certificate(sid):
    from redmax_tpu.scenes_matlab import (
        scene_fn_05, scene_fn_09, scene_fn_13, scene_fn_20, scene_fn_32,
    )

    sc = build_mscene(sid)
    sfn = {5: scene_fn_05, 9: scene_fn_09, 13: scene_fn_13,
           20: scene_fn_20, 32: scene_fn_32}.get(sid)
    T0, V0 = sc.energies(sc.state0.q, sc.state0.qdot)
    step = sc.make_step("euler")
    sim = jax.jit(integrators.make_simulate(step, sc.nsteps, scene_fn=sfn))
    final = sim(sc.params, sc.state0)
    T, V = sc.energies(final.q, final.qdot, final.aux)
    H = float(T) + float(V) - float(V0)
    expected = sc.Hexpected["euler"]
    assert abs(H - expected) <= 1e-2, f"mscene {sid}: H={H!r} vs {expected!r}"


@pytest.mark.parametrize("sid", [4, 6])
def test_euler_batched_matches_vmap(sid):
    """make_euler_step_batched (the TPU contact-QP tier: vmapped assembly +
    one explicitly-batched dual-PGS / KKT solve) == jax.vmap of
    make_euler_step, lane-for-lane, over a short rollout. Scene 4 = loop
    closure (equality KKT), scene 6 = joint limits (inequality PGS)."""
    import jax.numpy as jnp
    import numpy as np

    sc = build_mscene(sid)
    step = integrators.make_euler_step(
        sc.topo, sc.force_fns, sc.constraint_fns)
    stepb = integrators.make_euler_step_batched(
        sc.topo, sc.force_fns, sc.constraint_fns)
    B, nsteps = 4, 5
    rng = np.random.default_rng(3)
    from redmax_tpu.types import State

    q = jnp.asarray(np.asarray(sc.state0.q)[None]
                    + 0.05 * rng.normal(size=(B, sc.topo.nr)))
    qd = jnp.asarray(np.asarray(sc.state0.qdot)[None]
                     + 0.1 * rng.normal(size=(B, sc.topo.nr)))
    sv = State(q=q, qdot=qd, aux={})
    sb = State(q=q, qdot=qd, aux={})
    vstep = jax.jit(jax.vmap(lambda ss: step(sc.params, ss)))
    bstep = jax.jit(lambda ss: stepb(sc.params, ss))
    for _ in range(nsteps):
        sv = vstep(sv)
        sb = bstep(sb)
    np.testing.assert_allclose(np.asarray(sb.q), np.asarray(sv.q),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sb.qdot), np.asarray(sv.qdot),
                               atol=1e-8)
