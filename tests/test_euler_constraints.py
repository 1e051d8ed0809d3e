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
