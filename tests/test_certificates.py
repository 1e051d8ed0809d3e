"""Energy-certificate regression tests.

Mirror of the reference's PASS/FAIL gate (matlab-diff/+redmax/Scene.m:164-191):
run each scene with BDF1 and BDF2 and assert the final total energy
H = T_end + (V_end - V_init) matches the certificate stored in
scenesRedMax.m to within 1e-2. These certificates are deterministic and
hardware-independent, so matching them is trajectory-level parity with the
MATLAB reference.
"""

import jax
import numpy as np
import pytest

from redmax_tpu import integrators
from redmax_tpu.scenes import SCENES, build_scene

# Scenes with exact certificate parity. 7/9 run the Euler-chart ball joints
# (JointSpherical 12-chart switching) for parity with the reference;
# 11 (penalty ground contact + friction, h=5e-4 -> 1200 steps) is the
# slowest — kept last (passes at 1.8e-11 BDF1 / 1.2e-4 BDF2).
CERT_SCENES = [0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 13, 14, 11]


def build_cert_scene(sid):
    if sid in (7, 9):
        return build_scene(sid, exp_coords=False)
    return build_scene(sid)


def run_H(sc, integrator: str) -> float:
    T0, V0 = sc.energies(sc.state0.q, sc.state0.qdot)
    step = sc.make_step(integrator)
    sim = jax.jit(integrators.make_simulate(step, sc.nsteps))
    final = sim(sc.params, sc.initial_state(integrator))
    T, V = sc.energies(final.q, final.qdot, final.aux)
    return float(T) + float(V) - float(V0)


@pytest.mark.parametrize("sid", CERT_SCENES + [7, 9])
def test_bdf1_certificate(sid):
    sc = build_cert_scene(sid)
    H = run_H(sc, "bdf1")
    expected = sc.Hexpected["bdf1"]
    assert abs(H - expected) <= 1e-2, f"scene {sid}: H={H!r} vs {expected!r}"


@pytest.mark.parametrize("sid", CERT_SCENES + [7, 9])
def test_bdf2_certificate(sid):
    sc = build_cert_scene(sid)
    H = run_H(sc, "bdf2")
    expected = sc.Hexpected["bdf2"]
    assert abs(H - expected) <= 1e-2, f"scene {sid}: H={H!r} vs {expected!r}"


def test_exp_spherical_energy_sane():
    """Exp-coordinate ball joints: BDF2 keeps energy drift small on scene 7."""
    sc = build_scene(7, exp_coords=True)
    H = run_H(sc, "bdf2")
    # The reference (Euler charts, BDF2) certificate is 8.65446e3; the
    # exp-map discretization differs at O(h^2) but must stay the same scale.
    assert abs(H - 8.6544602745403390e03) < 5e2


def test_free3d_exp_energy_sane():
    sc = build_scene(9, exp_coords=True)
    H = run_H(sc, "bdf2")
    assert abs(H - 4.5466508559364156e00) < 5e-1


@pytest.mark.parametrize("sid", [-2, -1])
def test_smoke_scenes(sid):
    """Scenes -2/-1 (scenesRedMax.m:13-51) have no stored certificate in the
    reference; gate on finite energy and no NaNs after a full BDF1 run."""
    sc = build_scene(sid)
    H = run_H(sc, "bdf1")
    assert np.isfinite(H)
