"""Finite-difference checks of every derivative quantity, mirroring the
reference's test idioms (Joint.test, Scene.test — matlab-diff/+redmax/
Joint.m:650-784, Scene.m:224-378): analytic (here: autodiff) vs central FD
with relative error < 1e-6.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import model, se3
from redmax_tpu.dynamics import compute_values
from redmax_tpu.joints import KERNELS, derive_S, joint_QSSdot
from redmax_tpu.scenes import build_scene
from redmax_tpu.types import NDOF, JointType

RNG = np.random.default_rng(42)
EPS = 1e-6


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    den = max(np.linalg.norm(b), 1.0)
    return np.linalg.norm(a - b) / den


# ---------------------------------------------------------------------------
# Per-joint kernels (mirror of Joint.test)
# ---------------------------------------------------------------------------

JOINT_CASES = [
    (JointType.REVOLUTE, {"axis": np.array([0.0, 1.0, 0.0])}),
    (JointType.PRISMATIC, {"axis": np.array([1.0, 0.0, 0.0])}),
    (JointType.PLANAR, {"plane": np.array([[1.0, 0, 0], [0, 1.0, 0]]).T}),
    (JointType.TRANSLATIONAL, {}),
    (JointType.UNIVERSAL, {}),
    (JointType.SPHERICAL, {}),
    (JointType.FREE2D, {}),
    (JointType.FREE3D, {}),
]


@pytest.mark.parametrize("jt,params", JOINT_CASES, ids=lambda c: str(c))
def test_joint_S_is_body_jacobian(jt, params):
    """S must satisfy Q^{-1} dQ/dq_k = hat(S_k) — FD check on Q."""
    if not isinstance(jt, JointType):
        pytest.skip("param case")
    d = NDOF[jt]
    q = jnp.asarray(0.4 * RNG.normal(size=d))
    qdot = jnp.asarray(RNG.normal(size=d))
    p = {k: jnp.asarray(v) for k, v in params.items()}
    Q, S, Sdot = joint_QSSdot(jt, q, qdot, p)
    Qfn = KERNELS[jt].Q_fn
    h = 1e-7
    for k in range(d):
        dq = jnp.zeros(d).at[k].set(h)
        dQ_fd = (Qfn(q + dq, p) - Qfn(q - dq, p)) / (2 * h)
        Sk_fd = se3.unhat6(se3.inv(Q) @ dQ_fd)
        assert rel_err(Sk_fd, S[:, k]) < 1e-5, f"{jt} S col {k}"


@pytest.mark.parametrize("jt,params", JOINT_CASES, ids=lambda c: str(c))
def test_joint_Sdot(jt, params):
    """Sdot = d/dt S(q(t)) along qdot — FD in time."""
    if not isinstance(jt, JointType):
        pytest.skip("param case")
    d = NDOF[jt]
    q = jnp.asarray(0.4 * RNG.normal(size=d))
    qdot = jnp.asarray(RNG.normal(size=d))
    p = {k: jnp.asarray(v) for k, v in params.items()}
    _, S, Sdot = joint_QSSdot(jt, q, qdot, p)
    h = 1e-7
    _, Sp, _ = joint_QSSdot(jt, q + h * qdot, qdot, p)
    _, Sm, _ = joint_QSSdot(jt, q - h * qdot, qdot, p)
    Sdot_fd = (Sp - Sm) / (2 * h)
    assert rel_err(Sdot_fd, Sdot) < 1e-5


# ---------------------------------------------------------------------------
# System level (mirror of Scene.test): J, Jdot, dJdq, dMdq, K, D by FD
# ---------------------------------------------------------------------------


def _rand_scene_state(sid=2):
    sc = build_scene(sid)
    nr = sc.topo.nr
    q = sc.state0.q + 0.1 * jnp.asarray(RNG.normal(size=nr))
    qdot = sc.state0.qdot + jnp.asarray(RNG.normal(size=nr))
    return sc, q, qdot


def test_J_vs_fd_of_positions():
    """phi = J qdot: compare body twists against FD of world transforms."""
    sc, q, qdot = _rand_scene_state()
    kin = model.forward_kinematics(sc.topo, sc.params, q, qdot)
    J, Jdot, phi = model.jacobians(sc.topo, sc.params, kin, qdot)
    h = 1e-7
    kinp = model.forward_kinematics(sc.topo, sc.params, q + h * qdot, qdot)
    kinm = model.forward_kinematics(sc.topo, sc.params, q - h * qdot, qdot)
    # body twist: hat(phi_i) = E_wi^{-1} d/dt E_wi
    Edot = (kinp.E_wi - kinm.E_wi) / (2 * h)
    phib = se3.unhat6(se3.inv(kin.E_wi) @ Edot)
    assert rel_err(phib, phi) < 1e-5


def test_Jdot_vs_fd():
    """Jdot = d/dt J along the flow — FD over a time step."""
    sc, q, qdot = _rand_scene_state()
    kin = model.forward_kinematics(sc.topo, sc.params, q, qdot)
    J, Jdot, _ = model.jacobians(sc.topo, sc.params, kin, qdot)
    h = 1e-7

    def Jat(qq):
        k = model.forward_kinematics(sc.topo, sc.params, qq, qdot)
        return model.jacobians(sc.topo, sc.params, k, qdot)[0]

    Jdot_fd = (Jat(q + h * qdot) - Jat(q - h * qdot)) / (2 * h)
    assert rel_err(Jdot_fd, Jdot) < 1e-5


def test_dMdq_K_D_vs_fd():
    """The implicit-integrator tensors (dMdq, K, D) against FD of (M, f).

    Mirrors Scene.test's dM/dq, K, D checks (Scene.m:282-378) with the same
    1e-6 relative threshold idea (here 1e-5 for central differences on f64).
    """
    sc, q, qdot = _rand_scene_state()
    M, f, dMdq, K, D = compute_values(sc.topo, sc.params, q, qdot, sc.force_fns)
    nr = sc.topo.nr
    h = 1e-6

    def Mf(qq, qd):
        Mx, fx, _ = model.assemble(sc.topo, sc.params, qq, qd, sc.force_fns)
        return np.asarray(Mx), np.asarray(fx)

    for i in range(nr):
        dq = jnp.zeros(nr).at[i].set(h)
        Mp, fp = Mf(q + dq, qdot)
        Mm_, fm_ = Mf(q - dq, qdot)
        assert rel_err((Mp - Mm_) / (2 * h), dMdq[:, :, i]) < 1e-5, f"dMdq[{i}]"
        assert rel_err((fp - fm_) / (2 * h), K[:, i]) < 1e-5, f"K[:,{i}]"
        _, fpd = Mf(q, qdot + dq)
        _, fmd = Mf(q, qdot - dq)
        assert rel_err((fpd - fmd) / (2 * h), D[:, i]) < 1e-5, f"D[:,{i}]"


def test_newton_hessian_equals_reference_form():
    """jacfwd of the BDF1 residual == M - h D - h^2 K + dMdq . dqtmp
    (driverRedMaxBDF1.m:176-184), proving the autodiff Hessian is the
    reference's analytic Hessian."""
    from redmax_tpu.integrators import residual_bdf1

    sc, q0, qdot0 = _rand_scene_state()
    h = float(sc.params["h"])
    q1 = q0 + h * qdot0 + 0.01 * jnp.asarray(RNG.normal(size=sc.topo.nr))
    H_auto = jax.jacfwd(
        lambda qq: residual_bdf1(sc.topo, sc.force_fns, sc.params, qq, q0, qdot0)
    )(q1)

    qdot1 = (q1 - q0) / h
    M, f, dMdq, K, D = compute_values(sc.topo, sc.params, q1, qdot1, sc.force_fns)
    dqtmp = q1 - q0 - h * qdot0
    # Reference form: H(:,i) += dMdq(:,:,i)*dqtmp (driverRedMaxBDF1.m:182-184)
    corr = jnp.stack([dMdq[:, :, i] @ dqtmp for i in range(sc.topo.nr)], axis=1)
    H_ref = M - h * D - h * h * K + corr
    assert rel_err(H_auto, H_ref) < 1e-9


def test_force_energy_consistency():
    """For conservative pieces: f = -dV/dq at qdot=0 (stiffness+gravity+springs)."""
    for sid in (0, 10, 12, 14):
        sc = build_scene(sid)
        nr = sc.topo.nr
        q = sc.state0.q + 0.05 * jnp.asarray(RNG.normal(size=nr))
        qdot = jnp.zeros(nr)

        def V_of(qq):
            T, V = model.energies(sc.topo, sc.params, qq, qdot, sc.force_fns)
            return V

        _, f, _ = model.assemble(sc.topo, sc.params, q, qdot, sc.force_fns)
        g = jax.grad(V_of)(q)
        assert rel_err(f, -g) < 1e-6, f"scene {sid}: f != -dV/dq"
