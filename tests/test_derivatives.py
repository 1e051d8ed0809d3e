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


def test_derivatives_at_random_frames():
    """Joint.test runs its FD checks at RANDOM configurations built from
    se3.randE (Joint.m:650-784). Same here: randomize every joint/body rest
    frame with se3.rand_E and re-verify J, Jdot, and the K/D tensors by FD.
    """
    sc, q, qdot = _rand_scene_state()
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    N = sc.topo.njoints
    params = dict(sc.params)
    params["E0_pj"] = se3.rand_E(k1, (N,))
    params["E0_ji"] = se3.rand_E(k2, (N,))

    kin = model.forward_kinematics(sc.topo, params, q, qdot)
    J, Jdot, phi = model.jacobians(sc.topo, params, kin, qdot)
    h = 1e-7
    kinp = model.forward_kinematics(sc.topo, params, q + h * qdot, qdot)
    kinm = model.forward_kinematics(sc.topo, params, q - h * qdot, qdot)
    Edot = (kinp.E_wi - kinm.E_wi) / (2 * h)
    phib = se3.unhat6(se3.inv(kin.E_wi) @ Edot)
    assert rel_err(phib, phi) < 1e-5

    def Jat(qq):
        k = model.forward_kinematics(sc.topo, params, qq, qdot)
        return model.jacobians(sc.topo, params, k, qdot)[0]

    Jdot_fd = (Jat(q + h * qdot) - Jat(q - h * qdot)) / (2 * h)
    assert rel_err(Jdot_fd, Jdot) < 1e-5

    M, f, dMdq, K, D = compute_values(sc.topo, params, q, qdot, sc.force_fns)
    nr = sc.topo.nr
    hf = 1e-6

    def Mf(qq, qd):
        Mx, fx, _ = model.assemble(sc.topo, params, qq, qd, sc.force_fns)
        return np.asarray(Mx), np.asarray(fx)

    for i in range(0, nr, max(1, nr // 4)):  # spot-check a spread of columns
        dq = jnp.zeros(nr).at[i].set(hf)
        Mp, fp = Mf(q + dq, qdot)
        Mm_, fm_ = Mf(q - dq, qdot)
        assert rel_err((Mp - Mm_) / (2 * hf), dMdq[:, :, i]) < 1e-5
        assert rel_err((fp - fm_) / (2 * hf), K[:, i]) < 1e-5


@pytest.mark.parametrize(
    "jt1,jt2,p1,p2",
    [
        (JointType.REVOLUTE, JointType.SPHERICAL,
         {"axis": np.array([0.0, 1.0, 0.0])}, {}),
        (JointType.PRISMATIC, JointType.UNIVERSAL,
         {"axis": np.array([1.0, 0.0, 0.0])}, {}),
        (JointType.REVOLUTE, JointType.PRISMATIC,
         {"axis": np.array([0.0, 0.0, 1.0])},
         {"axis": np.array([1.0, 0.0, 0.0])}),
    ],
    ids=["rev∘sph", "prism∘univ", "rev∘prism"],
)
def test_general_composite_S_Sdot(jt1, jt2, p1, p2):
    """General JointComposite: derive_S of the composed Q must equal the
    reference's hand-assembled S = [Ad(Q2^{-1}) S1, S2]
    (JointComposite.m:56-60), and Sdot (jvp of S) must match FD."""
    from redmax_tpu.joints import (
        composite_S_reference, derive_S, make_composite,
    )

    kern = make_composite(jt1, jt2)
    params = {"p1": {k: jnp.asarray(v) for k, v in p1.items()},
              "p2": {k: jnp.asarray(v) for k, v in p2.items()}}
    d = NDOF[jt1] + NDOF[jt2]
    q = jnp.asarray(0.4 * RNG.normal(size=d))
    qdot = jnp.asarray(RNG.normal(size=d))

    S_fn = derive_S(kern.Q_fn)
    S = S_fn(q, params)
    S_ref = composite_S_reference(jt1, jt2, q, params)
    assert rel_err(S, S_ref) < 1e-10

    _, Sdot = jax.jvp(lambda qq: S_fn(qq, params), (q,), (qdot,))
    h = 1e-6
    Sdot_fd = (S_fn(q + h * qdot, params) - S_fn(q - h * qdot, params)) / (2 * h)
    assert rel_err(Sdot, Sdot_fd) < 1e-6


def test_scene_composite_desugar_matches_fused_rp():
    """SceneBuilder.joint_composite (massless-intermediate desugaring) must
    reproduce the fused COMPOSITE_RP joint's trajectory exactly."""
    from redmax_tpu import integrators
    from redmax_tpu.scene import SceneBuilder, transl
    from redmax_tpu.types import State

    def build(fused):
        b = SceneBuilder(name="comp", h=1e-2, tEnd=0.1, grav=(0, 0, -980.0))
        body = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        if fused:
            b.joint(JointType.COMPOSITE_RP, None, body,
                    axis1=(0, 1, 0), axis2=(1, 0, 0),
                    q=[0.3, 0.2], qdot=[0.5, -0.4])
        else:
            b.joint_composite(
                JointType.REVOLUTE, JointType.PRISMATIC, None, body,
                q=[0.3, 0.2], qdot=[0.5, -0.4],
                p1={"axis": (0, 1, 0)}, p2={"axis": (1, 0, 0)},
            )
        return b.compile()

    outs = []
    for fused in (True, False):
        sc = build(fused)
        step = integrators.make_bdf1_step(sc.topo, sc.force_fns)
        sim = integrators.make_simulate(step, 10)
        final = jax.jit(sim)(sc.params, sc.state0)
        outs.append((np.asarray(final.q), np.asarray(final.qdot)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-12)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-11)


def test_closed_form_S_matches_derive_S():
    """The closed-form S_fn overrides for the q-DEPENDENT-S joints
    (UNIVERSAL, SPHERICAL exp-map right Jacobian, FREE2D, FREE3D, FREE_ST,
    COMPOSITE_RP) must equal the autodiff identity S_k = unhat6(Q^-1 dQ/dq_k)
    to machine precision — including Sdot = jvp(S_fn) and the Taylor-guard
    region near q = 0. (These overrides keep the adjoint's residual VJP
    first-order instead of vjp∘jvp∘jacfwd of the exp map — the r5 fallback/
    backward speedup, benchmarks/sph_profile.json.)"""
    rng = np.random.default_rng(7)
    cases = [
        (JointType.UNIVERSAL, {}),
        (JointType.SPHERICAL, {}),
        (JointType.FREE2D, {}),
        (JointType.FREE3D, {}),
        (JointType.FREE_ST, {}),
        (JointType.COMPOSITE_RP,
         {"axis1": jnp.asarray([0.0, 1.0, 0.0]),
          "axis2": jnp.asarray([1.0, 0.0, 0.0])}),
    ]
    for jt, params in cases:
        k = KERNELS[jt]
        assert k.S_fn is not None, jt
        d = NDOF[jt]
        S_ad_fn = derive_S(k.Q_fn)
        for scale in (1e-4, 0.3, 2.0):   # Taylor branch, mid, trig branch
            q = jnp.asarray(rng.normal(size=d) * scale)
            qd = jnp.asarray(rng.normal(size=d))
            S_ad = S_ad_fn(q, params)
            S_cf = k.S_fn(q, params)
            np.testing.assert_allclose(
                np.asarray(S_cf), np.asarray(S_ad), atol=1e-12,
                err_msg=f"{jt} S at scale {scale}")
            _, Sd_ad = jax.jvp(lambda qq: S_ad_fn(qq, params), (q,), (qd,))
            _, Sd_cf = jax.jvp(lambda qq: k.S_fn(qq, params), (q,), (qd,))
            # Sdot atol: the AUTODIFF side is jvp∘jacfwd through exp_so3's
            # Taylor guard — near the guard boundary its cancellation noise
            # reaches ~3e-10 (FREE3D at |q| ~ 1e-4); the closed form is the
            # cleaner of the two.
            np.testing.assert_allclose(
                np.asarray(Sd_cf), np.asarray(Sd_ad), atol=3e-9,
                err_msg=f"{jt} Sdot at scale {scale}")


def test_euler_chart_closed_form_S_and_T():
    """euler.euler_T's closed form T = [Rc^T Rb^T e_a, Rc^T e_b, e_c] and
    the SPHERICAL_EULER / FREE3D_EULER S_fn overrides must equal the
    autodiff identities to machine precision across all 12 charts."""
    from redmax_tpu import euler

    def euler_T_ad(chart, q):
        R = euler.euler_R(chart, q)
        dR = jax.jacfwd(lambda qq: euler.euler_R(chart, qq))(q)
        return jnp.stack(
            [se3.unhat3(R.T @ dR[:, :, k]) for k in range(3)], axis=-1)

    rng = np.random.default_rng(3)
    for chart in range(12):
        q = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(
            np.asarray(euler.euler_T(jnp.int32(chart), q)),
            np.asarray(euler_T_ad(jnp.int32(chart), q)), atol=1e-13,
            err_msg=f"euler_T chart {chart}")
    for jt in (JointType.SPHERICAL_EULER, JointType.FREE3D_EULER):
        k = KERNELS[jt]
        d = NDOF[jt]
        S_ad_fn = derive_S(k.Q_fn)
        for chart in (0, 5, 6, 11):
            params = {"chart": jnp.int32(chart)}
            q = jnp.asarray(rng.normal(size=d))
            qd = jnp.asarray(rng.normal(size=d))
            np.testing.assert_allclose(
                np.asarray(k.S_fn(q, params)),
                np.asarray(S_ad_fn(q, params)), atol=1e-13,
                err_msg=f"{jt} S chart {chart}")
            _, Sd_ad = jax.jvp(lambda qq: S_ad_fn(qq, params), (q,), (qd,))
            _, Sd_cf = jax.jvp(lambda qq: k.S_fn(qq, params), (q,), (qd,))
            np.testing.assert_allclose(
                np.asarray(Sd_cf), np.asarray(Sd_ad), atol=1e-12,
                err_msg=f"{jt} Sdot chart {chart}")


def test_so3_right_jacobian_inv():
    """Closed-form Jr^-1 (joints.so3_right_jacobian_inv) must invert
    joints.so3_right_jacobian across both guard branches in both dtypes,
    and the exp-map reparam must preserve the physical angular velocity
    omega = Jr(r) rdot through a rescale (the r5 replacement for the
    per-step batched 3x3 linalg.solve — benchmarks/sph_profile.json)."""
    from redmax_tpu.joints import (KERNELS, so3_right_jacobian,
                                   so3_right_jacobian_inv)

    rng = np.random.default_rng(5)
    for dt, tol in ((jnp.float64, 1e-9), (jnp.float32, 1e-6)):
        for scale in (1e-6, 0.15, 0.25, 0.99, 1.01, 2.0, 4.0):
            r = jnp.asarray(rng.normal(size=3), dt)
            r = r / jnp.linalg.norm(r) * scale
            P = so3_right_jacobian_inv(r) @ so3_right_jacobian(r)
            np.testing.assert_allclose(
                np.asarray(P), np.eye(3), atol=tol,
                err_msg=f"{dt.__name__} scale {scale}")
    k = KERNELS[JointType.SPHERICAL]
    for mag in (0.5, 5.0):          # below / above the 1.5*pi rescale
        q = jnp.asarray(rng.normal(size=3))
        q = q / jnp.linalg.norm(q) * mag
        qd = jnp.asarray(rng.normal(size=3))
        q2, qd2 = k.reparam_fn(q, qd, {})
        w_old = so3_right_jacobian(q) @ qd
        w_new = so3_right_jacobian(q2) @ qd2
        np.testing.assert_allclose(
            np.asarray(w_new), np.asarray(w_old), atol=1e-12,
            err_msg=f"omega not preserved at |q| = {mag}")
        if mag > 1.5 * np.pi:
            assert float(jnp.linalg.norm(q2)) < 1.5 * np.pi
