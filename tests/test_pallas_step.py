"""Parity gate for the fused Pallas BDF2 chord kernel (pallas_step.py).

Strategy: the pallas kernel and pallas_step.chord_bdf2_dense evaluate the
SAME kernel function (_build_kernel) — pallas feeds it (8,128) jnp lane
blocks, the oracle here feeds it plain NUMPY [B] vectors (xp=np), so the
identical unrolled computation executes eagerly in milliseconds with no XLA
involvement. (Routing the ~20k-op unrolled graph through the XLA CPU
pipeline is pathological: default-opt compiles exceed 400s and level-0
executables dispatch for minutes; interpret-mode pallas is worse.)

Gated here, all against the vmapped JAX reference path
newton(fixed_iters, chord=True, hessian="structured", linsolve="gj"):
  * the closed-form per-body K/D blocks vs jacfwd;
  * one fused solve (solution AND materialized H^-1 chord factor) at the
    production config, on a revolute chain and a mixed
    revolute/prismatic/fixed scene;
  * a multi-step batched BDF2 rollout (numpy-oracle stepping vs
    make_bdf2_step_batched's vmap fallback);
  * divergence poisoning masks (growth_reject / NaN lanes);
  * the production custom-VJP backward (factor-reusing _pbwd in
    make_bdf2_step_batched) vs the fallback implicit_solve_factored VJP.

The pallas PLUMBING (BlockSpecs, lane layout, grid) is exercised on the
real TPU by bench.py / benchmarks/pallas_ablation.py, where the hardware
kernel is additionally measured against an f64 oracle (max |dx| ~ 1e-7 at
B=256 on the 12-link chain — tighter than the vmapped f32 XLA path itself,
whose MXU contractions round at bf16 input precision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import integrators, model, pallas_step
from redmax_tpu.integrators import Bdf2State, NewtonConfig
from redmax_tpu.scene import SceneBuilder
from redmax_tpu.scenes import scene_chain, scene_chain_ground
from redmax_tpu.types import JointType, State

CFG = NewtonConfig(
    fixed_iters=3, predictor="quadratic", chord=True,
    hessian="structured", linsolve="gj",
)


def _mixed_scene():
    """revolute + prismatic + planar + translational + fixed chain — covers
    every constant-S type the kernel supports."""

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="mix", h=1e-2, tEnd=0.1, grav=(0.0, 0.0, -980.0))
    b0 = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
    b.joint(JointType.REVOLUTE, None, b0, E_pj=np.eye(4), axis=(0, 1, 0))
    b1 = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
    b.joint(JointType.PRISMATIC, 0, b1, E_pj=transl([1.0, 0, 0]),
            axis=(1, 0, 0))
    b2 = b.body_cuboid(1.0, (0.5, 0.1, 0.1), E_ji=transl([0.25, 0, 0]))
    b.joint(JointType.FIXED, 1, b2, E_pj=transl([1.0, 0, 0]))
    b3 = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
    j = b.joint(JointType.REVOLUTE, 2, b3, E_pj=transl([0.5, 0, 0]),
                axis=(0, 0, 1))
    b.set_damping(j, 0.5)
    b.set_stiffness(j, 10.0)
    b4 = b.body_cuboid(1.0, (0.6, 0.1, 0.1), E_ji=transl([0.3, 0, 0]))
    jp = b.joint(JointType.PLANAR, 3, b4, E_pj=transl([1.0, 0, 0]),
                 plane=np.array([[1.0, 0, 0], [0, 0, 1.0]]).T)
    b.set_stiffness(jp, 25.0)
    b.set_damping(jp, 0.3)
    b5 = b.body_cuboid(1.0, (0.4, 0.1, 0.1), E_ji=transl([0.2, 0, 0]))
    jt = b.joint(JointType.TRANSLATIONAL, 4, b5, E_pj=transl([0.6, 0, 0]))
    b.set_stiffness(jt, 40.0)
    b.set_damping(jt, 0.5)
    b6 = b.body_cuboid(1.0, (0.5, 0.1, 0.1), E_ji=transl([0.25, 0, 0]))
    ju = b.joint(JointType.UNIVERSAL, 5, b6, E_pj=transl([0.5, 0, 0]))
    b.set_damping(ju, 0.4)
    return b.compile(dtype=jnp.float32)


def _sph_scene(nlinks=3, free=False):
    """Ball-joint (exp-map SPHERICAL) chain, optionally with a FREE3D
    floating base — the q-dependent-S joints added to the kernel in r5."""
    from redmax_tpu.types import JointType as JT

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="sph", h=1e-2, tEnd=0.1, grav=(0.0, 0.0, -980.0))
    for i in range(nlinks):
        body = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        jt = JT.FREE3D if (free and i == 0) else JT.SPHERICAL
        j = b.joint(jt, None if i == 0 else i - 1, body,
                    E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]))
        b.set_damping(j, 1.0)
    return b.compile(dtype=jnp.float32)


def _spring_scene():
    """Revolute chain + ForcePointPoint (body-body) + ForceSpringDamper
    (world-body) — the spring closures added to the kernel in r5."""

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="spr", h=1e-2, tEnd=0.1, grav=(0.0, 0.0, -980.0))
    for i in range(3):
        b_i = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        b.joint(JointType.REVOLUTE, None if i == 0 else i - 1, b_i,
                E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]),
                axis=(0, 1, 0) if i % 2 == 0 else (0, 0, 1))
    b.force_point_point(0, 2, xl1=(0.3, 0, 0.05), xl2=(0.2, 0, -0.05),
                        k=70.0, d=4.0)
    b.force_spring_damper(-1, 2, [1.5, 0.5, 2.0], [0.4, 0, 0.0],
                          k=120.0, d=2.0)
    return b.compile(dtype=jnp.float32)


def _rand_states(sc, B, seed=1):
    rng = np.random.default_rng(seed)
    nr = sc.topo.nr
    f32 = jnp.float32
    q1 = jnp.asarray(0.3 * rng.normal(size=(B, nr)), f32)
    qd1 = jnp.asarray(rng.normal(size=(B, nr)), f32)
    q0 = q1 - 0.01 * qd1
    qd0 = qd1 + jnp.asarray(0.05 * rng.normal(size=(B, nr)), f32)
    x0 = q1 + 0.01 * qd1
    return x0, q0, qd0, q1, qd1


def _jax_chord_solve(sc, cfg, params, x0, q0, qd0, q1, qd1):
    """Reference: vmapped newton(fixed_iters, chord, structured, gj), also
    returning the materialized H^-1 chord factor."""
    hess = integrators._hess_bdf2(sc.topo, sc.force_fns)

    def one(tau_i, x0i, q0i, qd0i, q1i, qd1i):
        p = {**params, "tau": tau_i}
        theta = (p, q0i, qd0i, q1i, qd1i, {})
        res = lambda x: integrators.residual_bdf2(
            sc.topo, sc.force_fns, p, x, q0i, qd0i, q1i, qd1i, {}
        )
        x, info = integrators.newton(
            res, x0i, cfg, jac_fn=lambda x: hess(theta, x)
        )
        return x, info["factor"]

    tau = params["tau"]
    tau_b = tau if tau.ndim == 2 else jnp.broadcast_to(tau, x0.shape)
    return jax.vmap(one)(tau_b, x0, q0, qd0, q1, qd1)


def _np_inner_step(sc, cfg, params, s: Bdf2State) -> Bdf2State:
    """The pallas inner BDF2 step with the solve replaced by the NUMPY
    oracle — mirrors integrators.make_bdf2_step_batched's inner()."""
    h = float(np.asarray(params["h"]))
    q0, qd0 = np.asarray(s.q_prev), np.asarray(s.qdot_prev)
    q1, qd1 = np.asarray(s.q), np.asarray(s.qdot)
    guess = q1 + h * qd1
    if cfg.predictor == "quadratic":
        guess = guess + 0.5 * h * (qd1 - qd0)
    q2, _ = pallas_step.chord_bdf2_dense(
        sc.topo, cfg, params, guess, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )
    q2 = q2.astype(np.float32)
    qdot2 = (3 / (2 * h)) * (q2 - (4 / 3) * q1 + (1 / 3) * q0)
    q2, qdot2 = jnp.asarray(q2), jnp.asarray(qdot2)
    # Mirror the kernel-path inner(): exp-map joints reparam between steps.
    from redmax_tpu.joints import KERNELS
    from redmax_tpu.types import JointType as JT

    if any(KERNELS[JT(t)].reparam_fn is not None for t in sc.topo.jtype):
        q2, qdot2 = jax.vmap(
            lambda qq, qd: model.reparam_all(sc.topo, params, qq, qd, {})[:2]
        )(q2, qdot2)
    return Bdf2State(q=q2, qdot=qdot2,
                     q_prev=s.q, qdot_prev=s.qdot, k=s.k + 1, aux=s.aux)


def test_closed_form_blocks_match_jacfwd():
    """local_force_blocks_closed == jacfwd blocks of model.local_force_blocks."""
    sc = scene_chain(nlinks=3).compile(dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if hasattr(a, "astype") else a, sc.params
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(0.4 * rng.normal(size=sc.topo.nr))
    qdot = jnp.asarray(rng.normal(size=sc.topo.nr))
    kin = model.forward_kinematics(sc.topo, params, q, qdot, {})
    J, _, phi = model.jacobians(sc.topo, params, kin, qdot)
    K_ref, D_ref = model.local_force_blocks(sc.topo, params, kin, phi)

    g = np.asarray(params["g"])
    for i in range(sc.topo.njoints):
        R = np.asarray(kin.E_wi[i, :3, :3])
        Ii = np.asarray(params["I_i"][i])
        ph = [float(x) for x in np.asarray(phi[i])]
        bd = float(np.asarray(params["body_damping"])[i])
        Rl = [[R[a, b] for b in range(3)] for a in range(3)]
        K, D = pallas_step.local_force_blocks_closed(Ii, Rl, ph, bd, list(g))
        np.testing.assert_allclose(np.array(K), np.asarray(K_ref[i]), atol=1e-10)
        np.testing.assert_allclose(np.array(D), np.asarray(D_ref[i]), atol=1e-10)


def _ground_scene(nlinks=3):
    """Revolute chain with penalty ground contact on every link; the floor
    sits just below z=0 so _rand_states configurations penetrate with mixed
    active/static/dynamic corner regimes."""
    return scene_chain_ground(
        nlinks=nlinks, floor_z=-0.02, kn=1e3, kt=50.0, kd=10.0, mu=0.5
    ).compile(dtype=jnp.float32)


@pytest.mark.parametrize(
    "scene", ["chain", "mixed", "ground", "sph", "free3d", "springs"]
)
def test_kernel_math_matches_chord_solve(scene):
    sc = {"chain": lambda: scene_chain(nlinks=4).compile(dtype=jnp.float32),
          "mixed": _mixed_scene, "ground": _ground_scene,
          "sph": _sph_scene, "free3d": lambda: _sph_scene(free=True),
          "springs": _spring_scene}[scene]()
    B = 8
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B)

    x_np, hinv_np = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, sc.params, x0, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )
    x_ref, hinv_ref = jax.jit(
        lambda a, b, c, d, e: _jax_chord_solve(
            sc, CFG, sc.params, a, b, c, d, e
        )
    )(x0, q0, qd0, q1, qd1)

    assert bool(jnp.all(jnp.isfinite(x_ref))), "reference path diverged"
    np.testing.assert_allclose(
        np.asarray(x_np), np.asarray(x_ref), rtol=0, atol=5e-6
    )
    scale = float(jnp.max(jnp.abs(hinv_ref)))
    np.testing.assert_allclose(
        np.asarray(hinv_np), np.asarray(hinv_ref), atol=2e-5 * scale
    )


def test_batched_rollout_matches_vmap_fallback():
    """Numpy-oracle stepping of the pallas inner step == the vmap fallback
    of make_bdf2_step_batched over a short rollout (bootstrap shared)."""
    sc = scene_chain(nlinks=3).compile(dtype=jnp.float32)
    B, nsteps = 4, 6
    rng = np.random.default_rng(0)
    s0 = State(
        q=jnp.asarray(0.3 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        qdot=jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        aux={},
    )
    step = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, use_pallas=False
    )
    sim = integrators.make_simulate(step, nsteps)
    ref = jax.jit(sim)(sc.params, integrators.bdf2_init(s0))
    assert bool(jnp.all(jnp.isfinite(ref.q)))

    s = step.bootstrap(sc.params, integrators.bdf2_init(s0))
    for _ in range(nsteps - 1):
        s = _np_inner_step(sc, CFG, sc.params, s)
    np.testing.assert_allclose(np.asarray(s.q), np.asarray(ref.q), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(s.qdot), np.asarray(ref.qdot), atol=5e-3
    )


def test_divergence_poisoning_matches():
    """A lane driven to divergence (absurd initial velocity) is NaN-poisoned
    identically by the numpy-oracle kernel path and the vmap fallback."""
    sc = scene_chain(nlinks=3).compile(dtype=jnp.float32)
    B, nsteps = 4, 6
    rng = np.random.default_rng(2)
    qd = rng.normal(size=(B, sc.topo.nr))
    qd[0] = 1e6
    s0 = State(
        q=jnp.asarray(0.3 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        qdot=jnp.asarray(qd, jnp.float32),
        aux={},
    )
    step = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, use_pallas=False
    )
    sim = integrators.make_simulate(step, nsteps)
    ref = jax.jit(sim)(sc.params, integrators.bdf2_init(s0))
    mask_ref = np.all(np.isfinite(np.asarray(ref.q)), axis=-1)
    assert not mask_ref[0] and mask_ref[1:].all(), mask_ref

    s = step.bootstrap(sc.params, integrators.bdf2_init(s0))
    for _ in range(nsteps - 1):
        s = _np_inner_step(sc, CFG, sc.params, s)
    mask_np = np.all(np.isfinite(np.asarray(s.q)), axis=-1)
    np.testing.assert_array_equal(mask_np, mask_ref)


def test_custom_vjp_backward_matches_fallback():
    """The production factor-reusing backward (_pbwd: z = H^-T xbar from the
    kernel's materialized H^-1, residual VJP through the pure-JAX residual)
    == the fallback implicit_solve_factored VJP, for one inner BDF2 step.

    Checks the cotangents of tau (the MPC gradient path) and of every state
    level. Forward values come from the numpy oracle for the pallas side.
    """
    sc = scene_chain(nlinks=3).compile(dtype=jnp.float32)
    B = 4
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=5)
    rng = np.random.default_rng(9)
    tau = jnp.asarray(0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    params = {**sc.params, "tau": tau}
    xbar = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)

    def inner_q(step, tau_b, q0b, qd0b, q1b, qd1b):
        s = Bdf2State(q=q1b, qdot=qd1b, q_prev=q0b, qdot_prev=qd0b,
                      k=jnp.ones((), jnp.int32), aux={})
        return step.inner({**sc.params, "tau": tau_b}, s).q

    # Fallback path (implicit_solve_factored custom VJP).
    step_f = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, differentiable=True, use_pallas=False
    )
    out_f, vjp_f = jax.vjp(
        lambda *a: inner_q(step_f, *a), tau, q0, qd0, q1, qd1
    )
    cots_f = vjp_f(xbar)

    # Production pallas backward, replicated with the numpy-oracle forward:
    # x* and H^-1 from the kernel computation, z = H^-T xbar, cotangents by
    # one VJP of the batched exact residual (what _pbwd does).
    h = sc.params["h"]
    guess = q1 + h * qd1 + 0.5 * h * (qd1 - qd0)
    xstar, hinv = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, params, guess, q0, qd0, q1, qd1, xp=np
    )
    xstar = jnp.asarray(xstar)
    z = jnp.einsum("bsr,bs->br", jnp.asarray(hinv), xbar)

    def res_b(tau_b, q0b, qd0b, q1b, qd1b, x):
        def one(ti, a, b, c, d, xi):
            p = {**sc.params, "tau": ti}
            return integrators.residual_bdf2(
                sc.topo, (), p, xi, a, b, c, d, {}
            )

        return jax.vmap(one)(tau_b, q0b, qd0b, q1b, qd1b, x)

    _, vjp_res = jax.vjp(
        lambda t, a, b, c, d: res_b(t, a, b, c, d, xstar), tau, q0, qd0, q1, qd1
    )
    cots_p = vjp_res(-z)

    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(xstar), atol=5e-6
    )
    names = ["tau", "q0", "qd0", "q1", "qd1"]
    for name, cf, cp in zip(names, cots_f, cots_p):
        cf, cp = np.asarray(cf, np.float64), np.asarray(cp, np.float64)
        scale = max(np.abs(cf).max(), 1e-9)
        # q1/qd1 also feed the predictor in the real step, but the solution
        # is predictor-independent (implicit function), so both VJPs treat
        # x0 as non-differentiable — comparable term for term.
        np.testing.assert_allclose(cp, cf, atol=2e-4 * scale, err_msg=name)


def test_unsupported_scene_falls_back():
    """A scene with an Euler-chart spherical joint or a cable must auto-route
    to the vmap fallback, and use_pallas=True must raise; ground-contact,
    exp-map spherical, and spring-damper scenes must QUALIFY (r5)."""
    from redmax_tpu.scenes import build_scene

    sc = build_scene(7, exp_coords=False)  # Euler-chart spherical (scene 7)
    assert not pallas_step.supports(sc.topo, sc.force_fns)
    step = integrators.make_bdf2_step_batched(sc.topo, sc.force_fns, CFG)
    assert step.inner is not None  # fallback built fine
    with pytest.raises(ValueError):
        integrators.make_bdf2_step_batched(
            sc.topo, sc.force_fns, CFG, use_pallas=True
        )
    from redmax_tpu.scenes_matlab import build_mscene

    scm = build_mscene(24)                 # SpringDamperM (custom_KD path)
    assert not pallas_step.supports(scm.topo, scm.force_fns)
    for qualifying in (_ground_scene(), build_scene(7), build_scene(12),
                       build_scene(13)):   # r5: cables qualify too
        assert pallas_step.supports(qualifying.topo, qualifying.force_fns)
    # backward escape hatches are rejected up front on the fallback path
    # (a silent reuse-gradient fallback would betray the request).
    with pytest.raises(ValueError):
        integrators.make_bdf2_step_batched(
            sc.topo, sc.force_fns, CFG, differentiable=True,
            backward="refresh",
        )


def test_contact_blocks_match_jacfwd():
    """_ground_contact's closed-form K/D == jacfwd of the ForceGroundCuboid
    closure under the structured_hessian perturbation convention
    (E_wi <- E_wi exp(xi^), phi <- phi + dphi), in f64."""
    from redmax_tpu import se3

    sc = _ground_scene(nlinks=2)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if hasattr(a, "astype") else a,
        sc.params,
    )
    rng = np.random.default_rng(7)
    q = jnp.asarray(0.4 * rng.normal(size=sc.topo.nr))
    qdot = jnp.asarray(rng.normal(size=sc.topo.nr))
    kin = model.forward_kinematics(sc.topo, params, q, qdot, {})
    _, _, phi = model.jacobians(sc.topo, params, kin, qdot)
    N = sc.topo.njoints
    z = jnp.zeros((N, 6), dtype=jnp.float64)

    for fn in sc.force_fns:
        b = fn.body

        def fm_of(xi, dphi):
            kin2 = kin._replace(E_wi=kin.E_wi @ se3.exp(xi))
            _, fm = fn(params, kin2, None, phi + dphi, q, qdot)
            return fm[b]

        K_ref = jax.jacfwd(fm_of, argnums=0)(z, z)[:, b, :]     # [6,6]
        D_ref = jax.jacfwd(fm_of, argnums=1)(z, z)[:, b, :]
        fm_ref = np.asarray(fm_of(z, z))

        fp = params["forces"][fn.key]
        E = np.asarray(fp["E"])
        cp = {
            "sides": list(np.asarray(fp["sides"], np.float64)),
            "kn": np.float64(fp["kn"]), "kt": np.float64(fp["kt"]),
            "kd": np.float64(fp["kd"]), "mu": np.float64(fp["mu"]),
            "xg": list(E[:3, 3]), "ng": list(E[:3, 2]),
        }
        Eb = np.asarray(kin.E_wi[b])
        Epair = ([[Eb[i, j] for j in range(3)] for i in range(3)],
                 [Eb[i, 3] for i in range(3)])
        ph = [float(x) for x in np.asarray(phi[b])]
        wr, K, D = pallas_step._ground_contact(
            Epair, ph, cp, np.float64, np, want_blocks=True
        )
        # the test config must actually exercise contact
        assert np.abs(np.array(wr)).max() > 0
        np.testing.assert_allclose(np.array(wr), fm_ref, rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.array(K), np.asarray(K_ref), atol=1e-9)
        np.testing.assert_allclose(np.array(D), np.asarray(D_ref), atol=1e-9)

        # the VECTORIZED jax blocks (forces.ground_contact_blocks — what
        # structured_hessian compiles) == the scalar lane-block code, WITH
        # the proximity-margin H activation on both sides
        from redmax_tpu.forces import ground_contact_blocks

        hh, gm = 0.01, float(np.linalg.norm(np.asarray(params["g"])))
        _, Km, Dm = pallas_step._ground_contact(
            Epair, ph, cp, np.float64, np, want_blocks=True, hpred=(hh, gm)
        )
        Kv, Dv = ground_contact_blocks(
            kin.E_wi[b], phi[b], fp, jnp.asarray(hh, jnp.float64),
            jnp.asarray(gm, jnp.float64),
        )
        np.testing.assert_allclose(np.asarray(Kv), np.array(Km), atol=1e-10)
        np.testing.assert_allclose(np.asarray(Dv), np.array(Dm), atol=1e-10)


def test_contact_rollout_matches_vmap_fallback():
    """Chain dropped onto the floor: numpy-oracle stepping of the pallas
    kernel (contact inside the kernel) == the vmap fallback (contact via
    force closures + jacfwd structured blocks) over a multi-step rollout
    through impact."""
    # Gentler than _rand_states: penalty contact at kn=1e3 under 3 chord
    # iterations rejects lanes slammed into the floor at |qdot| ~ 1 (the
    # vmapped REFERENCE path rejects them too — divergence parity is covered
    # by test_divergence_poisoning_matches); this test wants a convergent
    # impact trajectory on both paths.
    sc = scene_chain_ground(
        nlinks=3, floor_z=-0.02, kn=300.0, kt=20.0, kd=5.0, mu=0.5
    ).compile(dtype=jnp.float32)
    B, nsteps = 4, 8
    rng = np.random.default_rng(4)
    s0 = State(
        q=jnp.asarray(0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        qdot=jnp.asarray(0.3 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        aux={},
    )
    step = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, CFG, use_pallas=False
    )
    sim = integrators.make_simulate(step, nsteps)
    ref = jax.jit(sim)(sc.params, integrators.bdf2_init(s0))
    assert bool(jnp.all(jnp.isfinite(ref.q)))

    s = step.bootstrap(sc.params, integrators.bdf2_init(s0))
    for _ in range(nsteps - 1):
        s = _np_inner_step(sc, CFG, sc.params, s)
    np.testing.assert_allclose(np.asarray(s.q), np.asarray(ref.q), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s.qdot), np.asarray(ref.qdot), atol=2e-2
    )


@pytest.mark.parametrize(
    "mode", ["guarded", "refresh", "guarded_refresh", "guard_last"]
)
def test_robust_solve_modes_match_newton(mode):
    """The kernel's guarded solve (full/half/stay-put line-search guard, with
    chord=True OR re-evaluated-H chord=False), plain re-evaluated-H mode,
    and the r5 guard_last mode (one guarded final chord iteration) ==
    integrators.newton with the same config, on the contact scene where
    these modes matter. (r5: newton() guards the non-chord branch too, so
    every kernel mode has a behavior-equal vmapped counterpart.)"""
    cfg = NewtonConfig(
        fixed_iters=3, predictor="quadratic",
        chord=(mode in ("guarded", "guard_last")),
        guarded=(mode in ("guarded", "guarded_refresh")),
        guard_last=(mode == "guard_last"),
        hessian="structured", linsolve="gj",
    )
    sc = _ground_scene()
    B = 8
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=31)
    x_np, _ = pallas_step.chord_bdf2_dense(
        sc.topo, cfg, sc.params, x0, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )
    x_ref, _ = jax.jit(
        lambda a, b, c, d, e: _jax_chord_solve(sc, cfg, sc.params, a, b, c, d, e)
    )(x0, q0, qd0, q1, qd1)
    x_ref = np.asarray(x_ref)
    finite = np.all(np.isfinite(x_ref), axis=-1)
    assert finite.mean() > 0.5
    np.testing.assert_array_equal(np.all(np.isfinite(x_np), axis=-1), finite)
    np.testing.assert_allclose(x_np[finite], x_ref[finite], rtol=0, atol=1e-5)


@pytest.mark.parametrize("backward", ["refresh", "exact"])
def test_backward_escape_hatch(backward):
    """make_bdf2_step_batched(backward="refresh"/"exact"): the adjoint
    transposed solve runs against a structured / exact H re-evaluated AT THE
    SOLUTION x* (TaskBDF1.m:45-81 semantics) instead of the chord factor at
    the predictor. Verified against manually-computed IFT cotangents. Uses
    kernel_impl="dense" (same kernel code, XLA-compilable on CPU) at a tiny
    scene so the real _pbwd wiring is exercised end to end."""
    sc = scene_chain(nlinks=2).compile(dtype=jnp.float32)
    B = 2
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=21)
    rng = np.random.default_rng(23)
    tau = jnp.asarray(0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    xbar = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    s = Bdf2State(q=q1, qdot=qd1, q_prev=q0, qdot_prev=qd0,
                  k=jnp.ones((), jnp.int32), aux={})

    step = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, differentiable=True, use_pallas=True,
        kernel_impl="dense", backward=backward,
    )
    out, vjp = jax.vjp(lambda t: step.inner({**sc.params, "tau": t}, s).q, tau)
    (cot_tau,) = vjp(xbar)

    # Manual IFT reference: x* from the numpy oracle, H at x*, z = H^-T xbar,
    # cotangent = -z^T d(res)/d(tau).
    h = sc.params["h"]
    guess = q1 + h * qd1 + 0.5 * h * (qd1 - qd0)
    params = {**sc.params, "tau": tau}
    xstar, _ = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, params, guess, q0, qd0, q1, qd1, xp=np
    )
    xstar = jnp.asarray(xstar)
    hessb = integrators._hess_bdf2(sc.topo, ())

    def H_one(ti, a, b, c, d, xi):
        p = {**sc.params, "tau": ti}
        if backward == "refresh":
            return hessb((p, a, b, c, d, {}), xi)
        return jax.jacfwd(lambda xx: integrators.residual_bdf2(
            sc.topo, (), p, xx, a, b, c, d, {}
        ))(xi)

    H = jax.vmap(H_one)(tau, q0, qd0, q1, qd1, xstar)
    z = jnp.linalg.solve(jnp.swapaxes(H, -1, -2),
                         xbar.astype(H.dtype)[..., None])[..., 0]

    def res_b(tau_b):
        def one(ti, a, b, c, d, xi):
            p = {**sc.params, "tau": ti}
            return integrators.residual_bdf2(sc.topo, (), p, xi, a, b, c, d, {})
        return jax.vmap(one)(tau_b, q0, qd0, q1, qd1, xstar)

    _, vjp_res = jax.vjp(res_b, tau)
    (cot_ref,) = vjp_res(-z)
    cot_tau = np.asarray(cot_tau, np.float64)
    cot_ref = np.asarray(cot_ref, np.float64)
    scale = max(np.abs(cot_ref).max(), 1e-9)
    np.testing.assert_allclose(cot_tau, cot_ref, atol=5e-4 * scale)


def test_contact_vjp_matches_fallback():
    """Differentiable contact (the matlab-diff flagship): the factor-reusing
    pallas backward == the fallback VJP on the ground-contact scene."""
    sc = _ground_scene()
    B = 4
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=11)
    rng = np.random.default_rng(13)
    tau = jnp.asarray(0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    params = {**sc.params, "tau": tau}
    xbar = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)

    step_f = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, CFG, differentiable=True, use_pallas=False
    )

    def inner_q(tau_b, q0b, qd0b, q1b, qd1b):
        s = Bdf2State(q=q1b, qdot=qd1b, q_prev=q0b, qdot_prev=qd0b,
                      k=jnp.ones((), jnp.int32), aux={})
        return step_f.inner({**sc.params, "tau": tau_b}, s).q

    out_f, vjp_f = jax.vjp(inner_q, tau, q0, qd0, q1, qd1)
    cots_f = vjp_f(xbar)

    h = sc.params["h"]
    guess = q1 + h * qd1 + 0.5 * h * (qd1 - qd0)
    xstar, hinv = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, params, guess, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )
    xstar = jnp.asarray(xstar)
    z = jnp.einsum("bsr,bs->br", jnp.asarray(hinv), xbar)

    def res_b(tau_b, q0b, qd0b, q1b, qd1b, x):
        def one(ti, a, b, c, d, xi):
            p = {**sc.params, "tau": ti}
            return integrators.residual_bdf2(
                sc.topo, sc.force_fns, p, xi, a, b, c, d, {}
            )

        return jax.vmap(one)(tau_b, q0b, qd0b, q1b, qd1b, x)

    _, vjp_res = jax.vjp(
        lambda t, a, b, c, d: res_b(t, a, b, c, d, xstar), tau, q0, qd0, q1, qd1
    )
    cots_p = vjp_res(-z)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(xstar), atol=1e-5)
    names = ["tau", "q0", "qd0", "q1", "qd1"]
    for name, cf, cp in zip(names, cots_f, cots_p):
        cf, cp = np.asarray(cf, np.float64), np.asarray(cp, np.float64)
        scale = max(np.abs(cf).max(), 1e-9)
        np.testing.assert_allclose(cp, cf, atol=5e-4 * scale, err_msg=name)


def test_so3_exp_S_closed_forms():
    """_so3_exp_S (Rodrigues R, right-Jacobian S, closed-form Sdot) ==
    joints.derive_S / jax.jvp of the SPHERICAL kernel, in f64, across
    generic, small-angle, and zero configurations (the Taylor-guard band)."""
    from redmax_tpu.joints import KERNELS, derive_S, joint_QSSdot
    from redmax_tpu.types import JointType as JT

    Sf = derive_S(KERNELS[JT.SPHERICAL].Q_fn)
    rng = np.random.default_rng(17)
    ws = [rng.normal(size=3) * s for s in (2.0, 0.5, 0.15, 1e-3, 1e-6)]
    ws.append(np.zeros(3))
    for w in ws:
        wd = rng.normal(size=3)
        R, S, Sdot = pallas_step._so3_exp_S(list(w), list(wd), np)
        Q, S_ref, Sdot_ref = joint_QSSdot(
            JT.SPHERICAL, jnp.asarray(w, jnp.float64),
            jnp.asarray(wd, jnp.float64), {}
        )
        np.testing.assert_allclose(
            np.array(R), np.asarray(Q)[:3, :3], atol=1e-12
        )
        np.testing.assert_allclose(
            np.array(S), np.asarray(S_ref)[:3, :], atol=1e-9
        )
        np.testing.assert_allclose(
            np.array(Sdot), np.asarray(Sdot_ref)[:3, :], atol=1e-8
        )


def test_spring_blocks_match_jacfwd():
    """_spring_force's closed-form pairwise K/D blocks (incl. the body1-body2
    CROSS blocks) == jacfwd of the ForcePointPoint / ForceSpringDamper
    closures under the structured_hessian perturbation convention, in f64;
    and the wrench values match the closures exactly."""
    from redmax_tpu import se3

    sc = _spring_scene()
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if hasattr(a, "astype") else a,
        sc.params,
    )
    rng = np.random.default_rng(19)
    q = jnp.asarray(0.4 * rng.normal(size=sc.topo.nr))
    qdot = jnp.asarray(rng.normal(size=sc.topo.nr))
    kin = model.forward_kinematics(sc.topo, params, q, qdot, {})
    _, _, phi = model.jacobians(sc.topo, params, kin, qdot)
    N = sc.topo.njoints
    z = jnp.zeros((N, 6), dtype=jnp.float64)

    for fn, spec in zip(sc.force_fns, pallas_step._spring_spec(sc.force_fns)):

        def fm_of(xi, dphi):
            kin2 = kin._replace(E_wi=kin.E_wi @ se3.exp(xi))
            _, fm = fn(params, kin2, None, phi + dphi, q, qdot)
            return fm

        K_ref = np.asarray(jax.jacfwd(fm_of, argnums=0)(z, z))  # [N,6,N,6]
        D_ref = np.asarray(jax.jacfwd(fm_of, argnums=1)(z, z))
        fm_ref = np.asarray(fm_of(z, z))

        fp = params["forces"][fn.key]
        sp = {**spec,
              "xl1": list(np.asarray(fp["xl1"], np.float64)),
              "xl2": list(np.asarray(fp["xl2"], np.float64)),
              "k": np.float64(fp["k"]), "d": np.float64(fp["d"]),
              "L": np.float64(fp.get("L", 0.0))}

        def pt(b, r):
            if b < 0:
                return (r, [0.0, 0.0, 0.0], None, None, r)
            E = np.asarray(kin.E_wi[b])
            R = [[E[i, j] for j in range(3)] for i in range(3)]
            p = [E[i, 3] for i in range(3)]
            ph = np.asarray(phi[b])
            u = list(np.cross(ph[:3], r) + ph[3:])
            x = [p[i] + sum(R[i][k] * r[k] for k in range(3))
                 for i in range(3)]
            v = [sum(R[i][k] * u[k] for k in range(3)) for i in range(3)]
            return (x, v, R, u, r)

        st1 = pt(spec["b1"], sp["xl1"])
        st2 = pt(spec["b2"], sp["xl2"])
        w1, w2, blocks = pallas_step._spring_force(
            st1, st2, sp, np.float64, np, want_blocks=True
        )
        fm_chk = np.zeros((N, 6))
        if w1 is not None:
            fm_chk[spec["b1"]] += np.array(w1)
        if w2 is not None:
            fm_chk[spec["b2"]] += np.array(w2)
        assert np.abs(fm_chk).max() > 0
        np.testing.assert_allclose(fm_chk, fm_ref, atol=1e-10)

        K_chk = np.zeros((N, 6, N, 6))
        D_chk = np.zeros((N, 6, N, 6))
        bodies = (spec["b1"], spec["b2"])
        for (bi, ci), (K, D) in blocks.items():
            K_chk[bodies[bi], :, bodies[ci], :] += np.array(K)
            D_chk[bodies[bi], :, bodies[ci], :] += np.array(D)
        np.testing.assert_allclose(K_chk, K_ref, atol=1e-9)
        np.testing.assert_allclose(D_chk, D_ref, atol=1e-9)


def test_spherical_rollout_matches_vmap_fallback():
    """Ball-joint chain: numpy-oracle stepping of the pallas inner step
    (exp-map S inside the kernel, rescale reparam between steps) == the vmap
    fallback over a multi-step rollout."""
    sc = _sph_scene(nlinks=2)
    B, nsteps = 4, 8
    rng = np.random.default_rng(6)
    s0 = State(
        q=jnp.asarray(0.3 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        qdot=jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        aux={},
    )
    step = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, use_pallas=False
    )
    sim = integrators.make_simulate(step, nsteps)
    ref = jax.jit(sim)(sc.params, integrators.bdf2_init(s0))
    assert bool(jnp.all(jnp.isfinite(ref.q)))

    s = step.bootstrap(sc.params, integrators.bdf2_init(s0))
    for _ in range(nsteps - 1):
        s = _np_inner_step(sc, CFG, sc.params, s)
    np.testing.assert_allclose(np.asarray(s.q), np.asarray(ref.q), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(s.qdot), np.asarray(ref.qdot), atol=5e-3
    )


def test_spring_rollout_matches_vmap_fallback():
    """Spring scene: numpy-oracle stepping (springs + pairwise blocks inside
    the kernel) == the vmap fallback (springs via closures + whole-system
    jacfwd blocks) over a multi-step rollout."""
    sc = _spring_scene()
    B, nsteps = 4, 8
    rng = np.random.default_rng(8)
    s0 = State(
        q=jnp.asarray(0.2 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        qdot=jnp.asarray(0.5 * rng.normal(size=(B, sc.topo.nr)), jnp.float32),
        aux={},
    )
    step = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, CFG, use_pallas=False
    )
    sim = integrators.make_simulate(step, nsteps)
    ref = jax.jit(sim)(sc.params, integrators.bdf2_init(s0))
    assert bool(jnp.all(jnp.isfinite(ref.q)))

    s = step.bootstrap(sc.params, integrators.bdf2_init(s0))
    for _ in range(nsteps - 1):
        s = _np_inner_step(sc, CFG, sc.params, s)
    np.testing.assert_allclose(np.asarray(s.q), np.asarray(ref.q), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s.qdot), np.asarray(ref.qdot), atol=2e-2
    )


def _perlane_params(sc, B, seed=0):
    """Params with per-lane I_i / h / g / contact coefficients [B, ...]
    (integrators.split_batched_params / pallas_step._perlane_keys)."""
    rng = np.random.default_rng(seed)
    params = dict(sc.params)
    params["I_i"] = jnp.asarray(
        np.asarray(sc.params["I_i"])[None]
        * (1.0 + 0.3 * rng.uniform(size=(B, 1, 1))), jnp.float32)
    params["h"] = jnp.asarray(
        float(sc.params["h"]) * (1 + 0.2 * rng.uniform(size=B)), jnp.float32)
    params["g"] = jnp.asarray(
        np.asarray(sc.params["g"])[None] * (1 + 0.1 * rng.uniform(size=(B, 1))),
        jnp.float32)
    forces = {k: dict(v) for k, v in params.get("forces", {}).items()}
    for fn in sc.force_fns:
        fp = dict(forces[fn.key])
        if "kn" in fp:
            fp["kn"] = jnp.asarray(
                float(fp["kn"]) * (1 + 0.5 * rng.uniform(size=B)), jnp.float32)
            fp["mu"] = jnp.asarray(
                float(fp["mu"]) * rng.uniform(size=B), jnp.float32)
        forces[fn.key] = fp
    if forces:
        params["forces"] = forces
    params["tau"] = jnp.asarray(
        0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    return params


def test_perlane_params_match_vmap_fallback():
    """Per-lane physical params (I_i, h, g, contact kn/mu — the system-ID /
    domain-randomization dimension): the numpy-oracle kernel solve == the
    per-lane vmapped newton reference."""
    sc = _ground_scene()
    B = 8
    params = _perlane_params(sc, B)
    assert pallas_step._perlane_keys(params, sc.force_fns) == {
        "I_i", "gh", "cp"}
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=41)

    x_np, _ = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, params, x0, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )

    hess = integrators._hess_bdf2(sc.topo, sc.force_fns)
    shared, lane = integrators.split_batched_params(params)

    def one(lp, x0i, q0i, qd0i, q1i, qd1i):
        p = integrators.merge_batched_params(shared, lp)
        theta = (p, q0i, qd0i, q1i, qd1i, {})
        res = lambda x: integrators.residual_bdf2(
            sc.topo, sc.force_fns, p, x, q0i, qd0i, q1i, qd1i, {}
        )
        return integrators.newton(res, x0i, CFG,
                                  jac_fn=lambda x: hess(theta, x))[0]

    x_ref = np.asarray(jax.jit(
        lambda lp, a, b, c, d, e: jax.vmap(one)(lp, a, b, c, d, e)
    )(lane, x0, q0, qd0, q1, qd1))
    fin = np.all(np.isfinite(x_ref), axis=-1)
    assert fin.mean() > 0.5
    np.testing.assert_array_equal(
        np.all(np.isfinite(np.asarray(x_np)), axis=-1), fin)
    np.testing.assert_allclose(
        np.asarray(x_np)[fin], x_ref[fin], rtol=0, atol=1e-4)


def test_perlane_inertia_vjp_matches_fallback():
    """System identification through the kernel pipeline: cotangents of the
    PER-LANE physical params (I_i [B,N,6], h [B]) from the production
    factor-reusing backward == the fallback implicit_solve_factored VJP."""
    sc = scene_chain(nlinks=3).compile(dtype=jnp.float32)
    B = 4
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=43)
    rng = np.random.default_rng(44)
    Ii = jnp.asarray(
        np.asarray(sc.params["I_i"])[None]
        * (1.0 + 0.3 * rng.uniform(size=(B, 1, 1))), jnp.float32)
    hB = jnp.asarray(
        float(sc.params["h"]) * (1 + 0.2 * rng.uniform(size=B)), jnp.float32)
    tau = jnp.asarray(0.1 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    xbar = jnp.asarray(rng.normal(size=(B, sc.topo.nr)), jnp.float32)

    def inner_q(step, Ii_b, h_b):
        s = Bdf2State(q=q1, qdot=qd1, q_prev=q0, qdot_prev=qd0,
                      k=jnp.ones((), jnp.int32), aux={})
        p = {**sc.params, "tau": tau, "I_i": Ii_b, "h": h_b}
        return step.inner(p, s).q

    step_f = integrators.make_bdf2_step_batched(
        sc.topo, (), CFG, differentiable=True, use_pallas=False
    )
    out_f, vjp_f = jax.vjp(lambda a, b: inner_q(step_f, a, b), Ii, hB)
    cots_f = vjp_f(xbar)

    # Production backward replicated with the numpy-oracle forward.
    params = {**sc.params, "tau": tau, "I_i": Ii, "h": hB}
    hcol = np.asarray(hB)[:, None]
    guess = q1 + hcol * qd1 + 0.5 * hcol * (qd1 - qd0)
    xstar, hinv = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, params, jnp.asarray(guess, jnp.float32),
        q0, qd0, q1, qd1, xp=np,
    )
    xstar = jnp.asarray(xstar)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(xstar), atol=5e-6)
    z = jnp.einsum("bsr,bs->br", jnp.asarray(hinv), xbar)

    def res_b(Ii_b, h_b, x):
        def one(ii, hi, ti, a, b, c, d, xi):
            p = {**sc.params, "I_i": ii, "h": hi, "tau": ti}
            return integrators.residual_bdf2(
                sc.topo, (), p, xi, a, b, c, d, {}
            )

        return jax.vmap(one)(Ii_b, h_b, tau, q0, qd0, q1, qd1, x)

    _, vjp_res = jax.vjp(lambda a, b: res_b(a, b, xstar), Ii, hB)
    cots_p = vjp_res(-z)

    for name, cf, cp in zip(["I_i", "h"], cots_f, cots_p):
        cf, cp = np.asarray(cf, np.float64), np.asarray(cp, np.float64)
        scale = max(np.abs(cf).max(), 1e-9)
        np.testing.assert_allclose(cp, cf, atol=5e-4 * scale, err_msg=name)


def _cable_scene(taut=True):
    """Revolute chain + a 4-point tension-only cable (world anchor + three
    body points) — the multi-point closure added to the kernel in r5.
    taut=False puts the cable slack (gate = 0 regime)."""

    def transl(p):
        E = np.eye(4)
        E[:3, 3] = p
        return E

    b = SceneBuilder(name="cab", h=1e-2, tEnd=0.1, grav=(0.0, 0.0, -980.0))
    for i in range(3):
        b_i = b.body_cuboid(1.0, (1.0, 0.1, 0.1), E_ji=transl([0.5, 0, 0]))
        b.joint(JointType.REVOLUTE, None if i == 0 else i - 1, b_i,
                E_pj=np.eye(4) if i == 0 else transl([1.0, 0, 0]),
                axis=(0, 1, 0) if i % 2 == 0 else (0, 0, 1))
    b.force_cable(
        [-1, 0, 1, 2],
        [[0.0, 0.5, 2.0], [0.3, 0, 0.05], [0.4, 0, 0.0], [0.2, 0, -0.05]],
        k=200.0, d=5.0, L=(0.5 if taut else 50.0),
    )
    return b.compile(dtype=jnp.float32)


def test_cable_blocks_match_jacfwd():
    """_cable_force's closed-form point-pair K/D blocks (shared tension
    couples EVERY point pair) == jacfwd of the ForceCable closure under the
    structured_hessian perturbation convention, in f64; wrench values match
    the closure exactly. Covers taut and slack regimes."""
    from redmax_tpu import se3

    for taut in (True, False):
        sc = _cable_scene(taut)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64) if hasattr(a, "astype") else a,
            sc.params,
        )
        rng = np.random.default_rng(29)
        q = jnp.asarray(0.4 * rng.normal(size=sc.topo.nr))
        qdot = jnp.asarray(rng.normal(size=sc.topo.nr))
        kin = model.forward_kinematics(sc.topo, params, q, qdot, {})
        _, _, phi = model.jacobians(sc.topo, params, kin, qdot)
        fn = sc.force_fns[0]
        N = sc.topo.njoints
        z = jnp.zeros((N, 6), dtype=jnp.float64)

        def fm_of(xi, dphi):
            kin2 = kin._replace(E_wi=kin.E_wi @ se3.exp(xi))
            _, fm = fn(params, kin2, None, phi + dphi, q, qdot)
            return fm

        K_ref = np.asarray(jax.jacfwd(fm_of, argnums=0)(z, z))
        D_ref = np.asarray(jax.jacfwd(fm_of, argnums=1)(z, z))
        fm_ref = np.asarray(fm_of(z, z))

        fp = params["forces"][fn.key]
        spec = pallas_step._cable_spec(sc.force_fns)[0]
        sts = []
        for b, xl in zip(spec["bodies"], np.asarray(fp["xls"], np.float64)):
            r = list(xl)
            if b < 0:
                sts.append((r, [0.0, 0.0, 0.0], None, None, r))
                continue
            E = np.asarray(kin.E_wi[b])
            R = [[E[i, j] for j in range(3)] for i in range(3)]
            p = [E[i, 3] for i in range(3)]
            ph = np.asarray(phi[b])
            w = list(np.cross(ph[:3], r) + ph[3:])
            x = [p[i] + sum(R[i][k] * r[k] for k in range(3))
                 for i in range(3)]
            v = [sum(R[i][k] * w[k] for k in range(3)) for i in range(3)]
            sts.append((x, v, R, w, r))
        cab = {"k": np.float64(fp["k"]), "d": np.float64(fp["d"]),
               "L": np.float64(fp["L"])}
        wrs, blocks = pallas_step._cable_force(
            sts, cab, np.float64, np, want_blocks=True)
        fm_chk = np.zeros((N, 6))
        K_chk = np.zeros((N, 6, N, 6))
        D_chk = np.zeros((N, 6, N, 6))
        for b, wr in zip(spec["bodies"], wrs):
            if wr is not None:
                fm_chk[b] += np.array(wr)
        for (pi, pj), (K, D) in blocks.items():
            K_chk[spec["bodies"][pi], :, spec["bodies"][pj], :] += np.array(K)
            D_chk[spec["bodies"][pi], :, spec["bodies"][pj], :] += np.array(D)
        if taut:
            assert np.abs(fm_ref).max() > 0
        np.testing.assert_allclose(fm_chk, fm_ref, atol=1e-9)
        np.testing.assert_allclose(K_chk, K_ref, atol=1e-8)
        np.testing.assert_allclose(D_chk, D_ref, atol=1e-9)


@pytest.mark.parametrize("taut", [True, False])
def test_cable_solve_matches_chord(taut):
    """Cable scene (taut AND slack): the numpy-oracle kernel solve == the
    vmapped chord reference."""
    sc = _cable_scene(taut)
    assert pallas_step.supports(sc.topo, sc.force_fns)
    B = 8
    x0, q0, qd0, q1, qd1 = _rand_states(sc, B, seed=47)
    x_np, _ = pallas_step.chord_bdf2_dense(
        sc.topo, CFG, sc.params, x0, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )
    x_ref, _ = jax.jit(
        lambda a, b, c, d, e: _jax_chord_solve(sc, CFG, sc.params,
                                               a, b, c, d, e)
    )(x0, q0, qd0, q1, qd1)
    x_ref = np.asarray(x_ref)
    fin = np.all(np.isfinite(x_ref), axis=-1)
    assert fin.all()
    # taut cable forces are O(1e3): f32 reassociation shows at ~1e-5 |dq|
    np.testing.assert_allclose(np.asarray(x_np), x_ref, rtol=0, atol=3e-5)
