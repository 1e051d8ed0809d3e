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


def test_pcg_schur_loop_constraint_matches_dense_kkt():
    """Schur-complement loop-closure path (Solver.cpp:654-746) vs the dense
    KKT euler solve — same system, so qdot1 must agree to CG tolerance.
    The reference's per-row OpenMP PCG fan-out is one vmapped batched CG."""
    from redmax_tpu.scenes_matlab import build_mscene

    sc = build_mscene(15)  # slider-crank loop: ConstraintLoop (2 eq-M rows)
    solve = pcg.make_euler_pcg_constrained_solver(
        sc.topo, sc.force_fns, sc.constraint_fns, tol=1e-12
    )
    qdot1, lam, res = solve(sc.params, sc.state0.q, sc.state0.qdot)

    step = integrators.make_euler_step(sc.topo, sc.force_fns, sc.constraint_fns)
    s1 = step(sc.params, sc.state0)
    assert float(jnp.abs(qdot1 * sc.params["h"] + sc.state0.q - s1.q).max()) < 1e-8
    assert lam.shape == (2,)


def test_pcg_step_trajectory_matches_dense():
    """Full PCG-tier euler stepping (velocity solve + position update +
    reparam) tracks the dense euler step over a short trajectory."""
    import jax

    from redmax_tpu.scenes_matlab import build_mscene

    sc = build_mscene(15)
    nsteps = 20
    dense = integrators.make_euler_step(sc.topo, sc.force_fns, sc.constraint_fns)
    tier = pcg.make_euler_pcg_step(
        sc.topo, sc.force_fns, sc.constraint_fns, tol=1e-12
    )
    sim_d = jax.jit(integrators.make_simulate(dense, nsteps))
    sim_t = jax.jit(integrators.make_simulate(tier, nsteps))
    fd = sim_d(sc.params, sc.state0)
    ft = sim_t(sc.params, sc.state0)
    assert float(jnp.abs(fd.q - ft.q).max()) < 1e-6
    assert float(jnp.abs(fd.qdot - ft.qdot).max()) < 1e-5


def test_schur_rows_sharded_over_model_axis_bit_identical():
    """The per-row CG fan-out sharded over the "model" mesh axis (the
    device-parallel form of the reference's OpenMP row loop, Solver.cpp:714)
    must return BIT-IDENTICAL results to the single-device solve: each row's
    CG is an independent program and the Schur algebra is unchanged."""
    import numpy as np

    from redmax_tpu import parallel
    from redmax_tpu.scenes_matlab import build_mscene

    sc = build_mscene(15)  # slider-crank loop: 2 eq-M rows -> 3 CG RHS
    mesh = parallel.make_mesh(8, model=2)
    ref = pcg.make_euler_pcg_constrained_solver(
        sc.topo, sc.force_fns, sc.constraint_fns, tol=1e-12
    )
    shd = pcg.make_euler_pcg_constrained_solver(
        sc.topo, sc.force_fns, sc.constraint_fns, tol=1e-12, mesh=mesh
    )
    qdot_r, lam_r, res_r = ref(sc.params, sc.state0.q, sc.state0.qdot)
    qdot_s, lam_s, res_s = shd(sc.params, sc.state0.q, sc.state0.qdot)
    np.testing.assert_array_equal(np.asarray(qdot_s), np.asarray(qdot_r))
    np.testing.assert_array_equal(np.asarray(lam_s), np.asarray(lam_r))
    np.testing.assert_array_equal(np.asarray(res_s.x), np.asarray(res_r.x))
    assert np.array_equal(np.asarray(res_s.iters), np.asarray(res_r.iters))

    # and through the full step factory
    step_r = pcg.make_euler_pcg_step(sc.topo, sc.force_fns, sc.constraint_fns,
                                     tol=1e-12)
    step_s = pcg.make_euler_pcg_step(sc.topo, sc.force_fns, sc.constraint_fns,
                                     tol=1e-12, mesh=mesh)
    s_r = step_r(sc.params, sc.state0)
    s_s = step_s(sc.params, sc.state0)
    np.testing.assert_array_equal(np.asarray(s_s.q), np.asarray(s_r.q))
