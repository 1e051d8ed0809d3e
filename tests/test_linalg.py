"""Batched small-matrix solver tier (linalg.py).

The GJ inverse replaces XLA LU in the Newton chord path and the adjoint
transposed backward solve (driverRedMaxBDF1.m:117 H\\g and TaskBDF1.m:66
z = H^T\\y). These tests pin (a) algebraic correctness vs LAPACK in f64,
(b) pivoting on matrices unpivoted GJ cannot handle, and (c) end-to-end
integrator/gradient parity between the "lu" and "gj" configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu.linalg import gj_inverse, gj_solve, linsolve, make_solver


def test_gj_inverse_matches_lapack():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(64, 12, 12)))
    A = A @ jnp.swapaxes(A, -1, -2) + 3.0 * jnp.eye(12)
    err = jnp.abs(gj_inverse(A) - jnp.linalg.inv(A)).max()
    assert err < 1e-10


def test_gj_pivot_handles_zero_leading_pivot():
    # Row-permuted diagonal matrix: A[k,k] = 0 exactly, so unpivoted GJ
    # divides by zero while partial pivoting recovers the exact inverse.
    rng = np.random.default_rng(1)
    P = np.eye(6)[::-1]  # reversal permutation
    d = 1.0 + rng.random((8, 6))
    A = jnp.asarray(P[None] * d[:, :, None])
    X = gj_inverse(A, pivot=True)
    err = jnp.abs(X @ A - jnp.eye(6)).max()
    assert err < 1e-8
    assert not bool(jnp.isfinite(gj_inverse(A, pivot=False)).all())


def test_gj_solve_vector_and_matrix_rhs():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(16, 8, 8))) + 4.0 * jnp.eye(8)
    b = jnp.asarray(rng.normal(size=(16, 8)))
    Bm = jnp.asarray(rng.normal(size=(16, 8, 3)))
    assert jnp.abs(gj_solve(A, b) - jnp.linalg.solve(A, b[..., None])[..., 0]).max() < 1e-10
    assert jnp.abs(gj_solve(A, Bm) - jnp.linalg.solve(A, Bm)).max() < 1e-10
    assert jnp.abs(linsolve(A, b, "gj") - linsolve(A, b, "lu")).max() < 1e-10


def test_solver_transpose_path():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(4, 10, 10))) + 5.0 * jnp.eye(10)
    b = jnp.asarray(rng.normal(size=(4, 10)))
    for method in ("lu", "gj", "gj_pivot"):
        factor, solve, solve_T = make_solver(method)
        if method == "lu":
            lu, piv = jax.vmap(factor)(A)
            x = jax.vmap(lambda l, p, bb: solve((l, p), bb))(lu, piv, b)
            xt = jax.vmap(lambda l, p, bb: solve_T((l, p), bb))(lu, piv, b)
        else:
            F = factor(A)
            x, xt = solve(F, b), solve_T(F, b)
        ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        refT = jnp.linalg.solve(jnp.swapaxes(A, -1, -2), b[..., None])[..., 0]
        assert jnp.abs(x - ref).max() < 1e-9, method
        assert jnp.abs(xt - refT).max() < 1e-9, method


@pytest.mark.parametrize("method", ["gj", "gj_pivot"])
def test_bdf2_rollout_parity_lu_vs_gj(method):
    """The chord-Newton solution is pinned by the exact residual, so swapping
    the linear-solve kernel must not move the trajectory."""
    from redmax_tpu import integrators
    from redmax_tpu.scenes import scene_00_serial_chain

    sc = scene_00_serial_chain().compile()
    qs = {}
    for m in ("lu", method):
        cfg = integrators.NewtonConfig(
            fixed_iters=4, chord=True, hessian="structured", linsolve=m
        )
        step = integrators.make_bdf2_step(sc.topo, sc.force_fns, cfg)
        sim = jax.jit(integrators.make_simulate(step, 50))
        qs[m] = sim(sc.params, integrators.bdf2_init(sc.initial_state("bdf2"))).q
    assert jnp.abs(qs[method] - qs["lu"]).max() < 1e-10


def test_adjoint_gradient_parity_lu_vs_gj():
    """The implicit-function VJP backward solve (H^-T xbar) via the GJ path
    must reproduce the LU-path gradient."""
    from redmax_tpu import integrators, mpc
    from redmax_tpu.scenes import scene_00_serial_chain

    sc = scene_00_serial_chain().compile()
    task = mpc.PointPosTask(body=4, wp=1.0, wreg=1e-6, pscale=1e3)
    tgt = jnp.array([0.5, 0.0, 0.0])
    grads = {}
    for m in ("lu", "gj"):
        cfg = integrators.NewtonConfig(
            fixed_iters=4, chord=True, hessian="structured", linsolve=m
        )
        obj = mpc.make_objective(sc.topo, sc.force_fns, task, tgt, 10, "bdf2", cfg)
        p0 = jnp.zeros(sc.topo.nr)
        grads[m] = jax.grad(obj, argnums=1)(
            sc.params, p0, sc.initial_state("bdf2"), tgt
        )
    rel = jnp.abs(grads["gj"] - grads["lu"]).max() / jnp.abs(grads["lu"]).max()
    assert rel < 1e-12


def test_qp_pgs_batched_matches_vmap():
    """qp.qp_pgs_batched (lanes = scenes, rows unrolled) == jax.vmap(qp_pgs)
    lane-for-lane on random QPs with equality + inequality + boxed rows."""
    import numpy as np

    from redmax_tpu.qp import qp_pgs, qp_pgs_batched

    rng = np.random.default_rng(5)
    B, n, me, mi, mb = 6, 8, 2, 3, 2
    m = me + mi + mb
    Q = rng.normal(size=(B, n, n))
    H = jnp.asarray(Q @ np.transpose(Q, (0, 2, 1)) + 3.0 * np.eye(n))
    f = jnp.asarray(rng.normal(size=(B, n)))
    A = jnp.asarray(rng.normal(size=(B, m, n)))
    b = jnp.asarray(rng.normal(size=(B, m)))
    inf = np.inf
    box = np.abs(rng.normal(size=(B, mb)))
    lo = jnp.asarray(np.concatenate(
        [np.full((B, me), -inf), np.zeros((B, mi)), -box], axis=1))
    hi = jnp.asarray(np.concatenate(
        [np.full((B, me), inf), np.full((B, mi), inf), box], axis=1))

    x_b, lam_b = jax.jit(lambda *a: qp_pgs_batched(*a, iters=60))(
        H, f, A, b, lo, hi)
    x_v, lam_v = jax.jit(jax.vmap(lambda *a: qp_pgs(*a, iters=60)))(
        H, f, A, b, lo, hi)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_v), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(lam_b), np.asarray(lam_v), atol=1e-10)


def test_pallas_qp_oracle_matches_vmap():
    """pallas_qp.dual_pgs_dense (the numpy oracle of the fused QP kernel —
    identical kernel code) == jax.vmap(qp_pgs) on random QPs with
    equality + inequality + boxed rows."""
    import numpy as np

    from redmax_tpu import pallas_qp
    from redmax_tpu.qp import qp_pgs

    rng = np.random.default_rng(11)
    B, n, me, mi, mb = 5, 6, 1, 4, 3
    m = me + mi + mb
    Q = rng.normal(size=(B, n, n)).astype(np.float32)
    H = Q @ np.transpose(Q, (0, 2, 1)) + 3.0 * np.eye(n, dtype=np.float32)
    f = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(B, m, n)).astype(np.float32)
    b = rng.normal(size=(B, m)).astype(np.float32)
    inf = np.float32(np.inf)
    box = np.abs(rng.normal(size=(B, mb))).astype(np.float32)
    lo = np.concatenate(
        [np.full((B, me), -inf), np.zeros((B, mi), np.float32), -box], axis=1)
    hi = np.concatenate(
        [np.full((B, me), inf), np.full((B, mi), inf), box], axis=1)

    x_np, lam_np = pallas_qp.dual_pgs_dense(H, f, A, b, lo, hi, iters=60)
    x_v, lam_v = jax.jit(jax.vmap(lambda *a: qp_pgs(*a, iters=60)))(
        *(jnp.asarray(a) for a in (H, f, A, b, lo, hi)))
    scale = float(np.abs(np.asarray(x_v)).max())
    np.testing.assert_allclose(np.asarray(x_np), np.asarray(x_v),
                               atol=2e-5 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(lam_np), np.asarray(lam_v),
                               atol=2e-4 * max(1.0, float(np.abs(np.asarray(lam_v)).max())))
