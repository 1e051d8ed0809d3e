"""On-TPU plumbing gate for the fused Pallas kernel (VERDICT r3 weak #3).

tests/test_pallas_step.py proves the kernel MATH against the numpy oracle;
this file proves the pallas PLUMBING — BlockSpecs, lane tiling/padding,
grid, VMEM budget, Mosaic lowering — by running the hardware kernel on the
real TPU and diffing it against the same oracle. A layout or Mosaic
regression fails here instead of silently reaching the next BENCH round.

Run (the normal CPU gate auto-skips these):
    REDMAX_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -n 0 -q
The env var makes conftest.py leave the axon TPU registration in place
(platform stays tpu, f32). Run it before bench.py in the round script.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="pallas hardware plumbing needs the real TPU"),
]


def _states(sc, B, seed=1):
    rng = np.random.default_rng(seed)
    nr = sc.topo.nr
    f32 = jnp.float32
    q1 = jnp.asarray(0.3 * rng.normal(size=(B, nr)), f32)
    qd1 = jnp.asarray(rng.normal(size=(B, nr)), f32)
    q0 = q1 - 0.01 * qd1
    qd0 = qd1 + jnp.asarray(0.05 * rng.normal(size=(B, nr)), f32)
    x0 = q1 + 0.01 * qd1
    return x0, q0, qd0, q1, qd1


@pytest.mark.parametrize("scene", ["chain", "ground"])
def test_hardware_kernel_matches_numpy_oracle(scene):
    """pl.pallas_call on the TPU == chord_bdf2_dense(xp=np), solution and
    materialized H^-1, including the pad-to-1024 lane path (B=256)."""
    from redmax_tpu import integrators, pallas_step
    from redmax_tpu.scenes import scene_chain, scene_chain_ground

    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    sc = (scene_chain(nlinks=4) if scene == "chain"
          else scene_chain_ground(nlinks=3, floor_z=-0.02, kn=1e3, kt=50.0,
                                  kd=10.0, mu=0.5)).compile(dtype=jnp.float32)
    B = 256  # exercises the pad-and-slice wrapper (Bp = 1024)
    x0, q0, qd0, q1, qd1 = _states(sc, B)

    solve_hw = pallas_step.make_chord_bdf2(
        sc.topo, cfg, interpret=False, force_fns=sc.force_fns
    )
    x_hw, h_hw = jax.jit(solve_hw)(sc.params, x0, q0, qd0, q1, qd1)
    x_hw, h_hw = np.asarray(x_hw), np.asarray(h_hw)

    x_np, h_np = pallas_step.chord_bdf2_dense(
        sc.topo, cfg, sc.params, x0, q0, qd0, q1, qd1, xp=np,
        force_fns=sc.force_fns,
    )

    finite = np.all(np.isfinite(x_np), axis=-1)
    assert finite.mean() > 0.5, "workload degenerated — most lanes diverged"
    np.testing.assert_array_equal(np.all(np.isfinite(x_hw), axis=-1), finite)
    if scene == "chain":
        np.testing.assert_allclose(x_hw[finite], x_np[finite], rtol=0,
                                   atol=5e-6)
        scale = float(np.abs(h_np[finite]).max())
        np.testing.assert_allclose(h_hw[finite], h_np[finite],
                                   atol=2e-5 * scale)
    else:
        # Contact masks (active = d<=0, static regime) flip under f32
        # reassociation when a corner sits within rounding of the threshold;
        # a flipped lane legitimately takes a different (still convergent)
        # chord path. Gate: the bulk at f32-reassociation level, flipped
        # lanes bounded. (Measured on v5e: ~1% of elements, max ~2e-3.)
        d = np.abs(x_hw[finite] - x_np[finite])
        assert (d > 5e-6).mean() < 0.05, (d > 5e-6).mean()
        assert d.max() < 1e-2, d.max()
        scale = float(np.abs(h_np[finite]).max())
        dh = np.abs(h_hw[finite] - h_np[finite]) / scale
        assert (dh > 2e-5).mean() < 0.05, (dh > 2e-5).mean()
        assert dh.max() < 1e-2, dh.max()


def test_hardware_kernel_in_batched_step():
    """make_bdf2_step_batched routed through the hardware kernel == the
    vmapped XLA fallback for one inner BDF2 step on the TPU (f32-level
    agreement; the kernel is typically the MORE accurate side)."""
    from redmax_tpu import integrators
    from redmax_tpu.integrators import Bdf2State
    from redmax_tpu.scenes import scene_chain

    cfg = integrators.NewtonConfig(
        fixed_iters=3, predictor="quadratic", chord=True,
        hessian="structured", linsolve="gj",
    )
    sc = scene_chain(nlinks=4).compile(dtype=jnp.float32)
    B = 128
    x0, q0, qd0, q1, qd1 = _states(sc, B, seed=3)
    s = Bdf2State(q=q1, qdot=qd1, q_prev=q0, qdot_prev=qd0,
                  k=jnp.ones((), jnp.int32), aux={})

    step_hw = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, cfg, use_pallas=True, interpret=False
    )
    step_ref = integrators.make_bdf2_step_batched(
        sc.topo, sc.force_fns, cfg, use_pallas=False
    )
    out_hw = jax.jit(step_hw.inner)(sc.params, s)
    out_ref = jax.jit(step_ref.inner)(sc.params, s)
    q_hw, q_ref = np.asarray(out_hw.q), np.asarray(out_ref.q)
    finite = np.all(np.isfinite(q_ref), axis=-1)
    assert finite.mean() > 0.5
    # The fallback's einsum contractions go through the MXU at bf16 input
    # precision (the kernel side is true-f32 VPU — pallas_ablation.py
    # measures it ~4 digits closer to an f64 oracle), so agreement here is
    # bounded by the FALLBACK's own rounding, not the kernel's.
    np.testing.assert_allclose(q_hw[finite], q_ref[finite], rtol=0, atol=5e-3)
