"""Clean per-stage costs: scan K repetitions of each stage inside ONE jit,
so dispatch overhead amortizes and XLA cannot hoist the work (carry chains
each iteration through the input)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_bench")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 50


def scan_time(fn, q, qd, reps=5):
    """fn: (q, qd) -> scalar-ish pytree; chained K times inside one jit."""

    @jax.jit
    def loop(q, qd):
        def body(c, _):
            qq, qdd = c
            out = fn(qq, qdd)
            # fold output back into the carry so iterations are serialized
            qq = qq + 1e-20 * out[..., None]
            return (qq, qdd), None

        (qf, _), _ = jax.lax.scan(body, (q, qd), None, length=K)
        return qf

    out = loop(q, qd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(q, qd)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / K


def main():
    from redmax_tpu import model
    from redmax_tpu.integrators import residual_bdf2
    from redmax_tpu.scenes import scene_chain

    nlinks, B = 12, 1024
    dtype = jnp.float32
    sc = scene_chain(nlinks=nlinks).compile(dtype=dtype)
    topo, params = sc.topo, sc.params

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 0.3, size=(B, topo.nr)), dtype)
    qd = jnp.asarray(rng.normal(0, 0.3, size=(B, topo.nr)), dtype)

    def fk_kernels_only(qq, qdd):
        # per-type joint kernels + scatter, no world chain: replicate the
        # front half of forward_kinematics
        kin = model.forward_kinematics(topo, params, qq, qdd, None)
        return kin.Q[..., 0, 0].sum(-1)

    def fk(qq, qdd):
        kin = model.forward_kinematics(topo, params, qq, qdd, None)
        return kin.E_wi[..., 0, 0].sum(-1) + kin.S[..., 0, 0].sum(-1)

    def fkj(qq, qdd):
        kin = model.forward_kinematics(topo, params, qq, qdd, None)
        J, Jdot, phi = model.jacobians(topo, params, kin, qdd)
        return J.sum((-2, -1)) + Jdot.sum((-2, -1)) + phi.sum((-2, -1))

    def res(qq, qdd):
        return residual_bdf2(topo, (), params, qq, qq, qdd, qq, qdd, None).sum(-1)

    def rep(qq, qdd):
        out = model.reparam_all(topo, params, qq, qdd, None)
        return out[0].sum(-1) + out[1].sum(-1)

    for name, f in [("fk_Q_only", fk_kernels_only), ("fk_full", fk),
                    ("fk+jac", fkj), ("residual", res), ("reparam", rep)]:
        vf = jax.vmap(f)
        t = scan_time(vf, q, qd)
        print(f"{name:12s}: {t*1e3:8.4f} ms/call")


if __name__ == "__main__":
    main()
