"""Stage-level timing inside one residual evaluation (bench config, TPU).

Cumulative slices of the residual pipeline — fk, +jacobians, +forces,
+full residual — plus reparam, isolating which stage owns the time.
"""

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


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


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

    def fk(qq, qdd):
        return model.forward_kinematics(topo, params, qq, qdd, None).E_wi

    def fkj(qq, qdd):
        kin = model.forward_kinematics(topo, params, qq, qdd, None)
        J, Jdot, phi = model.jacobians(topo, params, kin, qdd)
        return J.sum() + Jdot.sum() + phi.sum()

    def fkjf(qq, qdd):
        kin = model.forward_kinematics(topo, params, qq, qdd, None)
        J, Jdot, phi = model.jacobians(topo, params, kin, qdd)
        fr = model.joint_space_force(topo, params, qq, qdd)
        fm = model.maximal_force(topo, params, kin, phi)
        return J.sum() + Jdot.sum() + fr.sum() + fm.sum()

    def asm(qq, qdd):
        M, f, _ = model.assemble(topo, params, qq, qdd, (), None)
        return M.sum() + f.sum()

    def res(qq, qdd):
        return residual_bdf2(topo, (), params, qq, qq, qdd, qq, qdd, None)

    def rep(qq, qdd):
        out = model.reparam_all(topo, params, qq, qdd, None)
        return out[0].sum() + out[1].sum()

    for name, fn in [("fk", fk), ("fk+jac", fkj), ("fk+jac+forces", fkjf),
                     ("assemble(M,f)", asm), ("residual", res),
                     ("reparam", rep)]:
        t = timeit(jax.jit(jax.vmap(fn)), q, qd)
        print(f"{name:16s}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
