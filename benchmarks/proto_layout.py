"""Layout experiment: batch-first [B,4,4] vs batch-last [4,4,B] on TPU.

The assembly op-soup operates on tensors whose trailing dims (4x4 SE(3)
blocks, 6-twists, 12-DOF columns) are far below the (8,128) TPU tile. If XLA
pads the minor dims to the tile, batch-first layouts waste up to 64x of the
VPU lanes and HBM transactions. This prototype measures the same math in
both layouts to decide whether a batch-last rewrite (or Pallas kernel) pays.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    B, N, R = 1024, 13, 12
    rng = np.random.default_rng(0)
    A_bf = jnp.asarray(rng.normal(size=(B, N, 4, 4)), dtype=jnp.float32)
    A_bl = jnp.transpose(A_bf, (1, 2, 3, 0))  # [N,4,4,B]
    J_bf = jnp.asarray(rng.normal(size=(B, 6 * N, R)), dtype=jnp.float32)
    J_bl = jnp.transpose(J_bf, (1, 2, 0))     # [6N,R,B]

    # --- chain of 16 4x4 matmuls (the FK doubling op) ---
    @jax.jit
    def fk_bf(A):
        E = A
        for _ in range(16):
            E = jnp.einsum("bnij,bnjk->bnik", E, A)
        return E

    @jax.jit
    def fk_bl(A):
        E = A
        for _ in range(16):
            E = jnp.einsum("nijb,njkb->nikb", E, A)
        return E

    # --- Mr = J^T (w * J), the reduced-mass contraction ---
    w_bf = jnp.abs(jnp.asarray(rng.normal(size=(B, 6 * N)), dtype=jnp.float32))
    w_bl = jnp.transpose(w_bf, (1, 0))

    @jax.jit
    def mr_bf(J, w):
        M = jnp.einsum("bmr,bm,bms->brs", J, w, J)
        return M

    @jax.jit
    def mr_bl(J, w):
        M = jnp.einsum("mrb,mb,msb->rsb", J, w, J)
        return M

    # --- 12x12 unrolled GJ inverse ---
    from redmax_tpu.linalg import gj_inverse

    H_bf = mr_bf(J_bf, w_bf) + 10.0 * jnp.eye(R)
    H_bl = jnp.transpose(H_bf, (1, 2, 0))

    vinv_bf = jax.jit(gj_inverse)

    @jax.jit
    def gj_bl(Hb):  # [n,n,B] batch-last Gauss-Jordan
        n = Hb.shape[0]
        I = jnp.broadcast_to(jnp.eye(n, dtype=Hb.dtype)[:, :, None], (n, n, Hb.shape[2]))
        M = jnp.concatenate([Hb, I], axis=1)  # [n, 2n, B]
        for k in range(n):
            piv = M[k, k][None, :]
            rowk = M[k] / piv                     # [2n, B]
            fac = M[:, k] * (1.0 - jax.nn.one_hot(k, n, dtype=Hb.dtype))[:, None]
            M = M - fac[:, None, :] * rowk[None, :, :]
            M = M.at[k].set(rowk)
        return M[:, n:]

    out = {}
    out["fk_bfirst_ms"] = timeit(fk_bf, A_bf) * 1e3
    out["fk_blast_ms"] = timeit(fk_bl, A_bl) * 1e3
    out["mr_bfirst_ms"] = timeit(mr_bf, J_bf, w_bf) * 1e3
    out["mr_blast_ms"] = timeit(mr_bl, J_bl, w_bl) * 1e3
    out["gj_bfirst_ms"] = timeit(vinv_bf, H_bf) * 1e3
    out["gj_blast_ms"] = timeit(gj_bl, H_bl) * 1e3

    # correctness cross-checks
    err_fk = jnp.abs(jnp.transpose(fk_bl(A_bl), (3, 0, 1, 2)) - fk_bf(A_bf)).max()
    err_mr = jnp.abs(jnp.transpose(mr_bl(J_bl, w_bl), (2, 0, 1)) - mr_bf(J_bf, w_bf)).max()
    err_gj = jnp.abs(jnp.transpose(gj_bl(H_bl), (2, 0, 1)) - vinv_bf(H_bf)).max()
    out["max_rel_err"] = float(max(err_fk, err_mr, err_gj))
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
