"""Prototype: unrolled Gauss-Jordan batched small-matrix inverse vs XLA LU.

The Newton chord path factors B x (nr x nr) matrices (nr ~ 12). XLA's LU on
TPU lowers to a sequential pivoting loop (~4.6 ms for B=1024, nr=12); a
branch-free unrolled Gauss-Jordan is pure elementwise work XLA can fuse.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gj_inverse(A, pivot=False):
    """Batched inverse by unrolled Gauss-Jordan. A: [..., n, n]."""
    n = A.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, I], axis=-1)  # [..., n, 2n]
    for k in range(n):
        if pivot:
            # branchless partial pivoting: swap row k with argmax |M[k:,k]|
            col = jnp.abs(M[..., :, k])
            mask = jnp.arange(n) >= k
            col = jnp.where(mask, col, -jnp.inf)
            p = jnp.argmax(col, axis=-1)  # [...]
            onek = jax.nn.one_hot(jnp.full(p.shape, k), n, dtype=A.dtype)
            onep = jax.nn.one_hot(p, n, dtype=A.dtype)
            rk = jnp.einsum("...r,...rc->...c", onep, M)
            rp = jnp.einsum("...r,...rc->...c", onek, M)
            M = M + onek[..., None] * (rk - rp)[..., None, :] \
                  + onep[..., None] * (rp - rk)[..., None, :]
        piv = M[..., k, k][..., None]              # [..., 1]
        rowk = M[..., k, :] / piv                  # [..., 2n]
        fac = M[..., :, k]                         # [..., n]
        fac = fac * (1.0 - jax.nn.one_hot(k, n, dtype=A.dtype))
        M = M - fac[..., None] * rowk[..., None, :]
        M = M.at[..., k, :].set(rowk)
    return M[..., :, n:]


def timeit(fn, *args, reps=50):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    B, n = 1024, 12
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, n, n)), dtype=jnp.float32)
    A = A @ jnp.swapaxes(A, -1, -2) + 3.0 * jnp.eye(n)  # well-conditioned
    b = jnp.asarray(rng.normal(size=(B, n)), dtype=jnp.float32)

    inv_gj = jax.jit(partial(gj_inverse, pivot=False))
    inv_gjp = jax.jit(partial(gj_inverse, pivot=True))
    lu_fac = jax.jit(jax.vmap(jax.scipy.linalg.lu_factor))
    x_inv = jax.jit(lambda A, b: jnp.einsum("bij,bj->bi", gj_inverse(A), b))
    x_ref = jax.jit(lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0])

    err = jnp.abs(inv_gj(A) @ A - jnp.eye(n)).max()
    errp = jnp.abs(inv_gjp(A) @ A - jnp.eye(n)).max()
    xerr = jnp.abs(x_inv(A, b) - x_ref(A, b)).max() / jnp.abs(x_ref(A, b)).max()
    print(f"GJ inverse residual: {err:.2e}  pivoted: {errp:.2e}  solve rel: {xerr:.2e}")

    print(f"gj_inverse (no pivot): {timeit(inv_gj, A)*1e3:7.3f} ms")
    print(f"gj_inverse (pivoted):  {timeit(inv_gjp, A)*1e3:7.3f} ms")
    print(f"lu_factor:             {timeit(lu_fac, A)*1e3:7.3f} ms")
    print(f"linalg.solve:          {timeit(x_ref, A, b)*1e3:7.3f} ms")
    print(f"gj-inv matvec solve:   {timeit(x_inv, A, b)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
