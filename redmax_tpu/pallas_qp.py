"""Fused Pallas TPU kernel for the batched dual-PGS contact QP.

qp.qp_pgs_batched runs the dual setup (H^{-1}f, H^{-1}A^T, D = A H^{-1}A^T)
as batched XLA dense algebra and the Gauss-Seidel sweep as ~iters*m
sequential [B]-wide XLA ops; at contact-scale shapes (n, m <= ~16) that is
launch/latency-bound, not flop-bound (benchmarks/bench_qp.json: 24.8 us/
solve measured vs 3.6 us sweep-at-VPU-peak). This kernel applies the same
layout decision as pallas_step: the BATCH is the tile — every scalar of H,
A, f, lambda is an (8,128) lane block — and the ENTIRE dual solve
(unrolled branch-free Gauss-Jordan inverse of H, the A H^{-1} A^T setup,
`iters` unrolled GS sweeps with per-row box projection, and the primal
recovery x = H^{-1}(f - A^T lambda)) runs as ONE pallas_call with (n, m,
iters) unrolled at trace time.

Numerics match qp.qp_pgs / qp_pgs_batched up to f32 reassociation (same
update order, same projection boxes, same reg guard) — gated against the
vmapped reference in tests/test_linalg.py via the numpy oracle
(dual_pgs_dense: the IDENTICAL kernel code on [B] vectors, the
pallas_step.chord_bdf2_dense pattern).

Reference role: the quadprog calls of the euler/SP paths
(matlab/testRedMax.m:513-530 — unilateral rows; :682-697 — boxed friction
rows), batched over scenes. The row order and projection semantics are
qp.qp_pgs's; see that docstring for the row-type encoding.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = (8, 128)
TILE = LANES[0] * LANES[1]


def _build_kernel(n: int, m: int, iters: int, reg: float,
                  lanes: Tuple[int, ...] = LANES, xp=jnp):
    """Trace-time construction; (n, m, iters) static, fully unrolled."""

    def kernel(H_ref, f_ref, A_ref, b_ref, lo_ref, hi_ref,
               x_out_ref, lam_out_ref):
        H = [[H_ref[i * n + j] for j in range(n)] for i in range(n)]
        f = [f_ref[i] for i in range(n)]
        A = [[A_ref[i * n + j] for j in range(n)] for i in range(m)]
        b = [b_ref[i] for i in range(m)]
        lo = [lo_ref[i] for i in range(m)]
        hi = [hi_ref[i] for i in range(m)]

        # H^{-1} by unrolled branch-free Gauss-Jordan (pallas_step pattern;
        # Mrtilde is SPD at physical timesteps, so no pivoting).
        M = [list(H[i]) + [1.0 if i == j else 0.0 for j in range(n)]
             for i in range(n)]
        for k in range(n):
            inv_p = 1.0 / M[k][k]
            rowk = [M[k][j] * inv_p for j in range(2 * n)]
            for i in range(n):
                if i == k:
                    continue
                fac = M[i][k]
                M[i] = [M[i][j] - fac * rowk[j] for j in range(2 * n)]
            M[k] = rowk
        Hinv = [[M[i][n + j] for j in range(n)] for i in range(n)]

        Hf = [sum(Hinv[i][k] * f[k] for k in range(n)) for i in range(n)]
        # HinvAT[:, r] = H^{-1} A[r, :]^T
        HAT = [[sum(Hinv[i][k] * A[r][k] for k in range(n)) for r in range(m)]
               for i in range(n)]
        D = [[sum(A[i][k] * HAT[k][j] for k in range(n)) for j in range(m)]
             for i in range(m)]
        r = [sum(A[i][k] * Hf[k] for k in range(n)) - b[i] for i in range(m)]
        diag = [D[i][i] for i in range(m)]
        safe = [xp.where(xp.abs(diag[i]) < reg, 1.0, diag[i])
                for i in range(m)]

        lam = [xp.zeros(lanes, dtype=H_ref.dtype) + 0.0 for _ in range(m)]
        for _ in range(iters):
            for i in range(m):
                resid = r[i] - sum(D[i][j] * lam[j] for j in range(m)) \
                    + diag[i] * lam[i]
                lam[i] = xp.minimum(xp.maximum(resid / safe[i], lo[i]), hi[i])

        for i in range(n):
            xi = Hf[i] - sum(HAT[i][j] * lam[j] for j in range(m))
            x_out_ref[i] = xp.broadcast_to(xi, lanes).astype(H_ref.dtype)
        for i in range(m):
            lam_out_ref[i] = xp.broadcast_to(lam[i], lanes).astype(H_ref.dtype)

    return kernel


class _Ref:
    def __init__(self, a):
        self.a = a
        self.dtype = a.dtype

    def __getitem__(self, i):
        return self.a[i]


class _Out:
    def __init__(self, shape, dtype, xp):
        self.a = xp.zeros(shape, dtype)
        self._np = xp is np

    def __setitem__(self, i, v):
        if self._np:
            self.a[i] = v
        else:
            self.a = self.a.at[i].set(v)


def dual_pgs_dense(H, f, A, b, lo, hi, iters: int = 40, reg: float = 1e-10,
                   xp=np):
    """The EXACT kernel computation on plain [B] lane vectors (numpy by
    default — executes the unrolled graph eagerly, the parity oracle)."""
    B, n = f.shape
    m = A.shape[1]
    if xp is np:
        H, f, A, b, lo, hi = (np.asarray(a, np.float32)
                              for a in (H, f, A, b, lo, hi))
    kernel = _build_kernel(n, m, iters, reg, lanes=(B,), xp=xp)
    t = lambda a, P: _Ref(xp.ascontiguousarray(
        a.reshape(B, P).T) if xp is np else a.reshape(B, P).T)
    ox = _Out((n, B), H.dtype, xp)
    ol = _Out((m, B), H.dtype, xp)
    kernel(t(H, n * n), t(f, n), t(A, m * n), t(b, m), t(lo, m), t(hi, m),
           ox, ol)
    return ox.a.T, ol.a.T


def make_dual_pgs(n: int, m: int, iters: int = 40, reg: float = 1e-10,
                  interpret: bool = None, impl: str = "pallas"):
    """Fused batched dual-PGS solve(H [B,n,n], f, A [B,m,n], b, lo, hi)
    -> (x [B,n], lam [B,m]). B is padded to a multiple of 1024 internally.

    impl: "pallas" (TPU kernel) or "dense" (same kernel code as jittable
    JAX on [B] vectors)."""
    if impl == "dense":
        return partial(dual_pgs_dense, iters=iters, reg=reg, xp=jnp)
    kernel = _build_kernel(n, m, iters, reg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def solve(H, f, A, b, lo, hi):
        dtype = jnp.float32
        B = f.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        G = Bp // TILE

        def tiles(a, P):
            a = a.reshape(B, P).astype(dtype)
            if Bp != B:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (Bp - B, P))], axis=0)
            return a.T.reshape(P, G * LANES[0], LANES[1])

        def spec(P):
            return pl.BlockSpec((P, LANES[0], LANES[1]), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)

        ox, ol = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[spec(n * n), spec(n), spec(m * n), spec(m), spec(m),
                      spec(m)],
            out_specs=[spec(n), spec(m)],
            out_shape=[
                jax.ShapeDtypeStruct((n, G * LANES[0], LANES[1]), dtype),
                jax.ShapeDtypeStruct((m, G * LANES[0], LANES[1]), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(tiles(H, n * n), tiles(f, n), tiles(A, m * n), tiles(b, m),
          tiles(lo, m), tiles(hi, m))
        x = ox.reshape(n, Bp).T[:B]
        lam = ol.reshape(m, Bp).T[:B]
        return x, lam

    return solve
