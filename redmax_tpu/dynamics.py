"""Derivative-level dynamics API: M, f, dMdq, K, D.

The reference hand-derives these tensors (computeValues,
driverRedMaxBDF1.m:190-243; K/D/dMdq contractions at :212-242). Here they are
exact forward-mode derivatives of the value-level assembly:

    K    = df/dq   (at fixed qdot)
    D    = df/dqdot
    dMdq = dM/dq   [nr, nr, nr], dMdq[:, :, i] = dM/dq_i

which equal the reference's analytic expressions (the reference's are the
same chain rule carried out by hand). These are exposed for tests and for
integrators that want the split form; the Newton path in integrators.py
differentiates the residual directly instead (one fused jacfwd).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from redmax_tpu.model import assemble
from redmax_tpu.types import Topology


def compute_Mf(topo: Topology, params: Dict, q, qdot, force_fns: Tuple = (), aux=None):
    M, f, _ = assemble(topo, params, q, qdot, force_fns, aux)
    return M, f


def compute_values(topo: Topology, params: Dict, q, qdot, force_fns: Tuple = (), aux=None):
    """Full (M, f, dMdq, K, D) — the implicit-integrator quintuple."""
    M, f, _ = assemble(topo, params, q, qdot, force_fns, aux)

    def Mf_q(qq):
        Mq, fq, _ = assemble(topo, params, qq, qdot, force_fns, aux)
        return Mq, fq

    def f_qdot(qd):
        _, fd, _ = assemble(topo, params, q, qd, force_fns, aux)
        return fd

    dMdq, K = jax.jacfwd(Mf_q)(q)        # [nr,nr,nr], [nr,nr]
    D = jax.jacfwd(f_qdot)(qdot)         # [nr,nr]
    return M, f, dMdq, K, D
