"""Force modules: point springs, spring-dampers, cables, ground contact.

The reference Force hierarchy (matlab-diff/+redmax/Force*.m) accumulates
(fr, fm) plus hand-derived stiffness/damping blocks (Kr, Km, Dr, Dm). Here a
force is a pure closure

    fn(params, kin, J, phi, q, qdot) -> (fr_add [nr], fm_add [N, 6])

registered on the compiled scene; K/D blocks come from autodiff of the
assembly (dynamics.compute_values), so force authors write values only.
Each force type also exposes .energy(params, kin, q, qdot) for the potential
used by the energy certificates.

Body points: a point r (body frame) on body b has world position
x = E_wi[b] @ [r;1] and world velocity xdot = R_wi[b] Gamma(r) phi[b]
(se3.Gamma, notes.pdf 1.2). Wrenches scatter back with Gamma^T.
"""

from typing import Dict, NamedTuple

import jax.numpy as jnp

from redmax_tpu import se3


class _ForceBase:
    """Force closure with a param slot in params['forces'][self.key]."""

    def __init__(self, key: str):
        self.key = key

    def p(self, params: Dict) -> Dict:
        return params["forces"][self.key]


def _point_state(kin, phi, b: int, r):
    """World position and velocity of body-frame point r on body b."""
    E = kin.E_wi[b]
    R = E[:3, :3]
    x = R @ r + E[:3, 3]
    G = se3.Gamma(r)                 # [3,6]
    v = R @ (G @ phi[b])
    return x, v, R, G


class ForcePointPoint(_ForceBase):
    """Zero-rest-length spring+damper between points on two bodies.

    Reference: matlab-diff/+redmax/ForcePointPoint.m:48-141. Force law
      f = k (xB - xA) + d (vB - vA)
    applied at each attachment point as a body wrench Gamma^T R^T f.
    params: {"bodyA": int static, "bodyB": int static} on self;
    array params: xlA [3], xlB [3], k [], d [].
    """

    def __init__(self, key, bodyA: int, bodyB: int):
        super().__init__(key)
        self.bodyA = bodyA  # -1 means world-fixed point (xlA in world frame)
        self.bodyB = bodyB

    def _ends(self, params, kin, phi):
        fp = self.p(params)
        if self.bodyA >= 0:
            xA, vA, RA, GA = _point_state(kin, phi, self.bodyA, fp["xlA"])
        else:
            xA, vA, RA, GA = fp["xlA"], jnp.zeros(3, fp["xlA"].dtype), None, None
        if self.bodyB >= 0:
            xB, vB, RB, GB = _point_state(kin, phi, self.bodyB, fp["xlB"])
        else:
            xB, vB, RB, GB = fp["xlB"], jnp.zeros(3, fp["xlB"].dtype), None, None
        return (xA, vA, RA, GA), (xB, vB, RB, GB)

    def __call__(self, params, kin, J, phi, q, qdot):
        fp = self.p(params)
        (xA, vA, RA, GA), (xB, vB, RB, GB) = self._ends(params, kin, phi)
        dx = xB - xA
        dv = vB - vA
        fW = fp["k"] * dx + fp["d"] * dv   # world-frame force on A (toward B)
        N = kin.E_wi.shape[0]
        fm = jnp.zeros((N, 6), dtype=q.dtype)
        if self.bodyA >= 0:
            fm = fm.at[self.bodyA].add(GA.T @ (RA.T @ fW))
        if self.bodyB >= 0:
            fm = fm.at[self.bodyB].add(GB.T @ (RB.T @ -fW))
        return jnp.zeros_like(q), fm

    def energy(self, params, kin, q, qdot):
        fp = self.p(params)
        phi0 = jnp.zeros((kin.E_wi.shape[0], 6), dtype=q.dtype)
        (xA, _, _, _), (xB, _, _, _) = self._ends(params, kin, phi0)
        dx = xB - xA
        return 0.5 * fp["k"] * jnp.dot(dx, dx)


FORCE_TYPES = {
    "point_point": ForcePointPoint,
}
