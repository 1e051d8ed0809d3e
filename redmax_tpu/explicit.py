"""Explicit adaptive integration (the reference's ode45 paths).

Two derivative oracles, mirroring the reference's cross-implementation
equivalence strategy (matlab/README.md itype table — REDMAX_ODE45 vs
RECURS_ODE45 "give numerically the same solution"):

  * dense RedMax: qddot = Mr^{-1} f from the maximal->reduced assembly
    (redmaxFcn, matlab/testRedMax.m:361-446), constraints resolved at the
    acceleration level with Baumgarte -(Gdot qdot) - 2 b1 G qdot - b2^2 g;
  * recursive O(n): qddot from the RHD 3-pass (recursFcn, :211-357),
    equality constraints via O(n) M^{-1} products and a small dense
    Schur solve (the reference builds A W A^T column-wise the same way).

The integrator is Dormand-Prince 5(4) with MATLAB ode45's error control
(RelTol 1e-4, AbsTol 1e-6 per testRedMax.m:101-103) in a lax.while_loop.
"""

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redmax_tpu import model, qp, recursive
from redmax_tpu.constraints import assemble_constraints
from redmax_tpu.types import State, Topology

# Dormand-Prince 5(4) tableau (the ode45 pair).
_A = np.array(
    [
        [0, 0, 0, 0, 0, 0],
        [1 / 5, 0, 0, 0, 0, 0],
        [3 / 40, 9 / 40, 0, 0, 0, 0],
        [44 / 45, -56 / 15, 32 / 9, 0, 0, 0],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0],
    ]
)
_B5 = np.array([35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0])
# 4th-order embedded weights. Not used directly in the stepper — the error
# estimate is computed as the exact stage combination E = _B5 - _B4 (MATLAB
# ode45's hardcoded E fractions equal this difference componentwise); kept
# here so the two cannot drift and the derivation stays checkable.
_B4 = np.array(
    [5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_C = np.array([0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0])


def make_deriv_dense(topo: Topology, force_fns: Tuple = (), constraint_fns: Tuple = ()):
    """ydot = [qdot; Mr^{-1} f] with acceleration-level constraints.

    Mirrors redmaxFcn (testRedMax.m:361-446); equality rows via dense KKT,
    active inequality rows via the PGS dual QP (quadprog role).
    """

    def deriv(params: Dict, t, y, aux=None):
        nr = topo.nr
        q, qdot = y[:nr], y[nr:]
        M, f, auxd = model.assemble(topo, params, q, qdot, force_fns, aux)
        if not constraint_fns:
            qdd = jnp.linalg.solve(M, f)
            return jnp.concatenate([qdot, qdd])
        kin, J, phi = auxd["kin"], auxd["J"], auxd["phi"]

        def rows_at(qq):
            kin2 = model.forward_kinematics(topo, params, qq, qdot, aux)
            J2, _, phi2 = model.jacobians(topo, params, kin2, qdot)
            return assemble_constraints(
                constraint_fns, params, topo, kin2, phi2, qq, qdot, J2
            )

        rows = rows_at(q)
        # Gdot qdot (the reference's Gdot*qdot + Gmdot terms,
        # testRedMax.m:395-398) exactly, via one jvp of G(q) qdot along qdot.
        _, rows_dot = jax.jvp(
            lambda qq: (rows_at(qq)["Geq"] @ qdot, rows_at(qq)["Cin"] @ qdot),
            (q,), (qdot,),
        )
        Gdot_qdot, Cdot_qdot = rows_dot
        b1, b2 = params["baumgarte"][0], params["baumgarte"][1]
        me = rows["Geq"].shape[0]
        mi = rows["Cin"].shape[0]
        rhsG = (
            -(Gdot_qdot + rows["geqddot"])
            - 2 * b1 * (rows["Geq"] @ qdot + rows["geqdot"])
            - b2 * b2 * rows["geq"]
        )
        if mi == 0:
            qdd, _ = qp.kkt_solve(M, rows["Geq"], f, rhsG)
        else:
            act = rows["act"].astype(q.dtype)[:, None]
            Cin = rows["Cin"] * act
            rhsC = jnp.where(
                rows["act"],
                -Cdot_qdot - 2 * b1 * (Cin @ qdot) - b2 * b2 * rows["cin"],
                0.0,
            )
            A = jnp.concatenate([rows["Geq"], Cin], axis=0)
            b = jnp.concatenate([rhsG, rhsC], axis=0)
            inf = jnp.inf
            lo = jnp.concatenate([jnp.full(me, -inf, q.dtype), jnp.zeros(mi, q.dtype)])
            hi = jnp.concatenate(
                [jnp.full(me, inf, q.dtype), jnp.where(rows["act"], inf, 0.0)]
            )
            qdd, _ = qp.qp_pgs(M, f, A, b, lo, hi, 200)
        return jnp.concatenate([qdot, qdd])

    return deriv


def make_deriv_recursive(
    topo: Topology, force_fns: Tuple = (), constraint_fns: Tuple = ()
):
    """ydot via the O(n) recursive hybrid dynamics (recursFcn, :211-357).

    Equality constraints: lambda from the Schur complement G M^{-1} G^T
    built with the O(n) M^{-1} product, then one extra M^{-1} apply.
    """

    def deriv(params: Dict, t, y, aux=None):
        nr = topo.nr
        q, qdot = y[:nr], y[nr:]
        qdd_free, _ = recursive.rhd_qddot(topo, params, q, qdot, force_fns, aux)
        if not constraint_fns:
            return jnp.concatenate([qdot, qdd_free])
        kin = model.forward_kinematics(topo, params, q, qdot, aux)
        J, _, phi = model.jacobians(topo, params, kin, qdot)

        def Geq_qdot(qq):
            kin2 = model.forward_kinematics(topo, params, qq, qdot, aux)
            J2, _, phi2 = model.jacobians(topo, params, kin2, qdot)
            return assemble_constraints(
                constraint_fns, params, topo, kin2, phi2, qq, qdot, J2
            )["Geq"] @ qdot

        rows = assemble_constraints(
            constraint_fns, params, topo, kin, phi, q, qdot, J
        )
        _, Gdot_qdot = jax.jvp(Geq_qdot, (q,), (qdot,))
        b1, b2 = params["baumgarte"][0], params["baumgarte"][1]
        G = rows["Geq"]
        rhsG = (
            -Gdot_qdot
            - 2 * b1 * (G @ qdot + rows["geqdot"])
            - b2 * b2 * rows["geq"]
        )
        minv = recursive.make_minv_product(topo, params, kin)
        MinvGT = jax.vmap(minv)(G)                      # [me, nr] rows M^{-1}g_i
        D = G @ MinvGT.T                                # G M^{-1} G^T
        lam = jnp.linalg.solve(D, rhsG - G @ qdd_free)
        qdd = qdd_free + MinvGT.T @ lam
        return jnp.concatenate([qdot, qdd])

    return deriv


def make_ode45(
    deriv: Callable,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    max_steps: int = 1000000,
):
    """Adaptive Dormand-Prince integrator: (params, y0, t0, t1, aux) -> y1.

    Replicates MATLAB ode45's controller EXACTLY (same RHS => same step
    sequence in f64, so the reference's ode45 energy certificates — which
    record that solver's drift at RelTol 1e-4 — transfer):
      threshold = atol/rtol, hmax = 0.1*(t1-t0)
      init:  absh = min(hmax, tspan); rh = ||f0/max(|y0|,thr)||_inf
             / (0.8 rtol^(1/5)); absh = 1/rh if absh*rh > 1
      per step: stretch h to t1 when 1.1*absh >= t1-t
      err = ||(y5-y4)/max(max(|y|,|y5|),thr)||_inf vs rtol
      reject: first failure absh *= max(0.1, 0.8 (rtol/err)^(1/5)),
              later failures absh *= 0.5
      accept (no failures this step): absh /= max(1.25 (err/rtol)^(1/5), 0.2)
    """
    A = jnp.asarray(_A)
    B5 = jnp.asarray(_B5)
    C = jnp.asarray(_C)
    # ode45's exact E = B5 - B4 fractions (the 4th-order embedded difference).
    E = jnp.asarray(
        np.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920,
                  -17253 / 339200, 22 / 525, -1 / 40])
    )
    pow_ = 0.2
    threshold = atol / rtol

    def integrate(params: Dict, y0, t0, t1, aux=None):
        dtype = y0.dtype
        t0 = jnp.asarray(t0, dtype)
        t1 = jnp.asarray(t1, dtype)
        f0 = deriv(params, t0, y0, aux)
        htspan = t1 - t0
        hmax = 0.1 * htspan
        absh = jnp.minimum(hmax, htspan)
        rh = jnp.max(
            jnp.abs(f0) / jnp.maximum(jnp.abs(y0), threshold)
        ) / (0.8 * rtol**pow_)
        absh = jnp.where(absh * rh > 1.0, 1.0 / rh, absh)

        # carry: (t, y, absh, f1, nofailed, done, steps)
        def cond(c):
            t, y, absh, f1, nofailed, done, steps = c
            return (~done) & (steps < max_steps)

        def body(c):
            t, y, absh, f1, nofailed, done, steps = c
            hmin = 16.0 * jnp.finfo(dtype).eps * jnp.abs(t)
            absh = jnp.minimum(hmax, jnp.maximum(hmin, absh))
            stretch = 1.1 * absh >= (t1 - t)
            h = jnp.where(stretch, t1 - t, absh)

            k = [f1]
            for i in range(1, 6):
                yi = y + h * sum(A[i, j] * k[j] for j in range(i))
                k.append(deriv(params, t + C[i] * h, yi, aux))
            y5 = y + h * sum(B5[j] * k[j] for j in range(6))
            k.append(deriv(params, t + h, y5, aux))          # FSAL stage
            # MATLAB forms the error DIRECTLY from the stage combination
            # err = absh*||(f*E)/sc||_inf with E = B5-B4 exact — NOT from
            # y5-y4, whose subtraction cancels ~7 digits and perturbs the
            # ulp-sensitive accept/reject sequence the certificates record.
            errvec = h * sum(E[j] * k[j] for j in range(7))
            sc = jnp.maximum(jnp.maximum(jnp.abs(y), jnp.abs(y5)), threshold)
            err = jnp.max(jnp.abs(errvec) / sc)
            accept = err <= rtol

            # Rejected: shrink (first failure vs later failures).
            shrink1 = jnp.maximum(0.1, 0.8 * (rtol / err) ** pow_)
            absh_rej = jnp.maximum(
                hmin, jnp.where(nofailed, absh * shrink1, 0.5 * absh)
            )
            # Accepted with no failures: possibly grow.
            temp = 1.25 * (err / rtol) ** pow_
            absh_acc = jnp.where(
                nofailed, jnp.where(temp > 0.2, absh / temp, absh / 0.2), absh
            )
            absh_new = jnp.where(accept, absh_acc, absh_rej)
            t_new = jnp.where(accept, t + h, t)
            y_new = jnp.where(accept, y5, y)
            f_new = jnp.where(accept, k[6], f1)
            done_new = accept & stretch
            nofailed_new = jnp.where(accept, jnp.asarray(True), jnp.asarray(False))
            return (t_new, y_new, absh_new, f_new, nofailed_new, done_new,
                    steps + 1)

        init = (t0, y0, absh, f0, jnp.asarray(True), htspan <= 0,
                jnp.zeros((), jnp.int32))
        t, y, absh, _, _, _, steps = jax.lax.while_loop(cond, body, init)
        return y

    return integrate


def simulate_ode45(sc, method: str = "dense", rtol=1e-4, atol=1e-6):
    """Integrate a CompiledScene over [0, tEnd]; returns final State."""
    if method == "dense":
        deriv = make_deriv_dense(sc.topo, sc.force_fns, sc.constraint_fns)
    elif method == "recursive":
        deriv = make_deriv_recursive(sc.topo, sc.force_fns, sc.constraint_fns)
    else:
        raise ValueError(method)
    integ = make_ode45(deriv, rtol, atol)
    y0 = jnp.concatenate([sc.state0.q, sc.state0.qdot])
    y1 = integ(sc.params, y0, 0.0, sc.tEnd, sc.state0.aux)
    nr = sc.topo.nr
    return State(q=y1[:nr], qdot=y1[nr:], aux=sc.state0.aux)
