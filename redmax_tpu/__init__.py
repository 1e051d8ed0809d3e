"""redmax_tpu — TPU-native reduced-coordinate articulated rigid-body dynamics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of sueda/redmax
(REDMAX, SIGGRAPH 2019): maximal-to-reduced dynamics assembly (Mr = J^T Mm J),
a full joint zoo, implicit BDF1/BDF2 integration, analytic/adjoint gradients,
frictional contact, and batched MPC/trajectory optimization sharded over TPU
meshes.

Design stance (vs. the reference at /root/reference):
  * Scenes compile to fixed-shape arrays (SceneStatic topology + SceneParams
    pytree); no pointer-based scene graph survives to runtime.
  * The kinematic-tree recursions of the reference (Joint.computeJacobian,
    matlab-diff/+redmax/Joint.m:490-613) collapse to ONE sequential transform
    scan plus dense batched 6x6-block algebra over a static ancestor mask —
    MXU-friendly, vmappable over thousands of scenes.
  * Second-order tensors the reference hand-derives per joint type (dAdq,
    dSdq, dJdq, K, D, dMdq) are obtained exactly by forward-mode autodiff of
    pure functions; the Newton Hessian is jacfwd of the BDF residual, which
    is mathematically identical to the reference's
    H = M - h*D - h^2*K + dMdq.dqtmp (driverRedMaxBDF1.m:176-184).
"""

from redmax_tpu import se3
from redmax_tpu.scene import CompiledScene, SceneBuilder
from redmax_tpu.types import JointType, SceneParams, State

__version__ = "0.2.0"

__all__ = [
    "se3",
    "SceneBuilder",
    "CompiledScene",
    "SceneParams",
    "State",
    "JointType",
    # submodules (imported lazily by users):
    # model, integrators, explicit, adjoint, dynamics, recursive, pcg,
    # constraints, qp, friction, forces, joints, euler, mesh, mpc, parallel,
    # pallas_step, pallas_qp, scenes, scenes_matlab, sceneio, export,
    # checkpoint, metrics
]
