"""Core data model: joint types, static scene topology, and dynamic state.

The reference keeps a pointer-based scene graph of MATLAB handle objects
(matlab-diff/+redmax/Joint.m, Body.m) traversed via next/prev linked lists.
Here a scene is compiled once into:

  * ``Topology`` — static (Python-level, hashable) structural data: parent
    indices, joint types, reduced-DOF offsets, tree levels, ancestor masks.
    Everything XLA needs to be *shapes and constants*.
  * ``SceneParams`` — a pytree (nested dict) of differentiable arrays:
    transforms, inertias, stiffnesses, torques, gravity, force parameters.
  * ``State`` — the minimal dynamic state (q, qdot), a registered dataclass
    pytree so it threads through jit/vmap/scan/grad.
"""

import enum
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


class JointType(enum.IntEnum):
    """Joint zoo. Mirrors the reference's class hierarchy (SURVEY.md section 2.3).

    The reference's JointSpherical (Euler charts) and JointSphericalExp are
    both 3-DOF ball joints; SPHERICAL here uses exponential coordinates with
    singularity-avoiding reparameterization (matlab/+redmax/JointSphericalExp.m),
    and SPHERICAL_EULER provides the 12-chart Euler version for parity.
    """

    FIXED = 0          # matlab-diff/+redmax/JointFixed.m
    REVOLUTE = 1       # matlab-diff/+redmax/JointRevolute.m
    PRISMATIC = 2      # matlab-diff/+redmax/JointPrismatic.m
    PLANAR = 3         # matlab-diff/+redmax/JointPlanar.m
    TRANSLATIONAL = 4  # matlab-diff/+redmax/JointTranslational.m
    UNIVERSAL = 5      # matlab-diff/+redmax/JointUniversal.m
    SPHERICAL = 6      # matlab/+redmax/JointSphericalExp.m (exp coords)
    FREE2D = 7         # matlab-diff/+redmax/JointFree2D.m
    FREE3D = 8         # matlab-diff/+redmax/JointFree3D.m (trans + spherical)
    SPHERICAL_EULER = 9  # matlab-diff/+redmax/JointSpherical.m (12 Euler charts)
    SPLINE_CURVE = 10  # matlab/+redmax/JointSplineCurve.m (cubic B-spline curve)
    FREE3D_EULER = 11  # matlab-diff/+redmax/JointFree3D.m (trans + Euler spherical)
    SPLINE_SURFACE = 12  # matlab/+redmax/JointSplineSurface.m (tensor-product)
    COMPOSITE_RP = 13  # matlab/+redmax/JointComposite.m (revolute o prismatic)
    FREE_ST = 14       # matlab/+redmax/JointFree.m (spherical-exp o translational)


NDOF: Dict[JointType, int] = {
    JointType.FIXED: 0,
    JointType.REVOLUTE: 1,
    JointType.PRISMATIC: 1,
    JointType.PLANAR: 2,
    JointType.TRANSLATIONAL: 3,
    JointType.UNIVERSAL: 2,
    JointType.SPHERICAL: 3,
    JointType.FREE2D: 3,
    JointType.FREE3D: 6,
    JointType.SPHERICAL_EULER: 3,
    JointType.SPLINE_CURVE: 1,
    JointType.FREE3D_EULER: 6,
    JointType.SPLINE_SURFACE: 2,
    JointType.COMPOSITE_RP: 2,
    JointType.FREE_ST: 6,
}

# Joint types carrying a dynamic Euler chart index in State.aux["euler_chart"],
# with the slice of q holding the chart angles.
EULER_CHART_TYPES = {
    JointType.SPHERICAL_EULER: slice(0, 3),
    JointType.FREE3D_EULER: slice(3, 6),
}

MAX_NDOF = 6


@dataclass(frozen=True)
class Topology:
    """Static structure of a compiled scene. Hashable; safe to close over in jit.

    Joint i owns body i (same index). Joints are stored in topological order
    (parent before child); the root has parent -1.
    """

    njoints: int
    nr: int                       # total reduced DOFs
    parent: Tuple[int, ...]       # parent joint index per joint (-1 = root)
    jtype: Tuple[int, ...]        # JointType value per joint
    qstart: Tuple[int, ...]       # offset of each joint's DOFs in the flat q
    ndof: Tuple[int, ...]         # DOFs per joint

    @property
    def nm(self) -> int:
        """Maximal coordinate count: 6 per body. Reference: Body.countDofs (Body.m:54)."""
        return 6 * self.njoints

    @property
    def levels(self) -> Tuple[Tuple[int, ...], ...]:
        """Joints grouped by tree depth; each level is parallelizable."""
        depth = [0] * self.njoints
        for i, p in enumerate(self.parent):
            depth[i] = 0 if p < 0 else depth[p] + 1
        out: List[List[int]] = [[] for _ in range(max(depth) + 1)]
        for i, d in enumerate(depth):
            out[d].append(i)
        return tuple(tuple(l) for l in out)

    def ancestor_mask(self) -> np.ndarray:
        """anc[i, a] = 1.0 iff joint a is an ancestor of i or i itself.

        This mask turns the reference's O(n^2) Jacobian tree recursion
        (Joint.m:490-613) into dense masked block algebra.
        """
        n = self.njoints
        anc = np.zeros((n, n), dtype=np.float64)
        for i in range(n):
            a = i
            while a >= 0:
                anc[i, a] = 1.0
                a = self.parent[a]
        return anc

    def doubling_rounds(self) -> Tuple[np.ndarray, ...]:
        """Static pointer-doubling schedule for the FK world chain.

        Round k holds ptr_k[i] = the 2^k-th ancestor of joint i (or the
        virtual world node N when exhausted). Composing
        E[i] <- E[ptr_k[i]] @ E[i] for k = 0.. turns the reference's
        root-to-leaf sweep (Joint.m:382-434, O(depth) sequential) into
        O(log depth) batched 4x4 matmul rounds — the parallel-prefix-
        over-the-kinematic-tree form (SURVEY.md section 2.11).
        """
        n = self.njoints
        ptr = np.array([p if p >= 0 else n for p in self.parent] + [n], dtype=np.int32)
        rounds = []
        while np.any(ptr[:n] != n):
            rounds.append(ptr.copy())
            ptr = ptr[ptr]
        return tuple(rounds)

    def euler_joints(self) -> Tuple[int, ...]:
        """Joint indices (ascending) that carry a chart in aux["euler_chart"]."""
        return tuple(
            i for i, t in enumerate(self.jtype) if JointType(t) in EULER_CHART_TYPES
        )

    def dof_joint(self) -> np.ndarray:
        """Map each reduced DOF to its owning joint index: shape [nr]."""
        out = np.zeros(self.nr, dtype=np.int32)
        for i in range(self.njoints):
            out[self.qstart[i]: self.qstart[i] + self.ndof[i]] = i
        return out

    def col_onehot(self) -> np.ndarray:
        """C[j, d, r] = 1 iff reduced column r is DOF d of joint j (d < ndof).

        Used to scatter padded per-joint Jacobian blocks [N, 6, dmax] into the
        dense J [6N, nr] with one einsum contraction.
        """
        C = np.zeros((self.njoints, MAX_NDOF, self.nr), dtype=np.float64)
        for j in range(self.njoints):
            for d in range(self.ndof[j]):
                C[j, d, self.qstart[j] + d] = 1.0
        return C

    def type_groups(self) -> Dict[int, Tuple[int, ...]]:
        """Joint indices grouped by type (static grouping for batched kernels)."""
        groups: Dict[int, List[int]] = {}
        for i, t in enumerate(self.jtype):
            groups.setdefault(t, []).append(i)
        return {t: tuple(g) for t, g in groups.items()}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "qdot", "aux"],
    meta_fields=[],
)
@dataclass
class State:
    """Reduced-coordinate state. q, qdot: shape [..., nr] (leading batch dims).

    aux: dict of per-joint-type discrete state that must thread through
    steps — currently {"euler_chart": int32 [n_spherical_euler]} for
    chart-switching ball joints (JointSpherical.m chart/chart0/chart1).
    Empty dict when no joint needs it.
    """

    q: Any
    qdot: Any
    aux: Any = field(default_factory=dict)


# SceneParams is a nested dict pytree with this layout (all arrays, leading
# batch dims allowed on every leaf when vmapping over scenes):
#
#   {
#     "E0_pj":   [N, 4, 4]   joint-wrt-parent-joint rest transform (Joint.m:E0_pj)
#     "E0_ji":   [N, 4, 4]   body-wrt-joint transform             (Body.m:E0_ji)
#     "I_i":     [N, 6]      diagonal body-frame inertia          (Body.m:I_i)
#     "g":       [3]         gravity
#     "h":       []          timestep
#     "stiffness": [nr]      joint stiffness (expanded per DOF)   (Joint.m:stiffness)
#     "damping":   [nr]      joint damping                        (Joint.m:damping)
#     "qrest":     [nr]      rest position                        (Joint.m:qRest)
#     "tau":       [nr]      joint torque                         (Joint.m:tau)
#     "qlimL", "qlimU", "qlimK", "qlimD": [nr]  penalty joint limits (Joint.m:447)
#     "joint": { str(JointType): per-type param array [G, ...] }  (e.g. axes)
#     "forces": [ {"type": <static>, ...params} ]  handled in forces.py
#   }
SceneParams = Dict[str, Any]
