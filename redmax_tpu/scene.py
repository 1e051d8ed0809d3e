"""Scene construction and compilation.

``SceneBuilder`` is the user-facing API (the role of scenesRedMax.m /
testRedMaxScenes.m scene assembly in the reference): add bodies and joints,
then ``compile()`` flattens everything into a ``CompiledScene`` — static
Topology + SceneParams pytree + initial State — on which all dynamics run as
pure jitted functions.
"""

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from redmax_tpu import constraints as con_mod
from redmax_tpu import forces as forces_mod
from redmax_tpu import integrators, model
from redmax_tpu.types import NDOF, JointType, State, Topology

_BIG = 1e8  # default joint limit bounds (Joint.m:78-81: qLimL=-1e8, qLimU=1e8)


@dataclass
class _BodySpec:
    density: float
    inertia: np.ndarray          # [6] diagonal
    E_ji: np.ndarray             # [4,4] body wrt joint
    name: str = ""
    sides: Optional[np.ndarray] = None   # cuboid dimensions (contact needs them)
    radius: Optional[float] = None       # sphere radius (floor contact)
    damping: float = 0.0                 # viscous body damping (Body.m:169)


@dataclass
class _JointSpec:
    jtype: JointType
    parent: int                  # joint index, -1 for root
    body: int                    # body index (same as joint index)
    E_pj: np.ndarray             # [4,4]
    params: Dict[str, np.ndarray] = field(default_factory=dict)
    q: Optional[np.ndarray] = None
    qdot: Optional[np.ndarray] = None
    stiffness: float = 0.0
    damping: float = 0.0
    qrest: Optional[np.ndarray] = None
    qlimL: float = -_BIG
    qlimU: float = _BIG
    qlimK: float = _BIG          # Joint.m:80 (qLimK = 1e8)
    qlimD: float = 0.0
    name: str = ""


def _np_inertia_cuboid(sides, density):
    sides = np.asarray(sides, dtype=np.float64)
    mass = density * np.prod(sides)
    s2 = sides * sides
    return np.array(
        [
            mass / 12.0 * (s2[1] + s2[2]),
            mass / 12.0 * (s2[2] + s2[0]),
            mass / 12.0 * (s2[0] + s2[1]),
            mass,
            mass,
            mass,
        ]
    )


def _np_inertia_sphere(radius, density):
    mass = density * 4.0 / 3.0 * math.pi * radius**3
    i = 0.4 * mass * radius * radius
    return np.array([i, i, i, mass, mass, mass])


def _np_inertia_cylinder(radius, height, density):
    mass = density * math.pi * radius * radius * height
    ix = mass * (3 * radius * radius + height * height) / 12.0
    iz = 0.5 * mass * radius * radius
    return np.array([ix, ix, iz, mass, mass, mass])


def transl(p) -> np.ndarray:
    E = np.eye(4)
    E[:3, 3] = p
    return E


class SceneBuilder:
    """Imperative scene assembly, compiled once to arrays.

    Mirrors the construction idiom of scenesRedMax.m: create a body, attach
    it with a joint (parent joint or None for root), set transforms and
    initial q. Joint i owns body i; insertion order must be topological
    (parent before child), matching Scene.init's traversal reorder
    (Scene.m:64-67).
    """

    def __init__(self, name="", h=1e-2, tEnd=1.0, grav=(0.0, 0.0, -980.0)):
        self.name = name
        self.h = h
        self.tEnd = tEnd
        self.grav = np.asarray(grav, dtype=np.float64)
        self.bodies: List[_BodySpec] = []
        self.joints: List[_JointSpec] = []
        self.forces: List[Tuple[str, Any, Dict[str, np.ndarray]]] = []
        self.constraints: List[Tuple[Any, Dict[str, np.ndarray]]] = []
        self.baumgarte = np.array([5.0, 5.0, 5.0])  # Scene.m:42
        self.fric = False                           # Scene.m:43 (fric flag)
        self.mu = np.array([0.6, 0.6])              # Scene.m:44 (int, ext)
        self.Hexpected: Dict[str, float] = {}
        # #spline editing paths from the c++ text format (sceneio.py);
        # metadata only — consumers build prescribed trajectories from them.
        self.spline_paths: List[Dict[str, Any]] = []

    # -- bodies ------------------------------------------------------------
    def body_cuboid(self, density, sides, E_ji=None, name="") -> int:
        spec = _BodySpec(
            density=density,
            inertia=_np_inertia_cuboid(sides, density),
            E_ji=np.eye(4) if E_ji is None else np.asarray(E_ji, dtype=np.float64),
            name=name,
            sides=np.asarray(sides, dtype=np.float64),
        )
        self.bodies.append(spec)
        return len(self.bodies) - 1

    def body_sphere(self, density, radius, E_ji=None, name="") -> int:
        spec = _BodySpec(
            density=density,
            inertia=_np_inertia_sphere(radius, density),
            E_ji=np.eye(4) if E_ji is None else np.asarray(E_ji, dtype=np.float64),
            name=name,
            radius=radius,
        )
        self.bodies.append(spec)
        return len(self.bodies) - 1

    def body_cylinder(self, density, radius, height, E_ji=None, name="") -> int:
        spec = _BodySpec(
            density=density,
            inertia=_np_inertia_cylinder(radius, height, density),
            E_ji=np.eye(4) if E_ji is None else np.asarray(E_ji, dtype=np.float64),
            name=name,
        )
        self.bodies.append(spec)
        return len(self.bodies) - 1

    def body_mesh_obj(self, density, obj_path, name="") -> int:
        """Body from an OBJ mesh: Mirtich inertia + inertial frame E_oi.

        Reference: BodyMeshObj (matlab/+redmax/BodyMeshObj.m). NOTE: like
        the reference, set_body_transform should then be called with
        E0 @ E_oi (the obj-frame transform composed with the inertial
        frame, testRedMaxScenes.m:781).
        """
        from redmax_tpu import mesh as mesh_mod

        V, F = mesh_mod.read_obj(obj_path)
        I6, E_oi = mesh_mod.mesh_mass_properties(V, F, density)
        spec = _BodySpec(
            density=density, inertia=I6, E_ji=np.eye(4), name=name
        )
        spec.E_oi = E_oi
        spec.mesh = (V, F)
        self.bodies.append(spec)
        return len(self.bodies) - 1

    def body_composite(self, parts, name="") -> int:
        """Rigid composite of (inertia6 | ('cuboid', density, sides) | ...,
        E) pairs given wrt the parent joint frame.

        Reference: BodyComposite (matlab/+redmax/BodyComposite.m). The
        body transform E_ji is set to the computed inertia frame E_jc
        (testRedMaxScenes.m:760-761 does this explicitly).
        """
        from redmax_tpu import mesh as mesh_mod

        inertias, Es = [], []
        for part, E in parts:
            if isinstance(part, tuple):
                kind = part[0]
                if kind == "cuboid":
                    I6 = _np_inertia_cuboid(part[2], part[1])
                elif kind == "cylinder":
                    I6 = _np_inertia_cylinder(part[2], part[3], part[1])
                elif kind == "sphere":
                    I6 = _np_inertia_sphere(part[2], part[1])
                else:
                    raise ValueError(kind)
            else:
                I6 = np.asarray(part, dtype=np.float64)
            inertias.append(I6)
            Es.append(np.asarray(E, dtype=np.float64))
        I6, E_jc = mesh_mod.composite_mass_properties(inertias, Es)
        spec = _BodySpec(density=0.0, inertia=I6, E_ji=E_jc, name=name)
        self.bodies.append(spec)
        return len(self.bodies) - 1

    def set_body_damping(self, body: int, d: float) -> None:
        self.bodies[body].damping = d

    def set_body_transform(self, body: int, E_ji) -> None:
        self.bodies[body].E_ji = np.asarray(E_ji, dtype=np.float64)

    # -- joints ------------------------------------------------------------
    def joint(
        self,
        jtype: JointType,
        parent: Optional[int],
        body: int,
        E_pj=None,
        q=None,
        qdot=None,
        name="",
        **jparams,
    ) -> int:
        d = NDOF[jtype]
        assert body == len(self.joints), "joint i must own body i (add in order)"
        params = {}
        if jtype in (JointType.REVOLUTE, JointType.PRISMATIC):
            axis = np.asarray(jparams.pop("axis"), dtype=np.float64)
            params["axis"] = axis / np.linalg.norm(axis)
        elif jtype == JointType.PLANAR:
            plane = np.asarray(
                jparams.pop("plane", np.array([[1.0, 0, 0], [0, 1.0, 0]]).T),
                dtype=np.float64,
            )
            plane = plane / np.linalg.norm(plane, axis=0, keepdims=True)
            params["plane"] = plane
        elif jtype == JointType.SPLINE_CURVE:
            # control frames -> relative twists (addControlFrame,
            # JointSplineCurve.m:44-57): dCs[j] = log(C_{j-1}^{-1} C_j), cyclic.
            from redmax_tpu import se3 as se3_mod

            Cs = np.stack(
                [np.asarray(C, dtype=np.float64) for C in jparams.pop("control_frames")]
            )
            ncfs = Cs.shape[0]
            dCs = np.zeros((ncfs, 6))
            for jj in range(ncfs):
                C0 = Cs[(jj - 1) % ncfs]
                C1 = Cs[jj]
                dCs[jj] = np.asarray(
                    se3_mod.log(jnp.asarray(np.linalg.inv(C0) @ C1, dtype=jnp.float64))
                )
            params["Cs"] = Cs
            params["dCs"] = dCs
        elif jtype == JointType.COMPOSITE_RP:
            a1 = np.asarray(jparams.pop("axis1"), dtype=np.float64)
            a2 = np.asarray(jparams.pop("axis2"), dtype=np.float64)
            params["axis1"] = a1 / np.linalg.norm(a1)
            params["axis2"] = a2 / np.linalg.norm(a2)
        elif jtype == JointType.SPLINE_SURFACE:
            params["cs"] = np.asarray(jparams.pop("control_values"), dtype=np.float64)
        spec = _JointSpec(
            jtype=jtype,
            parent=-1 if parent is None else parent,
            body=body,
            E_pj=np.eye(4) if E_pj is None else np.asarray(E_pj, dtype=np.float64),
            params=params,
            q=np.zeros(d) if q is None else np.atleast_1d(np.asarray(q, dtype=np.float64)),
            qdot=np.zeros(d) if qdot is None else np.atleast_1d(np.asarray(qdot, dtype=np.float64)),
            name=name,
        )
        for k, v in jparams.items():
            setattr(spec, k, v)
        self.joints.append(spec)
        return len(self.joints) - 1

    def joint_composite(
        self,
        jt1: JointType,
        jt2: JointType,
        parent: Optional[int],
        body: int,
        E_pj=None,
        q=None,
        qdot=None,
        name="",
        p1: Optional[Dict] = None,
        p2: Optional[Dict] = None,
    ) -> Tuple[int, int]:
        """General two-joint composition (matlab/+redmax/JointComposite.m:38-72)
        for ARBITRARY (type1, type2) pairs.

        Desugars to joint1 owning a massless intermediate body at the
        composite joint frame + joint2 (E_pj = I) owning `body` — exactly
        Q = Q1 Q2 with S = [Ad(Q2^{-1}) S1, S2] (the identity derive_S
        recovers; see joints.make_composite). The massless body contributes
        nothing to Mm/gravity, and every DOF still moves the real child
        mass, so Mr stays positive definite. q/qdot concatenate the
        sub-joint coordinates; p1/p2 are the sub-joint param dicts (e.g.
        {"axis": ...}). Returns the two joint indices (j1, j2).

        The revolute∘prismatic instance the reference scenes use also exists
        as the fused single-joint JointType.COMPOSITE_RP (one joint row, one
        body row — cheaper; certificate-gated by mscene 19); this desugaring
        is the fully general path.
        """
        assert body == len(self.joints), (
            "create the composite's body immediately before joint_composite"
        )
        inter = _BodySpec(
            density=0.0, inertia=np.zeros(6), E_ji=np.eye(4),
            name=(name or "composite") + "_link",
        )
        self.bodies.insert(body, inter)
        d1, d2 = NDOF[jt1], NDOF[jt2]
        q = np.zeros(d1 + d2) if q is None else np.atleast_1d(
            np.asarray(q, dtype=np.float64)
        )
        qdot = np.zeros(d1 + d2) if qdot is None else np.atleast_1d(
            np.asarray(qdot, dtype=np.float64)
        )
        j1 = self.joint(
            jt1, parent, body, E_pj=E_pj, q=q[:d1], qdot=qdot[:d1],
            name=(name or "composite") + "_1", **(p1 or {})
        )
        j2 = self.joint(
            jt2, j1, body + 1, E_pj=np.eye(4), q=q[d1:], qdot=qdot[d1:],
            name=(name or "composite") + "_2", **(p2 or {})
        )
        return j1, j2

    def set_stiffness(self, j: int, k: float) -> None:
        self.joints[j].stiffness = k

    def set_damping(self, j: int, d: float) -> None:
        self.joints[j].damping = d

    def set_limits(self, j: int, lower=-_BIG, upper=_BIG, k=_BIG, d=0.0) -> None:
        self.joints[j].qlimL = lower
        self.joints[j].qlimU = upper
        self.joints[j].qlimK = k
        self.joints[j].qlimD = d

    # -- forces ------------------------------------------------------------
    def _force_key(self) -> str:
        return f"f{len(self.forces)}"

    def force_point_point(self, body1, body2, xl1, xl2, k, d=0.0) -> None:
        key = self._force_key()
        self.forces.append(
            (
                "point_point",
                forces_mod.ForcePointPoint(key, body1, body2),
                {
                    "xl1": np.asarray(xl1, dtype=np.float64),
                    "xl2": np.asarray(xl2, dtype=np.float64),
                    "k": np.float64(k),
                    "d": np.float64(d),
                },
            )
        )

    def force_spring_damper(self, body1, body2, xl1, xl2, k, d=0.0, L=0.0) -> None:
        """L=0 requests rest-length auto-init from the initial configuration
        (ForceSpringDamper.init_, ForceSpringDamper.m:38-59)."""
        key = self._force_key()
        self.forces.append(
            (
                "spring_damper",
                forces_mod.ForceSpringDamper(key, body1, body2),
                {
                    "xl1": np.asarray(xl1, dtype=np.float64),
                    "xl2": np.asarray(xl2, dtype=np.float64),
                    "k": np.float64(k),
                    "d": np.float64(d),
                    "L": np.float64(L),
                },
            )
        )

    def force_spring_damper_m(self, body1, body2, xl1, xl2, k, d=0.0, L=0.0) -> None:
        """matlab-variant SpringDamper (sign conventions differ from the
        diff variant's ForceSpringDamper; see forces.SpringDamperM)."""
        key = self._force_key()
        self.forces.append(
            (
                "spring_damper_m",
                forces_mod.SpringDamperM(key, body1, body2),
                {
                    "xl1": np.asarray(xl1, dtype=np.float64),
                    "xl2": np.asarray(xl2, dtype=np.float64),
                    "k": np.float64(k),
                    "d": np.float64(d),
                    "L": np.float64(L),
                },
            )
        )

    def force_cable(self, bodies, xls, k, d=0.0, L=0.0) -> None:
        key = self._force_key()
        self.forces.append(
            (
                "cable",
                forces_mod.ForceCable(key, bodies),
                {
                    "xls": np.asarray(xls, dtype=np.float64),
                    "k": np.float64(k),
                    "d": np.float64(d),
                    "L": np.float64(L),
                },
            )
        )

    def force_point_direction(self, body, xl, d, k) -> None:
        key = self._force_key()
        self.forces.append(
            (
                "point_direction",
                forces_mod.ForcePointDirection(key, body),
                {
                    "xl": np.asarray(xl, dtype=np.float64),
                    "d": np.asarray(d, dtype=np.float64),
                    "k": np.float64(k),
                },
            )
        )

    def force_ground_cuboid(self, body, E_ground=None, kn=1.0, kt=0.0, kd=0.0, mu=0.0) -> None:
        key = self._force_key()
        sides = self.bodies[body].sides
        assert sides is not None, "ground contact requires a cuboid body"
        self.forces.append(
            (
                "ground_cuboid",
                forces_mod.ForceGroundCuboid(key, body),
                {
                    "E": np.eye(4) if E_ground is None else np.asarray(E_ground, dtype=np.float64),
                    "sides": sides,
                    "kn": np.float64(kn),
                    "kt": np.float64(kt),
                    "kd": np.float64(kd),
                    "mu": np.float64(mu),
                },
            )
        )

    def add_force(self, force_obj, fparams: Dict[str, np.ndarray]) -> None:
        """Register a custom force closure (see forces.py for the protocol)."""
        self.forces.append(("custom", force_obj, fparams))

    # -- deformables -------------------------------------------------------
    def deformable_spring(
        self, nnodes, stiffness, mass, body0, r0, body1, r1, damping=0.0
    ):
        """Serial point-mass spring with nnodes 3-DOF nodes.

        Reference: DeformableSpring (matlab/+redmax/DeformableSpring.m) +
        ConstraintAttachSpring. Nodes compile to translational root joints
        carrying point-mass bodies (rotational DOFs never activate: the
        translational motion subspace has zero angular rows), so every
        integrator/solver works unchanged. body0/body1 = -1 attaches that
        end to the fixed world point r0/r1.
        """
        from redmax_tpu.forces import ForceDeformableSegments
        from redmax_tpu.types import JointType

        node_ids = []
        eps = 1e-9  # inert rotational inertia (never excited)
        for i in range(nnodes):
            spec = _BodySpec(
                density=0.0,
                inertia=np.array([eps, eps, eps] + [mass / nnodes] * 3),
                E_ji=np.eye(4),
                name=f"defnode{len(self.bodies)}",
            )
            self.bodies.append(spec)
            b = len(self.bodies) - 1
            j = self.joint(JointType.TRANSLATIONAL, None, b)
            if damping:
                self.set_damping(j, damping)
            node_ids.append(b)
        key = self._force_key()
        self.forces.append(
            (
                "deform_segments",
                ForceDeformableSegments(key, node_ids),
                {
                    "K": np.float64(stiffness),
                    "L": np.zeros(nnodes - 1),  # set at compile (initGeometry_)
                },
            )
        )
        if body0 is None:
            body0 = -1
        if body1 is None:
            body1 = -1
        ck0 = self._con_key()
        self.constraints.append(
            (
                con_mod.ConstraintAttachPoint(ck0, body0, node_ids[0]),
                {"r": np.asarray(r0, dtype=np.float64)},
            )
        )
        ck1 = self._con_key()
        self.constraints.append(
            (
                con_mod.ConstraintAttachPoint(ck1, body1, node_ids[-1]),
                {"r": np.asarray(r1, dtype=np.float64)},
            )
        )
        self._deform_inits = getattr(self, "_deform_inits", [])
        self._deform_inits.append((node_ids, body0, r0, body1, r1, key))
        return node_ids

    # -- constraints -------------------------------------------------------
    def _con_key(self) -> str:
        return f"c{len(self.constraints)}"

    def constraint_loop(self, bodyA, bodyB, xA, xB, radius=1.0, height=1.0) -> None:
        """Loop closure; body A's joint must be revolute (axis defines basis).
        Reference: ConstraintLoop (matlab/+redmax/ConstraintLoop.m)."""
        key = self._con_key()
        axisA = self.joints[bodyA].params["axis"]
        obj = con_mod.ConstraintLoop(key, bodyA, bodyB)
        obj.static_params = {
            "xA": np.asarray(xA, dtype=np.float64),
            "axisA": np.asarray(axisA, dtype=np.float64),
            "radius": radius,
            "height": height,
        }
        self.constraints.append(
            (
                obj,
                {
                    "xA": np.asarray(xA, dtype=np.float64),
                    "xB": np.asarray(xB, dtype=np.float64),
                    "axisA": np.asarray(axisA, dtype=np.float64),
                },
            )
        )

    def constraint_joint_limit(self, joint: int, ql: float, qu: float) -> None:
        key = self._con_key()
        dof = sum(NDOF[self.joints[j].jtype] for j in range(joint))
        self.constraints.append(
            (
                con_mod.ConstraintJointLimit(key, dof),
                {"ql": np.float64(ql), "qu": np.float64(qu)},
            )
        )

    def constraint_floor(self, body: int, E=None) -> None:
        key = self._con_key()
        radius = self.bodies[body].radius
        assert radius is not None, "floor contact requires a sphere body"
        self.constraints.append(
            (
                con_mod.ConstraintFloor(key, body),
                {
                    "E": np.eye(4) if E is None else np.asarray(E, dtype=np.float64),
                    "radius": np.float64(radius),
                },
            )
        )

    def constraint_multq(self, jointA: int, jointB: int, factor: float) -> None:
        key = self._con_key()
        dofA = sum(NDOF[self.joints[j].jtype] for j in range(jointA))
        dofB = sum(NDOF[self.joints[j].jtype] for j in range(jointB))
        self.constraints.append(
            (
                con_mod.ConstraintMultQ(key, dofA, dofB),
                {"factor": np.float64(factor)},
            )
        )

    def constraint_presc_joint(self, joint: int, qdot_target) -> None:
        key = self._con_key()
        start = sum(NDOF[self.joints[j].jtype] for j in range(joint))
        d = NDOF[self.joints[joint].jtype]
        self.constraints.append(
            (
                con_mod.ConstraintPrescJoint(key, range(start, start + d)),
                {"qdot_target": np.atleast_1d(np.asarray(qdot_target, np.float64))},
            )
        )

    def constraint_presc_joint_m(self, joint: int) -> None:
        """Prescribe a revolute joint via maximal rows (velocity targets
        set through scene_fn)."""
        key = self._con_key()
        axis = np.asarray(self.joints[joint].params["axis"])
        axis_idx = int(np.argmax(np.abs(axis)))
        self.constraints.append(
            (
                con_mod.ConstraintPrescJointM(
                    key, joint, self.joints[joint].parent, axis_idx
                ),
                {"qdot_target": np.float64(0.0)},
            )
        )

    def constraint_presc_body_w(self, body: int, comps) -> None:
        """World-frame prescribed body motion (targets set via scene_fn)."""
        key = self._con_key()
        z = np.zeros(3)
        self.constraints.append(
            (
                con_mod.ConstraintPrescBodyW(key, body, comps),
                {"vt_w": z, "wt_i": z, "vtdot_w": z, "wtdot_i": z},
            )
        )

    def constraint_presc_body(self, body: int, comps, phi_target) -> None:
        key = self._con_key()
        self.constraints.append(
            (
                con_mod.ConstraintPrescBody(key, body, comps),
                {"phi_target": np.atleast_1d(np.asarray(phi_target, np.float64))},
            )
        )

    # -- compile -----------------------------------------------------------
    def _init_deformables(self):
        """Set node initial positions + segment rest lengths
        (DeformableSpring.initGeometry_, DeformableSpring.m:61-91) by
        composing world transforms of the rigid part with numpy FK."""
        if not getattr(self, "_deform_inits", None):
            return
        # numpy FK over the joint specs (initial q)
        from redmax_tpu.joints import KERNELS
        import jax.numpy as jnpp

        E_wj = [None] * len(self.joints)
        E_wi = [None] * len(self.joints)
        for i, js in enumerate(self.joints):
            kern = KERNELS[js.jtype]
            pj = dict(js.params)
            if "chart" in pj or js.jtype.name.endswith("EULER"):
                from redmax_tpu.euler import DEFAULT_CHART
                pj["chart"] = jnpp.asarray(DEFAULT_CHART)
            Q = np.asarray(
                kern.Q_fn(jnpp.asarray(js.q, dtype=jnpp.float64),
                          {k: jnpp.asarray(v) for k, v in pj.items()})
            )
            E_pj = js.E_pj @ Q
            E_wj[i] = E_pj if js.parent < 0 else E_wj[js.parent] @ E_pj
            E_wi[i] = E_wj[i] @ self.bodies[i].E_ji

        def world_pt(b, r):
            if b < 0:
                return np.asarray(r, dtype=np.float64)
            E = E_wi[b]
            return E[:3, :3] @ np.asarray(r) + E[:3, 3]

        for node_ids, body0, r0, body1, r1, fkey in self._deform_inits:
            x0 = world_pt(body0, r0)
            x1 = world_pt(body1, r1)
            n = len(node_ids)
            xs = [(1 - i / (n - 1)) * x0 + (i / (n - 1)) * x1 for i in range(n)]
            for i, b in enumerate(node_ids):
                self.joints[b].q = xs[i].copy()
            L = np.array([np.linalg.norm(xs[i + 1] - xs[i]) for i in range(n - 1)])
            for ft, obj, fp in self.forces:
                if getattr(obj, "key", None) == fkey:
                    fp["L"] = L

    def compile(self, dtype=jnp.float64) -> "CompiledScene":
        self._init_deformables()
        N = len(self.joints)
        assert N == len(self.bodies)
        qstart, ndof = [], []
        off = 0
        for js in self.joints:
            assert js.parent < js.body, "insertion order must be topological"
            qstart.append(off)
            ndof.append(NDOF[js.jtype])
            off += NDOF[js.jtype]
        nr = off
        topo = Topology(
            njoints=N,
            nr=nr,
            parent=tuple(js.parent for js in self.joints),
            jtype=tuple(int(js.jtype) for js in self.joints),
            qstart=tuple(qstart),
            ndof=tuple(ndof),
        )

        def per_dof(getter, default=0.0):
            out = np.full(nr, default, dtype=np.float64)
            for i, js in enumerate(self.joints):
                out[qstart[i]: qstart[i] + ndof[i]] = getter(js)
            return out

        q0 = np.zeros(nr)
        qdot0 = np.zeros(nr)
        qrest = np.zeros(nr)
        for i, js in enumerate(self.joints):
            sl = slice(qstart[i], qstart[i] + ndof[i])
            q0[sl] = js.q
            qdot0[sl] = js.qdot
            # Reference: qRest defaults to the initial q (set in scene setup
            # via joint.qRest = joint.q when stiffness is used; scenes that
            # use stiffness set qRest explicitly — default to initial q).
            qrest[sl] = js.q if js.qrest is None else js.qrest

        jt_params: Dict[str, Dict[str, Any]] = {}
        for jt, members in topo.type_groups().items():
            keys = set()
            for m in members:
                keys |= set(self.joints[m].params.keys())
            if keys:
                jt_params[str(int(jt))] = {
                    k: jnp.asarray(
                        np.stack([self.joints[m].params[k] for m in members]),
                        dtype=dtype,
                    )
                    for k in sorted(keys)
                }

        params: Dict[str, Any] = {
            "E0_pj": jnp.asarray(np.stack([j.E_pj for j in self.joints]), dtype=dtype),
            "E0_ji": jnp.asarray(np.stack([b.E_ji for b in self.bodies]), dtype=dtype),
            "I_i": jnp.asarray(np.stack([b.inertia for b in self.bodies]), dtype=dtype),
            "body_damping": jnp.asarray(
                np.array([b.damping for b in self.bodies]), dtype=dtype
            ),
            "g": jnp.asarray(self.grav, dtype=dtype),
            "h": jnp.asarray(self.h, dtype=dtype),
            "stiffness": jnp.asarray(per_dof(lambda j: j.stiffness), dtype=dtype),
            "damping": jnp.asarray(per_dof(lambda j: j.damping), dtype=dtype),
            "tau": jnp.zeros(nr, dtype=dtype),
            "qrest": jnp.asarray(qrest, dtype=dtype),
            "qlimL": jnp.asarray(per_dof(lambda j: j.qlimL, -_BIG), dtype=dtype),
            "qlimU": jnp.asarray(per_dof(lambda j: j.qlimU, _BIG), dtype=dtype),
            "qlimK": jnp.asarray(per_dof(lambda j: j.qlimK, _BIG), dtype=dtype),
            "qlimD": jnp.asarray(per_dof(lambda j: j.qlimD, 0.0), dtype=dtype),
            "baumgarte": jnp.asarray(self.baumgarte, dtype=dtype),
            "mu": jnp.asarray(self.mu, dtype=dtype),
            "joint": jt_params,
            "constraints": {
                obj.key: {k: jnp.asarray(v, dtype=dtype) for k, v in cp.items()}
                for obj, cp in self.constraints
            },
            "forces": {
                obj.key if hasattr(obj, "key") else f"f{i}": {
                    k: jnp.asarray(v, dtype=dtype) for k, v in fp.items()
                }
                for i, (_, obj, fp) in enumerate(self.forces)
            },
        }
        aux0: Dict[str, Any] = {}
        if self.fric:
            aux0["fbm"] = jnp.zeros(6 * N, dtype=dtype)
        euler_members = topo.euler_joints()
        if euler_members:
            from redmax_tpu.euler import DEFAULT_CHART

            aux0["euler_chart"] = jnp.full(
                len(euler_members), DEFAULT_CHART, dtype=jnp.int32
            )
        state0 = State(
            q=jnp.asarray(q0, dtype=dtype),
            qdot=jnp.asarray(qdot0, dtype=dtype),
            aux=aux0,
        )
        force_fns = tuple(obj for _, obj, _ in self.forces)
        constraint_fns = tuple(obj for obj, _ in self.constraints)
        friction_model = None
        if self.fric:
            from redmax_tpu.friction import build_friction_model

            friction_model = build_friction_model(
                topo, self.joints, self.bodies, constraint_fns
            )

        # Rest-length auto-init from the initial configuration
        # (ForceSpringDamper.init_ / ForceCable.init_; called from Scene.init
        # via forces{1}.init() in the reference, Scene.m:117).
        if any(
            ft in ("spring_damper", "spring_damper_m", "cable") and float(fp["L"]) == 0.0
            for ft, _, fp in self.forces
        ):
            kin0 = model.forward_kinematics(
                topo, params, state0.q, state0.qdot, state0.aux
            )

            def world_pt(b, xl):
                if b < 0:
                    return np.asarray(xl)
                E = np.asarray(kin0.E_wi[b])
                return E[:3, :3] @ np.asarray(xl) + E[:3, 3]

            for ft, obj, fp in self.forces:
                if ft in ("spring_damper", "spring_damper_m") and float(fp["L"]) == 0.0:
                    L = np.linalg.norm(
                        world_pt(obj.body2, fp["xl2"]) - world_pt(obj.body1, fp["xl1"])
                    )
                    params["forces"][obj.key]["L"] = jnp.asarray(L, dtype=dtype)
                elif ft == "cable" and float(fp["L"]) == 0.0:
                    pts = [world_pt(b, fp["xls"][i]) for i, b in enumerate(obj.bodies)]
                    L = sum(
                        np.linalg.norm(pts[i + 1] - pts[i]) for i in range(len(pts) - 1)
                    )
                    params["forces"][obj.key]["L"] = jnp.asarray(L, dtype=dtype)
        return CompiledScene(
            name=self.name,
            topo=topo,
            params=params,
            state0=state0,
            force_fns=force_fns,
            constraint_fns=constraint_fns,
            friction_model=friction_model,
            h=self.h,
            tEnd=self.tEnd,
            Hexpected=dict(self.Hexpected),
        )


@dataclass
class CompiledScene:
    name: str
    topo: Topology
    params: Dict[str, Any]
    state0: State
    force_fns: Tuple
    constraint_fns: Tuple
    h: float
    tEnd: float
    Hexpected: Dict[str, float]
    friction_model: Optional[Any] = None

    @property
    def nsteps(self) -> int:
        return math.ceil(self.tEnd / self.h)

    # Convenience evaluators (unjitted; wrap in jax.jit at call sites/tests).
    def assemble(self, q, qdot, aux=None):
        aux = self.state0.aux if aux is None else aux
        return model.assemble(self.topo, self.params, q, qdot, self.force_fns, aux)

    def energies(self, q, qdot, aux=None):
        aux = self.state0.aux if aux is None else aux
        return model.energies(self.topo, self.params, q, qdot, self.force_fns, aux)

    def make_step(self, integrator="bdf1", cfg: Optional[integrators.NewtonConfig] = None):
        cfg = cfg or integrators.NewtonConfig()
        if integrator == "bdf1":
            return integrators.make_bdf1_step(self.topo, self.force_fns, cfg)
        if integrator == "bdf2":
            return integrators.make_bdf2_step(self.topo, self.force_fns, cfg)
        if integrator == "euler":
            return integrators.make_euler_step(
                self.topo, self.force_fns, self.constraint_fns
            )
        if integrator == "euler_fric":
            from redmax_tpu.friction import make_euler_fric_step

            assert self.friction_model is not None, "compile with fric=True"
            return make_euler_fric_step(
                self.topo, self.force_fns, self.friction_model
            )
        raise ValueError(integrator)

    def initial_state(self, integrator="bdf1"):
        if integrator == "bdf2":
            return integrators.bdf2_init(self.state0)
        return self.state0
