"""Scene zoo: ports of the reference test scenes.

Covers matlab-diff/scenesRedMax.m cases 0-14 plus the adjoint scenes 100/101,
with the reference's per-scene energy certificates (Hexpected) attached so
the integration tests can assert |H_end - Hexpected| <= 1e-2 exactly as the
reference's PASS/FAIL gate does (matlab-diff/+redmax/Scene.m:164-191).

Scenes 7 and 9 use ball joints: the reference parameterizes them with Euler
charts (JointSpherical, default chart XYZ); this zoo builds them with the
chart-switching SPHERICAL_EULER joint for exact certificate parity, and the
``*_exp`` variants with exponential coordinates (the TPU-preferred joint).
"""

import math
from typing import Callable, Dict

import numpy as np

from redmax_tpu import se3
from redmax_tpu.scene import CompiledScene, SceneBuilder, transl
from redmax_tpu.types import JointType

import jax.numpy as jnp


def _rot(axis, angle) -> np.ndarray:
    E = np.eye(4)
    E[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray(axis, dtype=jnp.float64) * angle))
    return E


def scene_00_serial_chain() -> SceneBuilder:
    """scenesRedMax.m case 0: 5 cuboids, alternating revolute(y)/fixed."""
    b = SceneBuilder(name="Simple serial chain")
    b.Hexpected = {"bdf1": -1.2705398823489915e05, "bdf2": 2.6058008179021417e03}
    for i in range(5):
        body = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
        E_pj = np.eye(4) if i == 0 else transl([10, 0, 0])
        if i % 2 == 0:
            b.joint(
                JointType.REVOLUTE,
                None if i == 0 else i - 1,
                body,
                E_pj=E_pj,
                axis=(0, 1, 0),
                q=[math.pi / 4],
            )
        else:
            b.joint(JointType.FIXED, i - 1, body, E_pj=E_pj)
    return b


def scene_01_revolute_axes() -> SceneBuilder:
    """case 1: three bodies, revolute axes z/y/z."""
    b = SceneBuilder(name="Different revolute axes")
    b.Hexpected = {"bdf1": -3.8359074258588909e04, "bdf2": -9.7138545812971279e02}
    axes = [(0, 0, 1), (0, 1, 0), (0, 0, 1)]
    qs = [0.0, math.pi / 2, math.pi / 2]
    for i in range(3):
        body = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
        b.joint(
            JointType.REVOLUTE,
            None if i == 0 else i - 1,
            body,
            E_pj=np.eye(4) if i == 0 else transl([10, 0, 0]),
            axis=axes[i],
            q=[qs[i]],
        )
    return b


def scene_02_branching() -> SceneBuilder:
    """case 2: branching tree with revolute x/z/x/y."""
    b = SceneBuilder(name="Branching")
    b.Hexpected = {"bdf1": -2.2826101928480086e04, "bdf2": -2.4159349151742754e02}
    sides = [(1, 1, 10), (1, 20, 1), (1, 1, 10), (1, 1, 10)]
    E_ji = [transl([0, 0, -5]), transl([0, 0, 0]), transl([0, 0, -5]), transl([0, 0, -5])]
    axes = [(1, 0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0)]
    E_pj = [
        transl([0, 0, 15]),
        transl([0, 0, -10]),
        transl([0, -10, 0]),
        transl([0, 10, 0]),
    ]
    parents = [None, 0, 1, 1]
    qs = [0.0, 0.0, math.pi / 4, math.pi / 4]
    for i in range(4):
        body = b.body_cuboid(1.0, sides[i], E_ji=E_ji[i])
        b.joint(JointType.REVOLUTE, parents[i], body, E_pj=E_pj[i], axis=axes[i], q=[qs[i]])
    return b


def scene_03_prismatic() -> SceneBuilder:
    """case 3: prismatic(x) root + revolute(y) pendulum."""
    b = SceneBuilder(name="Prismatic joint")
    b.Hexpected = {"bdf1": -3.7579402399569808e04, "bdf2": -6.1132876082600706e02}
    b0 = b.body_cuboid(1.0, (20, 1, 1))
    b.joint(JointType.PRISMATIC, None, b0, axis=(1, 0, 0))
    b1 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(
        JointType.REVOLUTE, 0, b1, E_pj=transl([-10, 0, 0]), axis=(0, 1, 0), q=[math.pi / 2]
    )
    return b


def scene_04_planar() -> SceneBuilder:
    """case 4: planar root + two revolute pendulums."""
    b = SceneBuilder(name="Planar joint")
    b.Hexpected = {"bdf1": -4.5738939646068720e04, "bdf2": -4.7000178355609387e02}
    b0 = b.body_cuboid(1.0, (10, 10, 1))
    b.joint(JointType.PLANAR, None, b0)
    b1 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(
        JointType.REVOLUTE, 0, b1, E_pj=transl([-5, 0, 0]), axis=(0, 1, 0), q=[math.pi / 2]
    )
    b2 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(
        JointType.REVOLUTE, 0, b2, E_pj=transl([0, -5, 0]), axis=(1, 0, 0), q=[math.pi / 4]
    )
    return b


def scene_05_translational() -> SceneBuilder:
    """case 5: translational root, zero gravity, tEnd=2."""
    b = SceneBuilder(name="Translational joint", tEnd=2.0, grav=(0, 0, 0))
    b.Hexpected = {"bdf1": 3.3661704151378050e04, "bdf2": 3.3377464890219308e04}
    b0 = b.body_cuboid(1.0, (10, 10, 1))
    b.joint(JointType.TRANSLATIONAL, None, b0)
    b1 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(
        JointType.REVOLUTE, 0, b1, E_pj=transl([-5, 0, 0]), axis=(0, 1, 0), qdot=[-10.0]
    )
    b2 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(
        JointType.REVOLUTE, 0, b2, E_pj=transl([0, -5, 0]), axis=(1, 0, 0), qdot=[10.0]
    )
    return b


def scene_06_free2d() -> SceneBuilder:
    """case 6: single free 2D body, y-down gravity."""
    b = SceneBuilder(name="Free2D joint", h=5e-3, tEnd=0.4, grav=(0, -980, 0))
    b.Hexpected = {"bdf1": 2.0322933333333378e04, "bdf2": 2.1283333333333332e04}
    b0 = b.body_cuboid(1.0, (1, 1, 1))
    b.joint(JointType.FREE2D, None, b0, q=[-10, -10, 0], qdot=[50, 200, 20])
    return b


def _euler_xyz_S(q: np.ndarray) -> np.ndarray:
    """Body Jacobian (rotational 3x3) of the XYZ Euler chart at q (numpy)."""
    import jax

    from redmax_tpu.joints import derive_S

    def Qfn(qq, params):
        ex = jnp.array([1.0, 0, 0], dtype=jnp.float64)
        ey = jnp.array([0.0, 1, 0], dtype=jnp.float64)
        ez = jnp.array([0.0, 0, 1], dtype=jnp.float64)
        R = se3.exp_so3(ex * qq[0]) @ se3.exp_so3(ey * qq[1]) @ se3.exp_so3(ez * qq[2])
        return se3.make_E(R, jnp.zeros(3, dtype=jnp.float64))

    S = derive_S(Qfn)(jnp.asarray(q, dtype=jnp.float64), {})
    return np.asarray(S)[:3, :]


def scene_07_spherical(exp_coords: bool = True) -> SceneBuilder:
    """case 7: spherical double pendulum, h=2e-3.

    The reference uses Euler charts (chart XYZ initially); exp_coords=True
    builds the exp-map variant with equivalent initial conditions (same
    initial rotation and angular velocity; the discrete trajectory then
    differs at discretization order since BDF acts on chart coordinates).
    """
    b = SceneBuilder(name="Spherical joint", h=2e-3, tEnd=1.0)
    if not exp_coords:
        b.Hexpected = {"bdf1": -8.7859815791305155e03, "bdf2": 8.6544602745403390e03}
    jt = JointType.SPHERICAL if exp_coords else JointType.SPHERICAL_EULER
    # Joint 1: R0 = Rx(pi/8), chart qdot [2 2 2]
    q1_chart = np.array([math.pi / 8, 0.0, 0.0])
    qdot1_chart = np.array([2.0, 2.0, 2.0])
    if exp_coords:
        # same physical angular velocity: S_exp(q) qdot_exp = S_xyz(q_c) qdot_c
        w1 = _euler_xyz_S(q1_chart) @ qdot1_chart
        q1 = np.array([math.pi / 8, 0.0, 0.0])  # log(Rx(pi/8))
        from redmax_tpu.joints import KERNELS, derive_S

        S_exp = np.asarray(
            derive_S(KERNELS[JointType.SPHERICAL].Q_fn)(jnp.asarray(q1), {})
        )[:3, :]
        qdot1 = np.linalg.solve(S_exp, w1)
    else:
        q1, qdot1 = q1_chart, qdot1_chart
    b0 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(jt, None, b0, q=q1, qdot=qdot1)
    b1 = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
    b.joint(jt, 0, b1, E_pj=transl([0, 0, -10]), q=[math.pi / 2, 0, 0])
    return b


def scene_08_universal() -> SceneBuilder:
    """case 8: three universal joints."""
    b = SceneBuilder(name="Universal joint")
    b.Hexpected = {"bdf1": -2.5276246935781084e04, "bdf2": -1.3781281283808785e03}
    for i in range(3):
        body = b.body_cuboid(1.0, (1, 1, 10), E_ji=transl([0, 0, -5]))
        q = [math.pi / 8, 0] if i % 2 == 0 else [0, math.pi / 8]
        b.joint(
            JointType.UNIVERSAL,
            None if i == 0 else i - 1,
            body,
            E_pj=np.eye(4) if i == 0 else transl([0, 0, -10]),
            q=q,
        )
    return b


def scene_09_free3d(exp_coords: bool = True) -> SceneBuilder:
    """case 9: tumbling free body, h=5e-2, tEnd=6, weak gravity."""
    b = SceneBuilder(name="Free3D joint", h=5e-2, tEnd=6.0, grav=(0, 0, -1))
    if not exp_coords:
        b.Hexpected = {"bdf1": 4.3970920953724946e00, "bdf2": 4.5466508559364156e00}
    jt = JointType.FREE3D if exp_coords else JointType.FREE3D_EULER
    b0 = b.body_cuboid(1.0, (1, 1, 1))
    # At q=0 both charts have S_rot = I, so qdot carries over directly.
    b.joint(jt, None, b0, qdot=[0, 0, 3, 0.2, 0.4, 0.6])
    return b


def scene_10_loop() -> SceneBuilder:
    """case 10: four-bar-style loop closed by a stiff ForcePointPoint."""
    b = SceneBuilder(name="Loop")
    b.Hexpected = {"bdf1": 1.2376477982839792e03, "bdf2": 4.1146190850293169e03}
    sides = [(20, 1, 1), (1, 1, 10), (1, 1, 10), (20, 1, 1), (1, 1, 10)]
    E_ji = [
        np.eye(4),
        transl([0, 0, -5]),
        transl([0, 0, -5]),
        transl([10, 0, 0]),
        transl([0, 0, -5]),
    ]
    E_pj = [
        np.eye(4),
        transl([-10, 0, 0]),
        transl([10, 0, 0]),
        transl([0, 0, -10]),
        transl([10, 0, 0]),
    ]
    parents = [None, 0, 0, 1, 3]
    for i in range(5):
        body = b.body_cuboid(1.0, sides[i], E_ji=E_ji[i])
        if i == 0:
            b.joint(JointType.FIXED, None, body, E_pj=E_pj[i])
        else:
            qdot = [5.0] if i == 4 else [0.0]
            b.joint(
                JointType.REVOLUTE, parents[i], body, E_pj=E_pj[i], axis=(0, 1, 0), qdot=qdot
            )
    b.force_point_point(2, 3, [0, 0, -5], [10, 0, 0], k=1e7, d=0.0)
    return b


def scene_11_ground() -> SceneBuilder:
    """case 11: free2D cuboid bouncing on frictional ground, h=5e-4."""
    b = SceneBuilder(name="Free2D with ground", h=5e-4, tEnd=0.6, grav=(0, -980, 0))
    b.Hexpected = {"bdf1": -4.4208045000000002e03, "bdf2": -2.7811251900394832e03}
    b0 = b.body_cuboid(1.0, (3, 1, 1))
    b.joint(JointType.FREE2D, None, b0, q=[-1, 2, 0], qdot=[5, 70, 2])
    b.force_ground_cuboid(
        b0, E_ground=_rot([1, 0, 0], -math.pi / 2), kn=1e5, kt=1e2, kd=3e1, mu=0.5
    )
    return b


def scene_12_spring_damper() -> SceneBuilder:
    """case 12: two-link chain with two stiff spring-dampers."""
    b = SceneBuilder(name="Spring-damper")
    b.Hexpected = {"bdf1": -2.2145412057327565e04, "bdf2": -8.9887693524038732e03}
    b0 = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
    b.joint(JointType.REVOLUTE, None, b0, axis=(0, 1, 0))
    b1 = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
    b.joint(JointType.REVOLUTE, 0, b1, E_pj=transl([10, 0, 0]), axis=(0, 1, 0))
    b.force_spring_damper(-1, 1, [-5, 0, -5], [0, 0, -2], k=1e6, d=1e3)
    b.force_spring_damper(0, 1, [0, 0, 2], [0, 0, 2], k=1e6, d=1e3)
    return b


def scene_13_cables() -> SceneBuilder:
    """case 13: cable routed over two links to a stiff prismatic slider."""
    b = SceneBuilder(name="Cables")
    b.Hexpected = {"bdf1": -3.1874892332895153e04, "bdf2": -2.7872894793863266e04}
    b0 = b.body_cuboid(1.0, (0.1, 0.1, 0.1))
    b.joint(JointType.FIXED, None, b0)
    b1 = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
    b.joint(JointType.REVOLUTE, 0, b1, axis=(0, 1, 0), q=[math.pi / 2])
    b2 = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
    b.joint(
        JointType.REVOLUTE, 1, b2, E_pj=transl([10, 0, 0]), axis=(0, 1, 0), q=[-math.pi / 2]
    )
    b3 = b.body_cuboid(1.0, (1, 1, 1))
    j3 = b.joint(JointType.PRISMATIC, 0, b3, E_pj=transl([10, 0, 0]), axis=(1, 0, 0))
    b.set_stiffness(j3, 1e4)
    b.set_damping(j3, 1e3)
    b.force_cable(
        [b3, b1, b2], [[0, 0, 0], [-4, 0, 1], [-4, 0, 1]], k=1e6, d=1e3
    )
    return b


def scene_14_joint_limits() -> SceneBuilder:
    """case 14: three-link chain with penalty joint limits, h=5e-3."""
    b = SceneBuilder(name="Joint limits", h=5e-3)
    b.Hexpected = {"bdf1": -2.5928305306546572e04, "bdf2": -1.8476279319765570e04}
    for i in range(3):
        body = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
        if i == 0:
            j = b.joint(
                JointType.REVOLUTE, None, body, E_pj=_rot([0, 1, 0], math.pi / 2),
                axis=(0, 1, 0), q=[0.0],
            )
        else:
            j = b.joint(
                JointType.REVOLUTE, i - 1, body, E_pj=transl([10, 0, 0]),
                axis=(0, 1, 0), q=[-math.pi / 6],
            )
        b.set_limits(j, lower=-math.pi / 2, upper=0.0, k=1e5, d=1e2)
        b.set_damping(j, 1e2)
    return b


def scene_m2_single_revolute() -> SceneBuilder:
    """case -2 'Single revolute' (scenesRedMax.m:13-26): one cuboid on a
    y-axis hinge, qdot(0)=1."""
    b = SceneBuilder(name="Single revolute")
    body = b.body_cuboid(1.0, (2, 0.2, 0.2), E_ji=transl([1, 0, 0]))
    b.joint(JointType.REVOLUTE, None, body, axis=(0, 1, 0), qdot=[1.0])
    return b


def scene_m1_simpler_chain(nbodies: int = 1) -> SceneBuilder:
    """case -1 'Simpler serial chain' (scenesRedMax.m:27-51): 10x1x1 links,
    stiffness 1e6, damping 1e4."""
    b = SceneBuilder(name="Simpler serial chain")
    for i in range(nbodies):
        body = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
        j = b.joint(
            JointType.REVOLUTE,
            None if i == 0 else i - 1,
            body,
            E_pj=np.eye(4) if i == 0 else transl([10, 0, 0]),
            axis=(0, 1, 0),
            q=[0.0] if i == 0 else [math.pi / 4],
            qdot=[1.0],
        )
        b.set_stiffness(j, 1e6)
        b.set_damping(j, 1e4)
    return b


def scene_100_adjoint(nbodies: int = 2) -> SceneBuilder:
    """cases 100/101: two-link chain for the adjoint point-position task."""
    b = SceneBuilder(name="Adjoint")
    for i in range(nbodies):
        body = b.body_cuboid(1.0, (10, 1, 1), E_ji=transl([5, 0, 0]))
        q = [math.pi / 2] if i == 0 else [math.pi / 4]
        j = b.joint(
            JointType.REVOLUTE,
            None if i == 0 else i - 1,
            body,
            E_pj=np.eye(4) if i == 0 else transl([10, 0, 0]),
            axis=(0, 1, 0),
            q=q,
            qdot=[1.0],
        )
        b.set_stiffness(j, 1e4)
        b.set_damping(j, 1e4)
    return b


def scene_chain(
    nlinks: int = 12,
    link_len: float = 1.0,
    density: float = 1.0,
    stiffness: float = 0.0,
    damping: float = 1.0,
    h: float = 1e-2,
    tEnd: float = 0.5,
    grav=(0.0, 0.0, -980.0),
) -> SceneBuilder:
    """Parametric serial revolute chain (nlinks DOF) — the MPC benchmark
    scene (BASELINE.json: 12-DOF chain) and the analogue of the reference's
    procedural chain generator (c++/PCG/src/RigidBodyCreator.cpp loadChain).
    Alternating y/z axes so the chain moves in 3D.
    """
    b = SceneBuilder(name=f"chain-{nlinks}", h=h, tEnd=tEnd, grav=grav)
    sides = (link_len, 0.1 * link_len, 0.1 * link_len)
    for i in range(nlinks):
        body = b.body_cuboid(density, sides, E_ji=transl([link_len / 2, 0, 0]))
        axis = (0, 1, 0) if i % 2 == 0 else (0, 0, 1)
        j = b.joint(
            JointType.REVOLUTE,
            None if i == 0 else i - 1,
            body,
            E_pj=np.eye(4) if i == 0 else transl([link_len, 0, 0]),
            axis=axis,
        )
        if stiffness:
            b.set_stiffness(j, stiffness)
        if damping:
            b.set_damping(j, damping)
    return b


def scene_chain_ground(
    nlinks: int = 12,
    link_len: float = 1.0,
    density: float = 1.0,
    damping: float = 1.0,
    h: float = 1e-2,
    tEnd: float = 0.5,
    floor_z: float = None,
    kn: float = 1e4,
    kt: float = 1e2,
    kd: float = 3e1,
    mu: float = 0.5,
    contact_links=None,
) -> SceneBuilder:
    """scene_chain + penalty ground contact (ForceGroundCuboid) on every
    link — the differentiable-contact MPC benchmark scene (the role of
    matlab-diff scene 11, ForceGroundCuboid.m + scenesRedMax.m:290-311,
    composed with the loadChain generator). The floor plane is z-up at
    floor_z (default: 1.5 link lengths below the root, so a swinging chain
    strikes it mid-horizon). contact_links limits contact to a subset of
    link indices (default: all)."""
    b = scene_chain(nlinks=nlinks, link_len=link_len, density=density,
                    damping=damping, h=h, tEnd=tEnd)
    b.name = f"chain-ground-{nlinks}"
    if floor_z is None:
        floor_z = -1.5 * link_len
    E_g = np.eye(4)
    E_g[2, 3] = floor_z
    for i in (range(nlinks) if contact_links is None else contact_links):
        b.force_ground_cuboid(i, E_ground=E_g, kn=kn, kt=kt, kd=kd, mu=mu)
    return b


def scene_tree(depth: int = 4, branch: int = 2, link_len: float = 1.0,
               density: float = 1.0, h: float = 1e-2, tEnd: float = 0.5) -> SceneBuilder:
    """Procedural branching tree (RigidBodyCreator::loadSimpleTree/loadTree,
    c++/PCG/src/RigidBodyCreator.cpp): `branch` children per joint down to
    `depth` levels, alternating y/z hinge axes."""
    b = SceneBuilder(name=f"tree-d{depth}b{branch}", h=h, tEnd=tEnd)
    sides = (link_len, 0.1 * link_len, 0.1 * link_len)

    def add(parent, level, offset):
        body = b.body_cuboid(density, sides, E_ji=transl([link_len / 2, 0, 0]))
        axis = (0, 1, 0) if level % 2 == 0 else (0, 0, 1)
        E_pj = np.eye(4) if parent is None else transl([link_len, offset, 0])
        j = b.joint(JointType.REVOLUTE, parent, body, E_pj=E_pj, axis=axis)
        b.set_damping(j, 1.0)
        if level + 1 < depth:
            for k in range(branch):
                off = 0.05 * link_len * (k - (branch - 1) / 2)
                add(j, level + 1, off)

    add(None, 0, 0.0)
    return b


def scene_bridge(nplanks: int = 8, density: float = 1.0, h: float = 1e-2,
                 tEnd: float = 0.5) -> SceneBuilder:
    """Procedural plank bridge closed by a loop constraint
    (RigidBodyCreator::loadSimpleBridge/loadBridge): a revolute chain of
    planks between two anchors, the far end loop-closed to a fixed block."""
    b = SceneBuilder(name=f"bridge-{nplanks}", h=h, tEnd=tEnd)
    plank = (1.0, 0.4, 0.1)
    b0 = b.body_cuboid(density, (0.2, 0.4, 0.2))
    b.joint(JointType.FIXED, None, b0)
    prev = 0
    # Sagging arc (a taut horizontal bridge is a singular four-bar).
    sag = 0.3
    x, z, th = 0.2, 0.0, 0.0
    for i in range(nplanks):
        dq = -sag if i < nplanks // 2 else (
            sag * (2.0 if i == nplanks // 2 else 1.0)
        )
        body = b.body_cuboid(density, plank, E_ji=transl([0.5, 0, 0]))
        j = b.joint(JointType.REVOLUTE, prev, body,
                    E_pj=transl([0.2 if i == 0 else 1.0, 0, 0]),
                    axis=(0, 1, 0), q=[dq])
        b.set_damping(j, 0.5)
        th += dq
        x += math.cos(th)
        z += math.sin(th)  # y-axis hinge: +q rotates x toward -z... track both
        prev = j
    # Anchor exactly at the chain tip (computed via the same FK the
    # compiler uses, so the loop starts satisfied).
    import jax.numpy as _j
    from redmax_tpu import model as _m
    tmp = b.compile()
    kin0 = _m.forward_kinematics(tmp.topo, tmp.params, tmp.state0.q,
                                 tmp.state0.qdot)
    tip = np.asarray(kin0.E_wi[prev] @ _j.asarray([0.5, 0, 0, 1.0]))[:3]
    anchor = b.body_cuboid(density, (0.2, 0.4, 0.2))
    b.joint(JointType.FIXED, 0, anchor, E_pj=transl(tip))
    b.constraint_loop(prev, anchor, [0.5, 0, 0], [0.0, 0, 0])
    return b


def scene_umbrella(nribs: int = 6, density: float = 1.0, h: float = 1e-2,
                   tEnd: float = 0.5) -> SceneBuilder:
    """Procedural umbrella (RigidBodyCreator::loadUmbrella): a prismatic
    slider on a central pole driving `nribs` hinged ribs via stiff springs."""
    b = SceneBuilder(name=f"umbrella-{nribs}", h=h, tEnd=tEnd)
    pole = b.body_cuboid(density, (0.1, 0.1, 2.0))
    b.joint(JointType.FIXED, None, pole)
    slider = b.body_cuboid(density, (0.2, 0.2, 0.2))
    js = b.joint(JointType.PRISMATIC, 0, slider, E_pj=transl([0, 0, 0.5]),
                 axis=(0, 0, 1))
    b.set_stiffness(js, 50.0)
    b.set_damping(js, 5.0)
    for k in range(nribs):
        th = 2 * math.pi * k / nribs
        R = np.eye(4)
        c, s_ = math.cos(th), math.sin(th)
        R[:3, :3] = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]])
        R[:3, 3] = [0, 0, 1.0]
        rib = b.body_cuboid(density, (1.0, 0.05, 0.05), E_ji=transl([0.5, 0, 0]))
        j = b.joint(JointType.REVOLUTE, 0, rib, E_pj=R, axis=(0, 1, 0),
                    q=[-math.pi / 4])
        b.set_damping(j, 0.2)
        b.force_spring_damper(1, rib, [0.1 * c, 0.1 * s_, 0], [0.3, 0, 0],
                              k=200.0, d=2.0)
    return b


SCENES: Dict[int, Callable[[], SceneBuilder]] = {
    0: scene_00_serial_chain,
    1: scene_01_revolute_axes,
    2: scene_02_branching,
    3: scene_03_prismatic,
    4: scene_04_planar,
    5: scene_05_translational,
    6: scene_06_free2d,
    7: scene_07_spherical,
    8: scene_08_universal,
    9: scene_09_free3d,
    10: scene_10_loop,
    11: scene_11_ground,
    12: scene_12_spring_damper,
    13: scene_13_cables,
    14: scene_14_joint_limits,
    100: scene_100_adjoint,
    # case 101 'Adjoint BDF2' (scenesRedMax.m:437) is the same builder; the
    # BDF2 task + target [-10,0,-10] are picked at task-construction time.
    101: scene_100_adjoint,
    -2: scene_m2_single_revolute,
    -1: scene_m1_simpler_chain,
}


def build_scene(sid: int, dtype=None, **kw) -> CompiledScene:
    builder = SCENES[sid](**kw)
    if dtype is None:
        dtype = jnp.float64
    return builder.compile(dtype=dtype)
