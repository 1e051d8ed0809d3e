"""Frame export + visualization (the Brender/viewer role).

The reference ships an OpenGL viewer (c++/PCG/online/: GLFW + GLSL phong)
and the Brender Blender exporter (online/Brender/cpp/BrenderManager.h,
Brenderable.h:15-31: per-frame OBJ/JSON dumps + python import addons).
Here:

  * ``FrameExporter`` writes per-frame JSON (body world transforms +
    static geometry) in a Blender-importable layout — the Brender role;
  * ``export_objs`` writes per-frame OBJ files of transformed cuboid
    geometry (the per-frame OBJ dump mode of BrenderManager);
  * ``draw_scene`` renders a trajectory with matplotlib (the MATLAB
    draw()/viewer role) — optional, import-guarded.
"""

import json
import os
from typing import Dict, List, Optional

import numpy as np

_CUBE_VERTS = np.array(
    [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
)
_CUBE_FACES = np.array(
    [
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ]
)


class FrameExporter:
    """Accumulates frames and writes a Brender-style JSON bundle."""

    def __init__(self, scene, out_dir: str):
        self.scene = scene
        self.out_dir = out_dir
        self.frames: List[Dict] = []
        os.makedirs(out_dir, exist_ok=True)

    def add_frame(self, t: float, kin) -> None:
        self.frames.append(
            {
                "t": float(t),
                "E_wi": np.asarray(kin.E_wi).tolist(),
            }
        )

    def write(self) -> str:
        doc = {
            "name": self.scene.name,
            "bodies": [
                {
                    "name": getattr(bs, "name", f"body{i}"),
                    "sides": None
                    if getattr(bs, "sides", None) is None
                    else np.asarray(bs.sides).tolist(),
                }
                for i, bs in enumerate(getattr(self.scene, "body_specs", []))
            ],
            "frames": self.frames,
        }
        path = os.path.join(self.out_dir, "frames.json")
        with open(path, "w") as fh:
            json.dump(doc, fh)
        return path


_SPHERE_CACHE = None


def _unit_sphere(nsub: int = 2):
    """Unit icosphere (vertices, faces) by midpoint subdivision."""
    global _SPHERE_CACHE
    if _SPHERE_CACHE is not None:
        return _SPHERE_CACHE
    t = (1.0 + np.sqrt(5.0)) / 2.0
    V = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
        dtype=np.float64,
    )
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    F = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
    )
    for _ in range(nsub):
        verts = list(V)
        cache = {}
        newF = []

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                verts.append(m / np.linalg.norm(m))
                cache[key] = len(verts) - 1
            return cache[key]

        for a, b, c in F:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            newF += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        V = np.array(verts)
        F = np.array(newF)
    _SPHERE_CACHE = (V, F)
    return _SPHERE_CACHE


def _write_obj(path: str, V: np.ndarray, F: np.ndarray) -> None:
    with open(path, "w") as fh:
        for v in V:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in F:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def export_brender(scene, traj_q, out_dir: str, bodies=None,
                   group: str = "scene") -> str:
    """Write a Brender-compatible bundle the reference's Blender import
    addon ingests directly (online/Brender/python/blender_import_obj_base.py).

    Layout (mirrors RigidBodyMain::exportBrender, RigidBodyMain.cpp:747-840):

        {"header": {"objs": [<abs obj paths>],
                    "states": [{"obj": i, "name": n, "group": g}, ...]},
         "body": [{"frame": k,
                   "<name>": {"scale": [sx,sy,sz],
                              "quat": [qx,qy,qz,qw],   # addon reads [3],[0],[1],[2]
                              "location": [x,y,z]}, ...}, ...]}

    Template meshes (unit cube / unit sphere) are written next to the JSON
    and referenced by absolute path (the addon opens them verbatim); each
    body's scale carries its cuboid sides or sphere radius per frame.

    scene: CompiledScene; bodies: optional list of _BodySpec (SceneBuilder
    .bodies) supplying names/sides/radius — unit cubes otherwise.
    traj_q: [T, nr] recorded positions. Returns the JSON path.
    """
    import jax
    import jax.numpy as jnp

    from redmax_tpu import model, se3

    os.makedirs(out_dir, exist_ok=True)
    cube_path = os.path.abspath(os.path.join(out_dir, "cube.obj"))
    sphere_path = os.path.abspath(os.path.join(out_dir, "sphere.obj"))
    _write_obj(cube_path, _CUBE_VERTS, _CUBE_FACES)
    sV, sF = _unit_sphere()
    _write_obj(sphere_path, sV, sF)

    nb = scene.topo.njoints
    names, states, scales = [], [], []
    for i in range(nb):
        bs = None if bodies is None or i >= len(bodies) else bodies[i]
        name = (getattr(bs, "name", "") or f"body{i}") if bs else f"body{i}"
        names.append(name)
        radius = getattr(bs, "radius", None) if bs else None
        sides = getattr(bs, "sides", None) if bs else None
        if radius is not None:
            states.append({"obj": 1, "name": name, "group": group})
            scales.append([float(radius)] * 3)
        else:
            states.append({"obj": 0, "name": name, "group": group})
            s = np.ones(3) if sides is None else np.asarray(sides, np.float64)
            scales.append([float(v) for v in s])

    traj_q = jnp.asarray(traj_q)
    kin = jax.vmap(
        lambda q: model.forward_kinematics(
            scene.topo, scene.params, q, jnp.zeros_like(q), scene.state0.aux
        )
    )(traj_q)
    E = np.asarray(kin.E_wi, dtype=np.float64)       # [T, nb, 4, 4]
    Q = np.asarray(se3.mat_to_q(jnp.asarray(E[:, :, :3, :3])))  # [T,nb,4] wxyz

    frames = []
    for k in range(E.shape[0]):
        fr = {"frame": k + 1}                        # addon does frame-1
        for i, name in enumerate(names):
            w, x, y, z = Q[k, i]
            fr[name] = {
                "scale": scales[i],
                "quat": [float(x), float(y), float(z), float(w)],
                "location": [float(v) for v in E[k, i, :3, 3]],
            }
        frames.append(fr)

    doc = {
        "header": {"objs": [cube_path, sphere_path], "states": states},
        "body": frames,
    }
    path = os.path.join(out_dir, f"{scene.name or 'scene'}.json")
    with open(path, "w") as fh:
        json.dump(doc, fh)
    return path


_EXPORT_LIB = None


def _native_export():
    """ctypes handle to csrc/_export.so (BrenderManager's hot IO loop in C),
    or None — callers fall back to the pure-Python writer."""
    global _EXPORT_LIB
    if _EXPORT_LIB is not None:
        return _EXPORT_LIB or None
    import ctypes

    so = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc", "_export.so")
    try:
        lib = ctypes.CDLL(so)
        lib.write_frames_obj.restype = ctypes.c_int
        lib.write_frames_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
        ]
        _EXPORT_LIB = lib
    except OSError:
        _EXPORT_LIB = False
    return _EXPORT_LIB or None


def export_objs(scene, traj_q, out_dir: str, sides=None, stride: int = 1) -> int:
    """Write per-frame OBJs of cuboid bodies (BrenderManager OBJ mode).

    traj_q: [T, nr] recorded positions. FK runs once, batched over all
    frames (one vmap); the vertex-formatting/IO loop runs in native C
    (csrc/export.c) when available. Returns number of frames written.
    """
    import jax
    import jax.numpy as jnp

    from redmax_tpu import model

    os.makedirs(out_dir, exist_ok=True)
    traj_q = jnp.asarray(traj_q)
    kin = jax.vmap(
        lambda q: model.forward_kinematics(
            scene.topo, scene.params, q, jnp.zeros_like(q), scene.state0.aux
        )
    )(traj_q)
    E = np.ascontiguousarray(np.asarray(kin.E_wi, dtype=np.float64))  # [T,nb,4,4]
    T, nb = E.shape[:2]
    S = np.ascontiguousarray(
        np.ones((nb, 3)) if sides is None else np.asarray(sides, dtype=np.float64)
    )

    lib = _native_export()
    if lib is not None:
        import ctypes

        n = lib.write_frames_obj(
            out_dir.encode(),
            E.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            S.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            T, nb, stride,
        )
        if n >= 0:
            return n

    n = 0
    for k in range(0, T, stride):
        with open(os.path.join(out_dir, f"frame_{n:05d}.obj"), "w") as fh:
            voff = 1
            for b in range(nb):
                V = _CUBE_VERTS * S[b]
                Vw = V @ E[k, b, :3, :3].T + E[k, b, :3, 3]
                for v in Vw:
                    fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
                for f in _CUBE_FACES:
                    fh.write(f"f {f[0]+voff} {f[1]+voff} {f[2]+voff}\n")
                voff += 8
        n += 1
    return n


def draw_scene(scene, q, ax=None, sides=None):
    """matplotlib 3D wireframe of the scene at configuration q."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from redmax_tpu import model

    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    kin = model.forward_kinematics(
        scene.topo, scene.params, q, np.zeros_like(q), scene.state0.aux
    )
    E = np.asarray(kin.E_wi)
    for b in range(scene.topo.njoints):
        s = np.ones(3) if sides is None else np.asarray(sides[b])
        V = _CUBE_VERTS * s
        Vw = V @ E[b, :3, :3].T + E[b, :3, 3]
        for f in _CUBE_FACES:
            tri = Vw[f]
            ax.plot(tri[[0, 1, 2, 0], 0], tri[[0, 1, 2, 0], 1], tri[[0, 1, 2, 0], 2],
                    "b-", linewidth=0.3)
    return ax
