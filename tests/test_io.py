"""IO subsystems: scene text format, JSON round-trip, frame export,
checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import export, integrators, sceneio
from redmax_tpu.scenes import build_scene, scene_chain


def test_text_format_parse(tmp_path):
    """Parse a #link/#spring scene in the C++ input format (syntax.txt)."""
    txt = tmp_path / "scene.txt"
    txt.write_text(
        """#options
simt redCGnomat
#link
name top
dens 3
size 3 0.8 0.5
ppos 0 0 0
cpos -1.4 0 0
angl 0.25
type hinge 0 0 1
#link
name middle
dens 3
size 3 0.8 0.5
prnt top
ppos 1.4 0 0
cpos -1.4 0 0
angl 0
type hinge 0 0 1
#spring
lnka top
lnkb middle
posa 1 0 0
posb -1 0 0
stif 100
damp 1
"""
    )
    b = sceneio.load_scene_text(str(txt))
    sc = b.compile()
    assert sc.topo.njoints == 2
    assert sc.topo.nr == 2
    assert len(sc.force_fns) == 1
    # runs
    final = integrators.make_euler_step(sc.topo, sc.force_fns)(sc.params, sc.state0)
    assert not bool(jnp.any(jnp.isnan(final.q)))


def test_text_format_springpoint_spline(tmp_path):
    """#springpoint and #spline stanzas (syntax.txt full stanza set)."""
    txt = tmp_path / "scene.txt"
    txt.write_text(
        """#link
name root
dens 3
size 3 0.8 0.5
cpos -1.4 0 0
type hinge 0 0 1
#springpoint
lnka root
posa 1 0 0
axis 0 0 1
stif 50
#spline
prnt root
type cubic b-spline
ppos 0 0 1
1 0 0
2 0 0
3 1 0
"""
    )
    b = sceneio.load_scene_text(str(txt))
    assert len(b.spline_paths) == 1
    sp = b.spline_paths[0]
    assert sp["parent"] == 0 and len(sp["points"]) == 3
    sc = b.compile()
    assert len(sc.force_fns) == 1  # the point-direction spring
    final = integrators.make_euler_step(sc.topo, sc.force_fns)(sc.params, sc.state0)
    assert not bool(jnp.any(jnp.isnan(final.q)))


def test_json_roundtrip(tmp_path):
    b = scene_chain(nlinks=3)
    p = tmp_path / "scene.json"
    sceneio.save_scene_json(b, str(p))
    b2 = sceneio.load_scene_json(str(p))
    sc1, sc2 = b.compile(), b2.compile()
    np.testing.assert_allclose(np.asarray(sc1.params["E0_pj"]),
                               np.asarray(sc2.params["E0_pj"]))
    np.testing.assert_allclose(np.asarray(sc1.state0.q), np.asarray(sc2.state0.q))


def test_frame_export(tmp_path):
    from redmax_tpu import model

    sc = build_scene(0)
    ex = export.FrameExporter(sc, str(tmp_path))
    kin = model.forward_kinematics(sc.topo, sc.params, sc.state0.q, sc.state0.qdot)
    ex.add_frame(0.0, kin)
    path = ex.write()
    doc = json.load(open(path))
    assert len(doc["frames"]) == 1
    n = export.export_objs(sc, np.asarray(sc.state0.q)[None], str(tmp_path))
    assert n == 1
    assert os.path.exists(tmp_path / "frame_00000.obj")


def test_frame_export_native_matches_python(tmp_path):
    """The C writer (csrc/export.c) and the Python fallback emit identical
    OBJ bytes for the same trajectory."""
    sc = build_scene(0)
    traj = np.stack([np.asarray(sc.state0.q), np.asarray(sc.state0.q) + 0.1])
    sides = np.tile([1.0, 2.0, 0.5], (sc.topo.njoints, 1))

    d_native, d_py = tmp_path / "nat", tmp_path / "py"
    assert export._native_export() is not None
    n1 = export.export_objs(sc, traj, str(d_native), sides=sides)
    lib, export._EXPORT_LIB = export._EXPORT_LIB, False  # force fallback
    try:
        n2 = export.export_objs(sc, traj, str(d_py), sides=sides)
    finally:
        export._EXPORT_LIB = lib
    assert n1 == n2 == 2
    for k in range(2):
        a = (d_native / f"frame_{k:05d}.obj").read_text()
        b = (d_py / f"frame_{k:05d}.obj").read_text()
        assert a == b


def test_checkpoint_roundtrip(tmp_path):
    from redmax_tpu import checkpoint

    tree = {"q": jnp.arange(5.0), "step": jnp.asarray(7)}
    p = checkpoint.save_checkpoint(str(tmp_path / "ck"), tree)
    back = checkpoint.load_checkpoint(p, tree)
    np.testing.assert_allclose(np.asarray(back["q"]), np.arange(5.0))
