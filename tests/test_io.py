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
    # binaries are untracked (repo hygiene); _native_export builds on demand
    if export._native_export() is None:
        pytest.skip("no C toolchain to build csrc/_export.so")
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


def test_export_html_viewer(tmp_path):
    """export_html writes a self-contained interactive viewer: one file, no
    external resources, embedded trajectory JSON with the right shape, the
    ground plane auto-detected from ground-contact force params."""
    from redmax_tpu.scenes import scene_chain_ground

    sc = scene_chain_ground(nlinks=3, floor_z=-1.0).compile()
    traj = np.stack([np.asarray(sc.state0.q),
                     np.asarray(sc.state0.q) + 0.1,
                     np.asarray(sc.state0.q) + 0.2])
    path = export.export_html(sc, traj, str(tmp_path / "viewer.html"))
    html = open(path).read()
    assert "<canvas" in html and "http" not in html.split("</title>")[1], \
        "viewer must be offline-self-contained"
    data = json.loads(html.split("const DATA=")[1].split(";\n")[0])
    assert len(data["frames"]) == 3
    assert len(data["frames"][0]) == sc.topo.njoints
    assert len(data["frames"][0][0]) == 12          # 9 R + 3 p per body
    assert len(data["sides"]) == sc.topo.njoints
    assert data["floor_z"] == -1.0                  # auto-detected
    assert data["h"] is not None


def test_checkpoint_roundtrip(tmp_path):
    from redmax_tpu import checkpoint

    tree = {"q": jnp.arange(5.0), "step": jnp.asarray(7)}
    p = checkpoint.save_checkpoint(str(tmp_path / "ck"), tree)
    back = checkpoint.load_checkpoint(p, tree)
    np.testing.assert_allclose(np.asarray(back["q"]), np.arange(5.0))


def test_brender_export_addon_schema(tmp_path):
    """export_brender writes the bundle blender_import_obj_base.py ingests:
    header.objs (existing OBJ paths) + header.states + per-frame SRT dicts
    with the addon's quat ordering (rotation_quaternion = (q[3], q[0], q[1],
    q[2]) — i.e. [x, y, z, w] in the file)."""
    import json

    import numpy as np

    from redmax_tpu import se3
    from redmax_tpu.export import export_brender
    from redmax_tpu.scenes import scene_chain

    b = scene_chain(nlinks=3)
    sc = b.compile()
    rng = np.random.default_rng(0)
    traj = 0.3 * rng.normal(size=(4, sc.topo.nr))
    path = export_brender(sc, traj, str(tmp_path), bodies=b.bodies)
    doc = json.load(open(path))

    assert set(doc) == {"header", "body"}
    for op in doc["header"]["objs"]:
        assert os.path.isfile(op), op
        first = open(op).readline()
        assert first.startswith("v ")
    names = [s["name"] for s in doc["header"]["states"]]
    assert len(names) == sc.topo.njoints
    assert all(s["obj"] in (0, 1) for s in doc["header"]["states"])

    assert len(doc["body"]) == 4
    fr = doc["body"][0]
    assert fr["frame"] == 1
    from redmax_tpu import model
    import jax.numpy as jnp

    kin = model.forward_kinematics(
        sc.topo, sc.params, jnp.asarray(traj[0]),
        jnp.zeros(sc.topo.nr), sc.state0.aux,
    )
    for i, name in enumerate(names):
        st = fr[name]
        assert set(st) == {"scale", "quat", "location"}
        E = np.asarray(kin.E_wi[i])
        np.testing.assert_allclose(st["location"], E[:3, 3], atol=1e-6)
        # reconstruct R from the addon's (w, x, y, z) = (q[3], q[0..2]) read
        x, y, z, w = st["quat"]
        R = np.asarray(se3.q_to_mat(jnp.asarray([w, x, y, z])))
        np.testing.assert_allclose(R, E[:3, :3], atol=1e-6)
        # cuboid scale = body sides
        np.testing.assert_allclose(st["scale"], np.asarray(b.bodies[i].sides),
                                   atol=0)


def test_checkpoint_npz_backend(tmp_path):
    """npz fallback round-trips with explicit leaf_NNNNN key naming and
    rejects structure mismatches instead of silently mis-zipping."""
    from redmax_tpu import checkpoint

    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.asarray(3), "d": jnp.ones(2)}}
    p = checkpoint.save_checkpoint(str(tmp_path / "ck"), tree, backend="npz")
    assert p.endswith(".npz")
    data = np.load(p)
    assert sorted(data.files) == ["leaf_00000", "leaf_00001", "leaf_00002"]
    back = checkpoint.load_checkpoint(p, tree, backend="npz")
    np.testing.assert_allclose(np.asarray(back["b"]["d"]), np.ones(2))
    with pytest.raises(ValueError):
        checkpoint.load_checkpoint(p, {"a": jnp.zeros(4)}, backend="npz")


@pytest.mark.parametrize("backend", ["auto", "npz"])
def test_mpc_checkpoint_resume(tmp_path, backend):
    """Checkpoint/resume in anger (SURVEY section 5): a multi-iteration
    batched MPC Adam optimization snapshotted every 2 iterations resumes
    BIT-EXACTLY — an interrupted run re-driven through checkpointed_run
    lands on the same (P, opt_state) as the uninterrupted run."""
    import optax

    from redmax_tpu import checkpoint, mpc
    from redmax_tpu.integrators import NewtonConfig
    from redmax_tpu.types import State

    sc = scene_chain(nlinks=2).compile(dtype=jnp.float32)
    cfg = NewtonConfig(fixed_iters=2, predictor="quadratic", chord=True,
                       hessian="structured", linsolve="gj")
    task = mpc.PointPosTask(body=1, wp=1.0, wreg=1e-6, pscale=1e3)
    obj = mpc.make_objective_batched(
        sc.topo, (), task, jnp.array([0.5, 0.0, 0.0], jnp.float32),
        nsteps=3, cfg=cfg, use_pallas=False,
    )
    B = 2
    rng = np.random.default_rng(0)
    P0 = jnp.asarray(0.003 * rng.normal(size=(B, sc.topo.nr)), jnp.float32)
    s0 = State(q=jnp.tile(sc.state0.q, (B, 1)),
               qdot=jnp.tile(sc.state0.qdot, (B, 1)), aux={})
    tgt = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    opt = optax.adam(0.05)

    @jax.jit
    def iterate(carry, _i):
        P, opt_state = carry
        g = jax.grad(lambda PP: jnp.sum(obj(sc.params, PP, s0, tgt)))(P)
        updates, opt_state = opt.update(g, opt_state, P)
        return (optax.apply_updates(P, updates), opt_state)

    carry0 = (P0, opt.init(P0))
    n = 6

    # Uninterrupted reference run (no checkpoint dir involvement).
    ref = carry0
    for i in range(n):
        ref = iterate(ref, i)

    # Interrupted run: 3 iterations, then a fresh checkpointed_run resumes
    # from the snapshot and finishes.
    d = str(tmp_path / backend)
    part = checkpoint.checkpointed_run(iterate, carry0, 3, d, every=2,
                                       backend=backend)
    full = checkpoint.checkpointed_run(iterate, carry0, n, d, every=2,
                                       backend=backend)
    # resume-equality: bit-exact P and Adam moments
    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    del part
