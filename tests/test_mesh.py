"""Mesh geometry kernels: native C vs numpy parity + analytic oracle."""

import numpy as np
import pytest

from redmax_tpu import mesh

OBJ = "/root/reference/matlab/cuboid.obj"


def test_native_lib_loads():
    assert mesh._native() is not None, "csrc/geometry.c failed to build"


def test_obj_parse_native_vs_python():
    V, F = mesh.read_obj(OBJ)
    V2, F2 = mesh._read_obj_py(OBJ)
    np.testing.assert_allclose(V, V2)
    assert (F == F2).all()


def test_volume_integrals_native_vs_python():
    V, F = mesh.read_obj(OBJ)
    a = mesh.volume_integrals(V, F)
    b = mesh._volume_integrals_py(V, F)
    assert abs(a[0] - b[0]) < 1e-12
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_allclose(x, y, atol=1e-12)


def test_mesh_inertia_matches_analytic_cuboid():
    """cuboid.obj is a [1,2,3] box: principal inertias m/12*(b^2+c^2)."""
    V, F = mesh.read_obj(OBJ)
    I6, E = mesh.mesh_mass_properties(V, F, 1.0)
    m = I6[3]
    assert abs(m - 6.0) < 1e-3
    expected = sorted([m / 12 * 13, m / 12 * 10, m / 12 * 5])
    np.testing.assert_allclose(sorted(I6[:3]), expected, rtol=1e-3)
    # E_oi is a rotation
    R = E[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) > 0


def test_composite_matches_separate_bodies():
    """Composite inertia equals the fixed-joint equivalent (scene 25 idiom)."""
    from redmax_tpu.scenes_matlab import build_mscene

    sc = build_mscene(25)
    # mass = cuboid 10 + cylinder pi*1*10
    assert abs(float(sc.params["I_i"][0, 3]) - (10.0 + np.pi * 10.0)) < 1e-9
