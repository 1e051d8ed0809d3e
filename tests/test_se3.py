"""se3 module tests: algebraic identities + parity with the reference formulas.

Mirrors the reference's implicit contract (matlab-diff/se3.m): these ops are
the ground layer everything else builds on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redmax_tpu import se3

RNG = np.random.default_rng(0)


def rand_twist(n=()):
    return jnp.asarray(RNG.normal(size=(*n, 6)))


def rand_E(n=()):
    w = RNG.normal(size=(*n, 3))
    p = RNG.normal(size=(*n, 3))
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    E = np.zeros((*n, 4, 4))
    E[..., :3, :3] = R
    E[..., :3, 3] = p
    E[..., 3, 3] = 1.0
    return jnp.asarray(E)


def test_hat_unhat_roundtrip():
    w = jnp.asarray(RNG.normal(size=(5, 3)))
    assert np.allclose(se3.unhat3(se3.hat3(w)), w)
    phi = rand_twist((5,))
    assert np.allclose(se3.unhat6(se3.hat6(phi)), phi)


def test_inv():
    E = rand_E((4,))
    EE = E @ se3.inv(E)
    assert np.allclose(EE, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-12)


def test_Ad_group_homomorphism():
    E1, E2 = rand_E(), rand_E()
    assert np.allclose(se3.Ad(E1 @ E2), se3.Ad(E1) @ se3.Ad(E2), atol=1e-12)


def test_Ad_structure():
    """Ad(E) = [[R,0],[hat(p)R, R]] exactly as in se3.m:44."""
    E = rand_E()
    A = se3.Ad(E)
    R = E[:3, :3]
    p = E[:3, 3]
    assert np.allclose(A[:3, :3], R)
    assert np.allclose(A[3:, 3:], R)
    assert np.allclose(A[:3, 3:], 0)
    assert np.allclose(A[3:, :3], se3.hat3(p) @ R)


def test_ad_bracket():
    """ad(phi) psi = [hat(phi), hat(psi)] as se(3) matrices."""
    phi, psi = rand_twist(), rand_twist()
    lhs = se3.ad(phi) @ psi
    Hf, Hs = se3.hat6(phi), se3.hat6(psi)
    rhs = se3.unhat6(Hf @ Hs - Hs @ Hf)
    assert np.allclose(lhs, rhs, atol=1e-12)


def test_Addot_is_Ad_ad():
    """d/dt Ad(E(t)) along E' = E [phi] equals Ad(E) ad(phi) (se3.m:72)."""
    E = rand_E()
    phi = rand_twist()
    eps = 1e-7

    def Et(t):
        return E @ se3.exp(phi * t)

    fd = (se3.Ad(Et(eps)) - se3.Ad(Et(-eps))) / (2 * eps)
    assert np.allclose(fd, se3.Addot(E, phi), atol=1e-5)


def test_exp_log_roundtrip():
    phi = 0.8 * rand_twist((6,))
    assert np.allclose(se3.log(se3.exp(phi)), phi, atol=1e-9)


def test_exp_small_angle():
    phi = jnp.asarray([1e-12, -1e-12, 1e-12, 0.1, 0.2, 0.3])
    E = se3.exp(phi)
    assert np.allclose(E[:3, :3], np.eye(3), atol=1e-10)
    assert np.allclose(E[:3, 3], phi[3:], atol=1e-10)


def test_exp_matches_rodrigues():
    """exp_so3 equals the explicit Rodrigues formula of se3.m:263-287."""
    w = np.array([0.3, -1.2, 0.5])
    wlen = np.linalg.norm(w)
    u = w / wlen
    c, s = np.cos(wlen), np.sin(wlen)
    c1 = 1 - c
    wX, wY, wZ = u
    R_ref = np.array(
        [
            [c + wX * wX * c1, -wZ * s + wX * wY * c1, wY * s + wX * wZ * c1],
            [wZ * s + wX * wY * c1, c + wY * wY * c1, -wX * s + wY * wZ * c1],
            [-wY * s + wX * wZ * c1, wX * s + wY * wZ * c1, c + wZ * wZ * c1],
        ]
    )
    assert np.allclose(se3.exp_so3(jnp.asarray(w)), R_ref, atol=1e-14)


def test_aa_to_mat_matches_exp():
    axis = jnp.asarray([1.0, 2.0, -0.5])
    angle = 0.7
    R1 = se3.aa_to_mat(axis, angle)
    R2 = se3.exp_so3(axis / jnp.linalg.norm(axis) * angle)
    assert np.allclose(R1, R2, atol=1e-14)


def test_quaternion_roundtrip():
    E = rand_E((8,))
    R = E[..., :3, :3]
    q = se3.mat_to_q(R)
    R2 = se3.q_to_mat(q)
    assert np.allclose(R, R2, atol=1e-9)


def test_gamma_point_velocity():
    """x_world_dot = R Gamma(r) phi for a body-frame point r."""
    E = rand_E()
    phi = rand_twist()
    r = jnp.asarray(RNG.normal(size=3))
    eps = 1e-7

    def xw(t):
        Et = E @ se3.exp(phi * t)
        return Et[:3, :3] @ r + Et[:3, 3]

    fd = (xw(eps) - xw(-eps)) / (2 * eps)
    v = E[:3, :3] @ (se3.Gamma(r) @ phi)
    assert np.allclose(fd, v, atol=1e-6)


def test_inertia_cuboid():
    """Matches se3.inertiaCuboid (se3.m:366)."""
    m = se3.inertia_cuboid(jnp.asarray([10.0, 1.0, 1.0]), 1.0)
    mass = 10.0
    assert np.allclose(m[3:], mass)
    assert np.isclose(m[0], mass / 12 * (1 + 1))
    assert np.isclose(m[1], mass / 12 * (1 + 100))
    assert np.isclose(m[2], mass / 12 * (100 + 1))


def test_reparam_exp():
    w = jnp.asarray([0.0, 0.0, 1.7 * np.pi])
    w2 = se3.reparam_exp(w)
    assert np.linalg.norm(w2) < 1.5 * np.pi
    assert np.allclose(se3.exp_so3(w), se3.exp_so3(w2), atol=1e-12)
    # No-op below threshold
    w = jnp.asarray([0.0, 0.0, 1.0])
    assert np.allclose(se3.reparam_exp(w), w)


def test_batched_shapes():
    E = rand_E((3, 5))
    assert se3.Ad(E).shape == (3, 5, 6, 6)
    assert se3.inv(E).shape == (3, 5, 4, 4)
    phi = rand_twist((3, 5))
    assert se3.ad(phi).shape == (3, 5, 6, 6)
    assert se3.exp(phi).shape == (3, 5, 4, 4)


def test_rand_E_is_valid_transform():
    """rand_E (se3.m:355): orthonormal R with det=+1, batchable."""
    import jax

    E = se3.rand_E(jax.random.PRNGKey(0), (4,))
    assert E.shape == (4, 4, 4)
    R = np.asarray(E[:, :3, :3])
    for i in range(4):
        assert np.allclose(R[i].T @ R[i], np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R[i]), 1.0, atol=1e-12)
    assert np.allclose(np.asarray(E[:, 3]), [0, 0, 0, 1])
    # different keys -> different transforms
    E2 = se3.rand_E(jax.random.PRNGKey(1), (4,))
    assert not np.allclose(np.asarray(E), np.asarray(E2))


def test_dq_mat_roundtrip():
    """dqToMat/matToDq (se3.m:238-260): E -> dq -> E is the identity."""
    import jax

    E = se3.rand_E(jax.random.PRNGKey(7), (6,))
    dq = se3.mat_to_dq(E)
    assert dq.shape == (6, 4, 2)
    E2 = se3.dq_to_mat(dq)
    assert np.allclose(np.asarray(E2), np.asarray(E), atol=1e-12)
    # real part is a unit quaternion matching mat_to_q
    q0 = np.asarray(dq[..., 0])
    assert np.allclose(np.linalg.norm(q0, axis=-1), 1.0, atol=1e-12)
    # dual part satisfies the defining identity qe = 0.5 * t * q0 (quaternion
    # product with pure-vector t), i.e. 2 qe q0^* recovers the translation --
    # checked implicitly by the roundtrip; also check q0.qe = 0
    assert np.allclose(np.sum(q0 * np.asarray(dq[..., 1]), axis=-1), 0.0, atol=1e-12)
