import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.utils import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return np.asarray(lie.quat_normalize(jnp.asarray(q)))


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    R = lie.quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(lie.quat_from_matrix(R))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    r1 = lie.quat_rotate(q, v)
    r2 = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    # keep |phi| < pi: beyond that, log returns the equivalent shorter rotation
    phi = rng.normal(size=(64, 3)).astype(np.float32)
    phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi * rng.uniform(0.01, 3.0, size=(64, 1)).astype(np.float32)
    q = lie.so3_exp_quat(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(q))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
    q = lie.so3_exp_quat(phi)
    np.testing.assert_allclose(np.asarray(q[:, 0]), 1.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(lie.so3_log(q))))


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8  # keep rotation angle safely below pi
    pose = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(pose))
    np.testing.assert_allclose(xi2, xi, atol=6e-3)  # float32 Jl*Jl^-1 roundtrip


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    pose = lie.se3_exp(jnp.asarray(xi))
    ident = lie.se3_compose(pose, lie.se3_inverse(pose))
    np.testing.assert_allclose(
        np.asarray(ident), np.asarray(lie.se3_identity((16,))), atol=1e-5
    )


def test_se3_apply_matches_matrix(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    pose = lie.se3_exp(jnp.asarray(xi))
    x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    y1 = lie.se3_apply(pose, x)
    M = lie.se3_to_matrix(pose)
    xh = jnp.concatenate([x, jnp.ones((8, 1))], -1)
    y2 = jnp.einsum("nij,nj->ni", M, xh)[:, :3]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_se3_retract_direction(rng):
    pose = lie.se3_identity()
    xi = jnp.asarray([0.1, 0, 0, 0, 0, 0], jnp.float32)
    p2 = lie.se3_retract(pose, xi)
    np.testing.assert_allclose(np.asarray(p2[4:]), [0.1, 0, 0], atol=1e-6)


def test_sim3_exp_apply(rng):
    xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.5
    sim = lie.sim3_exp(jnp.asarray(xi))
    # scale = exp(sigma)
    np.testing.assert_allclose(np.asarray(sim[:, 7]), np.exp(xi[:, 6]), rtol=1e-4)
    # inverse works
    ident = lie.sim3_compose(sim, lie.sim3_inverse(sim))
    np.testing.assert_allclose(
        np.asarray(ident), np.asarray(lie.sim3_identity((32,))), atol=1e-4
    )


def test_sim3_log_roundtrip(rng):
    xi = rng.normal(size=(16, 7)).astype(np.float32) * 0.4
    sim = lie.sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.sim3_log(sim))
    np.testing.assert_allclose(xi2, xi, atol=2e-3)


def test_sim3_reduces_to_se3(rng):
    xi6 = rng.normal(size=(8, 6)).astype(np.float32)
    xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], -1)
    sim = lie.sim3_exp(jnp.asarray(xi7))
    se = lie.se3_exp(jnp.asarray(xi6))
    np.testing.assert_allclose(np.asarray(sim[:, :7]), np.asarray(se), atol=1e-4)
    x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(lie.sim3_apply(sim, x)), np.asarray(lie.se3_apply(se, x)), atol=1e-4
    )
