"""SE(2) algebra unit tests (reference pose.hpp:150-206, util.hpp:125-195)."""

import jax.numpy as jnp
import numpy as np
import pytest

from my_lidar_graph_slam_tpu.utils import se2

rng = np.random.default_rng(42)


def rand_pose():
    return rng.uniform(-5, 5, size=3)


@pytest.mark.parametrize("seed", range(5))
def test_compound_inverse_roundtrip(seed):
    a, b = rand_pose(), rand_pose()
    ab = se2.compound(jnp.asarray(a), jnp.asarray(b))
    rel = se2.inverse_compound(jnp.asarray(a), ab)
    np.testing.assert_allclose(np.asarray(rel), b, atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_move_backward_inverts_compound(seed):
    start, diff = rand_pose(), rand_pose()
    end = se2.compound(jnp.asarray(start), jnp.asarray(diff))
    back = se2.move_backward(end, jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(back), start, atol=1e-5)


def test_compound_identity():
    p = rand_pose()
    out = se2.compound(jnp.asarray(p), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), p, atol=1e-6)


def test_normalize_angle():
    vals = np.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0, -7.0, 2 * np.pi])
    out = np.asarray(se2.normalize_angle(jnp.asarray(vals)))
    assert np.all(out <= np.pi + 1e-6)
    assert np.all(out >= -np.pi - 1e-6)
    np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-5)
    np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-5)


def test_batched_compound_matches_loop():
    a = rng.uniform(-3, 3, size=(16, 3))
    b = rng.uniform(-3, 3, size=(16, 3))
    batched = np.asarray(se2.compound(jnp.asarray(a), jnp.asarray(b)))
    for i in range(16):
        single = se2.compound_np(a[i], b[i])
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_np_and_jnp_mirrors_agree():
    a, b = rand_pose(), rand_pose()
    np.testing.assert_allclose(
        np.asarray(se2.inverse_compound(jnp.asarray(a), jnp.asarray(b))),
        se2.inverse_compound_np(a, b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(se2.move_backward(jnp.asarray(a), jnp.asarray(b))),
        se2.move_backward_np(a, b), atol=1e-5)


def test_rotate_covariance_roundtrip():
    cov = rng.uniform(-1, 1, size=(3, 3))
    cov = cov @ cov.T + np.eye(3)
    pose = rand_pose()
    robot = se2.covariance_world_to_robot(jnp.asarray(pose), jnp.asarray(cov))
    world = se2.covariance_robot_to_world(jnp.asarray(pose), robot)
    np.testing.assert_allclose(np.asarray(world), cov, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(robot), se2.covariance_world_to_robot_np(pose, cov),
        atol=1e-4)


def test_rotation_preserves_theta_variance():
    cov = np.diag([0.5, 0.2, 0.03])
    rot = se2.rotate_covariance(jnp.asarray(0.7), jnp.asarray(cov))
    assert np.isclose(np.asarray(rot)[2, 2], 0.03, atol=1e-6)
