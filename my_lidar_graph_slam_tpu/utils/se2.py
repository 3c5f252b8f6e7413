"""SE(2) pose algebra as vmappable JAX functions.

Poses are arrays of shape ``[..., 3]`` holding ``(x, y, theta)``. Every
function broadcasts over leading axes, so the same code path serves a single
pose on the host and a million candidate poses on a TPU lane.

Reference parity: ``Compound`` / ``InverseCompound`` / ``MoveForward`` /
``MoveBackward`` (reference pose.hpp:150-206), ``NormalizeAngle``
(util.hpp:125-144), covariance frame rotation (util.hpp:164-195).

A NumPy mirror (``*_np``) is provided for host-side bookkeeping where JAX
dispatch overhead is not worth paying (a few poses per scan).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# JAX versions (device, vmappable)
# --------------------------------------------------------------------------


def normalize_angle(theta):
    """Normalize angles to (-pi, pi]. Mirrors util.hpp:125-135."""
    t = jnp.mod(theta, 2.0 * jnp.pi)
    t = jnp.where(t > jnp.pi, t - 2.0 * jnp.pi, t)
    t = jnp.where(t < -jnp.pi, t + 2.0 * jnp.pi, t)
    return t


def normalize_pose(pose):
    """Normalize the angular component of a pose array ``[..., 3]``."""
    return jnp.concatenate(
        [pose[..., :2], normalize_angle(pose[..., 2:3])], axis=-1)


def compound(start, diff):
    """SE(2) compounding ``start (+) diff`` (pose.hpp:150-161)."""
    s = jnp.sin(start[..., 2])
    c = jnp.cos(start[..., 2])
    x = c * diff[..., 0] - s * diff[..., 1] + start[..., 0]
    y = s * diff[..., 0] + c * diff[..., 1] + start[..., 1]
    t = start[..., 2] + diff[..., 2]
    return jnp.stack([x, y, t], axis=-1)


def inverse_compound(start, end):
    """Relative pose of ``end`` in the frame of ``start`` (pose.hpp:165-180)."""
    s = jnp.sin(start[..., 2])
    c = jnp.cos(start[..., 2])
    dx = end[..., 0] - start[..., 0]
    dy = end[..., 1] - start[..., 1]
    x = c * dx + s * dy
    y = -s * dx + c * dy
    t = end[..., 2] - start[..., 2]
    return jnp.stack([x, y, t], axis=-1)


def move_forward(start, diff):
    """Alias of :func:`compound` (pose.hpp:185-190)."""
    return compound(start, diff)


def move_backward(end, diff):
    """Pose ``p`` such that ``compound(p, diff) == end`` (pose.hpp:195-206)."""
    t = end[..., 2] - diff[..., 2]
    s = jnp.sin(t)
    c = jnp.cos(t)
    x = end[..., 0] - c * diff[..., 0] + s * diff[..., 1]
    y = end[..., 1] - s * diff[..., 0] - c * diff[..., 1]
    return jnp.stack([x, y, t], axis=-1)


def rotation_matrix(theta):
    """SE(2) covariance rotation matrix ``[..., 3, 3]`` (util.hpp:164-179)."""
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def rotate_covariance(theta, cov):
    """``R(theta) @ cov @ R(theta)^T`` for ``cov [..., 3, 3]``.

    Uses full-precision contractions: 3x3 pose algebra must not run at the
    default reduced matmul precision.
    """
    rot = rotation_matrix(theta)
    tmp = jnp.einsum("...ij,...jk->...ik", rot, cov, precision="highest")
    return jnp.einsum("...ik,...lk->...il", tmp, rot, precision="highest")


def covariance_world_to_robot(pose, cov):
    """World-frame covariance -> robot frame (util.hpp:182-187)."""
    return rotate_covariance(-pose[..., 2], cov)


def covariance_robot_to_world(pose, cov):
    """Robot-frame covariance -> world frame (util.hpp:190-195)."""
    return rotate_covariance(pose[..., 2], cov)


def distance(p0, p1=None):
    """Euclidean translation distance (pose.hpp:121-131)."""
    if p1 is None:
        return jnp.hypot(p0[..., 0], p0[..., 1])
    return jnp.hypot(p0[..., 0] - p1[..., 0], p0[..., 1] - p1[..., 1])


# --------------------------------------------------------------------------
# NumPy mirrors (host bookkeeping)
# --------------------------------------------------------------------------


def normalize_angle_np(theta):
    t = np.mod(theta, 2.0 * np.pi)
    t = np.where(t > np.pi, t - 2.0 * np.pi, t)
    t = np.where(t < -np.pi, t + 2.0 * np.pi, t)
    return t


def compound_np(start, diff):
    start = np.asarray(start, dtype=np.float64)
    diff = np.asarray(diff, dtype=np.float64)
    s, c = np.sin(start[..., 2]), np.cos(start[..., 2])
    return np.stack([
        c * diff[..., 0] - s * diff[..., 1] + start[..., 0],
        s * diff[..., 0] + c * diff[..., 1] + start[..., 1],
        start[..., 2] + diff[..., 2],
    ], axis=-1)


def inverse_compound_np(start, end):
    start = np.asarray(start, dtype=np.float64)
    end = np.asarray(end, dtype=np.float64)
    s, c = np.sin(start[..., 2]), np.cos(start[..., 2])
    dx = end[..., 0] - start[..., 0]
    dy = end[..., 1] - start[..., 1]
    return np.stack([
        c * dx + s * dy,
        -s * dx + c * dy,
        end[..., 2] - start[..., 2],
    ], axis=-1)


def move_backward_np(end, diff):
    end = np.asarray(end, dtype=np.float64)
    diff = np.asarray(diff, dtype=np.float64)
    t = end[..., 2] - diff[..., 2]
    s, c = np.sin(t), np.cos(t)
    return np.stack([
        end[..., 0] - c * diff[..., 0] + s * diff[..., 1],
        end[..., 1] - s * diff[..., 0] - c * diff[..., 1],
        t,
    ], axis=-1)


def rotate_covariance_np(theta, cov):
    s, c = np.sin(theta), np.cos(theta)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return rot @ np.asarray(cov) @ rot.T


def covariance_world_to_robot_np(pose, cov):
    return rotate_covariance_np(-np.asarray(pose)[2], cov)


def distance_np(p0, p1=None):
    p0 = np.asarray(p0)
    if p1 is None:
        return np.hypot(p0[..., 0], p0[..., 1])
    p1 = np.asarray(p1)
    return np.hypot(p0[..., 0] - p1[..., 0], p0[..., 1] - p1[..., 1])
