"""Velocity motion model: pose sampling + covariance propagation.

Port of MotionModelVelocity (motion_model_velocity.{hpp,cpp}) — built but
never instantiated by the reference launcher (a latent component); here it
serves as the odometry-uncertainty prior. Vectorized: ``sample_poses`` draws
a batch of particles in one call (the TPU-friendly form of the scalar
sampling loop), and covariance propagation mirrors the reference's
pose/velocity Jacobian composition (motion_model_velocity.cpp:85-140).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.utils import se2

TRANS_VELOCITY_MIN = 0.01   # motion_model_velocity.hpp:149
ANGULAR_VELOCITY_MIN = 0.01  # :151


@dataclasses.dataclass(frozen=True)
class AlphaCoefficients:
    """Variance = alpha-weighted squared velocities
    (motion_model_velocity.cpp:152-161)."""

    alpha_trans: float = 0.01
    alpha_angular_to_trans: float = 0.001
    alpha_trans_to_angular: float = 0.001
    alpha_angular: float = 0.01

    def variances(self, trans_velocity, angular_velocity, time_diff):
        del time_diff
        t2 = trans_velocity ** 2
        a2 = angular_velocity ** 2
        trans_var = self.alpha_trans * t2 + \
            self.alpha_angular_to_trans * a2
        ang_var = self.alpha_trans_to_angular * t2 + self.alpha_angular * a2
        return trans_var, ang_var


@dataclasses.dataclass(frozen=True)
class StandardDeviations:
    """Variance = stddev-weighted absolute velocities / dt
    (motion_model_velocity.cpp:162-178)."""

    std_dev_trans: float = 0.05
    std_dev_rot_to_trans: float = 0.05
    std_dev_trans_to_rot: float = 0.05
    std_dev_rot: float = 0.05

    def variances(self, trans_velocity, angular_velocity, time_diff):
        trans_var = (self.std_dev_trans ** 2 * jnp.abs(trans_velocity) +
                     self.std_dev_rot_to_trans ** 2 *
                     jnp.abs(angular_velocity)) / time_diff
        ang_var = (self.std_dev_trans_to_rot ** 2 *
                   jnp.abs(trans_velocity) +
                   self.std_dev_rot ** 2 *
                   jnp.abs(angular_velocity)) / time_diff
        return trans_var, ang_var


@dataclasses.dataclass(frozen=True)
class MotionModelVelocity:
    params: object = AlphaCoefficients()

    def velocities(self, rel_pose, time_diff):
        """Velocities from a relative pose
        (motion_model_velocity.cpp:17-33)."""
        trans = jnp.hypot(rel_pose[..., 0], rel_pose[..., 1]) / time_diff
        ang = rel_pose[..., 2] / time_diff
        return (jnp.maximum(trans, TRANS_VELOCITY_MIN),
                jnp.maximum(ang, ANGULAR_VELOCITY_MIN))

    def sample_poses(self, key, prev_pose, rel_pose, time_diff,
                     num_samples: int):
        """Draw ``num_samples`` noisy next poses (batched particle form of
        motion_model_velocity.cpp:36-82)."""
        tv, av = self.velocities(rel_pose, time_diff)
        tv_var, av_var = self.params.variances(tv, av, time_diff)
        k1, k2 = jax.random.split(key)
        noise_t = jax.random.normal(k1, (num_samples,))
        noise_a = jax.random.normal(k2, (num_samples,))
        tn = tv + jnp.sqrt(tv_var) * noise_t
        an = av + jnp.sqrt(av_var) * noise_a

        theta0 = prev_pose[2]
        new_theta = se2.normalize_angle(theta0 + an * time_diff)

        # Arc motion; straight-line fallback when the angular velocity is
        # almost zero (motion_model_velocity.cpp:58-67).
        safe_an = jnp.where(jnp.abs(an) < 1e-4, 1.0, an)
        radius = tn / safe_an
        arc_x = prev_pose[0] - radius * jnp.sin(theta0) + \
            radius * jnp.sin(new_theta)
        arc_y = prev_pose[1] + radius * jnp.cos(theta0) - \
            radius * jnp.cos(new_theta)
        line_x = prev_pose[0] + tn * jnp.cos(theta0) * time_diff
        line_y = prev_pose[1] + tn * jnp.sin(theta0) * time_diff
        straight = jnp.abs(an) < 1e-4
        x = jnp.where(straight, line_x, arc_x)
        y = jnp.where(straight, line_y, arc_y)
        return jnp.stack([x, y, new_theta], axis=-1)

    def compute_covariance(self, prev_pose, rel_pose, time_diff,
                           prev_cov):
        """Propagate pose covariance through the motion
        (motion_model_velocity.cpp:85-140)."""
        tv, av = self.velocities(rel_pose, time_diff)
        tv_var, av_var = self.params.variances(tv, av, time_diff)

        c = jnp.cos(prev_pose[2])
        s = jnp.sin(prev_pose[2])
        pose_jac = jnp.asarray([
            [1.0, 0.0, -tv * time_diff * s],
            [0.0, 1.0, tv * time_diff * c],
            [0.0, 0.0, 1.0]])
        vel_jac = jnp.asarray([
            [time_diff * c, 0.0],
            [time_diff * s, 0.0],
            [0.0, time_diff]])
        vel_cov = jnp.diag(jnp.stack([tv_var, av_var]))

        pose_component = jnp.einsum(
            "ij,jk,lk->il", pose_jac, prev_cov, pose_jac,
            precision="highest")
        vel_component = jnp.einsum(
            "ij,jk,lk->il", vel_jac, vel_cov, vel_jac, precision="highest")
        return pose_component + vel_component
