"""Pose-graph LM optimizer tests on synthetic noisy loops."""

import numpy as np
import pytest

from my_lidar_graph_slam_tpu.models import optimizer_lm, robust_loss
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.utils import se2


def make_noisy_loop(n=24, drift=0.03, seed=0):
    """Ground-truth circle; odometry edges with drift; one loop edge."""
    rng = np.random.default_rng(seed)
    radius = 3.0
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        gt.append([radius * np.cos(ang), radius * np.sin(ang),
                   ang + np.pi / 2])
    gt = np.asarray(gt)

    graph = PoseGraph()
    info_odom = np.diag([100.0, 100.0, 400.0])
    # Integrate noisy odometry for initial poses.
    pose = gt[0].copy()
    graph.append_node(pose, 0)
    for k in range(1, n):
        rel = se2.inverse_compound_np(gt[k - 1], gt[k])
        noisy_rel = rel + rng.normal(0, drift, 3) * [1, 1, 0.5]
        pose = se2.compound_np(pose, noisy_rel)
        graph.append_node(pose, k)
        graph.append_edge(k - 1, k, noisy_rel, info_odom)
    # Loop closure edge: exact relative pose from last node to node 0.
    rel = se2.inverse_compound_np(gt[-1], gt[0])
    graph.append_edge(n - 1, 0, rel, np.diag([1000.0, 1000.0, 4000.0]))
    return graph, gt


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_lm_reduces_error_and_fixes_gauge(solver):
    graph, gt = make_noisy_loop()
    arrays = graph.snapshot()
    cfg = optimizer_lm.LMConfig(solver=solver, max_iterations=20,
                                loss_name="Squared")
    loss = robust_loss.create("Squared")

    import jax.numpy as jnp
    err0 = float(optimizer_lm.total_error(
        jnp.asarray(arrays.poses), arrays, loss))
    res = optimizer_lm.optimize(arrays, cfg)
    err1 = float(res.total_error)
    assert err1 < 0.1 * err0

    # Gauge: first node pinned.
    out = np.asarray(res.poses)
    np.testing.assert_allclose(out[0], arrays.poses[0], atol=1e-3)

    # Loop closure pulls the final node near the ground truth.
    n = graph.num_nodes
    gt_err = np.linalg.norm(out[:n, :2] - gt[:, :2], axis=1)
    assert gt_err.max() < 0.25


def test_dense_and_cg_agree():
    graph, _ = make_noisy_loop(n=16, drift=0.02, seed=3)
    arrays = graph.snapshot()
    res_d = optimizer_lm.optimize(
        arrays, optimizer_lm.LMConfig(solver="dense", max_iterations=15,
                                      loss_name="Squared"))
    res_c = optimizer_lm.optimize(
        arrays, optimizer_lm.LMConfig(solver="cg", max_iterations=15,
                                      loss_name="Squared"))
    n = graph.num_nodes
    np.testing.assert_allclose(np.asarray(res_d.poses)[:n],
                               np.asarray(res_c.poses)[:n], atol=2e-3)


def test_huber_downweights_outlier_edge():
    graph, gt = make_noisy_loop(n=20, drift=0.01, seed=5)
    # Bogus loop edge (wrong by meters) with high confidence.
    graph.append_edge(10, 2, np.array([5.0, 5.0, 1.0]),
                      np.diag([1000.0, 1000.0, 4000.0]))
    arrays = graph.snapshot()
    n = graph.num_nodes

    res_sq = optimizer_lm.optimize(
        arrays, optimizer_lm.LMConfig(solver="dense", max_iterations=20,
                                      loss_name="Squared"))
    res_huber = optimizer_lm.optimize(
        arrays, optimizer_lm.LMConfig(solver="dense", max_iterations=20,
                                      loss_name="Huber", loss_scale=1.0))

    def gt_rmse(poses):
        p = np.asarray(poses)[:n, :2]
        return np.sqrt(((p - gt[:, :2]) ** 2).sum(axis=1).mean())

    # The robust loss must resist the outlier much better.
    assert gt_rmse(res_huber.poses) < 0.5 * gt_rmse(res_sq.poses)


def test_edge_error_jacobian_consistency():
    """Analytic Jacobians vs finite differences
    (the reference's own debug pattern, cost_function_square_error.cpp:138)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    pi = rng.uniform(-2, 2, 3)
    pj = rng.uniform(-2, 2, 3)
    rel = rng.uniform(-1, 1, 3)

    poses = jnp.asarray(np.stack([pi, pj]), jnp.float32)
    ei = jnp.asarray([0], jnp.int32)
    ej = jnp.asarray([1], jnp.int32)
    er = jnp.asarray(rel[None], jnp.float32)

    ji, jj = optimizer_lm.edge_jacobians(poses, ei, ej)
    eps = 1e-3

    def err_at(p0, p1):
        ps = jnp.asarray(np.stack([p0, p1]), jnp.float32)
        return np.asarray(
            optimizer_lm.edge_errors(ps, ei, ej, er))[0]

    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        fd_i = (err_at(pi + d, pj) - err_at(pi - d, pj)) / (2 * eps)
        fd_j = (err_at(pi, pj + d) - err_at(pi, pj - d)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(ji)[0][:, k], fd_i, atol=2e-2)
        np.testing.assert_allclose(np.asarray(jj)[0][:, k], fd_j, atol=2e-2)


def test_all_losses_run():
    graph, _ = make_noisy_loop(n=12)
    arrays = graph.snapshot()
    for name in ["Squared", "Huber", "Cauchy", "Fair", "GemanMcClure",
                 "Welsch", "DCS"]:
        cfg = optimizer_lm.LMConfig(solver="dense", max_iterations=5,
                                    loss_name=name, loss_scale=1.0)
        res = optimizer_lm.optimize(arrays, cfg)
        assert np.isfinite(float(res.total_error))


def test_loss_weight_formulas():
    """Spot-check against robust_loss_function.cpp:26-188."""
    t = np.array([0.5, 2.0, 10.0])
    import jax.numpy as jnp
    tj = jnp.asarray(t)
    h = robust_loss.create("Huber", 1.0)
    np.testing.assert_allclose(
        np.asarray(h.loss(tj)),
        np.where(t <= 1.0, t, 2 * np.sqrt(t) - 1), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(h.weight(tj)),
        np.where(t <= 1.0, 1.0, np.sqrt(1.0 / t)), rtol=1e-3)
    d = robust_loss.create("DCS", 1.0)
    np.testing.assert_allclose(
        np.asarray(d.weight(tj)),
        np.where(t <= 1.0, 1.0, (2.0 / (1.0 + t)) ** 2), rtol=1e-3)
    c = robust_loss.create("Cauchy", 2.0)
    np.testing.assert_allclose(
        np.asarray(c.loss(tj)), 2.0 * np.log1p(t / 2.0), rtol=1e-3)
