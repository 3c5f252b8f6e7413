"""Chain-preconditioner and host-solver tests.

Covers the round-3 solver redesign: the cyclic-reduction chain
preconditioner (optimizer_lm.chain_factor/chain_solve — the TPU-native
replacement for Eigen's sparse factorization, pose_graph_optimizer_lm.cpp:
178-206) and the scipy host baseline (optimizer_host — the Eigen-equivalent
path the bench compares against).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from my_lidar_graph_slam_tpu.models import (optimizer_host, optimizer_lm,
                                            robust_loss)
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.utils import se2


def make_ring(n, seed=0, n_loops=4, noise=0.01):
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(n) / n
    gt = np.stack([10 * np.cos(ang), 10 * np.sin(ang), ang + np.pi / 2],
                  axis=-1)
    graph = PoseGraph()
    info = np.diag([100.0, 100.0, 400.0])
    pose = gt[0].copy()
    graph.append_node(pose, 0)
    for k in range(1, n):
        rel = se2.inverse_compound_np(gt[k - 1], gt[k]) + \
            rng.normal(0, noise, 3)
        pose = se2.compound_np(pose, rel)
        graph.append_node(pose, k)
        graph.append_edge(k - 1, k, rel, info)
    for k in range(0, n, max(1, n // n_loops)):
        j = (k + n // 2) % n
        graph.append_edge(min(k, j), max(k, j),
                          se2.inverse_compound_np(gt[min(k, j)],
                                                  gt[max(k, j)]),
                          np.diag([1e3, 1e3, 4e3]))
    return graph, gt


def test_chain_factor_solves_block_tridiagonal_exactly():
    """cr factor/solve == dense solve of the same block-tridiag matrix."""
    rng = np.random.default_rng(0)
    for n in (5, 16, 33):
        a = rng.normal(size=(n, 3, 3))
        a[0] = 0.0
        d = np.einsum("nij,nkj->nik", a, a) + \
            np.einsum("nji,njk->nik", np.roll(a, -1, 0),
                      np.roll(a, -1, 0)) + 10 * np.eye(3)
        dense = np.zeros((3 * n, 3 * n))
        for i in range(n):
            dense[3 * i:3 * i + 3, 3 * i:3 * i + 3] = d[i]
            if i > 0:
                dense[3 * i:3 * i + 3, 3 * (i - 1):3 * i] = a[i]
                dense[3 * (i - 1):3 * i, 3 * i:3 * i + 3] = a[i].T
        b = rng.normal(size=(n, 3))
        want = np.linalg.solve(dense, b.reshape(-1)).reshape(n, 3)
        levels, dinv_f, npow = optimizer_lm.chain_factor(
            jnp.asarray(d, jnp.float32), jnp.asarray(a, jnp.float32))
        got = np.asarray(optimizer_lm.chain_solve(
            levels, dinv_f, npow, jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_chain_preconditioner_beats_jacobi_on_long_chain():
    """The motivating regression: block-Jacobi f32 CG cannot propagate the
    loop correction along a 1k-node chain in 64 iterations; the chain
    preconditioner solves the odometry chain exactly and converges."""
    graph, gt = make_ring(1024, n_loops=8)
    snap = graph.snapshot()
    out = {}
    for pre in ("jacobi", "chain"):
        cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                    cg_max_iterations=64,
                                    preconditioner=pre)
        res = optimizer_lm.optimize(snap, cfg)
        p = np.asarray(res.poses)[:graph.num_nodes]
        out[pre] = np.linalg.norm(p[:, :2] - gt[:, :2], axis=1).max()
    assert out["chain"] < 1.0
    assert out["chain"] < 0.5 * out["jacobi"]


def test_host_optimizer_matches_device_chain():
    """The scipy host path and the chain-PCG device path solve the same
    normal equations; their recovered trajectories must agree."""
    graph, gt = make_ring(256, n_loops=4)
    snap = graph.snapshot()
    cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                cg_max_iterations=64,
                                preconditioner="chain")
    dev = optimizer_lm.optimize(snap, cfg)
    host = optimizer_host.optimize_host(snap, cfg)
    n = graph.num_nodes
    dp = np.asarray(dev.poses)[:n]
    hp = host.poses[:n]
    assert np.linalg.norm(hp[:, :2] - gt[:, :2], axis=1).max() < 0.5
    np.testing.assert_allclose(dp[:, :2], hp[:, :2], atol=0.05)


def test_host_loss_formulas_match_device():
    ts = np.asarray([1e-6, 0.5, 1.0, 2.0, 10.0])
    for name in ("Squared", "Huber", "Cauchy", "Fair", "GemanMcClure",
                 "Welsch", "DCS"):
        dev = robust_loss.create(name, 1.0)
        np.testing.assert_allclose(
            optimizer_host._loss_weight(name, 1.0, ts),
            np.asarray(dev.weight(jnp.asarray(ts))), rtol=1e-4)
        np.testing.assert_allclose(
            optimizer_host._loss_value(name, 1.0, ts),
            np.asarray(dev.loss(jnp.asarray(ts))), rtol=1e-4)


def test_chain_preconditioner_with_padded_capacity():
    """Capacity-padded snapshots (masked nodes/edges) must not corrupt the
    chain factorization."""
    graph, gt = make_ring(100, n_loops=4)
    snap = graph.snapshot(node_cap=256, edge_cap=512)
    cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                cg_max_iterations=64,
                                preconditioner="chain")
    res = optimizer_lm.optimize(snap, cfg)
    p = np.asarray(res.poses)[:graph.num_nodes]
    assert np.isfinite(p).all()
    assert np.linalg.norm(p[:, :2] - gt[:, :2], axis=1).max() < 0.5
