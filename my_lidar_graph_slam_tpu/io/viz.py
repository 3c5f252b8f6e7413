"""Pose-graph visualization.

Headless equivalent of the reference's gnuplot live view
(gnuplot_helper.cpp:10-70): odometry edges black, loop-closing edges blue,
nodes red. Renders to a PNG file per call (usable as a live view by
rewriting the same file, or as a post-run artifact).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402

from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph  # noqa: E402


def draw_pose_graph(graph: PoseGraph, path: str, title: str = ""):
    """Draw nodes + edges (gnuplot_helper.cpp:22-70 styling)."""
    fig, ax = plt.subplots(figsize=(8, 8))
    poses = graph.node_poses()

    for e in range(graph.num_edges):
        i, j = int(graph.edge_i[e]), int(graph.edge_j[e])
        color = "black" if graph.edge_is_odom[e] else "blue"
        lw = 0.5 if graph.edge_is_odom[e] else 1.2
        ax.plot([poses[i, 0], poses[j, 0]], [poses[i, 1], poses[j, 1]],
                color=color, linewidth=lw, zorder=1)

    ax.scatter(poses[:, 0], poses[:, 1], s=4, color="red", zorder=2)
    ax.set_aspect("equal")
    ax.set_title(title or f"pose graph: {graph.num_nodes} nodes, "
                 f"{graph.num_edges} edges")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
