"""Multi-process (2-host CPU simulation) validation of the cross-host
edge-sharded pose-graph solver (SURVEY SS2.11 multi-host deliverable,
BASELINE config 5).

Each subprocess simulates one "host" with 4 virtual CPU devices; together
they form an 8-device global mesh. The test asserts that the distributed
LM/PCG solve over the global mesh matches the single-process solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, os.environ["REPO"])
from my_lidar_graph_slam_tpu.parallel import distributed, multihost
from my_lidar_graph_slam_tpu.models import optimizer_lm
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.utils import se2

multihost.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=int(os.environ["NPROC"]),
    process_id=int(os.environ["PID"]))
assert jax.process_count() == int(os.environ["NPROC"])
assert len(jax.devices()) == 8, len(jax.devices())

# Same deterministic graph on every process (frontend broadcast).
rng = np.random.default_rng(0)
n = 24
gt = np.stack([4.0 * np.cos(2 * np.pi * np.arange(n) / n),
               4.0 * np.sin(2 * np.pi * np.arange(n) / n),
               2 * np.pi * np.arange(n) / n + np.pi / 2], axis=-1)
graph = PoseGraph()
info = np.diag([100.0, 100.0, 400.0])
pose = gt[0].copy()
graph.append_node(pose, 0)
for k in range(1, n):
    rel = se2.inverse_compound_np(gt[k - 1], gt[k]) + rng.normal(0, 0.03, 3)
    pose = se2.compound_np(pose, rel)
    graph.append_node(pose, k)
    graph.append_edge(k - 1, k, rel, info)
graph.append_edge(n - 1, 0, se2.inverse_compound_np(gt[-1], gt[0]),
                  np.diag([1e3, 1e3, 4e3]))
arrays = graph.snapshot(edge_cap=32)

mesh = multihost.global_mesh("shard")
garrays = multihost.shard_edges_global(mesh, "shard", arrays)
cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=5,
                            cg_max_iterations=48)
res = distributed.optimize_sharded(garrays, cfg, mesh, axis="shard")
# Fully-addressable output (out_specs P() replicated) -> gather locally.
poses = np.asarray(jax.device_get(res.poses))
ref = optimizer_lm.optimize(arrays, cfg)
err = np.abs(poses - np.asarray(ref.poses)).max()
assert err < 1e-3, f"distributed vs single mismatch: {err}"
print(f"proc {os.environ['PID']}: ok err={err:.2e}", flush=True)
"""


def test_two_process_cpu_mesh_solver(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker_file = tmp_path / "worker.py"
    worker_file.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "REPO": repo,
            "COORD": coord,
            "NPROC": "2",
            "PID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache_mlgs_mh",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_file)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "ok err=" in out
