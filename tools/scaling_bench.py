#!/usr/bin/env python
"""Multi-device scaling proxies on the virtual CPU mesh (BASELINE
configs 4-5 analogs; VERDICT r3 items 6 and 8).

Pod-slice hardware is not available in this environment, so these are
RELATIVE-scaling numbers on an 8-virtual-device CPU mesh
(``--xla_force_host_platform_device_count=8``) — the same substitution the
test suite uses (SURVEY §4(e)). Two tables:

 1. Node-block-sharded pose-graph solve (``distributed.
    optimize_sharded_nodes``, the Backend's production mesh path) at
    D = 1/2/4/8 devices on a fixed N=4096 ring: wall-clock per solve and
    the psum volume per CG step (O(boundary), independent of N — vs the
    edge-sharded solver's O(N) pose psum).
 2. Two-process "multi-host" solve rate (the test_multihost 2x4-device
    setup): solves/s at 1 process vs 2 processes on identical global
    work, as the frames/s efficiency proxy.

Run: python tools/scaling_bench.py            (takes ~2-4 min, CPU only)
"""

import json
import os
import socket
import subprocess
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
# A sitecustomize hook imports jax before this script runs, so the env var
# alone does not stick (same workaround as tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def build_ring(n, n_loops=16, seed=0):
    from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
    from my_lidar_graph_slam_tpu.utils import se2

    rng = np.random.default_rng(seed)
    gt = np.stack([
        10.0 * np.cos(2 * np.pi * np.arange(n) / n),
        10.0 * np.sin(2 * np.pi * np.arange(n) / n),
        2 * np.pi * np.arange(n) / n + np.pi / 2], axis=-1)
    graph = PoseGraph()
    info = np.diag([100.0, 100.0, 400.0])
    pose = gt[0].copy()
    graph.append_node(pose, 0)
    for k in range(1, n):
        rel = se2.inverse_compound_np(gt[k - 1], gt[k]) + \
            rng.normal(0, 0.01, 3)
        pose = se2.compound_np(pose, rel)
        graph.append_node(pose, k)
        graph.append_edge(k - 1, k, rel, info)
    for k in range(0, n, max(n // n_loops, 1)):
        j = (k + n // 2) % n
        graph.append_edge(min(k, j), max(k, j),
                          se2.inverse_compound_np(gt[min(k, j)],
                                                  gt[max(k, j)]),
                          np.diag([1e3, 1e3, 4e3]))
    return graph


def bench_mesh_scaling(n=4096):
    import jax

    from my_lidar_graph_slam_tpu.models import optimizer_lm
    from my_lidar_graph_slam_tpu.parallel import distributed
    from my_lidar_graph_slam_tpu.parallel import mesh as mesh_mod

    cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                cg_max_iterations=64,
                                preconditioner="chain")
    rows = []
    base_ms = None
    for d in (1, 2, 4, 8):
        m = mesh_mod.make_mesh(d, axis="shard")
        ts = []
        sharded = None
        for i in range(4):
            graph = build_ring(n, seed=i)
            arrays = graph.snapshot()
            sharded = distributed.partition_graph_by_nodes(arrays, d)
            t0 = time.time()
            res = distributed.optimize_sharded_nodes(sharded, cfg, m)
            np.asarray(res.poses)
            ts.append(time.time() - t0)
        ms = round(1e3 * min(ts[1:]), 1)  # drop compile iteration
        if base_ms is None:
            base_ms = ms
        rows.append({
            "devices": d,
            "solve_ms": ms,
            "psum_bytes_per_cg_step":
                distributed.psum_bytes_per_cg_step(sharded),
            "rel_efficiency": round(base_ms / (ms * 1), 3),
        })
        print(f"[scaling] D={d}: {ms} ms/solve, "
              f"{rows[-1]['psum_bytes_per_cg_step']} psum B/step",
              file=sys.stderr)
    return rows


WORKER = r"""
import os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["REPO"])
from my_lidar_graph_slam_tpu.parallel import distributed, multihost
from my_lidar_graph_slam_tpu.models import optimizer_lm
sys.path.insert(0, os.path.join(os.environ["REPO"], "tools"))
from scaling_bench import build_ring

multihost.initialize(coordinator_address=os.environ["COORD"],
                     num_processes=int(os.environ["NPROC"]),
                     process_id=int(os.environ["PID"]))
mesh = multihost.global_mesh("shard")
cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=5,
                            cg_max_iterations=48)
ts = []
for i in range(4):
    graph = build_ring(1024, seed=i)
    arrays = graph.snapshot()
    g = multihost.shard_edges_global(mesh, "shard", arrays)
    t0 = time.time()
    res = distributed.optimize_sharded(g, cfg, mesh, axis="shard")
    np.asarray(jax.device_get(res.poses))
    ts.append(time.time() - t0)
if int(os.environ["PID"]) == 0:
    print("SOLVE_MS", round(1e3 * min(ts[1:]), 1))
"""


def bench_two_process():
    """Edge-sharded global solve: 1 process vs 2 processes, 8 global
    devices either way (4+4 for the 2-process run)."""
    out = {}
    for nproc, devs in ((1, "8"), (2, "4")):
        port = _free_port()
        env_base = dict(os.environ)
        env_base["REPO"] = REPO
        env_base["COORD"] = f"localhost:{port}"
        env_base["NPROC"] = str(nproc)
        env_base["XLA_FLAGS"] = \
            f"--xla_force_host_platform_device_count={devs}"
        procs = []
        for pid in range(nproc):
            env = dict(env_base)
            env["PID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True))
        outs = [p.communicate(timeout=240)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        ms = float(outs[0].split("SOLVE_MS")[1].strip())
        out[f"solve_ms_{nproc}proc"] = ms
        print(f"[scaling] {nproc} proc x {devs} dev: {ms} ms/solve",
              file=sys.stderr)
    out["two_process_efficiency"] = round(
        out["solve_ms_1proc"] / out["solve_ms_2proc"], 3)
    return out


PIPELINE_WORKER = r"""
import os, sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["REPO"])
from my_lidar_graph_slam_tpu import launcher
from my_lidar_graph_slam_tpu.utils.metrics import MetricManager

stats = launcher.run(os.environ["LOG"],
                     os.path.join(os.environ["REPO"],
                                  "configs/launcher_settings_default.json"),
                     "/tmp/scaling_pipe_out_%s" % os.environ["PID"],
                     threaded_backend=False,
                     multihost=True)
if int(os.environ["PID"]) == 0:
    m = MetricManager.instance()
    passes = m.distributions("LoopDetectionTime").num_samples
    print("PIPE", json.dumps({
        "frames_per_s": round(stats["scans_per_s"], 2),
        "elapsed_s": round(stats["elapsed_s"], 1),
        "closures": stats["num_loop_closures"],
        "backend_passes": passes,
        "backend_passes_per_s": round(passes / stats["elapsed_s"], 3),
    }))
"""


def bench_pipeline_multihost():
    """Pipeline-level frames/s at 1 vs 2 processes (VERDICT r4 missing
    #3): the FULL launcher (frontend + mesh backend) on a fixed synth
    log, 8 global devices either way. A gRPC-penalized CPU-sim LOWER
    BOUND — every mesh collective crosses the process boundary through
    the distributed runtime; on real multi-host ICI the per-collective
    cost is orders of magnitude lower."""
    from my_lidar_graph_slam_tpu.io import synth

    wp1 = synth.loop_waypoints()
    wps = np.concatenate([wp1, wp1[1:]], axis=0)
    scfg = synth.SimConfig(step=0.4, max_range=12.0, seed=2)
    scans, _ = synth.simulate(waypoints=wps, config=scfg)
    log = "/tmp/scaling_pipe.clf"
    synth.write_carmen_log(log, scans, max_range=scfg.max_range)

    out = {}
    for nproc, devs in ((1, "8"), (2, "4")):
        port = _free_port()
        env_base = dict(os.environ)
        env_base["REPO"] = REPO
        env_base["LOG"] = log
        env_base["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env_base["JAX_NUM_PROCESSES"] = str(nproc)
        env_base["XLA_FLAGS"] = \
            f"--xla_force_host_platform_device_count={devs}"
        procs = []
        for pid in range(nproc):
            env = dict(env_base)
            env["PID"] = str(pid)
            env["JAX_PROCESS_ID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", PIPELINE_WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        row = json.loads(outs[0].split("PIPE", 1)[1].strip())
        out[f"{nproc}proc"] = row
        print(f"[scaling] pipeline {nproc} proc x {devs} dev: "
              f"{row['frames_per_s']} frames/s, "
              f"{row['backend_passes']} backend passes", file=sys.stderr)
    out["frames_efficiency_2proc"] = round(
        out["2proc"]["frames_per_s"] / out["1proc"]["frames_per_s"], 3)
    return out


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    result = {"mesh_scaling_n4096": bench_mesh_scaling(),
              "two_process": bench_two_process(),
              "pipeline_multihost": bench_pipeline_multihost(),
              "note": "CPU-sim proxies: 8 virtual CPU devices share host "
                      "cores, so wall-clock does NOT improve with D; the "
                      "deliverables are the O(boundary) psum volume, "
                      "cross-process correctness/overhead, and the "
                      "pipeline frames/s lower bound."}
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
