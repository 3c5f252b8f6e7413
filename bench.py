#!/usr/bin/env python
"""Headline benchmark: correlative scan-matching throughput per chip.

Measures the frontend hot kernel (one full correlative scan-to-map match —
the work of ScanMatcherRealTimeCorrelative::OptimizePose per processed
scan) on the real device, against a measured C++ baseline implementing the
reference's pruned coarse-to-fine algorithm compiled -O3
(native/ref_correlative_bench.cpp; the reference itself cannot be built
here since Eigen3/Boost are absent).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Use the persistent compile cache so driver re-runs skip compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mlgs")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from my_lidar_graph_slam_tpu.io import synth  # noqa: E402
from my_lidar_graph_slam_tpu.ops import grid as gridops  # noqa: E402
from my_lidar_graph_slam_tpu.ops import matchers, raycast  # noqa: E402

RES = 0.05
NB = 256
N_BEAMS = 181
SCAN_RANGE_MAX = 20.0
RANGE_XY = 0.2          # launcher_settings_default.json:44-45
RANGE_THETA = 0.5       # :46
LOW_RES = 5             # :43
MAP_SIZE = 1024
N_QUERIES = 64
N_MAP_SCANS = 10


def build_workload(seed=0):
    """A built map + query scans along the synthetic corridor."""
    rng = np.random.default_rng(seed)
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, N_BEAMS)
    base = synth.rotate_points(np.array([[-7.0, -5.0]]),
                               synth.WORLD_ROTATION)[0]

    def scan_arrays(p, seed2):
        r2 = np.random.default_rng(seed2)
        r = synth.raycast_segments(p[:2], p[2] + beam, segs, SCAN_RANGE_MAX)
        r = np.where(r < SCAN_RANGE_MAX,
                     np.maximum(r + r2.normal(0, 0.01, r.shape), 0.0),
                     SCAN_RANGE_MAX)
        ranges = np.zeros(NB, np.float32)
        angles = np.zeros(NB, np.float32)
        valid = np.zeros(NB, bool)
        ranges[:N_BEAMS] = r
        angles[:N_BEAMS] = beam
        valid[:N_BEAMS] = True
        return ranges, angles, valid

    g = gridops.empty(MAP_SIZE, MAP_SIZE, RES, center=base)
    heading = synth.WORLD_ROTATION
    for k in range(N_MAP_SCANS):
        p = np.array([base[0] + 0.5 * k * np.cos(heading),
                      base[1] + 0.5 * k * np.sin(heading), heading])
        r, a, v = scan_arrays(p, 100 + k)
        g = raycast.integrate_scan(
            g, jnp.asarray(p, jnp.float32), jnp.asarray(r), jnp.asarray(a),
            jnp.asarray(v), 0.01, SCAN_RANGE_MAX, max_steps=448)

    queries = []
    for q in range(N_QUERIES):
        d = 0.5 * (q % N_MAP_SCANS)
        p = np.array([base[0] + d * np.cos(heading),
                      base[1] + d * np.sin(heading), heading])
        p = p + np.concatenate([rng.uniform(-0.05, 0.05, 2),
                                rng.uniform(-0.05, 0.05, 1)])
        r, a, v = scan_arrays(p, 200 + q)
        queries.append((p.astype(np.float32), r, a, v))
    return g, queries


def bench_tpu(g, queries):
    vals = gridops.values(g)
    win = int(np.ceil(0.5 * RANGE_XY / RES))
    win_t = matchers.static_max_theta_window(RES, SCAN_RANGE_MAX,
                                             RANGE_THETA)

    def match(pose, r, a, v):
        return matchers.correlative_match(
            vals, g, pose, r, a, v,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
            jnp.asarray(RANGE_THETA, jnp.float32),
            jnp.asarray(0.01, jnp.float32),
            jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            win_x=win, win_y=win, win_theta_max=win_t,
            num_total_beams=N_BEAMS,
            greedy_params=(("kernel_size", 1),))

    dev_queries = [(jnp.asarray(p), jnp.asarray(r), jnp.asarray(a),
                    jnp.asarray(v)) for p, r, a, v in queries]

    # Warmup / compile.
    out = match(*dev_queries[0])
    jax.block_until_ready(out.estimated_pose)

    # Sequential online throughput: dispatch all, sync once (device executes
    # serially; async dispatch only hides host overhead, as in production).
    t0 = time.time()
    outs = [match(*q) for q in dev_queries]
    jax.block_until_ready([o.estimated_pose for o in outs])
    dt = time.time() - t0
    seq_mps = len(dev_queries) / dt

    poses = np.stack([np.asarray(o.estimated_pose) for o in outs])
    scores = np.array([float(o.normalized_score) for o in outs])
    return seq_mps, poses, scores


def bench_cpp(g, queries):
    """Write the workload and run the C++ reference-algorithm baseline."""
    exe = os.path.join(REPO, "native", "ref_correlative_bench")
    src = os.path.join(REPO, "native", "ref_correlative_bench.cpp")
    if not os.path.exists(exe):
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        "-o", exe, src], check=True)

    wl_path = "/tmp/mlgs_bench_workload.bin"
    vals = np.asarray(gridops.values(g), np.float32)
    h, w = vals.shape
    origin = np.asarray(g.origin, np.float64)
    with open(wl_path, "wb") as f:
        np.array([h, w], np.int32).tofile(f)
        np.array([RES, origin[0], origin[1]], np.float32).tofile(f)
        vals.tofile(f)
        np.array([len(queries), NB], np.int32).tofile(f)
        for p, r, a, v in queries:
            np.asarray(p, np.float32).tofile(f)
            np.asarray(r, np.float32).tofile(f)
            np.asarray(a, np.float32).tofile(f)
        np.array([RANGE_XY, RANGE_XY, RANGE_THETA, SCAN_RANGE_MAX],
                 np.float32).tofile(f)
        np.array([LOW_RES], np.int32).tofile(f)

    out = subprocess.run([exe, wl_path, "3"], capture_output=True,
                         text=True, check=True)
    stats = json.loads(out.stdout.strip())
    results = np.fromfile(wl_path + ".out.bin",
                          np.float32).reshape(-1, 4)
    return stats["matches_per_sec"], results


def main():
    g, queries = build_workload()
    platform = jax.devices()[0].platform

    tpu_mps, tpu_poses, tpu_scores = bench_tpu(g, queries)
    cpp_mps, cpp_results = bench_cpp(g, queries)

    # Parity: both argmaxes should land on (nearly) the same pose.
    agree = np.mean(
        np.linalg.norm(tpu_poses[:, :2] - cpp_results[:, :2], axis=1)
        < 2.5 * RES)

    result = {
        "metric": "correlative_scan_matching_throughput_per_chip",
        "value": round(tpu_mps, 2),
        "unit": "matches/s",
        "vs_baseline": round(tpu_mps / cpp_mps, 2),
        "extra": {
            "platform": platform,
            "cpp_baseline_matches_per_s": round(cpp_mps, 2),
            "argmax_agreement": round(float(agree), 3),
            "mean_normalized_score": round(float(tpu_scores.mean()), 3),
            "num_queries": len(queries),
            "theta_candidates": 2 * matchers.static_max_theta_window(
                RES, SCAN_RANGE_MAX, RANGE_THETA) + 1,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
