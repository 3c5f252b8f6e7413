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
import shutil
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
    """Batched correlative matching, timed HONESTLY.

    Primary kernel: the gather-free Pallas MXU matcher
    (ops/matchers_mxu.correlative_match_mxu_batch — exact brute force over
    the full window, scan_matcher_real_time_correlative.cpp:50-145). If the
    Mosaic kernel is rejected on this platform, falls back to the pruned
    bound-and-refine gather path (matchers.correlative_match_pruned_batch)
    with brute-force re-runs of inexact queries. Only the selected path is
    compiled: process-fresh compiles through the remote helper dominate the
    bench budget, so compiling both would blow it.

    Timing gotchas this function works around (all measured on this
    machine — see .claude/skills/verify/SKILL.md):
      * jax.block_until_ready through the axon tunnel can return BEFORE the
        work executes; only a device->host transfer forces completion. The
        first np.asarray switches the session to synchronous dispatch; every
        timed iteration ends in a transfer.
      * the axon layer result-caches identical executions, so every timed
        batch uses distinct jittered inputs.
    The per-map precompute (MXU tiles / bound stack) is excluded from the
    timed loop, matching the C++ baseline which excludes its coarse-map
    precompute.
    """
    # Force synchronous dispatch before anything is timed (this transfer
    # also DRAINS every async dispatch queued so far — the workload build —
    # so it is timed separately for attribution).
    t0 = time.time()
    np.asarray(jnp.ones((4, 4)) @ jnp.ones((4, 4)))
    print(f"[bench] sync-drain: {time.time() - t0:.1f}s", file=sys.stderr)

    vals = gridops.values(g)
    win = int(np.ceil(0.5 * RANGE_XY / RES))
    win_t = matchers.static_max_theta_window(RES, SCAN_RANGE_MAX,
                                             RANGE_THETA)
    q = len(queries)
    nb = 192  # beams are front-packed; 181 real beams -> 192-wide bucket

    ip0 = np.stack([p for p, _, _, _ in queries])
    scan_args = (
        jnp.asarray(np.stack([r for _, r, _, _ in queries])[:, :nb]),
        jnp.asarray(np.stack([a for _, _, a, _ in queries])[:, :nb]),
        jnp.asarray(np.stack([v for _, _, _, v in queries])[:, :nb]),
        jnp.zeros(q, jnp.float32),
        jnp.full(q, SCAN_RANGE_MAX, jnp.float32),
        jnp.zeros((q, 3), jnp.float32),
    )
    scalars = (
        jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
        jnp.asarray(RANGE_THETA, jnp.float32),
        jnp.asarray(0.01, jnp.float32),
        jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.full(q, N_BEAMS, jnp.float32),
    )

    def time_rounds(fn, n_rounds=3, n_b=8):
        """Median-of-N timing over distinct jittered batches; every
        iteration ends in a device->host pose transfer."""
        rates = []
        for rnd in range(n_rounds):
            ips = []
            for i in range(n_b):
                r = np.random.default_rng(1 + n_b * rnd + i)
                ips.append(jnp.asarray(
                    ip0 + r.uniform(-0.005, 0.005, ip0.shape), jnp.float32))
            t0 = time.time()
            for ip in ips:
                fn(ip)
            dt = time.time() - t0
            rates.append(n_b * q / dt)
        rates.sort()
        return rates[len(rates) // 2], rates

    mxu_state = {"ok": False, "error": ""}
    # ---- Primary: Pallas MXU path ------------------------------------------
    try:
        from my_lidar_graph_slam_tpu.ops import matchers_mxu
        if not matchers_mxu.supported(win, win):
            raise RuntimeError(f"window {win} unsupported by tile budget")
        t0 = time.time()
        tiles = matchers_mxu.make_tiles(vals)
        np.asarray(tiles.tiles[0, 0, 0, :2])  # materialize (precompute)
        print(f"[bench] mxu tiles: {time.time() - t0:.1f}s",
              file=sys.stderr)

        def match_mxu(ip, q_chunk=16):
            return matchers_mxu.correlative_match_mxu_batch(
                vals, tiles, g, ip, *scan_args, *scalars,
                win_x=win, win_y=win, win_theta_max=win_t,
                q_chunk=q_chunk,
                greedy_params=(("kernel_size", 1),))

        t0 = time.time()
        out = match_mxu(jnp.asarray(ip0, jnp.float32))
        poses = np.asarray(out.estimated_pose)
        scores = np.asarray(out.normalized_score)
        mxu_state["compile_s"] = round(time.time() - t0, 1)
        mxu_state["ok"] = True
        print(f"[bench] mxu compile+first: {mxu_state['compile_s']}s",
              file=sys.stderr)

        def run_mxu(ip):
            np.asarray(match_mxu(ip).estimated_pose)

        t0 = time.time()
        mps, rates = time_rounds(run_mxu)
        print(f"[bench] mxu rounds (Q=64): {time.time() - t0:.1f}s",
              file=sys.stderr)

        # ---- Deployment-shape sweep (VERDICT r3 #2): matches/s vs
        # queries-per-dispatch. The kernel's per-query marginal is tiny
        # (~0.25 ms) next to the ~37 ms tunnel round trip, so throughput
        # scales nearly linearly with dispatch shape until the kernel
        # dominates. FLOPs per query = NCH * NB * 2*128*128*(TC*WYN)
        # (one 128x128 x (128, TC*WYN) one-hot matmul per beam per chunk).
        from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu as cm
        nt = 2 * win_t + 1
        tc = cm.auto_theta_chunk(nt, win, win)
        nch = -(-nt // tc)
        nb_k = scan_args[0].shape[1]
        flops_per_query = nch * nb_k * 2 * cm.TILE * cm.TILE * \
            (tc * (2 * win + 1))
        curve = {64: round(mps, 1)}
        best_mps, best_q = mps, q
        for qq in (256, 1024):
            rep = qq // q
            ipq = np.tile(ip0, (rep, 1))
            sa = tuple(jnp.asarray(np.tile(np.asarray(x), (rep,) +
                                           (1,) * (x.ndim - 1)))
                       for x in scan_args)
            sc = scalars[:-1] + (jnp.asarray(
                np.tile(np.asarray(scalars[-1]), rep)),)

            def match_q(ip, sa=sa, sc=sc):
                return matchers_mxu.correlative_match_mxu_batch(
                    vals, tiles, g, ip, *sa, *sc,
                    win_x=win, win_y=win, win_theta_max=win_t,
                    q_chunk=64,
                    greedy_params=(("kernel_size", 1),))

            t0 = time.time()
            np.asarray(match_q(jnp.asarray(ipq, jnp.float32))
                       .estimated_pose)
            print(f"[bench] mxu Q={qq} compile+first: "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            rates_q = []
            for rnd in range(3):
                ips = []
                for i in range(4):
                    r = np.random.default_rng(50 + 10 * rnd + i)
                    ips.append(jnp.asarray(
                        ipq + r.uniform(-0.005, 0.005, ipq.shape),
                        jnp.float32))
                t0 = time.time()
                for ip in ips:
                    np.asarray(match_q(ip).estimated_pose)
                rates_q.append(4 * qq / (time.time() - t0))
            rates_q.sort()
            curve[qq] = round(rates_q[1], 1)
            print(f"[bench] mxu Q={qq}: {rates_q[1]:.1f} matches/s",
                  file=sys.stderr)
            if rates_q[1] > best_mps:
                best_mps, best_q = rates_q[1], qq

        tflops = best_mps * flops_per_query / 1e12
        extra = {
            "headline_path": "mxu",
            "exact_fraction": 1.0,   # brute force over the window
            "fallback_batches": 0,
            "rate_spread": [round(rates[0], 1), round(rates[-1], 1)],
            "queries_per_dispatch_best": best_q,
            "dispatch_shape_curve": {str(k): v for k, v in curve.items()},
            "mxu_flops_per_query": flops_per_query,
            "mxu_padding_ratio_q1": matchers_mxu.wide_padding_ratio(
                1, nt, nb_k, win, win),
            "mxu_padding_ratio_best_q": matchers_mxu.wide_padding_ratio(
                best_q, nt, nb_k, win, win, q_chunk=64),
            "mxu_achieved_tflops": round(tflops, 2),
            # v5e f32 matmul peak assumed ~1/4 of the 197 TF bf16 MXU peak.
            "mxu_mfu_vs_49tf_f32_peak": round(tflops / 49.2, 4),
            "mxu": mxu_state,
        }
        return best_mps, poses, scores, extra
    except Exception as e:  # noqa: BLE001 — Mosaic rejection etc.
        mxu_state["error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"[bench] mxu path unavailable: {mxu_state['error']}",
              file=sys.stderr)

    # ---- Fallback: pruned bound-and-refine gather path ---------------------
    stack = matchers.make_bound_stack(vals, win, win)
    np.asarray(stack[0, 0, 0])  # materialize outside the timed loop

    def match_pruned(ip):
        return matchers.correlative_match_pruned_batch(
            vals, stack, g, ip, *scan_args, *scalars,
            win_x=win, win_y=win, win_theta_max=win_t,
            top_groups=14, top_thetas=48,
            greedy_params=(("kernel_size", 1),))

    def match_brute(ip):
        return matchers.correlative_match_batch(
            vals, g, ip, *scan_args, *scalars,
            win_x=win, win_y=win, win_theta_max=win_t,
            greedy_params=(("kernel_size", 1),))

    out, exact = match_pruned(jnp.asarray(ip0, jnp.float32))
    poses = np.array(out.estimated_pose)
    scores = np.array(out.normalized_score)
    exact_frac = float(np.asarray(exact).mean())
    if not np.asarray(exact).all():
        brute = match_brute(jnp.asarray(ip0, jnp.float32))
        bad = np.flatnonzero(~np.asarray(exact))
        poses[bad] = np.asarray(brute.estimated_pose)[bad]
        scores[bad] = np.asarray(brute.normalized_score)[bad]

    fallback_runs = 0

    def run_pruned(ip):
        nonlocal fallback_runs
        o, ex = match_pruned(ip)
        if not np.asarray(ex).all():
            fallback_runs += 1
            np.asarray(match_brute(ip).estimated_pose)
        np.asarray(o.estimated_pose)

    mps, rates = time_rounds(run_pruned)
    return mps, poses, scores, {
        "headline_path": "pruned",
        "exact_fraction": exact_frac,
        "fallback_batches": fallback_runs,
        "rate_spread": [round(rates[0], 1), round(rates[-1], 1)],
        "mxu": mxu_state,
    }


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

    # Median of 5 independent runs, each PINNED to one core with taskset
    # (VERDICT r4 weak #7: unpinned runs swung +-30% under session load
    # and the spread decided the headline); host load is recorded
    # alongside so every vs_baseline number carries its conditions.
    pin = []
    if shutil.which("taskset"):
        ncpu = os.cpu_count() or 1
        pin = ["taskset", "-c", str(ncpu - 1)]
    rates = []
    for _ in range(5):
        out = subprocess.run(pin + [exe, wl_path, "3"],
                             capture_output=True, text=True, check=True)
        rates.append(json.loads(out.stdout.strip())["matches_per_sec"])
    rates.sort()
    results = np.fromfile(wl_path + ".out.bin",
                          np.float32).reshape(-1, 4)
    try:
        with open("/proc/loadavg") as f:
            loadavg = float(f.read().split()[0])
    except OSError:
        loadavg = -1.0
    protocol = {"cpu_affinity": pin[2] if pin else "unpinned",
                "loadavg_1m": loadavg, "runs": len(rates)}
    return rates[len(rates) // 2], results, \
        [round(rates[0], 1), round(rates[-1], 1)], protocol


def bench_posegraph():
    """Pose-graph LM/PCG solve time per loop closure at N=1k / 8k nodes
    (the backend's optimize call, pose_graph_optimizer_lm.cpp:13-65)."""
    from my_lidar_graph_slam_tpu.models import optimizer_lm
    from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
    from my_lidar_graph_slam_tpu.utils import se2

    out = {}
    for n in (1024, 8192):
        def build(seed):
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
            for k in range(0, n, n // 8):  # 8 loop edges
                j = (k + n // 2) % n
                graph.append_edge(min(k, j), max(k, j),
                                  se2.inverse_compound_np(gt[min(k, j)],
                                                          gt[max(k, j)]),
                                  np.diag([1e3, 1e3, 4e3]))
            return graph.snapshot()

        cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                    cg_max_iterations=64)
        res = optimizer_lm.optimize(build(0), cfg)
        np.asarray(res.poses)  # compile + sync
        ts = []
        for i in range(3):
            snap = build(1 + i)
            t0 = time.time()
            res = optimizer_lm.optimize(snap, cfg)
            np.asarray(res.poses)
            ts.append(time.time() - t0)
        out[f"posegraph_solve_ms_n{n}"] = round(1e3 * min(ts), 1)

        # Host baseline: the scipy-sparse Eigen-equivalent direct solve
        # (pose_graph_optimizer_lm.cpp:178-206) on the same graphs — what
        # "must not regress vs reference" is judged against.
        from my_lidar_graph_slam_tpu.models import optimizer_host
        ts_host = []
        for i in range(3):
            snap = build(1 + i)
            t0 = time.time()
            optimizer_host.optimize_host(snap, cfg)
            ts_host.append(time.time() - t0)
        out[f"posegraph_host_ms_n{n}"] = round(1e3 * min(ts_host), 1)
    return out


def bench_loop_bb(g, queries):
    """Branch-and-bound loop-detection throughput: candidate nodes matched
    against one finished local map's pyramid (loop_detector_branch_bound
    .cpp:62-89). Round-3 path: ALL candidate nodes in ONE batched dispatch
    (matchers.branch_bound_match_batch, the production detect() path);
    the per-node rate of round 2 is kept for comparison."""
    from my_lidar_graph_slam_tpu.ops import pyramid as pyrops

    pyr = pyrops.build_pyramid(gridops.values(g), 6)
    np.asarray(pyr[0, 0, 0])
    win_t = matchers.static_max_theta_window(RES, SCAN_RANGE_MAX, 1.0)

    def batch_inputs(k, jitter_seed):
        rng = np.random.default_rng(jitter_seed)
        ps, rs, as_, vs = [], [], [], []
        for i in range(k):
            p, r, a, v = queries[i % len(queries)]
            ps.append(p + rng.uniform(-0.01, 0.01, 3))
            rs.append(r)
            as_.append(a)
            vs.append(v)
        return (jnp.asarray(np.stack(ps), jnp.float32),
                jnp.asarray(np.stack(rs)), jnp.asarray(np.stack(as_)),
                jnp.asarray(np.stack(vs)))

    k = 16

    def match_batch(jitter_seed):
        ip, r, a, v = batch_inputs(k, jitter_seed)
        return matchers.branch_bound_match_batch(
            pyr, g, ip, r, a, v,
            jnp.zeros(k, jnp.float32),
            jnp.full(k, SCAN_RANGE_MAX, jnp.float32),
            jnp.zeros((k, 3), jnp.float32),
            jnp.full(k, N_BEAMS, jnp.float32),
            jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.01, jnp.float32),
            jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
            jnp.asarray(0.6, jnp.float32),
            node_height_max=6, win_x=20, win_y=20, win_theta_max=win_t,
            frontier_cap=4096)

    np.asarray(match_batch(99).estimated_pose)  # compile + sync
    t0 = time.time()
    rounds = 3
    for i in range(rounds):
        np.asarray(match_batch(200 + i).estimated_pose)
    dt = time.time() - t0
    out = {"bb_loop_detection_nodes_per_s_batchedbb":
           round(rounds * k / dt, 2),
           "bb_loop_nodes_per_dispatch": k}

    # Production path on a TPU backend: LoopDetectorBranchBound._mxu_enabled
    # auto-selects the exhaustive MXU wide-window sweep (loop_closure.py),
    # scored with the same pixel-accurate gate as BB. Measure it so the
    # bench reports what detect() actually dispatches (VERDICT r3 weak #2).
    production = "bb"
    try:
        from my_lidar_graph_slam_tpu.ops import matchers_mxu
        from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu
        if not correlate_mxu.available():
            raise RuntimeError("no TPU backend")
        tiles = matchers_mxu.make_tiles(gridops.values(g))
        np.asarray(tiles.tiles[0, 0, 0, :2])

        def match_mxu(jitter_seed):
            ip, r, a, v = batch_inputs(k, jitter_seed)
            return matchers_mxu.correlative_match_mxu_batch(
                gridops.values(g), tiles, g, ip, r, a, v,
                jnp.zeros(k, jnp.float32),
                jnp.full(k, SCAN_RANGE_MAX, jnp.float32),
                jnp.zeros((k, 3), jnp.float32),
                jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
                jnp.asarray(1.0, jnp.float32),
                jnp.asarray(0.01, jnp.float32),
                jnp.asarray(SCAN_RANGE_MAX, jnp.float32),
                jnp.asarray(0.6, jnp.float32),
                jnp.full(k, N_BEAMS, jnp.float32),
                win_x=20, win_y=20,
                win_theta_max=matchers.static_max_theta_window(
                    RES, SCAN_RANGE_MAX, 1.0),
                score_gate="pixel_accurate")

        t0 = time.time()
        np.asarray(match_mxu(99).estimated_pose)
        print(f"[bench] loop-mxu compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for i in range(rounds):
            np.asarray(match_mxu(300 + i).estimated_pose)
        dt = time.time() - t0
        out["bb_loop_detection_nodes_per_s_mxu"] = round(rounds * k / dt, 2)
        production = "mxu"
    except Exception as e:  # noqa: BLE001
        print(f"[bench] loop-mxu unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    out["loop_detect_production_path"] = production
    out["bb_loop_detection_nodes_per_s"] = out.get(
        "bb_loop_detection_nodes_per_s_mxu",
        out["bb_loop_detection_nodes_per_s_batchedbb"])
    return out


def main():
    # Warm up the runtime (device init + first-dispatch handshake) before
    # any timed stage; dispatch stays async afterwards — the real wedge
    # protection is that every timed iteration below ends in a blocking
    # device->host transfer, so the queue never grows past one workload.
    t0 = time.time()
    np.asarray(jnp.ones((4, 4)) @ jnp.ones((4, 4)))
    print(f"[bench] sync handshake: {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    g, queries = build_workload()
    print(f"[bench] workload: {time.time() - t0:.1f}s", file=sys.stderr)
    platform = jax.devices()[0].platform

    t0 = time.time()
    tpu_mps, tpu_poses, tpu_scores, tpu_extra = bench_tpu(g, queries)
    print(f"[bench] tpu: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    cpp_mps, cpp_results, cpp_spread, cpp_protocol = bench_cpp(g, queries)
    print(f"[bench] cpp: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    pg_extra = bench_posegraph()
    print(f"[bench] posegraph: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    bb_extra = bench_loop_bb(g, queries)
    print(f"[bench] loop-bb: {time.time() - t0:.1f}s", file=sys.stderr)
    tpu_extra.update(pg_extra)
    tpu_extra.update(bb_extra)

    # Which kernel the PRODUCTION frontend dispatches on this platform
    # (CorrelativeMatcher auto selection; VERDICT r3 weak #2 demanded the
    # bench state what the product actually runs).
    from my_lidar_graph_slam_tpu.models.scan_matchers import (
        CorrelativeMatcher)
    _m = CorrelativeMatcher()
    _wx, _wy, _ = _m._window(RES)
    tpu_extra["frontend_path"] = (
        "mxu" if _m._mxu_enabled(_wx, _wy) else "pruned")

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
            "cpp_baseline_spread": cpp_spread,
            "cpp_baseline_protocol": cpp_protocol,
            "argmax_agreement": round(float(agree), 3),
            "mean_normalized_score": round(float(tpu_scores.mean()), 3),
            "num_queries": len(queries),
            "queries_per_dispatch": len(queries),
            "theta_candidates": 2 * matchers.static_max_theta_window(
                RES, SCAN_RANGE_MAX, RANGE_THETA) + 1,
            **tpu_extra,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
