"""SLAM launcher CLI.

Mirror of the reference's ``slam_launch`` executable (slam_launcher.cpp:
927-1026): ``python -m my_lidar_graph_slam_tpu.launcher <log> <settings.json>
[output]`` loads a CARMEN log, builds the SLAM object graph from the JSON
settings (the reference's settings files work verbatim), runs every scan
through the pipeline, and saves the global map, the latest map, the pose
graph JSON, and (extensions over the reference) a pose-graph PNG, a metrics
JSON, and a state checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Persistent compile cache: a SLAM run compiles dozens of bucketed-shape
# programs (matcher, map update, detection, rebuilds); without the disk
# cache every launcher invocation pays them all again (~260 s of the
# first measured TPU run). Must be set before jax imports.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mlgs")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# A sitecustomize hook may import jax before this module, freezing the
# env defaults — set the config explicitly as well.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from my_lidar_graph_slam_tpu.io import carmen, map_io, viz
from my_lidar_graph_slam_tpu.sensor.data import RawScan
from my_lidar_graph_slam_tpu.utils import config as config_mod
from my_lidar_graph_slam_tpu.utils.metrics import MetricManager


def _warm_backend_programs(warm_obj):
    """Force-load the detection and post-closure-rebuild executables.

    A normal warmup prefix rarely triggers a loop closure, so those
    programs would otherwise pay their per-process executable load
    (~10-35 s each through the tunnel) inside the timed run. Fabricated
    candidates at the production K buckets (window widths 3 and 5 ->
    buckets 4 and 8) drive the detector; clearing ``built_poses`` forces
    a full batched rebuild. Results are discarded.
    """
    import contextlib

    from my_lidar_graph_slam_tpu.models.loop_closure import LoopCandidate

    b = warm_obj.builder
    g = warm_obj.graph
    if not b.local_maps or g.num_nodes < 2:
        return
    lm = b.local_maps[0]
    was_finished = lm.finished
    lm.finished = True
    n = g.num_nodes
    for width in (3, 5):
        nodes = list(range(max(0, n - width), n))
        cand = [LoopCandidate(node_indices=nodes, local_map_idx=0,
                              local_map_node_idx=nodes[0])]
        with contextlib.suppress(Exception):
            warm_obj.backend.detector.detect(g, b, cand)
    kmaps = getattr(warm_obj.backend.searcher, "num_candidate_maps", 1)
    if kmaps > 1:
        # Multi-candidate configs run the stacked multi-map program;
        # warm its M buckets too.
        nodes = list(range(max(0, n - 5), n))
        for count in {2, min(kmaps, 3)}:
            cands = [LoopCandidate(node_indices=nodes, local_map_idx=0,
                                   local_map_node_idx=nodes[0])] * count
            with contextlib.suppress(Exception):
                warm_obj.backend.detector.detect(g, b, cands)
    lm.finished = was_finished
    for lmm in b.local_maps:
        lmm.built_poses = None  # force the batched rebuild program
    with contextlib.suppress(Exception):
        b.after_loop_closure(g)


def run(log_path: str, settings_path: str, output: str,
        threaded_backend: bool = True,
        max_scans: int = 0,
        gui_interval: int = 0,
        gt_path: str = "",
        save_local_maps: bool = False,
        save_pyramid_maps: bool = False,
        multihost: bool = False,
        mesh_devices: int = 0,
        profile_dir: str = "",
        platform: str = "",
        replay_chunk: int = 0,
        attach_odom: bool = False,
        warmup: int = 0,
        stream_async: bool = False) -> dict:
    """Run the full pipeline; returns summary stats.

    ``multihost`` initializes jax.distributed (coordinator from the
    standard env vars) and spans the backend mesh over every process's
    devices; ``mesh_devices`` > 0 builds a single-process mesh over the
    first N local devices instead. ``platform`` forces a JAX backend
    (e.g. "cpu") — the env var alone does not stick here because a
    sitecustomize hook imports jax before this module runs."""
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    mesh = None
    if multihost:
        from my_lidar_graph_slam_tpu.parallel import multihost as mh
        mh.initialize()
        mesh = mh.global_mesh("shard")
    elif mesh_devices:
        from my_lidar_graph_slam_tpu.parallel import mesh as mesh_mod
        mesh = mesh_mod.make_mesh(mesh_devices, axis="shard")
    metrics = MetricManager.instance()
    cfg = config_mod.load(settings_path)
    if replay_chunk:
        # Replay mode is a synchronous batch pipeline: backend passes are
        # coalesced to chunk boundaries (models/replay.py).
        threaded_backend = False
    slam_obj = config_mod.create_slam(cfg, threaded_backend=threaded_backend,
                                      mesh=mesh)
    if stream_async:
        # Pipelined online frontend: overlap each keyframe's match round
        # trip with the scans accumulated until the next keyframe
        # (models/slam.py Frontend.async_pipeline).
        slam_obj.frontend.async_pipeline = True

    records = carmen.load(log_path)
    if attach_odom:
        # RAWLASER records carry no pose (the reference leaves it zero
        # and ignores ODOM records entirely, carmen_reader.cpp:163-236 +
        # slam_launcher.cpp:966-976, making RAWLASER-only logs unusable);
        # this extension stamps each scan with the most recent ODOM pose
        # so RAWLASER+ODOM logs drive the full pipeline.
        from my_lidar_graph_slam_tpu.sensor.data import OdometryData
        last_odom = None
        for r in records:
            if isinstance(r, OdometryData):
                last_odom = r
            elif isinstance(r, RawScan) and last_odom is not None and \
                    not np.any(r.odom_pose):
                r.odom_pose = last_odom.pose.copy()
    scan_records = [r for r in records if isinstance(r, RawScan)]
    if max_scans:
        scan_records = scan_records[:max_scans]
    if not scan_records:
        print(f"no scan records in {log_path}", file=sys.stderr)
        return {}

    # JAX profiler hook (the tracing/profiling subsystem the reference
    # lacks, SURVEY.md §5): every device program dispatched inside the
    # scan loop lands in a TensorBoard-loadable trace under profile_dir.
    profile_ctx = None
    if profile_dir:
        import contextlib
        import jax
        profile_ctx = contextlib.ExitStack()
        profile_ctx.enter_context(jax.profiler.trace(profile_dir))

    if warmup:
        # Drive the first N scans through a THROWAWAY pipeline so every
        # compiled program is loaded into the device runtime before the
        # timed run — on a remote-attached device (axon tunnel) a fresh
        # process pays a multi-second executable load per program even
        # with a warm persistent compile cache (measured ~60-120 s for
        # the big programs); production servers warm up the same way.
        print(f"[launcher] warmup over first {warmup} scans...",
              file=sys.stderr)
        t0 = time.time()
        warm_obj = config_mod.create_slam(
            cfg, threaded_backend=False, mesh=mesh)
        warm_scans = scan_records[:warmup]
        if replay_chunk:
            from my_lidar_graph_slam_tpu.models.replay import ReplayRunner
            ReplayRunner(warm_obj, chunk=replay_chunk).run(warm_scans)
        else:
            for scan in warm_scans:
                warm_obj.process_scan(scan, scan.odom_pose)
        if warm_obj.backend is not None:
            warm_obj.backend.run_once(warm_obj)
            _warm_backend_programs(warm_obj)
        del warm_obj
        MetricManager.reset_instance()
        metrics = MetricManager.instance()
        print(f"[launcher] warmup done in {time.time() - t0:.1f}s",
              file=sys.stderr)

    slam_obj.start_backend()
    t0 = time.time()
    if replay_chunk:
        from my_lidar_graph_slam_tpu.models.replay import ReplayRunner
        runner = ReplayRunner(slam_obj, chunk=replay_chunk)

        def progress(count):
            if gui_interval and count % gui_interval < replay_chunk:
                viz.draw_pose_graph(slam_obj.graph, output + ".live.png")

        runner.run(scan_records, progress_cb=progress)
        metrics.counters("ProcessedScans").increment(len(scan_records))
    else:
        for scan in scan_records:
            t1 = time.time()
            updated = slam_obj.process_scan(scan, scan.odom_pose)
            if updated:
                metrics.distributions("FrontendScanTime").observe(
                    time.time() - t1)
                if gui_interval and \
                        slam_obj.process_count % gui_interval == 0:
                    viz.draw_pose_graph(slam_obj.graph, output + ".live.png")
            metrics.counters("ProcessedScans").increment()
    elapsed = time.time() - t0
    slam_obj.stop_backend()
    if profile_ctx is not None:
        profile_ctx.close()
        print(f"profiler trace written to {profile_dir}", file=sys.stderr)

    # Save artifacts (slam_launcher.cpp:995-1020).
    graph = slam_obj.graph
    builder = slam_obj.builder
    poses = graph.node_poses()

    global_map = builder.construct_global_map(graph)
    map_io.save_map(global_map, output, node_poses=poses,
                    node_idx_min=0, node_idx_max=graph.num_nodes - 1)
    if builder.latest_map is not None:
        # The reference draws the scans into the latest map
        # (slam_launcher.cpp:1018, drawScans=true).
        pts, origins = map_io.scan_endpoints(
            graph, slam_obj.scans, builder.latest_scan_idx_min,
            builder.latest_scan_idx_max)
        map_io.save_map(builder.latest_map, output + "-latest",
                        node_poses=poses,
                        node_idx_min=builder.latest_scan_idx_min,
                        node_idx_max=builder.latest_scan_idx_max,
                        scan_points=pts, scan_poses=origins)
    if save_local_maps:
        map_io.save_local_maps(builder, graph, output)
    if save_pyramid_maps and builder.local_maps:
        map_io.save_pyramid_maps(builder, builder.local_maps[0], output)
    map_io.save_pose_graph(graph, slam_obj.scans, output)
    viz.draw_pose_graph(graph, output + "-posegraph.png")
    map_io.save_checkpoint(output + ".ckpt.npz", graph, slam_obj.scans)

    metrics.gauges("TotalElapsedSeconds").set(elapsed)
    metrics.gauges("NumPoseGraphNodes").set(graph.num_nodes)
    metrics.gauges("NumPoseGraphEdges").set(graph.num_edges)
    metrics.gauges("NumLoopClosures").set(
        slam_obj.backend.num_loop_closures if slam_obj.backend else 0)
    metrics.save_json(output + ".metrics.json")

    stats = {
        "num_scans": len(scan_records),
        "num_nodes": graph.num_nodes,
        "num_edges": graph.num_edges,
        "num_loop_closures":
            slam_obj.backend.num_loop_closures if slam_obj.backend else 0,
        "elapsed_s": elapsed,
        "scans_per_s": len(scan_records) / elapsed if elapsed > 0 else 0.0,
    }
    if gt_path:
        from my_lidar_graph_slam_tpu.utils import ate
        gt = np.load(gt_path)
        node_times = slam_obj.scans.timestamps[
            graph.scan_ids[:graph.num_nodes]]
        stats["ate_rmse_m"] = ate.ate_rmse(
            poses, gt["true_poses"], est_times=node_times,
            gt_times=gt["timestamps"])
        metrics.gauges("AteRmseMeters").set(stats["ate_rmse_m"])
    print(f"processed {stats['num_scans']} scans "
          f"({stats['num_nodes']} nodes, {stats['num_edges']} edges, "
          f"{stats['num_loop_closures']} loop closures) "
          f"in {elapsed:.1f}s = {stats['scans_per_s']:.1f} scans/s"
          + (f", ATE RMSE {stats['ate_rmse_m']:.3f} m"
             if "ate_rmse_m" in stats else ""),
          file=sys.stderr)
    return stats


def main():
    parser = argparse.ArgumentParser(
        description="TPU-native LiDAR graph SLAM launcher")
    parser.add_argument("log", help="CARMEN log file")
    parser.add_argument("settings", help="JSON settings file")
    parser.add_argument("output", nargs="?", default=None,
                        help="output name (default: log stem)")
    parser.add_argument("--max-scans", type=int, default=0)
    parser.add_argument("--no-backend-thread", action="store_true")
    parser.add_argument("--gui-interval", type=int, default=0,
                        help="rewrite a live pose-graph PNG every N frames")
    parser.add_argument("--gt", default="",
                        help="ground-truth npz (true_poses, timestamps) "
                             "for ATE RMSE")
    parser.add_argument("--save-local-maps", action="store_true",
                        help="dump one PNG+JSON per local map")
    parser.add_argument("--save-pyramid-maps", action="store_true",
                        help="dump the first local map's coarse pyramid")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed and span the "
                             "backend mesh across all processes")
    parser.add_argument("--mesh-devices", type=int, default=0,
                        help="single-process mesh over N local devices")
    parser.add_argument("--profile", default="",
                        help="write a JAX profiler trace of the scan loop "
                             "to this directory (TensorBoard-loadable)")
    parser.add_argument("--platform", default="",
                        help="force a JAX backend (e.g. cpu)")
    parser.add_argument("--replay-chunk", type=int, default=0,
                        help="device-resident chunked replay: run K "
                             "keyframes' match chain per dispatch "
                             "(amortizes the dispatch round trip; "
                             "backend passes coalesce to chunk "
                             "boundaries)")
    parser.add_argument("--attach-odom", action="store_true",
                        help="stamp pose-less RAWLASER scans with the "
                             "most recent ODOM pose (extension; the "
                             "reference leaves them zero)")
    parser.add_argument("--warmup", type=int, default=0,
                        help="pre-drive the first N scans through a "
                             "throwaway pipeline so device executables "
                             "are loaded before the timed run")
    parser.add_argument("--stream-async", action="store_true",
                        help="pipelined online frontend: overlap each "
                             "keyframe's match round trip with the next "
                             "keyframe's scan accumulation")
    args = parser.parse_args()

    output = args.output or os.path.splitext(os.path.basename(args.log))[0]
    run(args.log, args.settings, output,
        threaded_backend=not args.no_backend_thread,
        max_scans=args.max_scans,
        gui_interval=args.gui_interval,
        gt_path=args.gt,
        save_local_maps=args.save_local_maps,
        save_pyramid_maps=args.save_pyramid_maps,
        multihost=args.multihost,
        mesh_devices=args.mesh_devices,
        profile_dir=args.profile,
        platform=args.platform,
        replay_chunk=args.replay_chunk,
        attach_odom=args.attach_odom,
        warmup=args.warmup,
        stream_async=args.stream_async)


if __name__ == "__main__":
    main()
