"""JSON configuration system with strategy composition.

Reads the SAME JSON schema as the reference launcher
(launcher_settings_default.json, parsed by the factory functions at
slam_launcher.cpp:54-876): every component is selected by a ``<X>Type``
string plus a ``<X>ConfigGroup`` name pointing at its settings group, with
in-code defaults matching the reference's ``config.get(key, default)``
calls. A reference settings file therefore works verbatim.

TPU-specific knobs (dense map tensor sizes, beam capacity, ray-step caps,
BB frontier width, CG iterations) live in an optional ``Tpu`` group with
conservative defaults.

Booleans may be JSON booleans or the strings "true"/"false" (Boost ptree
accepts both, and the reference's default settings file uses strings).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import numpy as np

from my_lidar_graph_slam_tpu.models import loop_closure as lc
from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models import optimizer_lm, scan_matchers, slam
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.models.preprocess import (ScanAccumulator,
                                                       ScanInterpolator)


class Config:
    """Dotted-path accessor over nested JSON (Boost ptree style)."""

    def __init__(self, tree: Dict[str, Any]):
        self.tree = tree

    def get(self, path: str, default=None):
        node: Any = self.tree
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def get_bool(self, path: str, default: bool) -> bool:
        v = self.get(path, default)
        if isinstance(v, str):
            return v.lower() == "true"
        return bool(v)

    def group(self, path: str) -> "Config":
        sub = self.get(path)
        if sub is None:
            raise KeyError(f"missing config group: {path}")
        return Config(sub)


def load(path: str) -> Config:
    with open(path) as f:
        return Config(json.load(f))


# ---------------------------------------------------------------------------
# Component factories (slam_launcher.cpp:54-876)
# ---------------------------------------------------------------------------


def _greedy_params(root: Config, group: str) -> tuple:
    """CostGreedyEndpoint settings (slam_launcher.cpp:54-76).

    The launcher swaps the last two constructor arguments (header order is
    scalingFactor, standardDeviation — cost_function_greedy_endpoint.hpp:
    20-27 — but the call site passes standardDeviation, scalingFactor), so
    the EFFECTIVE sigma is the JSON ScalingFactor and the effective scale
    is the JSON StandardDeviation. We replicate the behavior as configured.
    """
    g = root.group(group)
    return (
        ("hit_and_missed_dist", float(g.get("HitAndMissedDist", 0.075))),
        ("occupancy_threshold", float(g.get("OccupancyThreshold", 0.1))),
        ("kernel_size", int(g.get("KernelSize", 1))),
        ("standard_deviation", float(g.get("ScalingFactor", 1.0))),
        ("scaling_factor", float(g.get("StandardDeviation", 0.05))),
    )


def _cost_settings(root: Config, cost_type: str, group: str):
    """Returns (cost_type_str, greedy_params, usable_min, usable_max)."""
    g = root.group(group)
    usable_min = float(g.get("UsableRangeMin", 0.01))
    usable_max = float(g.get("UsableRangeMax", 50.0))
    if cost_type == "GreedyEndpoint":
        return "greedy_endpoint", _greedy_params(root, group), \
            usable_min, usable_max
    elif cost_type == "SquareError":
        return "square_error", (), usable_min, usable_max
    raise ValueError(f"unknown cost type: {cost_type}")


def create_scan_matcher(root: Config, matcher_type: str, group: str):
    """CreateScanMatcher (slam_launcher.cpp:325-342)."""
    g = root.group(group)
    if matcher_type == "RealTimeCorrelative":
        cost_type, gp, umin, umax = _cost_settings(
            root, g.get("CostType", "GreedyEndpoint"),
            g.get("CostConfigGroup", "CostGreedyEndpoint"))
        return scan_matchers.CorrelativeMatcher(
            low_resolution=int(g.get("LowResolutionMapWinSize", 10)),
            range_x=float(g.get("SearchRangeX", 0.75)),
            range_y=float(g.get("SearchRangeY", 0.75)),
            range_theta=float(g.get("SearchRangeTheta", 0.5)),
            scan_range_max=float(g.get("ScanRangeMax", 20.0)),
            usable_range_min=umin, usable_range_max=umax,
            cost_type=cost_type, greedy_params=gp)
    if matcher_type == "BranchBound":
        cost_type, gp, umin, umax = _cost_settings(
            root, g.get("CostType", "GreedyEndpoint"),
            g.get("CostConfigGroup", "CostGreedyEndpoint"))
        return scan_matchers.BranchBoundMatcher(
            node_height_max=int(g.get("NodeHeightMax", 6)),
            range_x=float(g.get("SearchRangeX", 2.0)),
            range_y=float(g.get("SearchRangeY", 2.0)),
            range_theta=float(g.get("SearchRangeTheta", 1.0)),
            scan_range_max=float(g.get("ScanRangeMax", 20.0)),
            usable_range_min=umin, usable_range_max=umax,
            frontier_cap=int(root.get("Tpu.BranchBoundFrontierCap", 4096)),
            cost_type=cost_type, greedy_params=gp)
    if matcher_type == "GridSearch":
        cost_type, gp, umin, umax = _cost_settings(
            root, g.get("CostType", "GreedyEndpoint"),
            g.get("CostConfigGroup", "CostGreedyEndpoint"))
        return scan_matchers.GridSearchMatcher(
            range_x=float(g.get("SearchRangeX", 2.0)),
            range_y=float(g.get("SearchRangeY", 2.0)),
            range_theta=float(g.get("SearchRangeTheta", 0.5)),
            step_x=float(g.get("SearchStepX", 0.05)),
            step_y=float(g.get("SearchStepY", 0.05)),
            step_theta=float(g.get("SearchStepTheta", 0.005)),
            usable_range_min=umin, usable_range_max=umax,
            cost_type=cost_type, greedy_params=gp)
    if matcher_type == "HillClimbing":
        cost_type, gp, umin, umax = _cost_settings(
            root, g.get("CostType", "GreedyEndpoint"),
            g.get("CostConfigGroup", "CostGreedyEndpoint"))
        return scan_matchers.HillClimbingMatcher(
            linear_step=float(g.get("LinearStep", 0.1)),
            angular_step=float(g.get("AngularStep", 0.1)),
            max_iterations=int(g.get("MaxIterations", 100)),
            max_refinements=int(g.get("MaxNumOfRefinements", 5)),
            usable_range_min=umin, usable_range_max=umax,
            cost_type=cost_type, greedy_params=gp)
    if matcher_type == "LinearSolver":
        gcost = root.group(g.get("CostConfigGroup", "CostSquareError"))
        return scan_matchers.LinearSolverMatcher(
            max_iterations=int(g.get("NumOfIterationsMax", 3)),
            convergence_threshold=float(g.get("ConvergenceThreshold", 1e-2)),
            usable_range_min=float(gcost.get("UsableRangeMin", 0.01)),
            usable_range_max=float(gcost.get("UsableRangeMax", 50.0)),
            translation_regularizer=float(
                g.get("TranslationRegularizer", 1e-3)),
            rotation_regularizer=float(g.get("RotationRegularizer", 1e-3)))
    raise ValueError(f"unknown scan matcher type: {matcher_type}")


def create_loop_searcher(root: Config, searcher_type: str, group: str):
    """CreateLoopSearcher (slam_launcher.cpp:345-374)."""
    if searcher_type != "Nearest":
        raise ValueError(f"unknown loop searcher type: {searcher_type}")
    g = root.group(group)
    return lc.LoopSearcherNearest(
        travel_dist_threshold=float(g.get("TravelDistThreshold", 10.0)),
        node_dist_max=float(g.get("PoseGraphNodeDistMax", 2.0)),
        num_candidate_nodes=int(g.get("NumOfCandidateNodes", 1)),
        # Extension over the reference (which always emits one candidate,
        # loop_searcher_nearest.cpp:90-107): K>1 emits the nearest node of
        # up to K distinct finished maps; the batched detectors fold them
        # into one dispatch.
        num_candidate_maps=int(g.get("NumOfCandidateMaps", 1)))


def create_loop_detector(root: Config, detector_type: str, group: str):
    """CreateLoopDetector (slam_launcher.cpp:482-497)."""
    if detector_type == "Empty":
        return lc.LoopDetectorEmpty()
    g = root.group(group)
    sm_group = root.group(g.get("ScanMatcherConfigGroup"))
    if detector_type == "BranchBound":
        cost_type, gp, umin, umax = _cost_settings(
            root, sm_group.get("CostType", "GreedyEndpoint"),
            sm_group.get("CostConfigGroup", "CostGreedyEndpoint"))
        return lc.LoopDetectorBranchBound(
            score_threshold=float(g.get("ScoreThreshold", 0.8)),
            node_height_max=int(sm_group.get("NodeHeightMax", 6)),
            range_x=float(sm_group.get("SearchRangeX", 2.0)),
            range_y=float(sm_group.get("SearchRangeY", 2.0)),
            range_theta=float(sm_group.get("SearchRangeTheta", 1.0)),
            scan_range_max=float(sm_group.get("ScanRangeMax", 20.0)),
            usable_range_min=umin, usable_range_max=umax,
            frontier_cap=int(root.get("Tpu.BranchBoundFrontierCap", 4096)),
            greedy_params=gp)
    if detector_type == "RealTimeCorrelative":
        cost_type, gp, umin, umax = _cost_settings(
            root, sm_group.get("CostType", "GreedyEndpoint"),
            sm_group.get("CostConfigGroup", "CostGreedyEndpoint"))
        return lc.LoopDetectorCorrelative(
            score_threshold=float(g.get("ScoreThreshold", 0.8)),
            low_resolution=int(sm_group.get("LowResolutionMapWinSize", 10)),
            range_x=float(sm_group.get("SearchRangeX", 0.75)),
            range_y=float(sm_group.get("SearchRangeY", 0.75)),
            range_theta=float(sm_group.get("SearchRangeTheta", 0.5)),
            scan_range_max=float(sm_group.get("ScanRangeMax", 20.0)),
            usable_range_min=umin, usable_range_max=umax,
            refine_blocks=int(root.get("Tpu.CorrelativeRefineBlocks", 512)),
            greedy_params=gp)
    if detector_type == "GridSearch":
        cost_type, gp, umin, umax = _cost_settings(
            root, sm_group.get("CostType", "GreedyEndpoint"),
            sm_group.get("CostConfigGroup", "CostGreedyEndpoint"))
        return lc.LoopDetectorGridSearch(
            score_threshold=float(g.get("ScoreThreshold", 0.8)),
            range_x=float(sm_group.get("SearchRangeX", 2.0)),
            range_y=float(sm_group.get("SearchRangeY", 2.0)),
            range_theta=float(sm_group.get("SearchRangeTheta", 0.5)),
            step_x=float(sm_group.get("SearchStepX", 0.05)),
            step_y=float(sm_group.get("SearchStepY", 0.05)),
            step_theta=float(sm_group.get("SearchStepTheta", 0.005)),
            usable_range_min=umin, usable_range_max=umax,
            greedy_params=gp)
    raise ValueError(f"unknown loop detector type: {detector_type}")


def create_optimizer_config(root: Config, optimizer_type: str,
                            group: str) -> optimizer_lm.LMConfig:
    """CreatePoseGraphOptimizerLM (slam_launcher.cpp:627-661)."""
    if optimizer_type != "LM":
        raise ValueError(f"unknown optimizer type: {optimizer_type}")
    g = root.group(group)
    solver_str = g.get("SolverType", "SparseCholesky")
    # SparseCholesky maps to the dense direct-solve path for small graphs;
    # ConjugateGradient maps to the matrix-free PCG (the TPU-native default).
    solver = "cg" if solver_str == "ConjugateGradient" else "dense"
    loss_type = g.get("LossFunctionType", "Huber")
    loss_group = g.get("LossFunctionConfigGroup", "LossHuber")
    loss_defaults = {
        "Squared": 1.0, "Huber": 1.345 * 1.345, "Cauchy": 1e-2,
        "Fair": 1.3998 * 1.3998, "GemanMcClure": 1.0,
        "Welsch": 2.9846 * 2.9846, "DCS": 1.0,
    }
    scale = float(root.get(loss_group + ".Scale",
                           loss_defaults.get(loss_type, 1.0)))
    return optimizer_lm.LMConfig(
        solver=solver,
        max_iterations=int(g.get("NumOfIterationsMax", 10)),
        error_tolerance=float(g.get("ErrorTolerance", 1e-3)),
        initial_lambda=float(g.get("InitialLambda", 1e-4)),
        loss_name=loss_type,
        loss_scale=scale,
        cg_max_iterations=int(root.get("Tpu.CgMaxIterations", 256)),
        cg_tolerance=float(root.get("Tpu.CgTolerance", 1e-6)))


def create_slam(root: Config,
                threaded_backend: bool = False,
                mesh=None) -> slam.LidarGraphSlam:
    """CreateLidarGraphSlam (slam_launcher.cpp:846-876): the full object
    graph from one settings tree.

    ``mesh``: optional jax.sharding.Mesh — the backend then runs the
    edge-sharded solver and fans loop-detection queries out across it
    (single- or multi-host)."""
    top = root.group("LidarGraphSlam") if root.get("LidarGraphSlam") \
        else Config({})

    # Grid map builder (slam_launcher.cpp:711-737).
    gmb_group = top.get("GridMapBuilderConfigGroup", "GridMapBuilder")
    g = root.group(gmb_group)
    builder_cfg = mb.MapBuilderConfig(
        resolution=float(g.get("Map.Resolution", 0.05)),
        local_map_size=int(root.get("Tpu.LocalMapSize", 1536)),
        latest_map_size=int(root.get("Tpu.LatestMapSize", 1024)),
        num_scans_for_latest_map=int(g.get("Map.NumOfScansForLatestMap", 5)),
        travel_dist_threshold=float(
            g.get("Map.TravelDistThresholdForLocalMap", 20.0)),
        usable_range_min=float(g.get("UsableRangeMin", 0.01)),
        usable_range_max=float(g.get("UsableRangeMax", 50.0)),
        prob_hit=float(g.get("ProbabilityHit", 0.9)),
        prob_miss=float(g.get("ProbabilityMiss", 0.1)),
        max_ray_steps=int(root.get("Tpu.MaxRaySteps", 448)),
    )
    store = mb.ScanStore(
        beam_capacity=int(root.get("Tpu.BeamCapacity", 1024)))
    builder = mb.GridMapBuilder(builder_cfg, store)

    # Frontend (slam_launcher.cpp:740-803).
    fe_group = top.get("FrontendConfigGroup", "Frontend")
    fe = root.group(fe_group)
    accumulator = None
    if fe.get_bool("UseScanAccumulator", False):
        acc_group = root.group(
            fe.get("ScanAccumulatorConfigGroup", "ScanAccumulator"))
        accumulator = ScanAccumulator(
            num_accumulated_scans=int(
                acc_group.get("NumOfAccumulatedScans", 3)))
    interpolator = None
    if fe.get_bool("UseScanInterpolator", True):
        int_group = root.group(
            fe.get("ScanInterpolatorConfigGroup", "ScanInterpolator"))
        interpolator = ScanInterpolator(
            dist_scans=float(int_group.get("DistScans", 0.05)),
            dist_threshold_empty=float(
                int_group.get("DistThresholdEmpty", 0.25)))
    matcher = create_scan_matcher(
        root,
        fe.get("LocalSlam.ScanMatcherType", "HillClimbing"),
        fe.get("LocalSlam.ScanMatcherConfigGroup", "ScanMatcherHillClimbing"))
    fe_cfg = slam.FrontendConfig(
        initial_pose=np.array([
            float(fe.get("InitialPose.X", 0.0)),
            float(fe.get("InitialPose.Y", 0.0)),
            float(fe.get("InitialPose.Theta", 0.0))]),
        update_threshold_travel_dist=float(
            fe.get("UpdateThresholdTravelDist", 1.0)),
        update_threshold_angle=float(fe.get("UpdateThresholdAngle", 0.5)),
        update_threshold_time=float(fe.get("UpdateThresholdTime", 5.0)),
        loop_detection_interval=int(fe.get("LoopDetectionInterval", 10)))
    frontend = slam.Frontend(fe_cfg, matcher, interpolator=interpolator,
                             accumulator=accumulator)

    # Backend (slam_launcher.cpp:806-843).
    be_group = top.get("BackendConfigGroup", "Backend")
    be = root.group(be_group)
    lm_cfg = create_optimizer_config(
        root,
        be.get("PoseGraphOptimizerType", "LM"),
        be.get("PoseGraphOptimizerConfigGroup", "PoseGraphOptimizerLM"))
    searcher = create_loop_searcher(
        root,
        be.get("LoopSearcherType", "Nearest"),
        be.get("LoopSearcherConfigGroup", "LoopSearcherNearest"))
    detector = create_loop_detector(
        root,
        be.get("LoopDetectorType", "GridSearch"),
        be.get("LoopDetectorConfigGroup", "LoopDetectorGridSearch"))
    backend = slam.Backend(searcher, detector, lm_cfg, mesh=mesh)

    graph = PoseGraph()
    return slam.LidarGraphSlam(frontend, backend, builder, graph,
                               threaded_backend=threaded_backend)
