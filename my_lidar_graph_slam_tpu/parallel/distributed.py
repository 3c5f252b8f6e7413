"""Sharded pose-graph optimization and loop-detection fan-out.

Distributed LM/CG: pose vectors are replicated (3N floats — tiny), EDGES are
sharded across the mesh. Every normal-equation contraction is a sum over
edges, so each device computes its partial segment-sum and one ``psum``
completes it — the distributed Schur-complement/CG structure from the build
plan (SURVEY.md §2.11) with all collectives riding ICI. This replaces the
reference's single-threaded Eigen solve (pose_graph_optimizer_lm.cpp:
178-206) with a solver whose per-device work shrinks linearly in the edge
count.

Loop-detection fan-out: candidate nodes are sharded across the mesh and each
device runs the full branch-and-bound matcher on its shard (the reference
runs the same loop sequentially, loop_detector_branch_bound.cpp:62-89).

All mesh inputs are threaded explicitly through ``shard_map`` arguments
(nothing traced is closed over), so the programs build identically on real
multi-chip meshes and on the CPU-faked 8-device test mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from my_lidar_graph_slam_tpu.models import optimizer_lm, robust_loss
from my_lidar_graph_slam_tpu.models.pose_graph import GraphArrays
from my_lidar_graph_slam_tpu.ops import matchers


def _edge_axis_specs(axis: str) -> GraphArrays:
    """Shardings for GraphArrays: nodes replicated, edges sharded."""
    return GraphArrays(
        poses=P(),
        node_mask=P(),
        edge_i=P(axis),
        edge_j=P(axis),
        edge_rel=P(axis),
        edge_info=P(axis),
        edge_mask=P(axis),
    )


@functools.partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def optimize_sharded(graph: GraphArrays, config: optimizer_lm.LMConfig,
                     mesh: Mesh, axis: str = "shard"
                     ) -> optimizer_lm.OptimizeResult:
    """LM loop with the CG inner solve sharded over edges.

    Inside ``shard_map`` each device sees its slice of the edge arrays; all
    per-edge products are local, and the only communication is one ``psum``
    per reduction (b, H diagonal, Hv, total error).
    """
    loss = robust_loss.create(config.loss_name, config.loss_scale)
    n = graph.poses.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_edge_axis_specs(axis),),
        out_specs=(P(), P(), P()))
    def lm_loop(g):
        poses0 = jnp.asarray(g.poses, jnp.float32)
        node_mask = g.node_mask

        def psum(x):
            return jax.lax.psum(x, axis)

        def build_terms(poses):
            err = optimizer_lm.edge_errors(
                poses, g.edge_i, g.edge_j, g.edge_rel)
            ji, jj = optimizer_lm.edge_jacobians(poses, g.edge_i, g.edge_j)
            sq = optimizer_lm._quad(err, g.edge_info)
            w = jnp.where(g.edge_mask, loss.weight(sq), 0.0)
            winfo = w[:, None, None] * g.edge_info
            tr_ji_w = optimizer_lm._mm(jnp.swapaxes(ji, -1, -2), winfo)
            tr_jj_w = optimizer_lm._mm(jnp.swapaxes(jj, -1, -2), winfo)
            b = jnp.zeros((n, 3), poses.dtype)
            b = b.at[g.edge_i].add(optimizer_lm._mv(tr_ji_w, err))
            b = b.at[g.edge_j].add(optimizer_lm._mv(tr_jj_w, err))
            return ji, jj, winfo, psum(b)

        def hv(v, ji, jj, winfo, lam):
            vi = v[g.edge_i]
            vj = v[g.edge_j]
            u = optimizer_lm._mv(ji, vi) + optimizer_lm._mv(jj, vj)
            t = optimizer_lm._mv(winfo, u)
            out = jnp.zeros_like(v)
            out = out.at[g.edge_i].add(
                optimizer_lm._mv(jnp.swapaxes(ji, -1, -2), t))
            out = out.at[g.edge_j].add(
                optimizer_lm._mv(jnp.swapaxes(jj, -1, -2), t))
            out = psum(out)
            out = out + lam * v
            out = out.at[0].add(optimizer_lm.GAUGE * v[0])
            return out

        def block_diag(ji, jj, winfo, lam):
            hii = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(ji, -1, -2), winfo), ji)
            hjj = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(jj, -1, -2), winfo), jj)
            diag = jnp.zeros((n, 3, 3), ji.dtype)
            diag = diag.at[g.edge_i].add(hii)
            diag = diag.at[g.edge_j].add(hjj)
            diag = psum(diag)
            eye = jnp.eye(3, dtype=ji.dtype)
            diag = diag + lam * eye[None]
            diag = diag.at[0].add(optimizer_lm.GAUGE * eye)
            return diag

        def pcg(rhs, ji, jj, winfo, lam):
            # Chain preconditioner (see optimizer_lm.chain_factor): each
            # device scatters its local odometric-edge blocks, ONE psum
            # replicates the chain, then the cyclic-reduction factor/solve
            # runs redundantly per device — no communication per CG step
            # beyond the Hv psum, and CG iterations drop from O(N) to
            # O(#loop edges).
            diag = block_diag(ji, jj, winfo, lam)
            sub = psum(optimizer_lm._chain_subdiag(g, ji, jj, winfo, n))
            levels, dinv_f, npow = optimizer_lm.chain_factor(diag, sub)

            def precond(r):
                return optimizer_lm.chain_solve(levels, dinv_f, npow, r)

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            rz0 = (rhs * z0).sum()
            rr0 = (rhs * rhs).sum()

            def cond(s):
                x, r, z, p, rz, it = s
                return (it < config.cg_max_iterations) & \
                    ((r * r).sum() > config.cg_tolerance ** 2 * rr0)

            def body(s):
                x, r, z, p, rz, it = s
                hp = hv(p, ji, jj, winfo, lam)
                alpha = rz / jnp.maximum((p * hp).sum(), 1e-30)
                x = x + alpha * p
                r = r - alpha * hp
                z = precond(r)
                rz_new = (r * z).sum()
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return (x, r, z, p, rz_new, it + 1)

            x, *_ = jax.lax.while_loop(
                cond, body,
                (x0, rhs, z0, z0, rz0, jnp.asarray(0, jnp.int32)))
            return x

        def total_err(poses):
            err = optimizer_lm.edge_errors(
                poses, g.edge_i, g.edge_j, g.edge_rel)
            sq = optimizer_lm._quad(err, g.edge_info)
            return psum(jnp.where(g.edge_mask, loss.loss(sq), 0.0).sum())

        def body(s):
            ji, jj, winfo, b = build_terms(s["poses"])
            delta = pcg(-b, ji, jj, winfo, s["lam"])
            poses = s["poses"] + delta * node_mask[:, None]
            err = total_err(poses)
            iters = s["iters"] + 1
            done = (iters >= config.max_iterations) | \
                   (jnp.abs(s["prev_err"] - err) < config.error_tolerance)
            decreased = err < s["prev_err"]
            lam = jnp.where(decreased, s["lam"] * 0.5, s["lam"] * 2.0)
            return dict(poses=poses, lam=lam, prev_err=err, err=err,
                        iters=iters, done=done)

        init = dict(
            poses=poses0,
            lam=jnp.asarray(config.initial_lambda, jnp.float32),
            prev_err=jnp.asarray(jnp.finfo(jnp.float32).max),
            err=jnp.asarray(jnp.finfo(jnp.float32).max),
            iters=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )
        final = jax.lax.while_loop(lambda s: ~s["done"], body, init)
        return final["poses"], final["err"], final["iters"]

    poses, err, iters = lm_loop(graph)
    return optimizer_lm.OptimizeResult(poses, err, iters)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "node_height_max", "win_x", "win_y",
                     "win_theta_max", "frontier_cap"))
def branch_bound_fanout(pyramid, grid, initial_poses,
                        ranges, angles, valid,
                        scan_min_range, scan_max_range, rel_sensor_poses,
                        num_total_beams,
                        scan_range_max, range_theta,
                        usable_range_min, usable_range_max,
                        normalized_score_threshold,
                        mesh: Mesh, axis: str = "shard",
                        node_height_max: int = 6,
                        win_x: int = 20, win_y: int = 20,
                        win_theta_max: int = 100,
                        frontier_cap: int = 4096):
    """Match K candidate nodes against one local map, K sharded over chips.

    ``initial_poses``: f32[K, 3]; per-node scan tensors are [K, NB],
    per-node scalars (incl. ``num_total_beams``, the reference's
    normalization divisor which varies per scan) are f32[K]; K must be a
    multiple of the mesh size (pad with all-invalid scans — a padded row
    scores 0 and cannot pass a positive threshold). The pyramid and map
    metadata are replicated. Returns a MatchSummary pytree with leading
    axis K.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P(),
                  P()),
        out_specs=P(axis))
    def fan(pyr, grd, poses, r, a, v, mn, mx, rel, ntot,
            srm, rt, urmin, urmax, thresh):
        def match_one(p, r1, a1, v1, mn1, mx1, rel1, nt1):
            # num_total_beams is traced (per node), so run the matcher
            # un-normalized (n_total = 1) with the threshold pre-scaled by
            # nt1, then divide the normalized outputs back.
            s = matchers.branch_bound_match(
                pyr, grd, p, r1, a1, v1, mn1, mx1, rel1,
                srm, rt, urmin, urmax, thresh * nt1,
                node_height_max=node_height_max,
                win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
                frontier_cap=frontier_cap,
                num_total_beams=1)
            return s._replace(
                normalized_cost=s.normalized_cost / nt1,
                normalized_score=s.normalized_score / nt1)

        return jax.vmap(match_one)(poses, r, a, v, mn, mx, rel, ntot)

    return fan(pyramid, grid, initial_poses, ranges, angles, valid,
               scan_min_range, scan_max_range, rel_sensor_poses,
               jnp.asarray(num_total_beams, jnp.float32),
               jnp.asarray(scan_range_max, jnp.float32),
               jnp.asarray(range_theta, jnp.float32),
               jnp.asarray(usable_range_min, jnp.float32),
               jnp.asarray(usable_range_max, jnp.float32),
               jnp.asarray(normalized_score_threshold, jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "node_height_max", "win_x", "win_y",
                     "win_theta_max", "frontier_cap"))
def branch_bound_fanout_multi(pyramids, grids, initial_poses,
                              ranges, angles, valid,
                              scan_min_range, scan_max_range,
                              rel_sensor_poses, num_total_beams,
                              scan_range_max, range_theta,
                              usable_range_min, usable_range_max,
                              normalized_score_threshold,
                              mesh: Mesh, axis: str = "shard",
                              node_height_max: int = 6,
                              win_x: int = 20, win_y: int = 20,
                              win_theta_max: int = 100,
                              frontier_cap: int = 4096):
    """M candidates' sharded fan-outs in ONE dispatch.

    ``pyramids``: the M same-shape local-map pyramids stacked on axis 0;
    ``grids``: a GridMap pytree with leading axis M; scan tensors have
    leading axes [M, K]. Each candidate's node window still fans out
    across the mesh (the per-candidate :func:`branch_bound_fanout`
    program, now inside one jit) — this removes the per-candidate host
    round trip the reference's sequential query loop implies
    (loop_detector_branch_bound.cpp:38-89). Returns a MatchSummary with
    leading axes [M, K].
    """
    m = pyramids.shape[0]
    outs = []
    for ci in range(m):
        grid = jax.tree_util.tree_map(lambda x, c=ci: x[c], grids)
        outs.append(branch_bound_fanout(
            pyramids[ci], grid, initial_poses[ci],
            ranges[ci], angles[ci], valid[ci],
            scan_min_range[ci], scan_max_range[ci], rel_sensor_poses[ci],
            num_total_beams[ci], scan_range_max, range_theta,
            usable_range_min, usable_range_max,
            normalized_score_threshold, mesh=mesh, axis=axis,
            node_height_max=node_height_max, win_x=win_x, win_y=win_y,
            win_theta_max=win_theta_max, frontier_cap=frontier_cap))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)


# ---------------------------------------------------------------------------
# Node-sharded LM solve (O(N/D + boundary) memory and comm per device)
# ---------------------------------------------------------------------------


class NodeShardedGraph(NamedTuple):
    """Pose graph partitioned into contiguous node blocks.

    Built on the host by :func:`partition_graph_by_nodes`. SE(2) pose
    graphs are chain-dominated (every node couples to its successor,
    pose_graph.hpp:165-169), so contiguous blocks make almost every edge
    LOCAL to one device; the only cross-shard edges are the D-1 chain
    crossings plus the loop-closure edges — the "boundary" of the
    distributed Schur-complement structure (SURVEY.md §2.11 solver row).

    Leading axis D is the device axis (sharded); cross-edge arrays are
    replicated.
    """

    poses: np.ndarray        # f32[D, NB, 3]   sharded
    node_mask: np.ndarray    # bool[D, NB]     sharded
    l_i: np.ndarray          # i32[D, EL]      local edge endpoint offsets
    l_j: np.ndarray          # i32[D, EL]
    l_rel: np.ndarray        # f32[D, EL, 3]
    l_info: np.ndarray       # f32[D, EL, 3, 3]
    l_mask: np.ndarray       # bool[D, EL]
    c_bi: np.ndarray         # i32[C] block of endpoint i   replicated
    c_oi: np.ndarray         # i32[C] offset of endpoint i
    c_bj: np.ndarray         # i32[C]
    c_oj: np.ndarray         # i32[C]
    c_rel: np.ndarray        # f32[C, 3]
    c_info: np.ndarray       # f32[C, 3, 3]
    c_mask: np.ndarray       # bool[C]


def _pad_pow2(n: int, minimum: int = 8) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def partition_graph_by_nodes(graph: GraphArrays,
                             n_devices: int) -> NodeShardedGraph:
    """Host-side partition of a GraphArrays snapshot into node blocks."""
    d = n_devices
    node_mask = np.asarray(graph.node_mask, bool)
    emask = np.asarray(graph.edge_mask, bool)
    n_cap = node_mask.shape[0]
    nb = -(-n_cap // d)
    n_pad = d * nb

    poses = np.zeros((n_pad, 3), np.float32)
    poses[:n_cap] = np.asarray(graph.poses, np.float32)
    nmask = np.zeros((n_pad,), bool)
    nmask[:n_cap] = node_mask

    ei = np.asarray(graph.edge_i, np.int64)[emask]
    ej = np.asarray(graph.edge_j, np.int64)[emask]
    rel = np.asarray(graph.edge_rel, np.float32)[emask]
    info = np.asarray(graph.edge_info, np.float32)[emask]
    bi = ei // nb
    bj = ej // nb
    local = bi == bj

    # Local edges, bucketed per device.
    el_counts = np.bincount(bi[local], minlength=d)
    el = _pad_pow2(max(int(el_counts.max(initial=0)), 1))
    l_i = np.zeros((d, el), np.int32)
    l_j = np.zeros((d, el), np.int32)
    l_rel = np.zeros((d, el, 3), np.float32)
    l_info = np.zeros((d, el, 3, 3), np.float32)
    l_mask = np.zeros((d, el), bool)
    fill = np.zeros(d, np.int64)
    for k in np.flatnonzero(local):
        dev = int(bi[k])
        p = fill[dev]
        l_i[dev, p] = ei[k] - dev * nb
        l_j[dev, p] = ej[k] - dev * nb
        l_rel[dev, p] = rel[k]
        l_info[dev, p] = info[k]
        l_mask[dev, p] = True
        fill[dev] += 1

    # Cross edges, replicated (few: loop closures + chain crossings).
    cross = np.flatnonzero(~local)
    c = _pad_pow2(max(len(cross), 1))
    c_bi = np.zeros((c,), np.int32)
    c_oi = np.zeros((c,), np.int32)
    c_bj = np.zeros((c,), np.int32)
    c_oj = np.zeros((c,), np.int32)
    c_rel = np.zeros((c, 3), np.float32)
    c_info = np.zeros((c, 3, 3), np.float32)
    c_mask = np.zeros((c,), bool)
    for p, k in enumerate(cross):
        c_bi[p] = bi[k]
        c_oi[p] = ei[k] - bi[k] * nb
        c_bj[p] = bj[k]
        c_oj[p] = ej[k] - bj[k] * nb
        c_rel[p] = rel[k]
        c_info[p] = info[k]
        c_mask[p] = True

    return NodeShardedGraph(
        poses=poses.reshape(d, nb, 3),
        node_mask=nmask.reshape(d, nb),
        l_i=l_i, l_j=l_j, l_rel=l_rel, l_info=l_info, l_mask=l_mask,
        c_bi=c_bi, c_oi=c_oi, c_bj=c_bj, c_oj=c_oj,
        c_rel=c_rel, c_info=c_info, c_mask=c_mask)


def psum_bytes_per_cg_step(sharded: NodeShardedGraph) -> int:
    """Collective volume per CG iteration: two [C, 3] endpoint-value
    exchanges plus two scalars — O(boundary), independent of N."""
    c = sharded.c_bi.shape[0]
    return 2 * c * 3 * 4 + 2 * 4


@functools.partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def optimize_sharded_nodes(sharded: NodeShardedGraph,
                           config: optimizer_lm.LMConfig,
                           mesh: Mesh, axis: str = "shard"
                           ) -> optimizer_lm.OptimizeResult:
    """LM solve with NODE BLOCKS sharded across the mesh.

    Each device owns a contiguous block of poses and every edge interior
    to it; the replicated cross-edge set (loop closures + chain
    crossings) is the only coupling. Per CG step the ONLY collectives are
    one [C, 3]-pair psum (fetch remote endpoint values of cross edges)
    and the scalar dot-product psums — O(N/D + C) per device versus the
    edge-sharded solver's O(N) pose psum (distributed.optimize_sharded).
    The preconditioner is the per-shard chain cyclic reduction
    (optimizer_lm.chain_factor) over LOCAL odometric couplings: shard
    interiors solve exactly; CG corrects the C boundary couplings.
    """
    loss = robust_loss.create(config.loss_name, config.loss_scale)
    d, nb, _ = sharded.poses.shape

    specs = NodeShardedGraph(
        poses=P(axis), node_mask=P(axis),
        l_i=P(axis), l_j=P(axis), l_rel=P(axis), l_info=P(axis),
        l_mask=P(axis),
        c_bi=P(), c_oi=P(), c_bj=P(), c_oj=P(),
        c_rel=P(), c_info=P(), c_mask=P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(specs,),
        out_specs=(P(axis), P(), P()))
    def lm_loop(g):
        my = jax.lax.axis_index(axis)
        poses0 = g.poses[0]                      # [NB, 3] local block
        nmask = g.node_mask[0]
        li = g.l_i[0]
        lj = g.l_j[0]
        l_rel = g.l_rel[0]
        l_info = g.l_info[0]
        l_mask = g.l_mask[0]
        is_first = my == 0

        def psum(x):
            return jax.lax.psum(x, axis)

        def cross_vals(v):
            """Fetch cross-edge endpoint values: [C, 2, 3] replicated."""
            vi = jnp.where((g.c_bi == my)[:, None], v[g.c_oi], 0.0)
            vj = jnp.where((g.c_bj == my)[:, None], v[g.c_oj], 0.0)
            return psum(jnp.stack([vi, vj], axis=1))

        def local_terms(poses):
            pi = poses[li]
            pj = poses[lj]
            err = _pair_errors(pi, pj, l_rel)
            ji, jj = _pair_jacobians(pi, pj)
            sq = optimizer_lm._quad(err, l_info)
            w = jnp.where(l_mask, loss.weight(sq), 0.0)
            winfo = w[:, None, None] * l_info
            return err, ji, jj, winfo

        def cross_terms(poses):
            pc = cross_vals(poses)               # [C, 2, 3]
            err = _pair_errors(pc[:, 0], pc[:, 1], g.c_rel)
            ji, jj = _pair_jacobians(pc[:, 0], pc[:, 1])
            sq = optimizer_lm._quad(err, g.c_info)
            w = jnp.where(g.c_mask, loss.weight(sq), 0.0)
            winfo = w[:, None, None] * g.c_info
            return err, ji, jj, winfo

        def scatter_cross(out, contrib_i, contrib_j):
            """Add cross-edge endpoint contributions owned by this shard
            (contributions may be [C, 3] vectors or [C, 3, 3] blocks)."""
            mi = (g.c_bi == my).reshape((-1,) + (1,) * (contrib_i.ndim - 1))
            mj = (g.c_bj == my).reshape((-1,) + (1,) * (contrib_j.ndim - 1))
            out = out.at[g.c_oi].add(jnp.where(mi, contrib_i, 0.0))
            out = out.at[g.c_oj].add(jnp.where(mj, contrib_j, 0.0))
            return out

        def build_b(terms_l, terms_c):
            err, ji, jj, winfo = terms_l
            b = jnp.zeros((nb, 3), jnp.float32)
            b = b.at[li].add(optimizer_lm._mv(
                optimizer_lm._mm(jnp.swapaxes(ji, -1, -2), winfo), err))
            b = b.at[lj].add(optimizer_lm._mv(
                optimizer_lm._mm(jnp.swapaxes(jj, -1, -2), winfo), err))
            errc, jic, jjc, winfoc = terms_c
            ci = optimizer_lm._mv(
                optimizer_lm._mm(jnp.swapaxes(jic, -1, -2), winfoc), errc)
            cj = optimizer_lm._mv(
                optimizer_lm._mm(jnp.swapaxes(jjc, -1, -2), winfoc), errc)
            return scatter_cross(b, ci, cj)

        def hv(v, terms_l, terms_c, lam):
            _, ji, jj, winfo = terms_l
            u = optimizer_lm._mv(ji, v[li]) + optimizer_lm._mv(jj, v[lj])
            t = optimizer_lm._mv(winfo, u)
            out = jnp.zeros_like(v)
            out = out.at[li].add(
                optimizer_lm._mv(jnp.swapaxes(ji, -1, -2), t))
            out = out.at[lj].add(
                optimizer_lm._mv(jnp.swapaxes(jj, -1, -2), t))
            _, jic, jjc, winfoc = terms_c
            vc = cross_vals(v)                    # ONLY O(C) comm
            uc = optimizer_lm._mv(jic, vc[:, 0]) + \
                optimizer_lm._mv(jjc, vc[:, 1])
            tc = optimizer_lm._mv(winfoc, uc)
            out = scatter_cross(
                out,
                optimizer_lm._mv(jnp.swapaxes(jic, -1, -2), tc),
                optimizer_lm._mv(jnp.swapaxes(jjc, -1, -2), tc))
            out = out + lam * v
            out = out.at[0].add(jnp.where(is_first,
                                          optimizer_lm.GAUGE, 0.0) * v[0])
            return out

        def precond_factor(terms_l, terms_c, lam):
            _, ji, jj, winfo = terms_l
            hii = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(ji, -1, -2), winfo), ji)
            hjj = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(jj, -1, -2), winfo), jj)
            diag = jnp.zeros((nb, 3, 3), jnp.float32)
            diag = diag.at[li].add(hii)
            diag = diag.at[lj].add(hjj)
            _, jic, jjc, winfoc = terms_c
            hiic = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(jic, -1, -2), winfoc), jic)
            hjjc = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(jjc, -1, -2), winfoc), jjc)
            diag = scatter_cross(diag, hiic, hjjc)
            eye = jnp.eye(3)
            diag = diag + lam * eye[None]
            diag = diag.at[0].add(
                jnp.where(is_first, optimizer_lm.GAUGE, 0.0) * eye)
            # Per-shard chain: local odometric couplings (j == i + 1).
            is_chain = l_mask & (lj == li + 1)
            hij = optimizer_lm._mm(
                optimizer_lm._mm(jnp.swapaxes(ji, -1, -2), winfo), jj)
            sub = jnp.zeros((nb, 3, 3), jnp.float32)
            sub = sub.at[jnp.where(is_chain, lj, 0)].add(
                jnp.where(is_chain[:, None, None],
                          jnp.swapaxes(hij, -1, -2), 0.0))
            sub = sub.at[0].set(0.0)
            return optimizer_lm.chain_factor(diag, sub)

        def pcg(rhs, terms_l, terms_c, lam):
            levels, dinv_f, npow = precond_factor(terms_l, terms_c, lam)

            def precond(r):
                return optimizer_lm.chain_solve(levels, dinv_f, npow, r)

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            rz0 = psum((rhs * z0).sum())
            rr0 = psum((rhs * rhs).sum())

            def cond(s):
                x, r, z, p, rz, it = s
                return (it < config.cg_max_iterations) & \
                    (psum((r * r).sum()) >
                     config.cg_tolerance ** 2 * rr0)

            def body(s):
                x, r, z, p, rz, it = s
                hp = hv(p, terms_l, terms_c, lam)
                alpha = rz / jnp.maximum(psum((p * hp).sum()), 1e-30)
                x = x + alpha * p
                r = r - alpha * hp
                z = precond(r)
                rz_new = psum((r * z).sum())
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return (x, r, z, p, rz_new, it + 1)

            x, *_ = jax.lax.while_loop(
                cond, body,
                (x0, rhs, z0, z0, rz0, jnp.asarray(0, jnp.int32)))
            return x

        def total_err(poses):
            errl, _, _, _ = local_terms(poses)
            sql = optimizer_lm._quad(errl, l_info)
            e = jnp.where(l_mask, loss.loss(sql), 0.0).sum()
            errc, _, _, _ = cross_terms(poses)
            sqc = optimizer_lm._quad(errc, g.c_info)
            # Count each cross edge once: on the owner of endpoint i.
            e = e + jnp.where(g.c_mask & (g.c_bi == my),
                              loss.loss(sqc), 0.0).sum()
            return psum(e)

        def body(s):
            terms_l = local_terms(s["poses"])
            terms_c = cross_terms(s["poses"])
            b = build_b(terms_l, terms_c)
            delta = pcg(-b, terms_l, terms_c, s["lam"])
            poses = s["poses"] + delta * nmask[:, None]
            err = total_err(poses)
            iters = s["iters"] + 1
            done = (iters >= config.max_iterations) | \
                   (jnp.abs(s["prev_err"] - err) < config.error_tolerance)
            decreased = err < s["prev_err"]
            lam = jnp.where(decreased, s["lam"] * 0.5, s["lam"] * 2.0)
            return dict(poses=poses, lam=lam, prev_err=err, err=err,
                        iters=iters, done=done)

        init = dict(
            poses=poses0,
            lam=jnp.asarray(config.initial_lambda, jnp.float32),
            prev_err=jnp.asarray(jnp.finfo(jnp.float32).max),
            err=jnp.asarray(jnp.finfo(jnp.float32).max),
            iters=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )
        final = jax.lax.while_loop(lambda s: ~s["done"], body, init)
        return final["poses"][None], final["err"], final["iters"]

    poses, err, iters = lm_loop(sharded)
    return optimizer_lm.OptimizeResult(
        poses.reshape(-1, 3), err, iters)


def _pair_errors(pi, pj, rel):
    """SE(2) edge error from explicit endpoint poses
    (pose_graph_optimizer_lm.cpp:283-299)."""
    from my_lidar_graph_slam_tpu.utils import se2
    r = se2.inverse_compound(pi, pj) - rel
    return jnp.concatenate(
        [r[..., :2], se2.normalize_angle(r[..., 2:3])], axis=-1)


def _pair_jacobians(pi, pj):
    """Analytic edge Jacobians from explicit endpoint poses
    (pose_graph_optimizer_lm.cpp:224-280)."""
    th = pi[..., 2]
    s = jnp.sin(th)
    c = jnp.cos(th)
    dx = pj[..., 0] - pi[..., 0]
    dy = pj[..., 1] - pi[..., 1]
    a = -s * dx + c * dy
    b = -c * dx - s * dy
    z = jnp.zeros_like(th)
    o = jnp.ones_like(th)
    ji = jnp.stack([
        jnp.stack([-c, -s, a], axis=-1),
        jnp.stack([s, -c, b], axis=-1),
        jnp.stack([z, z, -o], axis=-1),
    ], axis=-2)
    jj = jnp.stack([
        jnp.stack([c, s, z], axis=-1),
        jnp.stack([-s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)
    return ji, jj
