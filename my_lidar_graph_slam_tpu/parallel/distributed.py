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

import jax
import jax.numpy as jnp
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
