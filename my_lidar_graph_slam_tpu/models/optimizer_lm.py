"""Robust Levenberg-Marquardt pose-graph optimizer (Sparse Pose Adjustment).

TPU-native redesign of PoseGraphOptimizerLM (pose_graph_optimizer_lm.cpp:
13-338, after Konolige et al. IROS 2010):

 * Per-edge SE(2) errors and analytic 3x3 Jacobians are evaluated for ALL
   edges as one batched computation (:224-299).
 * Robust M-estimator weights scale each edge's information matrix (:110-115).
 * The normal equations are never assembled as a sparse matrix: the solver is
   a matrix-free preconditioned conjugate gradient whose SpMV is a
   segment-sum over edge blocks, with a block-Jacobi (3x3 block diagonal)
   preconditioner — the TPU replacement for Eigen's SimplicialLDLT / CG
   (:178-206). A dense Cholesky path exists for small graphs and testing.
 * Gauge freedom is fixed by adding 1e9 to the first node's diagonal block
   (:164-168); the LM damping lambda is doubled/halved on error
   increase/decrease exactly as the reference's loop does (:41-64).

All arrays are capacity-padded; masked edges carry zero information and
masked nodes receive zero increments, so one compiled program serves every
graph size within a capacity bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.models import robust_loss
from my_lidar_graph_slam_tpu.models.pose_graph import GraphArrays
from my_lidar_graph_slam_tpu.utils import se2

GAUGE = 1e9  # First-node diagonal anchor (pose_graph_optimizer_lm.cpp:168).


class OptimizeResult(NamedTuple):
    poses: jnp.ndarray        # f32[N_cap, 3]
    total_error: jnp.ndarray  # f32[]
    iterations: jnp.ndarray   # i32[]


@dataclasses.dataclass(frozen=True)
class LMConfig:
    solver: str = "cg"                  # "cg" | "dense"
    max_iterations: int = 10
    error_tolerance: float = 1e-4
    initial_lambda: float = 1e-4
    loss_name: str = "Huber"
    loss_scale: float = 0.01
    cg_max_iterations: int = 256
    cg_tolerance: float = 1e-6
    # "chain": exact block-tridiagonal solve of the odometry chain via
    # cyclic reduction (log2 N batched 3x3 steps — the TPU-native
    # replacement for a sparse factorization); "jacobi": 3x3 block diagonal.
    preconditioner: str = "chain"


def edge_errors(poses, edge_i, edge_j, edge_rel):
    """Batched error e_ij = h(c_i, c_j) - z_ij with normalized angle
    (pose_graph_optimizer_lm.cpp:283-299)."""
    pi = poses[edge_i]
    pj = poses[edge_j]
    rel = se2.inverse_compound(pi, pj)
    err = rel - edge_rel
    return jnp.concatenate(
        [err[..., :2], se2.normalize_angle(err[..., 2:3])], axis=-1)


def edge_jacobians(poses, edge_i, edge_j):
    """Batched analytic Jacobians wrt start/end poses
    (pose_graph_optimizer_lm.cpp:224-280). Returns (Ji, Jj) [E, 3, 3]."""
    pi = poses[edge_i]
    pj = poses[edge_j]
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


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest")


def _mv(a, v):
    return jnp.einsum("...ij,...j->...i", a, v, precision="highest")


def _quad(e, info):
    """e^T Lambda e per edge."""
    return jnp.einsum("...i,...ij,...j->...", e, info, e,
                      precision="highest")


def total_error(poses, graph: GraphArrays, loss: robust_loss.RobustLoss):
    """Robust total error (pose_graph_optimizer_lm.cpp:302-338)."""
    err = edge_errors(poses, graph.edge_i, graph.edge_j, graph.edge_rel)
    sq = _quad(err, graph.edge_info)
    return jnp.where(graph.edge_mask, loss.loss(sq), 0.0).sum()


def _build_normal_terms(poses, graph: GraphArrays,
                        loss: robust_loss.RobustLoss):
    """Per-edge weighted blocks + RHS for the normal equations."""
    err = edge_errors(poses, graph.edge_i, graph.edge_j, graph.edge_rel)
    ji, jj = edge_jacobians(poses, graph.edge_i, graph.edge_j)
    sq = _quad(err, graph.edge_info)
    w = jnp.where(graph.edge_mask, loss.weight(sq), 0.0)
    winfo = w[:, None, None] * graph.edge_info          # [E, 3, 3]

    tr_ji_w = _mm(jnp.swapaxes(ji, -1, -2), winfo)      # Ji^T W
    tr_jj_w = _mm(jnp.swapaxes(jj, -1, -2), winfo)      # Jj^T W

    n = poses.shape[0]
    b = jnp.zeros((n, 3), poses.dtype)
    b = b.at[graph.edge_i].add(_mv(tr_ji_w, err))
    b = b.at[graph.edge_j].add(_mv(tr_jj_w, err))
    return ji, jj, winfo, tr_ji_w, tr_jj_w, b


def _block_diag(graph: GraphArrays, ji, jj, winfo, lam, n):
    """3x3 diagonal blocks of H (for the preconditioner / dense assembly)."""
    hii = _mm(_mm(jnp.swapaxes(ji, -1, -2), winfo), ji)
    hjj = _mm(_mm(jnp.swapaxes(jj, -1, -2), winfo), jj)
    diag = jnp.zeros((n, 3, 3), ji.dtype)
    diag = diag.at[graph.edge_i].add(hii)
    diag = diag.at[graph.edge_j].add(hjj)
    eye = jnp.eye(3, dtype=ji.dtype)
    diag = diag + lam * eye[None]
    diag = diag.at[0].add(GAUGE * eye)
    return diag


def _hv(v, graph: GraphArrays, ji, jj, winfo, lam):
    """Matrix-free H @ v as a segment-sum over edge blocks."""
    vi = v[graph.edge_i]
    vj = v[graph.edge_j]
    u = _mv(ji, vi) + _mv(jj, vj)        # [E, 3]
    t = _mv(winfo, u)
    out = jnp.zeros_like(v)
    out = out.at[graph.edge_i].add(_mv(jnp.swapaxes(ji, -1, -2), t))
    out = out.at[graph.edge_j].add(_mv(jnp.swapaxes(jj, -1, -2), t))
    out = out + lam * v
    out = out.at[0].add(GAUGE * v[0])
    return out


def _chain_subdiag(graph: GraphArrays, ji, jj, winfo, n):
    """Sub-diagonal 3x3 blocks A[i] (coupling node i to node i-1) of the
    ODOMETRY-CHAIN part of H: only edges with j == i + 1 contribute
    (pose_graph.hpp:165-169 defines odometric edges exactly so)."""
    is_odom = (graph.edge_j == graph.edge_i + 1) & graph.edge_mask
    hij = _mm(_mm(jnp.swapaxes(ji, -1, -2), winfo), jj)   # H_ij blocks
    a = jnp.zeros((n, 3, 3), ji.dtype)
    a = a.at[jnp.where(is_odom, graph.edge_j, 0)].add(
        jnp.where(is_odom[:, None, None], jnp.swapaxes(hij, -1, -2), 0.0))
    return a.at[0].set(0.0)


def chain_factor(diag, sub):
    """Cyclic-reduction factorization of the block-tridiagonal matrix with
    diagonal blocks ``diag`` [N, 3, 3] and sub-diagonal ``sub`` [N, 3, 3]
    (``sub[i]`` couples x_i to x_{i-1}; ``sub[0]`` ignored).

    This is the TPU-native replacement for a sparse LDL^T of the chain:
    log2(N) levels, each a BATCHED 3x3 inverse/matmul over the remaining
    blocks — O(N) total work, O(log N) sequential depth, no scalar loops.
    Used as the CG preconditioner: the odometry chain (the long-range
    coupling that makes block-Jacobi CG need O(N) iterations) is solved
    EXACTLY, so CG only has to correct for the few loop-closure edges.

    Returns a tuple of per-level pytrees consumed by :func:`chain_solve`.
    N is padded to a power of two with identity blocks.
    """
    n = diag.shape[0]
    npow = 1
    while npow < n:
        npow *= 2
    eye = jnp.eye(3, dtype=diag.dtype)
    if npow != n:
        diag = jnp.concatenate(
            [diag, jnp.broadcast_to(eye, (npow - n, 3, 3))])
        sub = jnp.concatenate([sub, jnp.zeros((npow - n, 3, 3),
                                              diag.dtype)])
    # NOTE: every matmul below must run at full f32 precision (_mm, not
    # the @ operator): TPU's default matmul precision is bf16, and the
    # cyclic-reduction recurrence amplifies the rounding over log2(N)
    # levels into NaNs at N >= ~1k (observed on v5e; CPU f32 was fine).
    levels = []
    d, a = diag, sub
    while d.shape[0] > 1:
        m = d.shape[0]
        z = jnp.zeros((1, 3, 3), d.dtype)
        dinv_odd = jnp.linalg.inv(d[1::2])               # [m/2, 3, 3]
        a_odd = a[1::2]                                  # x_odd <- x_even(k)
        c_odd = jnp.swapaxes(
            jnp.concatenate([a[2::2], z])[:m // 2], -1, -2)
        a_even = a[0::2]
        c_even = jnp.swapaxes(a[1::2], -1, -2)
        adinv = _mm(a_even, jnp.concatenate([z, dinv_odd])[:m // 2])
        cdinv = _mm(c_even, dinv_odd)
        a_odd_sh = jnp.concatenate([z, a_odd])[:m // 2]
        c_odd_sh = jnp.concatenate([z, c_odd])[:m // 2]
        d_next = d[0::2] - _mm(adinv, c_odd_sh) - _mm(cdinv, a_odd)
        a_next = -_mm(adinv, a_odd_sh)
        levels.append((dinv_odd, a_odd, c_odd, adinv, cdinv))
        d, a = d_next, a_next
    return tuple(levels), jnp.linalg.inv(d[0]), npow


def chain_solve(levels, dinv_final, npow, b):
    """Solve M x = b with the factorization from :func:`chain_factor`."""
    n0 = b.shape[0]
    if npow != n0:
        b = jnp.concatenate([b, jnp.zeros((npow - n0, 3), b.dtype)])
    stack = []
    for dinv_odd, _, _, adinv, cdinv in levels:
        m = b.shape[0]
        b_odd = b[1::2]
        z = jnp.zeros((1, 3), b.dtype)
        b_odd_sh = jnp.concatenate([z, b_odd])[:m // 2]
        stack.append(b_odd)
        b = b[0::2] - _mv(adinv, b_odd_sh) - _mv(cdinv, b_odd)
    x = _mv(dinv_final, b[0])[None]
    for (dinv_odd, a_odd, c_odd, _, _), b_odd in zip(reversed(levels),
                                                     reversed(stack)):
        x_next = jnp.concatenate([x[1:], jnp.zeros((1, 3), x.dtype)])
        x_odd = _mv(dinv_odd,
                    b_odd - _mv(a_odd, x) - _mv(c_odd, x_next))
        m = 2 * x_odd.shape[0]
        x = jnp.zeros((m, 3), x.dtype).at[0::2].set(x).at[1::2].set(x_odd)
    return x[:n0]


def _pcg_solve(rhs, graph, ji, jj, winfo, lam, precond,
               max_iters: int, tol: float):
    """Preconditioned CG for H x = rhs (x over [N, 3])."""

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = (r0 * z0).sum()
    rr0 = (rhs * rhs).sum()

    def cond(s):
        x, r, z, p, rz, it = s
        return (it < max_iters) & ((r * r).sum() > tol * tol * rr0)

    def body(s):
        x, r, z, p, rz, it = s
        hp = _hv(p, graph, ji, jj, winfo, lam)
        alpha = rz / jnp.maximum((p * hp).sum(), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = (r * z).sum()
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, z, p, rz, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0, jnp.int32)))
    return x


def _dense_solve(rhs, graph, ji, jj, winfo, lam, n):
    """Dense assembly + solve (parity path for small graphs; mirrors the
    SparseCholesky branch, pose_graph_optimizer_lm.cpp:179-188)."""
    hii = _mm(_mm(jnp.swapaxes(ji, -1, -2), winfo), ji)
    hjj = _mm(_mm(jnp.swapaxes(jj, -1, -2), winfo), jj)
    hij = _mm(_mm(jnp.swapaxes(ji, -1, -2), winfo), jj)

    h = jnp.zeros((n, 3, n, 3), ji.dtype)
    h = h.at[graph.edge_i, :, graph.edge_i, :].add(hii)
    h = h.at[graph.edge_j, :, graph.edge_j, :].add(hjj)
    h = h.at[graph.edge_i, :, graph.edge_j, :].add(hij)
    h = h.at[graph.edge_j, :, graph.edge_i, :].add(
        jnp.swapaxes(hij, -1, -2))
    h = h.reshape(3 * n, 3 * n)
    h = h + lam * jnp.eye(3 * n, dtype=ji.dtype)
    h = h.at[:3, :3].add(GAUGE * jnp.eye(3, dtype=ji.dtype))
    delta = jnp.linalg.solve(h, rhs.reshape(-1))
    return delta.reshape(n, 3)


@functools.partial(jax.jit, static_argnames=("config",))
def optimize(graph: GraphArrays, config: LMConfig) -> OptimizeResult:
    """Full LM loop (pose_graph_optimizer_lm.cpp:13-65) as one jitted
    program: step -> total error -> convergence check -> lambda update."""
    loss = robust_loss.create(config.loss_name, config.loss_scale)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    n = poses0.shape[0]

    def lm_step(poses, lam):
        ji, jj, winfo, _, _, b = _build_normal_terms(poses, graph, loss)
        if config.solver == "dense":
            delta = _dense_solve(-b, graph, ji, jj, winfo, lam, n)
        else:
            diag = _block_diag(graph, ji, jj, winfo, lam, n)
            if config.preconditioner == "chain":
                sub = _chain_subdiag(graph, ji, jj, winfo, n)
                levels, dinv_f, npow = chain_factor(diag, sub)

                def precond(r):
                    return chain_solve(levels, dinv_f, npow, r)
            else:
                diag_inv = jnp.linalg.inv(diag)

                def precond(r):
                    return _mv(diag_inv, r)
            delta = _pcg_solve(-b, graph, ji, jj, winfo, lam, precond,
                               config.cg_max_iterations, config.cg_tolerance)
        new_poses = poses + delta * graph.node_mask[:, None]
        return new_poses

    init = dict(
        poses=poses0,
        lam=jnp.asarray(config.initial_lambda, jnp.float32),
        prev_err=jnp.asarray(jnp.finfo(jnp.float32).max),
        err=jnp.asarray(jnp.finfo(jnp.float32).max),
        iters=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )

    def cond(s):
        return ~s["done"]

    def body(s):
        poses = lm_step(s["poses"], s["lam"])
        err = total_error(poses, graph, loss)
        iters = s["iters"] + 1
        done = (iters >= config.max_iterations) | \
               (jnp.abs(s["prev_err"] - err) < config.error_tolerance)
        decreased = err < s["prev_err"]
        lam = jnp.where(decreased, s["lam"] * 0.5, s["lam"] * 2.0)
        return dict(poses=poses, lam=lam, prev_err=err, err=err,
                    iters=iters, done=done)

    final = jax.lax.while_loop(cond, body, init)
    return OptimizeResult(
        poses=final["poses"],
        total_error=final["err"],
        iterations=final["iters"],
    )
