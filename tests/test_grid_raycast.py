"""Grid map, ray-cast integration, and pyramid tests vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import pyramid, raycast


def bresenham_np(x0, y0, x1, y1):
    """NumPy oracle mirroring util.hpp:257-303 (returns all visited cells)."""
    dx, dy = x1 - x0, y1 - y0
    sx = -1 if dx < 0 else 1
    sy = -1 if dy < 0 else 1
    nx, ny = x0, y0
    dx, dy = abs(dx * 2), abs(dy * 2)
    cells = [(nx, ny)]
    if dx > dy:
        err = dy - dx // 2
        while nx != x1:
            if err >= 0:
                ny += sy
                err -= dx
            nx += sx
            err += dy
            cells.append((nx, ny))
    else:
        err = dx - dy // 2
        while ny != y1:
            if err >= 0:
                nx += sx
                err -= dy
            ny += sx * 0 + sy
            err += dx
            cells.append((nx, ny))
    return cells


def test_world_cell_roundtrip():
    g = gridops.empty(64, 64, 0.05, center=np.array([1.0, -2.0]))
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (32, 2))
                      + np.array([1.0, -2.0]))
    ix, iy = gridops.world_to_cell(g, pts)
    # Cell center back-projects into the same cell.
    cx = g.origin[0] + (ix + 0.5) * g.resolution
    cy = g.origin[1] + (iy + 0.5) * g.resolution
    ix2, iy2 = gridops.world_to_cell(g, jnp.stack([cx, cy], axis=-1))
    np.testing.assert_array_equal(np.asarray(ix), np.asarray(ix2))
    np.testing.assert_array_equal(np.asarray(iy), np.asarray(iy2))


def test_binary_bayes_accumulation():
    """First-touch assign + odds product (binary_bayes_grid_cell.hpp:75-92)."""
    g = gridops.empty(32, 32, 0.05)
    # One beam pointing +x, hit at 0.5 m.
    ranges = jnp.asarray([[0.5]]).reshape(1)
    angles = jnp.zeros(1)
    valid = jnp.ones(1, bool)
    pose = jnp.zeros(3)
    g1 = raycast.integrate_scan(g, pose, ranges, angles, valid,
                                0.01, 20.0, max_steps=64)
    vals = np.asarray(gridops.values(g1))
    ix, iy = gridops.world_to_cell(g1, jnp.asarray([0.5, 0.0]))
    hx, hy = int(ix), int(iy)
    # Hit cell got prob_hit once (first-touch assign).
    assert np.isclose(vals[hy, hx], 0.6, atol=1e-5)
    # A miss cell along the ray got prob_miss.
    mx, my = gridops.world_to_cell(g1, jnp.asarray([0.25, 0.0]))
    assert np.isclose(vals[int(my), int(mx)], 0.45, atol=1e-5)
    # Unobserved cell reads Unknown = 0.
    assert vals[0, 0] == 0.0

    # Integrate the same scan again: odds product.
    g2 = raycast.integrate_scan(g1, pose, ranges, angles, valid,
                                0.01, 20.0, max_steps=64)
    vals2 = np.asarray(gridops.values(g2))
    odds = (0.6 / 0.4) ** 2
    assert np.isclose(vals2[hy, hx], odds / (1 + odds), atol=1e-5)


def test_miss_cells_match_bresenham():
    g = gridops.empty(64, 64, 0.05)
    rng = np.random.default_rng(3)
    for _ in range(10):
        ang = rng.uniform(-np.pi, np.pi)
        r = rng.uniform(0.3, 1.4)
        ranges = jnp.asarray([r], jnp.float32)
        angles = jnp.asarray([ang], jnp.float32)
        g1 = raycast.integrate_scan(
            g, jnp.zeros(3), ranges, angles, jnp.ones(1, bool),
            0.01, 20.0, max_steps=64)
        touched = set(map(tuple, np.argwhere(np.asarray(g1.observed))))

        hit = np.array([r * np.cos(ang), r * np.sin(ang)])
        hix, hiy = gridops.world_to_cell(g1, jnp.asarray(hit))
        six, siy = gridops.world_to_cell(g1, jnp.zeros(2))
        oracle = bresenham_np(int(six), int(siy), int(hix), int(hiy))
        oracle_set = {(y, x) for (x, y) in oracle}
        # DDA may pick a diagonal neighbor at crossings; require the visited
        # sets to agree up to one-cell discrepancies and identical size.
        assert len(touched) == len(oracle_set)
        for (y, x) in touched:
            assert any(abs(y - oy) + abs(x - ox) <= 1
                       for (oy, ox) in oracle_set)


def test_range_gating():
    """Beams outside (min, max) produce no updates
    (grid_map_builder.cpp:363-379)."""
    g = gridops.empty(32, 32, 0.05)
    ranges = jnp.asarray([25.0, 0.005], jnp.float32)  # too far, too close
    angles = jnp.asarray([0.0, 1.0], jnp.float32)
    g1 = raycast.integrate_scan(g, jnp.zeros(3), ranges, angles,
                                jnp.ones(2, bool), 0.01, 20.0, max_steps=64)
    assert not np.asarray(g1.observed).any()


def test_integrate_scans_batch_matches_sequential():
    rng = np.random.default_rng(7)
    nb = 16
    k = 3
    poses = rng.uniform(-0.3, 0.3, (k, 3)).astype(np.float32)
    ranges = rng.uniform(0.3, 1.2, (k, nb)).astype(np.float32)
    angles = np.tile(np.linspace(-1.5, 1.5, nb, dtype=np.float32), (k, 1))
    valid = np.ones((k, nb), bool)
    rel = np.zeros((k, 3), np.float32)
    rmin = np.full((k,), 0.01, np.float32)
    rmax = np.full((k,), 20.0, np.float32)

    g = gridops.empty(64, 64, 0.05)
    batched = raycast.integrate_scans(
        g, jnp.asarray(poses), jnp.asarray(ranges), jnp.asarray(angles),
        jnp.asarray(valid), jnp.asarray(rel), jnp.asarray(rmin),
        jnp.asarray(rmax), max_steps=64)

    seq = g
    for i in range(k):
        seq = raycast.integrate_scan(
            seq, jnp.asarray(poses[i]), jnp.asarray(ranges[i]),
            jnp.asarray(angles[i]), jnp.asarray(valid[i]),
            float(rmin[i]), float(rmax[i]), max_steps=64)

    np.testing.assert_allclose(np.asarray(batched.log_odds),
                               np.asarray(seq.log_odds), atol=1e-5)


def test_pyramid_matches_naive_window_max():
    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 1, (40, 40)).astype(np.float32)
    pyr = np.asarray(pyramid.build_pyramid(jnp.asarray(vals), 3))
    assert pyr.shape == (4, 40, 40)
    np.testing.assert_allclose(pyr[0], vals)
    for h in [1, 2, 3]:
        w = 1 << h
        padded = np.pad(vals, ((0, w - 1), (0, w - 1)))
        naive = np.zeros_like(vals)
        for y in range(40):
            for x in range(40):
                naive[y, x] = padded[y:y + w, x:x + w].max()
        np.testing.assert_allclose(pyr[h], naive, atol=1e-6)


def test_windowed_max_odd_window():
    rng = np.random.default_rng(13)
    vals = rng.uniform(0, 1, (24, 24)).astype(np.float32)
    out = np.asarray(pyramid.windowed_max(jnp.asarray(vals), 5))
    padded = np.pad(vals, ((0, 4), (0, 4)))
    naive = np.zeros_like(vals)
    for y in range(24):
        for x in range(24):
            naive[y, x] = padded[y:y + 5, x:x + 5].max()
    np.testing.assert_allclose(out, naive, atol=1e-6)
