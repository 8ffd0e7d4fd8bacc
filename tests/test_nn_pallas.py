"""Pallas NN kernels vs exact brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from piecewise_icp_tpu.ops.grid_nn import build_grid
from piecewise_icp_tpu.ops.nn import nn1
from piecewise_icp_tpu.ops.nn_pallas import grid_range_query, nn1_pallas


def _brute(q, t):
    d2 = ((q[:, None, :].astype(np.float64)
           - t[None, :, :].astype(np.float64)) ** 2).sum(-1)
    return d2.argmin(1), np.sqrt(d2.min(1))


class TestPallasNN:
    def test_matches_brute(self, rng):
        q = rng.normal(size=(700, 3)).astype(np.float32)
        t = rng.normal(size=(900, 3)).astype(np.float32)
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(t))
        ridx, rdist = _brute(q, t)
        np.testing.assert_allclose(np.asarray(dist), rdist, atol=1e-5)
        d_got = np.linalg.norm(q - t[np.asarray(idx)], axis=1)
        np.testing.assert_allclose(d_got, rdist, atol=1e-5)

    def test_matches_xla_kernel(self, rng):
        q = rng.normal(size=(513, 3)).astype(np.float32)   # odd sizes
        t = rng.normal(size=(1025, 3)).astype(np.float32)
        pi, pd = nn1_pallas(jnp.asarray(q), jnp.asarray(t))
        xi, xd = nn1(jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(pd), np.asarray(xd), atol=1e-5)

    def test_masks(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        t = rng.normal(size=(300, 3)).astype(np.float32)
        tm = np.zeros(300, dtype=bool)
        tm[:120] = True
        qm = np.ones(100, dtype=bool)
        qm[5:15] = False
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(t),
                               q_mask=jnp.asarray(qm), t_mask=jnp.asarray(tm))
        ridx, rdist = _brute(q, t[:120])
        valid = qm
        np.testing.assert_allclose(np.asarray(dist)[valid], rdist[valid],
                                   atol=1e-5)
        assert (np.asarray(idx)[valid] < 120).all()
        assert np.isinf(np.asarray(dist)[~valid]).all()

    def test_mm_scale_precision(self, rng):
        base = rng.normal(scale=30.0, size=(600, 3)).astype(np.float32)
        q = base + rng.normal(scale=0.002, size=(600, 3)).astype(np.float32)
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(base))
        d_exact = np.linalg.norm(
            q.astype(np.float64) - base[np.asarray(idx)], axis=1)
        np.testing.assert_allclose(np.asarray(dist), d_exact,
                                   rtol=1e-3, atol=2e-6)


def _range_query(q, grid, q_mask=None):
    if q_mask is None:
        q_mask = jnp.ones((q.shape[0],), bool)
    return grid_range_query(
        jnp.asarray(q), q_mask, jnp.asarray(grid.points),
        jnp.asarray(grid.cell_starts), jnp.asarray(grid.origin),
        jnp.asarray(grid.dims, jnp.int32),
        jnp.asarray(grid.h, jnp.float32))


def _cell_sort(q, grid):
    cell = np.floor((q - grid.origin) / grid.h).astype(np.int64)
    d = grid.dims
    lin = ((np.clip(cell[:, 0], 0, d[0] - 1) * d[1]
            + np.clip(cell[:, 1], 0, d[1] - 1)) * d[2]
           + np.clip(cell[:, 2], 0, d[2] - 1))
    return q[np.argsort(lin, kind="stable")]


class TestGridRangeQuery:
    """Contiguous-slab grid kernel: exactness contract on every path."""

    def test_coherent_queries_all_exact(self, rng):
        t = (rng.uniform(size=(8000, 3))
             * np.array([3.0, 2.0, 1.0])).astype(np.float32)
        q = _cell_sort(
            t + rng.normal(scale=0.004, size=t.shape).astype(np.float32),
            build_grid(t, h=0.02))
        grid = build_grid(t, h=0.02)
        idx, d, res, strict = (np.asarray(a) for a in _range_query(q, grid))
        bi, bd = nn1(jnp.asarray(q), jnp.asarray(grid.points))
        bi, bd = np.asarray(bi), np.asarray(bd)
        assert bool(strict)
        # coherent sorted queries: (almost) everything resolves in-slab
        assert res.mean() > 0.999
        np.testing.assert_array_equal(d[res], bd[res])
        np.testing.assert_array_equal(idx[res], bi[res])
        assert (bd[~res] > grid.h).all()   # dichotomy for the rest

    def test_resolved_always_exact_even_scrambled(self, rng):
        # scrambled query order: tiles span huge ranges -> coverage drops,
        # but any query reported resolved must still be exact
        t = (rng.uniform(size=(20000, 3)) * 8.0).astype(np.float32)
        q = (rng.uniform(size=(3000, 3)) * 8.0).astype(np.float32)
        grid = build_grid(t, h=0.15)
        idx, d, res, strict = (np.asarray(a) for a in _range_query(q, grid))
        bi, bd = nn1(jnp.asarray(q), jnp.asarray(grid.points))
        bd = np.asarray(bd)
        np.testing.assert_allclose(d[res], bd[res], rtol=0, atol=0)
        if bool(strict):
            # dichotomy: unresolved => true distance > h
            assert (bd[~res] > grid.h).all()

    def test_masked_queries(self, rng):
        t = (rng.uniform(size=(5000, 3)) * 2.0).astype(np.float32)
        q = _cell_sort(t.copy(), build_grid(t, h=0.05))
        grid = build_grid(t, h=0.05)
        qm = np.ones(q.shape[0], bool)
        qm[::3] = False
        idx, d, res, _ = (np.asarray(a) for a in
                          _range_query(q, grid, jnp.asarray(qm)))
        assert np.isinf(d[~qm]).all()
        assert res[~qm].all()          # masked queries count as resolved
        assert (d[qm] == 0.0).all()    # q is a permutation of t


def _range_query3(q, grid, q_mask=None):
    from piecewise_icp_tpu.ops.nn_pallas import grid_range_query3

    if q_mask is None:
        q_mask = jnp.ones((q.shape[0],), bool)
    return grid_range_query3(
        jnp.asarray(q), q_mask, jnp.asarray(grid.points),
        jnp.asarray(grid.cell_starts), jnp.asarray(grid.origin),
        jnp.asarray(grid.dims, jnp.int32),
        jnp.asarray(grid.h, jnp.float32))


class TestGridRangeQuery3:
    """Three-range 1-NN kernel (the round-3 production percentile path):
    same exactness contract as the one-slab kernel, tighter slabs."""

    def test_coherent_queries_all_exact(self, rng):
        t = (rng.uniform(size=(8000, 3))
             * np.array([3.0, 2.0, 1.0])).astype(np.float32)
        grid = build_grid(t, h=0.02)
        q = _cell_sort(
            t + rng.normal(scale=0.004, size=t.shape).astype(np.float32),
            grid)
        idx, d, res, strict = (np.asarray(a) for a in _range_query3(q, grid))
        bi, bd = nn1(jnp.asarray(q), jnp.asarray(grid.points))
        bi, bd = np.asarray(bi), np.asarray(bd)
        assert bool(strict)
        assert res.mean() > 0.999
        np.testing.assert_array_equal(d[res], bd[res])
        np.testing.assert_array_equal(idx[res], bi[res])
        assert (bd[~res] > grid.h).all()   # dichotomy for the rest

    def test_resolved_always_exact_even_scrambled(self, rng):
        t = (rng.uniform(size=(20000, 3)) * 8.0).astype(np.float32)
        q = (rng.uniform(size=(3000, 3)) * 8.0).astype(np.float32)
        grid = build_grid(t, h=0.15)
        idx, d, res, strict = (np.asarray(a) for a in _range_query3(q, grid))
        bd = np.asarray(nn1(jnp.asarray(q), jnp.asarray(grid.points))[1])
        np.testing.assert_allclose(d[res], bd[res], rtol=0, atol=0)
        if bool(strict):
            assert (bd[~res] > grid.h).all()

    def test_matches_one_slab_kernel(self, rng):
        # surface-like cloud, sorted queries: both kernels fully resolve
        # and must agree bit-for-bit with each other
        xy = (rng.uniform(size=(5000, 2))
              * np.array([3.0, 2.0])).astype(np.float32)
        z = 0.2 * np.sin(xy[:, 0] * 3) + rng.normal(scale=0.002, size=5000)
        t = np.column_stack([xy, z]).astype(np.float32)
        grid = build_grid(t, h=0.06)
        q = _cell_sort(
            t + rng.normal(scale=0.01, size=t.shape).astype(np.float32),
            grid)
        i3, d3, r3, s3 = (np.asarray(a) for a in _range_query3(q, grid))
        i1, d1, r1, s1 = (np.asarray(a) for a in _range_query(q, grid))
        both = r3 & r1
        assert both.mean() > 0.99
        np.testing.assert_array_equal(d3[both], d1[both])
        np.testing.assert_array_equal(i3[both], i1[both])

    def test_masked_queries(self, rng):
        t = (rng.uniform(size=(5000, 3)) * 2.0).astype(np.float32)
        grid = build_grid(t, h=0.05)
        q = _cell_sort(t.copy(), grid)
        qm = np.ones(q.shape[0], bool)
        qm[::3] = False
        idx, d, res, _ = (np.asarray(a) for a in
                          _range_query3(q, grid, jnp.asarray(qm)))
        assert np.isinf(d[~qm]).all()
        assert res[~qm].all()
        assert (d[qm] == 0.0).all()


def _knn_sorted(q, grid, k, q_mask=None):
    from piecewise_icp_tpu.ops.nn_pallas import grid_knn_sorted

    if q_mask is None:
        q_mask = jnp.ones((q.shape[0],), bool)
    return grid_knn_sorted(
        jnp.asarray(q), q_mask, jnp.asarray(grid.points),
        jnp.asarray(grid.cell_starts), jnp.asarray(grid.origin),
        jnp.asarray(grid.dims, jnp.int32),
        jnp.asarray(grid.h, jnp.float32), k)


def _brute_knn_d(q, t, k):
    d2 = ((q[:, None, :].astype(np.float64)
           - t[None, :, :].astype(np.float64)) ** 2).sum(-1)
    return np.sqrt(np.sort(d2, axis=1)[:, :k])


class TestGridKnnSorted:
    """Three-range-slab k-NN kernel: exactness of every resolved query."""

    def test_self_join_matches_brute(self, rng):
        # surface-like cloud (the production regime): z = f(x, y) + noise
        xy = (rng.uniform(size=(6000, 2))
              * np.array([3.0, 2.0])).astype(np.float32)
        z = (0.2 * np.sin(xy[:, 0] * 2) * np.cos(xy[:, 1] * 3)
             + rng.normal(scale=0.003, size=6000))
        t = np.column_stack([xy, z]).astype(np.float32)
        k = 9
        grid = build_grid(t, h=0.09)
        n = grid.n_real
        q = grid.points[:n]                     # self-join, cell-sorted
        idx, d, res = (np.asarray(a) for a in _knn_sorted(q, grid, k))
        assert res.mean() > 0.95
        ref_d = _brute_knn_d(q, grid.points, k)
        np.testing.assert_allclose(d[res], ref_d[res], rtol=1e-5, atol=1e-6)
        # self must be among the neighbours at distance 0
        assert (d[res][:, 0] == 0.0).all()
        # unresolved queries' true k-th neighbour is beyond the window
        # (when their tile was covered) OR the tile was uncovered; either
        # way the caller recomputes them, so no exactness claim is tested

    def test_indices_are_real_neighbours(self, rng):
        t = (rng.uniform(size=(4000, 3)) * 2.0).astype(np.float32)
        grid = build_grid(t, h=0.15)
        q = grid.points[:grid.n_real]
        k = 6
        idx, d, res = (np.asarray(a) for a in _knn_sorted(q, grid, k))
        rq = np.where(res)[0]
        got = grid.points[idx[rq]]              # [R, k, 3]
        dd = np.linalg.norm(got.astype(np.float64)
                            - q[rq][:, None, :], axis=-1)
        np.testing.assert_allclose(dd, d[rq], rtol=1e-5, atol=1e-6)
        # no duplicate neighbour ids within a query (disjoint ranges)
        for row in idx[rq][:200]:
            assert len(set(row.tolist())) == k

    def test_masked_and_edge_queries(self, rng):
        t = (rng.uniform(size=(3000, 3))
             * np.array([4.0, 0.5, 0.5])).astype(np.float32)
        grid = build_grid(t, h=0.1)
        q = grid.points[:grid.n_real]
        qm = np.ones(q.shape[0], bool)
        qm[::5] = False
        k = 4
        idx, d, res = (np.asarray(a) for a in
                       _knn_sorted(q, grid, k, jnp.asarray(qm)))
        assert res[~qm].all()
        assert np.isinf(d[~qm]).all()
        ref_d = _brute_knn_d(q, grid.points, k)
        ok = res & qm
        np.testing.assert_allclose(d[ok], ref_d[ok], rtol=1e-5, atol=1e-6)
