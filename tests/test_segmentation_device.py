"""Device segmentation (kNN slab kernel + jitted label propagation) vs the
native host twin — same seeds, same metric, same contract."""

import numpy as np
import pytest

from piecewise_icp_tpu import native
from piecewise_icp_tpu.models.segmentation_device import (
    knn_graph_device, propagate_seeds, segment_cloud_device)
from piecewise_icp_tpu.ops.grid_nn import build_grid


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def _surface_cloud(rng, n=4000, extent=(2.0, 1.5)):
    xy = (rng.uniform(size=(n, 2)) * np.array(extent)).astype(np.float32)
    z = (0.15 * np.sin(xy[:, 0] * 3) * np.cos(xy[:, 1] * 2)
         + rng.normal(scale=0.002, size=n))
    return np.column_stack([xy, z]).astype(np.float32)


class TestSeeds:
    def test_count_matches_grid_sample(self, lib_ok, rng):
        pts = _surface_cloud(rng)
        for res in (0.1, 0.23, 0.5):
            seeds = propagate_seeds(pts, res)
            assert len(seeds) == native.grid_sample_count(pts, res)
            assert len(np.unique(seeds)) == len(seeds)

    def test_seed_is_nearest_to_voxel_centre(self, rng):
        pts = rng.uniform(size=(500, 3)).astype(np.float32)
        res = 0.25
        seeds = propagate_seeds(pts, res)
        mn = pts.astype(np.float64).min(0)
        dims = ((pts.astype(np.float64).max(0) - mn) / res).astype(
            np.int64) + 1
        cell = np.clip((pts - mn) / res, 0, dims - 1).astype(np.int64)
        lin = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
        ctr = mn + (cell + 0.5) * res
        d2c = ((pts - ctr) ** 2).sum(1)
        for s in seeds[:50]:
            same = lin == lin[s]
            assert d2c[s] <= d2c[same].min() + 1e-12


class TestDeviceKnnGraph:
    def test_graph_matches_native(self, lib_ok, rng):
        pts = _surface_cloud(rng, n=3000)
        k = 10
        grid = build_grid(pts, 0.08)
        nbr, dist = (np.asarray(a) for a in knn_graph_device(grid, k))
        n = grid.n_real
        # map device (sorted-order) results back to original order
        d_orig = np.empty((n, k), np.float32)
        d_orig[grid.ids[:n]] = dist[:n]
        ref = native.knn_graph(pts, k)
        d2 = ((pts[:, None, :].astype(np.float64)
               - pts[None, :, :].astype(np.float64)) ** 2).sum(-1)
        ref_d = np.sqrt(np.take_along_axis(d2, ref, axis=1))
        np.testing.assert_allclose(d_orig, ref_d, rtol=1e-4, atol=1e-6)


class TestDeviceSegmentation:
    def test_matches_host_propagate(self, lib_ok, rng):
        pts = _surface_cloud(rng, n=3500)
        res = 0.02
        svres = 0.2
        lab_d, k_d = segment_cloud_device(pts, svres, k=12, resolution=res)
        nbr = native.knn_graph(pts, 12)
        normals = native.pca_normals(pts, nbr)
        lab_h, k_h = native.supervoxel_propagate(pts, normals, nbr,
                                                 resolution=svres)
        # supervoxel counts may differ by an orphan singleton (the device
        # adjacency is radius-capped at the 27-cell window; host kNN can
        # bridge wider gaps)
        assert abs(k_d - k_h) <= 2
        # same seeds, same metric, same sweep — but the device adjacency
        # is the ~k nearest within the histogram-refined radius and its
        # normals average over that set, so supervoxel-BOUNDARY points
        # (a large fraction when supervoxels are ~100 points) can flip;
        # interiors agree.  Campaign-level accuracy is the real gate
        # (eval/golden_eval.py); this bound catches gross regressions.
        agree = (lab_d == lab_h).mean()
        assert agree > 0.75, f"label agreement only {agree:.3f}"

    def test_full_patch_pipeline_device_impl(self, rng):
        from piecewise_icp_tpu.config import PiecewiseICPConfig
        from piecewise_icp_tpu.models.segmentation import build_patches

        pts = _surface_cloud(rng, n=3000)
        cfg_h = PiecewiseICPConfig(segmentation_impl="native",
                                   knn_normals=12, min_patch_points=10)
        cfg_d = PiecewiseICPConfig(segmentation_impl="jax",
                                   knn_normals=12, min_patch_points=10)
        ps_h = build_patches(pts, 0.2, cfg_h, resolution=0.02)
        ps_d = build_patches(pts, 0.2, cfg_d, resolution=0.02)
        # identical seeding => same patch universe; boundary flips may move
        # patches across the min-size/planarity gates
        assert abs(ps_d.num_patches - ps_h.num_patches) <= 8
        # nearest-centroid matching: the shared patches carry (nearly)
        # identical statistics
        d2 = ((ps_d.centroids[:, None, :] -
               ps_h.centroids[None, :, :]) ** 2).sum(-1)
        j = d2.argmin(1)
        close = d2[np.arange(len(j)), j] < (0.02) ** 2
        assert close.mean() > 0.85
        np.testing.assert_allclose(ps_d.std_bp[close],
                                   ps_h.std_bp[j[close]],
                                   rtol=0.3, atol=5e-4)


class TestFusedSegmentation:
    def test_fused_matches_staged_partition(self, rng):
        """The one-dispatch fused program (segmentation + patch stats)
        must produce the SAME supervoxel partition and patch universe as
        the staged device path it replaced (only f32 summation order
        differs inside segment reductions)."""
        from piecewise_icp_tpu.config import PiecewiseICPConfig
        from piecewise_icp_tpu.models.segmentation_device import (
            segment_patches_device)

        pts = _surface_cloud(rng, n=3000)
        res, svres, k = 0.02, 0.2, 12
        cfg = PiecewiseICPConfig(knn_normals=k, min_patch_points=10)
        lab_s, nsv_s = segment_cloud_device(pts, svres, k=k, resolution=res)
        ps, nsv_f = segment_patches_device(pts, svres, k, res, cfg)
        assert nsv_f == nsv_s
        # partition equality on points belonging to valid patches: every
        # fused patch maps to exactly one staged supervoxel and vice versa
        sel = ps.labels >= 0
        pairs = set(zip(ps.labels[sel].tolist(), lab_s[sel].tolist()))
        assert len(pairs) == ps.num_patches
        assert len({b for _, b in pairs}) == ps.num_patches
        # patch statistics are finite and shaped consistently
        assert ps.centroids.shape == (ps.num_patches, 3)
        assert np.isfinite(ps.std_bp).all()
        assert (ps.counts >= cfg.min_patch_points).all()


class TestSegStatsKernel:
    def test_threshold_and_normals_vs_brute(self, rng):
        import jax.numpy as jnp
        from piecewise_icp_tpu.ops.seg_pallas import seg_stats

        pts = _surface_cloud(rng, n=2500)
        k, res = 10, 0.025
        h = float(max(1.2 * np.sqrt(k / np.pi), 3.0) * res)
        grid = build_grid(pts, h)
        nreal = grid.n_real
        qm = jnp.arange(grid.points.shape[0]) < nreal
        t2, cnt, nrm, cov = (np.asarray(a) for a in seg_stats(
            jnp.asarray(grid.points), qm, jnp.asarray(grid.cell_starts),
            jnp.asarray(grid.origin), jnp.asarray(grid.dims, jnp.int32),
            h, k))
        d2 = ((grid.points[:nreal, None, :].astype(np.float64)
               - grid.points[None, :nreal, :].astype(np.float64)
               ) ** 2).sum(-1)
        kth = np.sort(d2, axis=1)[:, k - 1]
        # interior points (k-th within the window): t2 brackets the k-th
        # distance within one histogram bin (h^2/512) and count >= k
        interior = kth <= (h * h) * 0.8
        assert interior.mean() > 0.7
        assert (cnt[:nreal][interior] >= k).all()
        assert (t2[:nreal][interior] >= kth[interior] - 1e-7).all()
        assert (t2[:nreal][interior]
                <= kth[interior] + (h * h) / 512 + 1e-7).all()
        # normals: smallest eigenvector of the true k-NN covariance
        from piecewise_icp_tpu import native
        if native.available():
            nbr = native.knn_graph(grid.points[:nreal], k)
            nat = native.pca_normals(grid.points[:nreal], nbr)
            dots = np.abs((nrm[:nreal] * nat).sum(1))
            assert np.percentile(dots, 50) > 0.9999
            assert np.percentile(dots, 5) > 0.99
