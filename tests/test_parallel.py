"""Multi-device tests on the virtual 8-CPU mesh: the sharded iteration must
reproduce the single-device iteration (same classification, same transform,
same percentile) — collectives change the schedule, not the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piecewise_icp_tpu.models.piecewise_icp import (_classify_and_align,
                                                    _pad, _mask)
from piecewise_icp_tpu.models.segmentation import build_patches
from piecewise_icp_tpu.ops.grid_nn import build_grid
from piecewise_icp_tpu.ops.preprocess import percentile_c2c
from piecewise_icp_tpu.parallel.sharded import (build_sharded_iteration,
                                                make_mesh)

from util import make_pair, small_test_config


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    params = np.array([0.001, -0.001, 0.0015, 0.003, -0.004, 0.002])
    c1, c2, t_true = make_pair(rng, params, n_side=60)
    cfg = small_test_config()
    ps1 = build_patches(c1, cfg.svsize1, cfg)
    ps2 = build_patches(c2, cfg.svsize2, cfg)
    return cfg, ps1, ps2


def _device_arrays(cfg, ps1, ps2, n_dev=8):
    pm = cfg.patch_pad_multiple
    cm = cfg.point_pad_multiple
    arrs = dict(
        ct1=_pad(ps1.centroids, pm), n1=_pad(ps1.normals, pm),
        std_ct1=_pad(ps1.std_ct, pm), ct1_mask=_mask(ps1.num_patches, pm),
        ct2=_pad(ps2.centroids, pm),
        bp2=_pad(ps2.boundary.reshape(-1, 3), 6 * pm),
        std_bp2=_pad(ps2.std_bp, pm), ct2_mask=_mask(ps2.num_patches, pm),
        cloud1=_pad(ps1.points, cm),
        cloud1_mask=_mask(len(ps1.points), cm),
        cloud2=_pad(ps2.points, cm),
        cloud2_mask=_mask(len(ps2.points), cm),
        labels2=_pad(ps2.labels, cm, value=-1),
    )
    return {k: jnp.asarray(v) for k, v in arrs.items()}


class TestShardedIteration:
    def test_matches_single_device(self, scene):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg, ps1, ps2 = scene
        a = _device_arrays(cfg, ps1, ps2)
        curr_dt = jnp.asarray(cfg.dt_init, jnp.float32)
        dt_min = cfg.dt_min
        max_lod = cfg.dt_min * cfg.lod_max_ratio
        sv_sum = cfg.svsize1 + cfg.svsize2

        # single-device reference
        t_ref, stable_ref, lod_ref, n_ref, _ = _classify_and_align(
            a["ct1"], a["n1"], a["std_ct1"], a["ct1_mask"],
            a["ct2"], a["bp2"], a["std_bp2"], a["ct2_mask"],
            curr_dt, dt_min, max_lod, sv_sum)
        labels2 = np.asarray(a["labels2"])
        stable_np = np.asarray(stable_ref)
        pt_stable = (labels2 >= 0) & stable_np[np.clip(labels2, 0, None)]
        d75_ref = percentile_c2c(a["cloud1"], a["cloud2"], 0.75,
                                 t_mask=a["cloud1_mask"],
                                 s_mask=jnp.asarray(pt_stable)
                                 & a["cloud2_mask"])

        # sharded version (cloud1 enters as its replicated grid index)
        grid = build_grid(np.asarray(a["cloud1"]),
                          h=max(4.0 * cfg.res1, 1e-6),
                          mask=np.asarray(a["cloud1_mask"]))
        mesh = make_mesh(8)
        step = build_sharded_iteration(mesh, grid_max_run=grid.max_run)
        out = step(jnp.asarray(grid.points), jnp.asarray(grid.cell_starts),
                   jnp.asarray(grid.origin),
                   jnp.asarray(grid.dims, jnp.int32),
                   jnp.asarray(grid.h, jnp.float32),
                   a["cloud2"], a["cloud2_mask"], a["labels2"],
                   a["ct1"], a["n1"], a["std_ct1"], a["ct1_mask"],
                   a["ct2"], a["bp2"], a["std_bp2"], a["ct2_mask"],
                   curr_dt, jnp.asarray(dt_min, jnp.float32),
                   jnp.asarray(max_lod, jnp.float32),
                   jnp.asarray(sv_sum, jnp.float32),
                   jnp.asarray(0.75, jnp.float32))
        t_sh, stable_sh, lod_sh, n_sh, d75_sh, d75_exact, bb_sh = out[:7]
        assert bool(d75_exact)

        np.testing.assert_array_equal(np.asarray(stable_sh), stable_np)
        assert int(n_sh) == int(n_ref)
        assert float(lod_sh) == pytest.approx(float(lod_ref), rel=1e-6)
        # the psum-reduced ICP must agree with the single-device ICP to
        # float accumulation-order tolerance
        np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_ref),
                                   atol=5e-5)
        assert float(d75_sh) == pytest.approx(float(d75_ref), rel=1e-4)

        # sharded output cloud = transformed input cloud
        c2_out = np.asarray(out[7])
        ref_out = (np.asarray(a["cloud2"]) @ np.asarray(t_sh)[:3, :3].T
                   + np.asarray(t_sh)[:3, 3])
        np.testing.assert_allclose(c2_out, ref_out, atol=1e-5)

    def test_graft_dryrun(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import importlib.util
        import pathlib
        root = pathlib.Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", root / "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out[0])).all()
