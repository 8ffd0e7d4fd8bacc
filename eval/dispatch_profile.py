"""Round-5 probe: split the campaign phase walls into host / upload /
dispatch / kernel / fetch components (VERDICT r4 item 7).

BENCH_r04 fine phases: prep.sor 0.646, seg.fused 0.774, core.iteration
0.738 (4 iters) — steady state 1.87 s/epoch.  This probe measures, for
the real bench source epoch:

  * host slab-join build time (pure numpy)
  * device upload time (device_put + block) for the slab arrays
  * SOR kernel time: first call after upload vs chained repeats
  * fused segmentation program: same split
  * fused iteration step: dispatch+kernel vs fetch
  * dispatch floor and small-fetch floor for reference

Usage: python eval/dispatch_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/python"
DATA = f"{REF}/data/data_synthetic/syntheticPC_with_transformations"


def t_best(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from piecewise_icp_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from piecewise_icp_tpu.config import PiecewiseICPConfig
    from piecewise_icp_tpu.io import read_pcd
    from piecewise_icp_tpu.ops.grid_nn import build_grid, \
        slab_padded_self_join
    from piecewise_icp_tpu.ops.nn_pallas import _KQT, _TPB
    from piecewise_icp_tpu.ops.preprocess import voxel_downsample, \
        _sor_mask_sorted

    cfg = PiecewiseICPConfig(
        set_res_svsize=True, res1=0.005, res2=0.005,
        svsize1=0.05, svsize2=0.05,
        set_dtinit=True, dt_init=0.05, dt_min=0.004)

    pts2 = read_pcd(f"{DATA}/Epoch_002.pcd")
    out = {}

    f_noop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128))
    jax.block_until_ready(f_noop(x0))
    out["dispatch_floor_ms"] = round(1e3 * t_best(
        lambda: jax.block_until_ready(f_noop(x0)), 5), 2)

    # small fetch floor
    y = jax.block_until_ready(f_noop(x0))
    out["small_fetch_ms"] = round(1e3 * t_best(
        lambda: np.asarray(y), 5), 2)

    down = voxel_downsample(pts2, cfg.res1)
    n = down.shape[0]
    out["n_points"] = int(n)

    # ---- SOR split ----
    h = max(1.5 * np.sqrt(15 / np.pi), 4.0) * cfg.res1
    out["sor_grid_build_ms"] = round(1e3 * t_best(
        lambda: build_grid(down, h)), 1)
    grid = build_grid(down, h)
    out["sor_slab_join_ms"] = round(1e3 * t_best(
        lambda: slab_padded_self_join(grid, lane=_KQT, block=_KQT * _TPB,
                                      tile_multiple=_TPB)), 1)
    sp = slab_padded_self_join(grid, lane=_KQT, block=_KQT * _TPB,
                               tile_multiple=_TPB)

    def upload():
        arrs = [jax.device_put(a) for a in
                (sp.points, sp.real_mask, sp.ranges, sp.covered)]
        jax.block_until_ready(arrs)
        return arrs

    out["sor_upload_ms"] = round(1e3 * t_best(upload), 1)
    pts_j, mask_j, rng_j, cov_j = upload()
    g_origin = jnp.asarray(grid.origin)
    g_dims = jnp.asarray(grid.dims, jnp.int32)
    g_h = jnp.asarray(grid.h, jnp.float32)
    zero = jnp.zeros((1,), jnp.int32)
    mult = jnp.asarray(5.0, jnp.float32)

    def sor_call():
        keep, nb = _sor_mask_sorted(pts_j, mask_j, pts_j, zero, g_origin,
                                    g_dims, g_h, 14, mult,
                                    interpret=False,
                                    ranges=rng_j, covered=cov_j)
        jax.block_until_ready((keep, nb))
        return keep, nb

    out["sor_kernel_dispatch_ms"] = round(1e3 * t_best(sor_call), 1)
    keep, nb = sor_call()
    out["sor_fetch_ms"] = round(1e3 * t_best(
        lambda: (np.asarray(keep), int(nb))), 1)

    # ---- full phase walls as the pipeline runs them ----
    from piecewise_icp_tpu.ops.preprocess import preprocess_cloud, \
        sor_keep_mask_device
    from piecewise_icp_tpu.utils.logging import GLOBAL_TIMER

    out["sor_full_ms"] = round(1e3 * t_best(
        lambda: sor_keep_mask_device(down, cfg.res1, 14, 5.0)), 1)

    prep = preprocess_cloud(pts2, cfg.res1, 14, 5.0)

    from piecewise_icp_tpu.models.segmentation_device import \
        segment_patches_device

    def seg_call():
        return segment_patches_device(prep, cfg.svsize1, 45, cfg.res1, cfg)

    out["seg_full_ms"] = round(1e3 * t_best(seg_call), 1)
    GLOBAL_TIMER.records.clear()
    seg_call()
    out["seg_inner_phases"] = {k: round(v * 1e3, 1)
                               for k, v in GLOBAL_TIMER.summary().items()}

    # component split of segment_patches_device
    sv = cfg.svsize1
    h2 = float(max(1.2 * np.sqrt(45 / np.pi), 3.0) * cfg.res1)
    out["seg_grid_build_ms"] = round(1e3 * t_best(
        lambda: build_grid(prep, h2)), 1)
    g2 = build_grid(prep, h2)
    out["seg_slab_join_ms"] = round(1e3 * t_best(
        lambda: slab_padded_self_join(g2, lane=_KQT, block=_KQT * _TPB,
                                      tile_multiple=_TPB)), 1)
    from piecewise_icp_tpu.models.segmentation_device import propagate_seeds
    out["seg_seeds_ms"] = round(1e3 * t_best(
        lambda: propagate_seeds(g2.points[:g2.n_real], sv)), 1)

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
