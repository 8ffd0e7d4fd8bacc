"""Benchmark harness — run on real TPU hardware.

Registers the reference synthetic pair (Epoch_001 ← Epoch_002, the
data/config of configuration_4d.txt) end-to-end with the TPU-native
pipeline, verifies the recovered transform against the shipped ground truth
(defined_transformations.txt), and reports registration throughput.

Prints ONE JSON line:
    {"metric": "epochs/s", "value": N, "unit": "epochs/s",
     "vs_baseline": N / BASELINE_EPOCHS_PER_S, ...extras}

The C++ reference publishes no timing numbers (BASELINE.md) — the baseline
constant below is this repo's own round-1 TPU measurement, so vs_baseline
tracks progress across rounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Round-1 reference point: the first end-to-end TPU measurement of this
# repo (pre-optimisation), so vs_baseline tracks real speedup across rounds.
BASELINE_EPOCHS_PER_S = 0.0924

SYN = "/root/reference/python/data/data_synthetic"


def main() -> int:
    import jax

    from piecewise_icp_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from piecewise_icp_tpu.config import PiecewiseICPConfig
    from piecewise_icp_tpu.io import formats, read_pcd
    from piecewise_icp_tpu.models.pairwise import register_pair
    from piecewise_icp_tpu.ops.transform import matrix_to_params_gon
    from piecewise_icp_tpu.utils.logging import log

    devices = jax.devices()
    log.info("devices: %s", devices)

    cfg = PiecewiseICPConfig(
        set_res_svsize=True, res1=0.005, res2=0.005,
        svsize1=0.05, svsize2=0.05,
        set_dtinit=True, dt_init=0.05, dt_min=0.004)

    pts1 = read_pcd(f"{SYN}/syntheticPC_with_transformations/Epoch_001.pcd")
    pts2 = read_pcd(f"{SYN}/syntheticPC_with_transformations/Epoch_002.pcd")
    _, gt = formats.read_ground_truth_transforms(
        f"{SYN}/defined_transformations.txt")

    # cold run (includes all jit compilation)
    t0 = time.perf_counter()
    result = register_pair(pts1, pts2, cfg, sor_mult=cfg.sor_std_mult_4d)
    cold = time.perf_counter() - t0

    # warm run — the steady-state per-pair cost of a 4D campaign
    from piecewise_icp_tpu.utils.logging import GLOBAL_TIMER
    GLOBAL_TIMER.records.clear()
    t0 = time.perf_counter()
    result = register_pair(pts1, pts2, cfg, sor_mult=cfg.sor_std_mult_4d)
    warm = time.perf_counter() - t0
    fine = GLOBAL_TIMER.summary()

    err = (matrix_to_params_gon(result.trans_mat)
           - matrix_to_params_gon(gt[1]))
    rot_err_mgon = float(np.abs(err[:3]).max() * 1000)
    trans_err_mm = float(np.abs(err[3:]).max() * 1000)

    # opt-in symmetric point-to-plane variant (beyond-reference accuracy)
    import dataclasses as _dc

    cfg_sym = _dc.replace(cfg, icp_variant="symmetric")
    res_sym = register_pair(pts1, pts2, cfg_sym,
                            sor_mult=cfg.sor_std_mult_4d)
    err_s = (matrix_to_params_gon(res_sym.trans_mat)
             - matrix_to_params_gon(gt[1]))
    sym = {"rot_err_mgon": round(float(np.abs(err_s[:3]).max() * 1000), 2),
           "trans_err_mm": round(float(np.abs(err_s[3:]).max() * 1000), 3)}

    # NN kernel microbenchmarks on a real preprocessed cloud
    import jax.numpy as jnp

    from piecewise_icp_tpu.ops.grid_nn import build_grid, grid_nn1
    from piecewise_icp_tpu.ops.nn import nn1
    from piecewise_icp_tpu.ops.nn_pallas import nn1_pallas
    from piecewise_icp_tpu.ops.preprocess import voxel_downsample

    down = voxel_downsample(pts1, cfg.res1)
    dj = jnp.asarray(down)
    n = down.shape[0]

    def t_kernel(fn, reps=3):
        jax.block_until_ready(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    grid = build_grid(down, h=4 * cfg.res1)
    nn_bench = {
        "n_points": n,
        "xla_brute_ms": round(1e3 * t_kernel(lambda: nn1(dj, dj)[1]), 1),
        "pallas_brute_ms": round(
            1e3 * t_kernel(lambda: nn1_pallas(dj, dj)[1]), 1),
        "grid_hash_ms": round(
            1e3 * t_kernel(lambda: grid_nn1(dj, grid, exact=False)[1]), 1),
    }

    eps = 1.0 / warm
    out = {
        "metric": "epochs/s",
        "value": round(eps, 4),
        "unit": "epochs/s",
        "vs_baseline": round(eps / BASELINE_EPOCHS_PER_S, 3),
        "warm_s": round(warm, 2),
        "cold_s": round(cold, 2),
        "rot_err_mgon": round(rot_err_mgon, 2),
        "trans_err_mm": round(trans_err_mm, 3),
        "symmetric_icp": sym,
        "nn_kernels": nn_bench,
        "phases": {k: round(v, 2)
                   for k, v in result.timer.summary().items()},
        "fine_phases": {k: round(v, 3) for k, v in fine.items()},
        "device": str(devices[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
