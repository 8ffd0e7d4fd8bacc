"""Rockfall stand-in dataset (eval/rockfall_sim.py) — BASELINE configs 3/4.

The real Vals Valley PLS series is an external download the environment
cannot fetch, so the rockfall configurations run against a simulated TLS
series with the same operational characteristics (scanner-centric angular
sampling, range-dependent density, planar-facet rock structure, growing
rockfall scars, real-data file naming).  These tests pin the simulator's
structural properties and the registration behaviour it exists to drive.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "eval"))

import rockfall_sim  # noqa: E402

from piecewise_icp_tpu.io import formats, read_pcd  # noqa: E402
from piecewise_icp_tpu.io.folders import scan_epoch_folder  # noqa: E402


@pytest.fixture(scope="module")
def series(tmp_path_factory):
    out = tmp_path_factory.mktemp("rockfall")
    scans = rockfall_sim.generate_rockfall(
        str(out), n_epochs=3, extent=(60.0, 40.0), res=0.45)
    return str(out), scans


def test_series_files_and_gt(series):
    out, scans = series
    files = sorted(os.listdir(scans))
    assert len(files) == 3
    # real-data naming convention (Data_description.txt): the timestamp
    # parser must order them via the configurable prefix
    assert files[0].startswith("SINGLESCANS - ")
    paths, times = scan_epoch_folder(scans, prefix="- ", digits=6)
    assert times == sorted(times) and len(paths) == 3
    epochs, gt = formats.read_ground_truth_transforms(
        os.path.join(out, "defined_transformations.txt"))
    assert len(gt) == 3
    assert np.allclose(gt[0], np.eye(4))
    # ground-truth steps stay below DTinit at the slope (lever-arm check)
    for m in gt:
        assert np.abs(m[:3, 3]).max() < 0.1


def test_range_dependent_density(series):
    """Angular sampling => nearer surface regions are denser (the
    non-uniform-density regime SURVEY.md §7 flags for the NN kernel)."""
    _, scans = series
    pts = read_pcd(os.path.join(scans, sorted(os.listdir(scans))[0]))
    r = np.linalg.norm(pts, axis=1)
    near = pts[(r > np.quantile(r, 0.05)) & (r < np.quantile(r, 0.25))]
    far = pts[(r > np.quantile(r, 0.75)) & (r < np.quantile(r, 0.95))]

    def mean_nn(sub):
        sub = sub[np.random.default_rng(0).permutation(len(sub))[:800]]
        d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        return float(np.sqrt(d2.min(1)).mean())

    assert mean_nn(near) < mean_nn(far)


def test_scars_grow_only_in_later_epochs(series):
    """Epoch 1 vs epoch 3 must differ by more than the rigid GT motion in
    the scar regions (localised deformation well above DTmin)."""
    out, scans = series
    files = sorted(os.listdir(scans))
    epochs, gt = formats.read_ground_truth_transforms(
        os.path.join(out, "defined_transformations.txt"))
    from piecewise_icp_tpu.ops.transform import apply_transform_np

    a = read_pcd(os.path.join(scans, files[0]))
    c = apply_transform_np(
        read_pcd(os.path.join(scans, files[2])).astype(np.float64), gt[2])
    # after perfect GT alignment, some region of epoch 3 is far from any
    # epoch-1 point (the scar), while the bulk is close
    sub = c[:: max(len(c) // 2000, 1)][:2000].astype(np.float32)
    dmin = np.full(len(sub), np.inf, np.float32)
    for lo in range(0, len(a), 4096):
        blk = a[lo: lo + 4096]
        d2 = ((sub[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
        dmin = np.minimum(dmin, d2.min(1))
    dmin = np.sqrt(dmin)
    assert np.quantile(dmin, 0.5) < 0.30    # bulk aligned (~point spacing)
    assert dmin.max() > 0.10                # scar/debris signal >> DTmin


@pytest.mark.slow
def test_clean_registration_recovers_gt(tmp_path):
    """Noise-free scene: the full pairwise pipeline on the rockfall
    geometry recovers the GT transform to a few mgon / mm."""
    from piecewise_icp_tpu.models.pairwise import register_pair
    from piecewise_icp_tpu.ops.transform import matrix_to_params_gon

    scans = rockfall_sim.generate_rockfall(
        str(tmp_path), n_epochs=2, extent=(60.0, 40.0), res=0.45,
        range_noise=0.0, raster_jitter=False, with_scars=False)
    files = sorted(os.listdir(scans))
    pts1 = read_pcd(os.path.join(scans, files[0]))
    pts2 = read_pcd(os.path.join(scans, files[1]))
    cfg = rockfall_sim.rockfall_config(scans, str(tmp_path) + "/",
                                       res=0.45)
    _, gt = formats.read_ground_truth_transforms(
        os.path.join(str(tmp_path), "defined_transformations.txt"))
    r = register_pair(pts1, pts2, cfg, sor_mult=cfg.sor_std_mult_pair)
    err = matrix_to_params_gon(r.trans_mat) - matrix_to_params_gon(gt[1])
    # Bounds sized to the scene, not to noise: at res=0.45 m the scene
    # yields only ~135 selected patches, and the (PCL-exact) SOR removes
    # silhouette/ledge points at facet boundaries whose sliver patches
    # anchor the range (x) direction — a few-mgon / ~DTmin/2 sensitivity
    # inherent to this coarse geometry (DTmin here is 30 mm).  The fine
    # synthetic benchmark pins accuracy far tighter (eval/run_all_report).
    assert np.abs(err[:3]).max() * 1000 < 10.0    # mgon
    assert np.abs(err[3:]).max() * 1000 < 25.0    # mm
