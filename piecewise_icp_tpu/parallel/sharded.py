"""Multi-chip sharded Piecewise-ICP iteration (shard_map + collectives).

The reference is strictly single-threaded (SURVEY.md §2.4); every
parallelism axis here is new design:

* **Point sharding ("sp" axis)** — the full clouds are sharded across chips
  along the point dimension.  The hot stage-1 percentile NN (every source
  point against the full target cloud) computes its query shard locally,
  then ``all_gather``s the per-shard distances for the global percentile.
* **Schur-style normal-equation reduction** — the inner point-to-plane ICP
  shards the source-centroid rows across chips; each chip accumulates its
  local 6x6 A^T A / A^T L block and a single ``psum`` over ICI reduces them
  before the (replicated, deterministic) 6x6 solve.  This is the
  BASELINE.json north-star collective pattern.
* Patch-level arrays (centroids, boundary points, stds — O(10^3)) are
  replicated: they are 1000x smaller than the clouds and every chip needs
  them for classification.

The same program runs on an N-chip TPU mesh or on N virtual CPU devices
(``--xla_force_host_platform_device_count``), which is how the test suite
and the driver's multi-chip dry-run validate it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: Optional[int] = None, axis: str = "sp") -> Mesh:
    """A 1-D device mesh over the point-sharding axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _local_nn(q, q_mask, t, t_mask):
    """Dense masked 1-NN (local shard vs replicated targets)."""
    d2 = jnp.zeros((q.shape[0], t.shape[0]), dtype=q.dtype)
    for c in range(3):
        diff = q[:, c][:, None] - t[None, :, c]
        d2 = d2 + diff * diff
    d2 = jnp.where(t_mask[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))
    return idx, jnp.where(q_mask, d, jnp.inf)


def _p2pl_rows(src, tgt_pt, tgt_n):
    qx, qy, qz = src[:, 0], src[:, 1], src[:, 2]
    nx, ny, nz = tgt_n[:, 0], tgt_n[:, 1], tgt_n[:, 2]
    a = jnp.stack([nz * qy - ny * qz, nx * qz - nz * qx,
                   ny * qx - nx * qy, nx, ny, nz], axis=1)
    l = jnp.sum(tgt_n * (tgt_pt - src), axis=1)
    return a, l


def _sharded_icp(ct1, n1, ct1_mask, ct2_local, stable_local, axis,
                 max_iterations=100, transformation_eps=1e-8,
                 fitness_eps=1e-6):
    """Point-to-plane ICP with psum-reduced normal equations.

    ``ct2_local``/``stable_local`` are this chip's shard of the source
    centroids; targets are replicated.  Returns the (replicated) transform.
    """
    from ..ops.transform import small_angle_matrix_jax

    f32 = ct1.dtype

    def cond(state):
        it, _, _, prev_mse, mse, delta_ok = state
        keep = (it < max_iterations) & jnp.logical_not(delta_ok)
        abs_mse = jnp.abs(mse - prev_mse) > fitness_eps
        rel_mse = jnp.abs(mse - prev_mse) > 1e-5 * jnp.maximum(prev_mse, 1e-30)
        return keep & (abs_mse | rel_mse | (it < 1))

    def body(state):
        it, trans, src, prev_mse, mse, _ = state
        idx, dist = _local_nn(src, stable_local, ct1, ct1_mask)
        a, l = _p2pl_rows(src, ct1[idx], n1[idx])
        w = stable_local.astype(f32)[:, None]
        a = a * w
        l = l * w[:, 0]
        ata = jax.lax.psum(jnp.matmul(a.T, a, precision="highest"), axis)
        atl = jax.lax.psum(jnp.matmul(a.T, l, precision="highest"), axis)
        x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=f32), atl)
        t_delta = small_angle_matrix_jax(x)
        new_src = jnp.matmul(src, t_delta[:3, :3].T,
                             precision="highest") + t_delta[:3, 3]
        new_trans = jnp.matmul(t_delta, trans, precision="highest")
        n_valid = jnp.maximum(
            jax.lax.psum(jnp.sum(stable_local), axis), 1).astype(f32)
        sse = jax.lax.psum(
            jnp.sum(jnp.where(stable_local, dist * dist, 0.0)), axis)
        new_mse = sse / n_valid
        tr_sqr = jnp.sum(t_delta[:3, 3] ** 2)
        cos_angle = (jnp.trace(t_delta[:3, :3]) - 1.0) / 2.0
        delta_ok = (tr_sqr <= transformation_eps) & (cos_angle >= 0.99999)
        return (it + 1, new_trans, new_src, mse, new_mse, delta_ok)

    init = (jnp.asarray(0, jnp.int32), jnp.eye(4, dtype=f32), ct2_local,
            jnp.asarray(jnp.inf, f32), jnp.asarray(jnp.inf, f32),
            jnp.asarray(False))
    it, trans, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return trans, it


def build_sharded_iteration(mesh: Mesh, axis: str = "sp",
                            icp_max_iterations: int = 100,
                            grid_max_run: int = 32):
    """Compile the fully sharded Piecewise-ICP iteration for ``mesh``.

    The returned jitted function is the multi-chip 'training step': one
    classification + alignment + percentile + state-update pass with clouds
    sharded along ``axis``.  The stage-1 percentile queries each chip's
    cloud2 shard against the REPLICATED cloud1 grid index (the same
    grid-hash kernel as the single-device fused step) and ``all_gather``s
    the per-shard distances for the global order statistic.  Signature:

        step(g_pts, g_starts, g_origin, g_dims, g_h,   # cloud1 grid (repl.)
             cloud2, cloud2_mask, pt_labels2,          # sharded
             ct1, n1, std_ct1, ct1_mask, ct2, bp2, std_bp2, ct2_mask,
             curr_dt, dt_min, max_lod, sv_sum, percentile)
        -> (t_icp 4x4, stable [P2], lod_min, n_stable, d75, d75_exact,
            bb_change, cloud2_out sharded, ct2_out, bp2_out)
    """
    from ..ops.grid_nn import _grid_query

    def body(g_pts, g_starts, g_origin, g_dims, g_h,
             cloud2, cloud2_mask, pt_labels2,
             ct1, n1, std_ct1, ct1_mask, ct2, bp2, std_bp2, ct2_mask,
             curr_dt, dt_min, max_lod, sv_sum, percentile):
        p2 = ct2.shape[0]
        f32 = ct1.dtype
        n_dev = jax.lax.axis_size(axis)
        dev = jax.lax.axis_index(axis)

        # ---- classification on replicated patch arrays ----
        ct_idx, ct_dist = _local_nn(ct2, ct2_mask, ct1, ct1_mask)
        bp2_mask = jnp.repeat(ct2_mask, 6)
        bp_idx, _ = _local_nn(bp2, bp2_mask, ct1, ct1_mask)
        sig1 = std_ct1[ct_idx]
        lod = jnp.clip(1.96 * jnp.sqrt(sig1 ** 2 + std_bp2 ** 2),
                       dt_min, max_lod)
        lod_min = jnp.min(jnp.where(ct2_mask, lod, jnp.inf))
        pt2pl_ct = jnp.abs(jnp.sum((ct1[ct_idx] - ct2) * n1[ct_idx], axis=1))
        pt2pl_bp = jnp.abs(jnp.sum((ct1[bp_idx] - bp2) * n1[bp_idx],
                                   axis=1)).reshape(p2, 6)
        thr = jnp.maximum(curr_dt, lod)
        stable = (ct2_mask & (pt2pl_ct <= thr)
                  & jnp.all(pt2pl_bp <= thr[:, None], axis=1)
                  & (ct_dist < curr_dt + sv_sum))
        n_stable = jnp.sum(stable)

        # ---- inner ICP: source centroid rows sharded, psum reduction ----
        rows_per_dev = p2 // n_dev
        sl = jax.lax.dynamic_slice_in_dim(ct2, dev * rows_per_dev,
                                          rows_per_dev)
        sl_mask = jax.lax.dynamic_slice_in_dim(stable, dev * rows_per_dev,
                                               rows_per_dev)
        t_icp, _ = _sharded_icp(ct1, n1, ct1_mask, sl, sl_mask, axis,
                                max_iterations=icp_max_iterations)

        # ---- stage-1 percentile over sharded stable cloud points:
        #      local grid query vs the replicated cloud1 index, then
        #      all_gather for the global order statistic ----
        safe_lab = jnp.clip(pt_labels2, 0, p2 - 1)
        pt_stable = cloud2_mask & (pt_labels2 >= 0) & stable[safe_lab]
        _, d_local, res_local = _grid_query(cloud2, pt_stable, g_pts,
                                            g_starts, g_origin, g_dims,
                                            grid_max_run, g_h)
        ok_local = res_local | (~pt_stable)
        d_all = jax.lax.all_gather(
            jnp.where(ok_local, d_local, jnp.inf), axis, tiled=True)
        stable_all = jax.lax.all_gather(pt_stable, axis, tiled=True)
        n_q = jnp.sum(stable_all)
        n_resolved = jax.lax.psum(jnp.sum(ok_local & pt_stable), axis)
        idx75 = jnp.clip((n_q * percentile).astype(jnp.int32), 0,
                         d_all.shape[0] - 1)
        d75 = jnp.sort(d_all)[idx75]
        d75_exact = idx75 < n_resolved

        # ---- bounding-box corner change (global min/max via pmin/pmax) ----
        big = jnp.asarray(3e38, f32)
        local_min = jnp.min(jnp.where(cloud2_mask[:, None], cloud2, big),
                            axis=0)
        local_max = jnp.max(jnp.where(cloud2_mask[:, None], cloud2, -big),
                            axis=0)
        bb_min = jax.lax.pmin(local_min, axis)
        bb_max = jax.lax.pmax(local_max, axis)
        r = t_icp[:3, :3]
        c1 = jnp.matmul(r, bb_min, precision="highest") + t_icp[:3, 3]
        c2 = jnp.matmul(r, bb_max, precision="highest") + t_icp[:3, 3]
        bb_change = jnp.maximum(jnp.linalg.norm(c1 - bb_min),
                                jnp.linalg.norm(c2 - bb_max))

        # ---- apply transform to the sharded source state ----
        cloud2_out = jnp.matmul(cloud2, r.T, precision="highest") + t_icp[:3, 3]
        ct2_out = jnp.matmul(ct2, r.T, precision="highest") + t_icp[:3, 3]
        bp2_out = jnp.matmul(bp2, r.T, precision="highest") + t_icp[:3, 3]
        return (t_icp, stable, lod_min, n_stable, d75, d75_exact,
                bb_change, cloud2_out, ct2_out, bp2_out)

    sharded = P(axis)
    repl = P()
    step = shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl,   # cloud1 grid (replicated)
                  sharded, sharded, sharded,      # cloud2, mask, labels
                  repl, repl, repl, repl,         # ct1, n1, std_ct1, mask
                  repl, repl, repl, repl,         # ct2, bp2, std_bp2, mask
                  repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, repl, repl, repl,
                   sharded, repl, repl),
        check_vma=False)
    return jax.jit(step)
