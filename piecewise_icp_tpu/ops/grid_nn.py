"""Grid-hash 1-NN — the keystone fast path for full-cloud queries.

Brute-force 1-NN over two ~170k clouds costs ~3e10 distance evaluations per
call; the stage-1 percentile C2C runs it every iteration.  This module
replaces it with a uniform-grid candidate search:

* **build (host)**: targets are binned into cells of size ``h`` and sorted
  by linearised cell id (x-major, z fastest).  A CSR ``cell_starts`` array
  gives each cell's point range.  With z fastest, the 27-cell neighbourhood
  of any query is NINE contiguous runs of three z-cells each.
* **query (device, jitted)**: for each query tile, gather the 9 run ranges
  and scan a fixed number of candidate slots per run (the bucketed maximum
  3-cell occupancy), masked by the true run lengths.  Pure VPU work over
  ~100 candidates instead of ~170k.
* **exactness**: a found neighbour at distance <= h is provably the true
  nearest (anything outside the 27-cell window is > h away).  Queries that
  resolve farther than h fall back — via ``lax.cond``, so the cost is paid
  only when needed — to the exact brute-force kernel for the whole batch,
  and per-query results are merged.

Replaces the reference's FLANN KD-trees (Registration.cpp:737-747,
CommonFunc.cpp:266-281) with a data layout XLA vectorises: no pointers, no
recursion, static shapes per (size-bucket, occupancy-bucket).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import nn1 as brute_nn1


def _bucket(n: int, base: int = 8) -> int:
    """Round up to the next power-of-two-ish bucket to bound recompiles."""
    b = base
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class GridIndex:
    """Host-built uniform-grid index over a target cloud."""

    points: np.ndarray        # [T, 3] sorted by cell id (f32)
    ids: np.ndarray           # [T] original target indices (int32)
    cell_starts: np.ndarray   # [n_cells + 1] CSR offsets (int32)
    origin: np.ndarray        # [3] f32
    dims: Tuple[int, int, int]
    h: float
    max_run: int              # bucketed max occupancy of any 3-z-cell run

    @property
    def n_targets(self) -> int:
        return self.points.shape[0]


def build_grid(targets: np.ndarray, h: float,
               mask: np.ndarray | None = None) -> GridIndex:
    """Bin + sort targets into a uniform grid of cell size ``h`` (host)."""
    pts = np.asarray(targets, dtype=np.float32)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    if pts.shape[0] == 0:
        raise ValueError("cannot build a grid over an empty target cloud")
    origin = pts.min(axis=0)
    cell = np.floor((pts - origin) / h).astype(np.int64)
    dims = cell.max(axis=0) + 1
    dx, dy, dz = (int(dims[0]), int(dims[1]), int(dims[2]))
    lin = (cell[:, 0] * dy + cell[:, 1]) * dz + cell[:, 2]
    order = np.argsort(lin, kind="stable").astype(np.int32)
    lin_sorted = lin[order]
    n_cells = dx * dy * dz
    starts = np.searchsorted(lin_sorted, np.arange(n_cells + 1)).astype(
        np.int32)
    # max occupancy over any run of three consecutive z-cells
    counts = np.diff(starts)
    if dz >= 3:
        run3 = counts[:-2] + counts[1:-1] + counts[2:]
        # only runs fully inside one (x, y) column matter, but the bound
        # over all windows is safe and simpler
        max_run = int(run3.max()) if run3.size else int(counts.max())
    else:
        max_run = int(counts.max()) * dz
    return GridIndex(points=pts[order], ids=order,
                     cell_starts=starts, origin=origin.astype(np.float32),
                     dims=(dx, dy, dz), h=float(h),
                     max_run=_bucket(max(max_run, 1)))


@functools.partial(jax.jit, static_argnames=("dims", "max_run", "q_tile"))
def _grid_query(queries, q_mask, sorted_pts, cell_starts, origin,
                dims, max_run: int, h, q_tile: int = 2048):
    """Device query pass.  Returns (idx into sorted targets, dist,
    resolved)."""
    dx, dy, dz = dims
    n_cells = dx * dy * dz
    f32 = queries.dtype

    qn = queries.shape[0]
    pad = (-qn) % q_tile
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))

    def per_tile(args):
        q, valid = args
        cell = jnp.floor((q - origin) / h).astype(jnp.int32)
        cx = jnp.clip(cell[:, 0], 0, dx - 1)
        cy = jnp.clip(cell[:, 1], 0, dy - 1)
        cz = jnp.clip(cell[:, 2], 0, dz - 1)

        best_d2 = jnp.full((q.shape[0],), jnp.inf, dtype=f32)
        best_i = jnp.zeros((q.shape[0],), dtype=jnp.int32)

        z0 = jnp.clip(cz - 1, 0, dz - 1)
        z1 = jnp.clip(cz + 1, 0, dz - 1)
        for ox in (-1, 0, 1):
            x = jnp.clip(cx + ox, 0, dx - 1)
            for oy in (-1, 0, 1):
                y = jnp.clip(cy + oy, 0, dy - 1)
                base = (x * dy + y) * dz
                run_start = cell_starts[jnp.clip(base + z0, 0, n_cells)]
                run_end = cell_starts[jnp.clip(base + z1 + 1, 0, n_cells)]
                run_len = run_end - run_start

                def scan_k(k, carry):
                    bd2, bi = carry
                    slot = run_start + k
                    ok = k < run_len
                    cand = jnp.clip(slot, 0, sorted_pts.shape[0] - 1)
                    cpt = sorted_pts[cand]
                    diff = q - cpt
                    d2 = jnp.sum(diff * diff, axis=1)
                    d2 = jnp.where(ok, d2, jnp.inf)
                    upd = d2 < bd2
                    return (jnp.where(upd, d2, bd2),
                            jnp.where(upd, cand, bi))

                best_d2, best_i = jax.lax.fori_loop(
                    0, max_run, scan_k, (best_d2, best_i))

        d = jnp.sqrt(jnp.maximum(best_d2, 0.0))
        found = jnp.isfinite(d)
        resolved = (~valid) | (found & (d <= h))
        d = jnp.where(valid, d, jnp.inf)
        return best_i, d, resolved

    n_tiles = qp.shape[0] // q_tile
    idx, dist, res = jax.lax.map(
        per_tile, (qp.reshape(n_tiles, q_tile, 3),
                   qm.reshape(n_tiles, q_tile)))
    return (idx.reshape(-1)[:qn], dist.reshape(-1)[:qn],
            res.reshape(-1)[:qn])


def grid_nn1(queries: jnp.ndarray, grid: GridIndex,
             q_mask: jnp.ndarray | None = None,
             exact: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of ``queries`` in the gridded target cloud.

    Returns (idx into the ORIGINAL target array, dist).  With ``exact``
    (default), queries unresolved within the 27-cell window are recomputed
    by the brute-force kernel (triggered lazily via ``lax.cond``).
    """
    if q_mask is None:
        q_mask = jnp.ones((queries.shape[0],), dtype=bool)
    sorted_pts = jnp.asarray(grid.points)
    starts = jnp.asarray(grid.cell_starts)
    origin = jnp.asarray(grid.origin)
    ids = jnp.asarray(grid.ids)

    s_idx, dist, resolved = _grid_query(
        queries, q_mask, sorted_pts, starts, origin,
        grid.dims, grid.max_run, jnp.asarray(grid.h, queries.dtype))
    idx = ids[s_idx]
    if not exact:
        return idx, dist

    def with_fallback(_):
        b_idx, b_dist = brute_nn1(queries, sorted_pts, q_mask=q_mask)
        return (jnp.where(resolved, idx, ids[b_idx]),
                jnp.where(resolved, dist, b_dist))

    def no_fallback(_):
        return idx, dist

    all_resolved = jnp.all(resolved)
    return jax.lax.cond(all_resolved, no_fallback, with_fallback,
                        operand=None)
