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



def _pad_subset(sub: np.ndarray, total: int) -> np.ndarray:
    """Pad a fallback index subset to a power-of-two bucket (repeating the
    first element) so the brute kernels compile once per bucket."""
    b = _bucket(max(len(sub), 1), base=512)
    b = min(b, total) if total >= 512 else len(sub)
    if b <= len(sub):
        return sub
    return np.concatenate([sub, np.full(b - len(sub), sub[0],
                                        dtype=sub.dtype)])


@dataclasses.dataclass
class GridIndex:
    """Host-built uniform-grid index over a target cloud."""

    points: np.ndarray        # [Tb, 3] sorted by cell id, bucket-padded
    ids: np.ndarray           # [Tb] original target indices (int32)
    cell_starts: np.ndarray   # [n_cells + 1] CSR offsets (int32)
    origin: np.ndarray        # [3] f32
    dims: Tuple[int, int, int]
    h: float
    max_run: int              # bucketed max occupancy of any 3-z-cell run
    n_real: int = 0           # real (unpadded) target count

    @property
    def n_targets(self) -> int:
        return self.points.shape[0]


MAX_GRID_CELLS = 1 << 26   # dense CSR cap: 64M cells = 256 MB of starts


def build_grid(targets: np.ndarray, h: float,
               mask: np.ndarray | None = None) -> GridIndex:
    """Bin + sort targets into a uniform grid of cell size ``h`` (host).

    The CSR ``cell_starts`` array is DENSE over the bounding box — raises
    ValueError when ``h`` is small relative to the extent (e.g. long-range
    TLS scenes); callers fall back to the brute kernel then.
    """
    pts = np.asarray(targets, dtype=np.float32)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    if pts.shape[0] == 0:
        raise ValueError("cannot build a grid over an empty target cloud")
    origin = pts.min(axis=0)
    cell = np.floor((pts - origin) / h).astype(np.int64)
    dims = cell.max(axis=0) + 1
    dx, dy, dz = (int(dims[0]), int(dims[1]), int(dims[2]))
    if dx * dy * dz > MAX_GRID_CELLS:
        raise ValueError(
            f"dense grid of {dx}x{dy}x{dz} cells exceeds MAX_GRID_CELLS "
            f"(cell size {h} too small for the cloud extent)")
    lin = (cell[:, 0] * dy + cell[:, 1]) * dz + cell[:, 2]
    order = np.argsort(lin, kind="stable").astype(np.int32)
    n_cells = dx * dy * dz
    # CSR via bincount+cumsum: O(N + cells), ~3x cheaper than the
    # searchsorted formulation once cells reach the millions
    counts_all = np.bincount(lin, minlength=n_cells)
    starts = np.zeros(n_cells + 1, dtype=np.int32)
    np.cumsum(counts_all, out=starts[1:])
    # pad the CSR array to a size bucket so the device kernels compile once
    # per bucket instead of once per cloud (padding repeats the total count,
    # so out-of-range cells read empty runs)
    starts_bucket = _bucket(n_cells + 1, base=4096)
    if starts_bucket > starts.shape[0]:
        starts = np.concatenate([
            starts, np.full(starts_bucket - starts.shape[0], pts.shape[0],
                            dtype=np.int32)])
    # max occupancy over any run of three consecutive z-cells
    counts = np.diff(starts)
    if dz >= 3:
        run3 = counts[:-2] + counts[1:-1] + counts[2:]
        # only runs fully inside one (x, y) column matter, but the bound
        # over all windows is safe and simpler
        max_run = int(run3.max()) if run3.size else int(counts.max())
    else:
        max_run = int(counts.max()) * dz
    # bucket the POINT count too: the sorted arrays feed jitted programs
    # whose compile key is their shape — without this every epoch of a
    # campaign has a unique size and recompiles the fused iteration
    # (~30 s/pair over the device tunnel).  Padding points sit at +BIG
    # beyond every CSR run, so they never win any query.
    n_real = pts.shape[0]
    n_pad = _bucket(max(n_real, 1), base=4096) - n_real
    pts_sorted = pts[order]
    ids = order
    if n_pad > 0:
        pts_sorted = np.concatenate(
            [pts_sorted, np.full((n_pad, 3), 1e30, dtype=np.float32)])
        ids = np.concatenate([ids, np.zeros(n_pad, dtype=np.int32)])
    return GridIndex(points=pts_sorted, ids=ids,
                     cell_starts=starts, origin=origin.astype(np.float32),
                     dims=(dx, dy, dz), h=float(h),
                     max_run=_bucket(max(max_run, 1)), n_real=n_real)


@dataclasses.dataclass
class SlabPaddedSelfJoin:
    """Self-join geometry with padding rows INSERTED between x-slabs.

    Queries == targets == ``points`` (padded order).  Properties:

    * every ``lane``-row tile draws from ONE x-slab, so per-tile
      three-range windows stay tight — no wrap-tile coverage loss AND no
      truncated neighbourhoods (the quality caveat of the round-3/4
      segmentation path);
    * any within-slab contiguous range of the original sorted order maps
      to a contiguous range here shifted by a per-slab constant, so the
      exact slab ranges are computed directly in padded coordinates and
      per-query state arrays stay aligned with target rows (the
      propagation kernel's requirement);
    * ``ranges`` never touch ``cell_starts`` on the device.
    """

    points: np.ndarray      # [M, 3] f32, 1e30 on padding rows
    real_mask: np.ndarray   # [M] bool
    orig_idx: np.ndarray    # [M] int32 — original point index, -1 padding
    pos_map: np.ndarray     # [n_real] int32 — sorted row -> padded row
    ranges: np.ndarray      # [n_tiles * 9] int32 (padded coordinates)
    covered: np.ndarray     # [n_tiles] bool


def slab_padded_self_join(grid: GridIndex, lane: int = 128,
                          block: int = 4096,
                          tile_multiple: int = 32) -> SlabPaddedSelfJoin:
    from .nn_pallas import _KQT, _SEG

    n = grid.n_real
    pts = grid.points[:n].astype(np.float64)
    dx, dy, dz = grid.dims
    h = grid.h
    origin = grid.origin.astype(np.float64)
    starts = grid.cell_starts
    n_cells = min(dx * dy * dz, len(starts) - 1)

    cell = np.floor((pts - origin) / h).astype(np.int64)
    cx = np.clip(cell[:, 0], 0, dx - 1)
    # rows are x-major sorted: slab runs are contiguous
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(cx)) + 1, [n]])
    slab_x = cx[bounds[:-1]]                      # x value of each run
    run_len = np.diff(bounds)
    padded_len = -(-run_len // lane) * lane
    pad_before = np.concatenate([[0], np.cumsum(padded_len - run_len)])
    m = int(bounds[-1] + pad_before[-1])
    m_total = -(-m // block) * block

    pos_map = np.empty(n, dtype=np.int64)
    for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        pos_map[a:b] = np.arange(a, b) + pad_before[i]
    orig_idx = np.full(m_total, -1, dtype=np.int32)
    orig_idx[pos_map] = grid.ids[:n]
    real_mask = np.zeros(m_total, dtype=bool)
    real_mask[pos_map] = True
    pts_padded = np.full((m_total, 3), 1e30, dtype=np.float32)
    pts_padded[pos_map] = grid.points[:n]

    # per-slab shift of any within-slab range: cumulative padding before
    # that slab (slabs may be absent for some x — map x -> shift)
    shift_of_x = np.zeros(dx + 1, dtype=np.int64)
    shift_of_x[slab_x] = pad_before[:-1]
    # absent slabs are empty ranges; give them the shift of the previous
    # present slab so lo==hi stays consistent
    present = np.zeros(dx + 1, dtype=bool)
    present[slab_x] = True
    for i in range(1, dx + 1):
        if not present[i]:
            shift_of_x[i] = shift_of_x[i - 1]

    cy = np.clip(cell[:, 1], 0, dy - 1)
    cz = np.clip(cell[:, 2], 0, dz - 1)
    y0 = np.clip(cy - 1, 0, dy - 1)
    y1 = np.clip(cy + 1, 0, dy - 1)
    z0 = np.clip(cz - 1, 0, dz - 1)
    z1 = np.clip(cz + 1, 0, dz - 1)
    # per-query windows in ORIGINAL coordinates + per-slab shift, scattered
    # to padded rows
    qpad_tiles = m_total // _KQT
    if qpad_tiles % tile_multiple:
        m_total2 = (-(-qpad_tiles // tile_multiple) * tile_multiple) * _KQT
        pts_padded = np.vstack([pts_padded, np.full(
            (m_total2 - m_total, 3), 1e30, np.float32)])
        orig_idx = np.concatenate([orig_idx, np.full(
            m_total2 - m_total, -1, np.int32)])
        real_mask = np.concatenate([real_mask, np.zeros(
            m_total2 - m_total, bool)])
        m_total = m_total2
    n_tiles = m_total // _KQT

    lo_t = np.full((n_tiles, 3), 2**30, dtype=np.int64)
    hi_t = np.zeros((n_tiles, 3), dtype=np.int64)
    for ri, r in enumerate((-1, 0, 1)):
        x = np.clip(cx + r, 0, dx - 1)
        lo_col = (x * dy + y0) * dz + z0
        hi_col = (x * dy + y1) * dz + z1
        lo_q = starts[np.clip(lo_col, 0, n_cells)].astype(np.int64) \
            + shift_of_x[x]
        hi_q = starts[np.clip(hi_col + 1, 0, n_cells)].astype(np.int64) \
            + shift_of_x[x]
        tile_of_q = pos_map // _KQT
        np.minimum.at(lo_t[:, ri], tile_of_q, lo_q)
        np.maximum.at(hi_t[:, ri], tile_of_q, hi_q)
    empty = lo_t >= 2**30
    lo_t = np.where(empty, 0, lo_t)
    hi_t = np.where(empty, 0, hi_t)
    hi_t = np.maximum(hi_t, lo_t)
    # monotone clamp (disjoint ranges), as tile_ranges3
    lo_t[:, 1] = np.maximum(lo_t[:, 1], hi_t[:, 0])
    hi_t[:, 1] = np.maximum(hi_t[:, 1], lo_t[:, 1])
    lo_t[:, 2] = np.maximum(lo_t[:, 2], hi_t[:, 1])
    hi_t[:, 2] = np.maximum(hi_t[:, 2], lo_t[:, 2])

    tp = m_total + (-m_total) % 128 + _SEG
    lo_al = np.clip((lo_t // 128) * 128, 0, tp - _SEG).astype(np.int64)
    covered = np.all(hi_t - lo_al <= _SEG, axis=1)
    ranges = np.concatenate(
        [lo_al, lo_t, hi_t], axis=1).astype(np.int32).reshape(-1)
    return SlabPaddedSelfJoin(points=pts_padded, real_mask=real_mask,
                              orig_idx=orig_idx,
                              pos_map=pos_map.astype(np.int32),
                              ranges=ranges, covered=covered)


def grid_query_1nn(queries, q_mask, sorted_pts, cell_starts, origin,
                   dims, max_run: int, h):
    """Backend-dispatched grid 1-NN: (idx into sorted targets, dist,
    resolved [Q], strict []).

    On TPU this runs the Pallas three-range-slab kernel
    (ops/nn_pallas.grid_range_query3) — per query tile, three short
    contiguous DMAs (the tile's y/z-window inside each of its three
    x-slabs) instead of the [Q, 9*max_run] gather, which made the XLA
    formulation gather-bound (BENCH_r01: 519.7 ms vs 128.4 ms brute at
    142k points), and a ~2.7x tighter candidate set than the round-2
    whole-union one-slab kernel (grid_range_query).  Callers keep their
    query clouds approximately cell-sorted for tight ranges (the pipeline
    stores the source cloud in target-grid cell order); correctness never
    depends on it.  Elsewhere (CPU tests) it keeps the XLA gather
    formulation.  Both paths guarantee: resolved queries carry their EXACT
    nearest distance <= h.  ``strict`` is True iff additionally every
    unresolved query's true distance exceeds h (always true for the XLA
    path; requires full slab coverage for Pallas) — the precondition of
    the percentile order-statistic exactness argument.
    """
    if jax.default_backend() == "tpu":
        from .nn_pallas import grid_range_query

        # ONE-SLAB whole-union kernel, not the three-range kernel: the
        # three-range scheme assumes each query tile lives in a single
        # x-slab, which holds only for freshly cell-sorted queries.  The
        # staged loop queries a MOVING cloud sorted once at build time —
        # after the first rigid update ~half the tiles straddle an x-slab
        # boundary and their three-range unions span a whole slab
        # (measured: tile coverage 98% -> 5%, 99k unresolved of 120k).
        # The one-slab kernel's per-tile union (_RMAX = 8 x _SEG) absorbs
        # multi-cell drift at ~12 ms per 142k queries; residual uncovered
        # tiles are restored by the caller's exact rescue.
        return grid_range_query(queries, q_mask, sorted_pts, cell_starts,
                                origin, dims, h)
    idx, d, res = _grid_query(queries, q_mask, sorted_pts, cell_starts,
                              origin, dims, max_run, h)
    return idx, d, res, jnp.asarray(True)


@functools.partial(jax.jit, static_argnames=("max_run", "q_tile"))
def _grid_query(queries, q_mask, sorted_pts, cell_starts, origin,
                dims, max_run: int, h, q_tile: int = 2048):
    """Device query pass.  Returns (idx into sorted targets, dist,
    resolved).  ``dims`` is a traced [3] int32 vector so differently sized
    grids reuse the same executable."""
    dx, dy, dz = dims[0], dims[1], dims[2]
    n_cells = jnp.minimum(dx * dy * dz, cell_starts.shape[0] - 1)
    f32 = queries.dtype

    qn = queries.shape[0]
    pad = (-qn) % q_tile
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))

    def per_tile(args):
        q, valid = args
        qt = q.shape[0]
        cell = jnp.floor((q - origin) / h).astype(jnp.int32)
        cx = jnp.clip(cell[:, 0], 0, dx - 1)
        cy = jnp.clip(cell[:, 1], 0, dy - 1)
        cz = jnp.clip(cell[:, 2], 0, dz - 1)
        z0 = jnp.clip(cz - 1, 0, dz - 1)
        z1 = jnp.clip(cz + 1, 0, dz - 1)

        # nine (x, y) columns -> nine contiguous 3-z-cell runs per query
        starts, lens = [], []
        for ox in (-1, 0, 1):
            x = jnp.clip(cx + ox, 0, dx - 1)
            for oy in (-1, 0, 1):
                y = jnp.clip(cy + oy, 0, dy - 1)
                base = (x * dy + y) * dz
                s = cell_starts[jnp.clip(base + z0, 0, n_cells)]
                e = cell_starts[jnp.clip(base + z1 + 1, 0, n_cells)]
                starts.append(s)
                lens.append(e - s)
        run_start = jnp.stack(starts, axis=1)          # [Qt, 9]
        run_len = jnp.stack(lens, axis=1)              # [Qt, 9]

        # one block gather over all candidate slots
        offs = jnp.arange(max_run, dtype=jnp.int32)
        slots = run_start[:, :, None] + offs[None, None, :]   # [Qt, 9, M]
        ok = offs[None, None, :] < run_len[:, :, None]
        cand = jnp.clip(slots, 0, sorted_pts.shape[0] - 1)
        flat = cand.reshape(qt, -1)                    # [Qt, 9*M]
        cpts = sorted_pts[flat]                        # [Qt, 9*M, 3]
        diff = cpts - q[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(ok.reshape(qt, -1), d2, jnp.inf)
        j = jnp.argmin(d2, axis=1)
        best_d2 = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(flat, j[:, None], axis=1)[:, 0]

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

    s_idx, dist, resolved, _ = grid_query_1nn(
        queries, q_mask, sorted_pts, starts, origin,
        jnp.asarray(grid.dims, jnp.int32), grid.max_run,
        jnp.asarray(grid.h, queries.dtype))
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


@functools.partial(jax.jit, static_argnames=("max_run", "k", "q_tile"))
def _grid_query_k(queries, q_mask, sorted_pts, cell_starts, origin,
                  dims, max_run: int, k: int, h, q_tile: int = 2048):
    """k-NN over the 27-cell window.  Returns (idx [Q,k], dist [Q,k],
    resolved [Q]) — resolved iff the k-th distance is <= h."""
    dx, dy, dz = dims[0], dims[1], dims[2]
    n_cells = jnp.minimum(dx * dy * dz, cell_starts.shape[0] - 1)

    qn = queries.shape[0]
    pad = (-qn) % q_tile
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))

    def per_tile(args):
        q, valid = args
        qt = q.shape[0]
        cell = jnp.floor((q - origin) / h).astype(jnp.int32)
        cx = jnp.clip(cell[:, 0], 0, dx - 1)
        cy = jnp.clip(cell[:, 1], 0, dy - 1)
        cz = jnp.clip(cell[:, 2], 0, dz - 1)
        z0 = jnp.clip(cz - 1, 0, dz - 1)
        z1 = jnp.clip(cz + 1, 0, dz - 1)
        starts, lens = [], []
        for ox in (-1, 0, 1):
            x = jnp.clip(cx + ox, 0, dx - 1)
            for oy in (-1, 0, 1):
                y = jnp.clip(cy + oy, 0, dy - 1)
                base = (x * dy + y) * dz
                s = cell_starts[jnp.clip(base + z0, 0, n_cells)]
                e = cell_starts[jnp.clip(base + z1 + 1, 0, n_cells)]
                starts.append(s)
                lens.append(e - s)
        run_start = jnp.stack(starts, axis=1)
        run_len = jnp.stack(lens, axis=1)
        offs = jnp.arange(max_run, dtype=jnp.int32)
        slots = run_start[:, :, None] + offs[None, None, :]
        ok = offs[None, None, :] < run_len[:, :, None]
        cand = jnp.clip(slots, 0, sorted_pts.shape[0] - 1).reshape(qt, -1)
        cpts = sorted_pts[cand]
        diff = cpts - q[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(ok.reshape(qt, -1), d2, jnp.inf)
        top_d2, sel = jax.lax.top_k(-d2, k)
        top_d2 = -top_d2
        top_idx = jnp.take_along_axis(cand, sel, axis=1)
        d = jnp.sqrt(jnp.maximum(top_d2, 0.0))
        resolved = (~valid) | (jnp.isfinite(d[:, -1]) & (d[:, -1] <= h))
        d = jnp.where(valid[:, None], d, jnp.inf)
        return top_idx, d, resolved

    n_tiles = qp.shape[0] // q_tile
    idx, dist, res = jax.lax.map(
        per_tile, (qp.reshape(n_tiles, q_tile, 3),
                   qm.reshape(n_tiles, q_tile)))
    return (idx.reshape(-1, k)[:qn], dist.reshape(-1, k)[:qn],
            res.reshape(-1)[:qn])


def grid_knn(queries: jnp.ndarray, grid: GridIndex, k: int,
             q_mask: jnp.ndarray | None = None,
             exact: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN in the gridded targets (ascending); brute fallback when the
    k-th neighbour of any query lies beyond the 27-cell window."""
    from .nn import knn as brute_knn

    if q_mask is None:
        q_mask = jnp.ones((queries.shape[0],), dtype=bool)
    sorted_pts = jnp.asarray(grid.points)
    starts = jnp.asarray(grid.cell_starts)
    origin = jnp.asarray(grid.origin)
    ids = jnp.asarray(grid.ids)

    s_idx, dist, resolved = _grid_query_k(
        queries, q_mask, sorted_pts, starts, origin,
        jnp.asarray(grid.dims, jnp.int32),
        grid.max_run, k, jnp.asarray(grid.h, queries.dtype))
    idx = ids[s_idx]
    if not exact:
        return idx, dist

    def with_fallback(_):
        b_idx, b_dist = brute_knn(queries, sorted_pts, k, q_mask=q_mask)
        r = resolved[:, None]
        return (jnp.where(r, idx, ids[b_idx]), jnp.where(r, dist, b_dist))

    def no_fallback(_):
        return idx, dist

    return jax.lax.cond(jnp.all(resolved), no_fallback, with_fallback,
                        operand=None)


def grid_percentile(source: jnp.ndarray, grid: GridIndex, percentile: float,
                    s_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """p-th percentile of source→target NN distances via the grid.

    Exactness by order statistics: every query resolved in the 27-cell
    window has an exact distance <= h, and every unresolved query's true
    distance is > h, so sorting resolved-then-inf keeps the true order as
    long as the percentile index lands inside the resolved block.  Only
    when it does not (heavy misalignment) does the brute kernel run — via
    ``lax.cond``, so the steady-state cost is the grid pass alone.

    Index semantics match calArrayPercentileElement (CommonFunc.cpp:174-179).

    The grid-vs-brute decision is made ON HOST from one scalar fetch — a
    ``lax.cond`` would compile (and upload) the heavy brute kernel into
    every caller even when it never runs (CLAUDE.md rule; the fused
    iteration step makes the same host-side choice).
    """
    if s_mask is None:
        s_mask = jnp.ones((source.shape[0],), dtype=bool)
    sorted_pts = jnp.asarray(grid.points)
    starts = jnp.asarray(grid.cell_starts)
    origin = jnp.asarray(grid.origin)

    d_grid, use_grid = _grid_percentile_pass(
        source, s_mask, sorted_pts, starts, origin,
        jnp.asarray(grid.dims, jnp.int32), grid.max_run,
        jnp.asarray(grid.h, source.dtype), percentile)
    if bool(use_grid):
        return d_grid
    return _brute_percentile_pass(source, s_mask, sorted_pts, percentile)


@functools.partial(jax.jit, static_argnames=("max_run", "percentile"))
def _grid_percentile_pass(source, s_mask, sorted_pts, starts, origin,
                          dims, max_run: int, h, percentile: float):
    _, dist, resolved, strict = grid_query_1nn(
        source, s_mask, sorted_pts, starts, origin, dims, max_run, h)
    n = jnp.sum(s_mask)
    idx = jnp.clip((n * percentile).astype(jnp.int32), 0,
                   source.shape[0] - 1)
    ok = resolved | (~s_mask)
    n_resolved = jnp.sum(ok & s_mask)
    d = jnp.where(ok, dist, jnp.inf)
    return jnp.sort(d)[idx], strict & (idx < n_resolved)


@functools.partial(jax.jit, static_argnames=("percentile",))
def _brute_percentile_pass(source, s_mask, sorted_pts, percentile: float):
    n = jnp.sum(s_mask)
    idx = jnp.clip((n * percentile).astype(jnp.int32), 0,
                   source.shape[0] - 1)
    _, d = brute_nn1(source, sorted_pts, q_mask=s_mask)
    return jnp.sort(jnp.where(jnp.isfinite(d), d, jnp.inf))[idx]
