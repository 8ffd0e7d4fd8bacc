"""Pallas TPU kernels for nearest-neighbour search — the hand-scheduled path.

Two kernels:

* ``nn1_pallas`` — brute-force 1-NN.  The whole target cloud is small
  (142k pts × 3 coords × f32 ≈ 1.7 MB) so it lives VMEM-RESIDENT as three
  ``[1, T]`` lane-major rows; the grid runs over query tiles only and each
  program streams the targets through the VPU in ``[QT, TC]`` chunks with
  an elementwise running min.  This removes the per-(q-tile, t-tile)
  grid-step overhead that made the round-1 2-D-grid kernel 2.5x slower
  than XLA: the inner loop is pure VPU work over a resident buffer.

* ``grid_range_query`` — the grid-hash query kernel (used by
  ops/grid_nn.py).  Queries are processed in cell-sorted tiles; a device
  pass computes one contiguous candidate range [lo, hi) per tile in the
  cell-sorted target array (covering every query's 27-cell window), and a
  scalar-prefetch + manual DMA pulls exactly that contiguous slab into VMEM —
  a dense copy instead of the [Q, 9*M] gather that made the XLA grid
  query gather-bound (4x slower than brute despite ~100x less
  arithmetic).  Extra candidates inside the slab are real points, so the
  result is exact-or-better than the 27-cell window.

Replaces FLANN KD-tree queries (Registration.cpp:737-747,
CommonFunc.cpp:246-273).  Numerical note: coordinate-difference distances
only (see ops/nn.py header) — the matmul identity loses ~1e-4 absolute in
f32 at metre scale.

Falls back to interpret mode automatically off-TPU so tests exercise the
same code path on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

_QT = 256        # query tile (sublanes)
_TC = 2048       # target chunk (lanes) streamed per inner-loop step
_BIG = 1e30
_IMAX = np.int32(2**31 - 1)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Brute-force 1-NN: grid over query tiles, targets VMEM-resident.
# ---------------------------------------------------------------------------


def _nn1_kernel(qx, qy, qz, tx, ty, tz, out_d2, out_i, bd, bc):
    """One query tile vs the whole (padded) target row.

    bd/bc: VMEM scratch [QT, TC] — elementwise running min distance and the
    chunk id that produced it.  The cross-lane argmin happens ONCE at the
    end; the hot loop is 3 fma + min + select per element.
    """
    n_chunks = tx.shape[1] // _TC

    bd[:] = jnp.full((_QT, _TC), _BIG, dtype=jnp.float32)
    bc[:] = jnp.zeros((_QT, _TC), dtype=jnp.int32)

    def body(c, _):
        sl = pl.ds(c * _TC, _TC)
        dx = qx[:] - tx[:, sl]          # [QT,1] - [1,TC] -> [QT,TC]
        dy = qy[:] - ty[:, sl]
        dz = qz[:] - tz[:, sl]
        d2 = dx * dx + dy * dy + dz * dz
        upd = d2 < bd[:]
        bd[:] = jnp.where(upd, d2, bd[:])
        bc[:] = jnp.where(upd, c, bc[:])
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    best = jnp.min(bd[:], axis=1, keepdims=True)            # [QT, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_QT, _TC), 1)
    gidx = bc[:] * _TC + lane
    # first-occurrence tie break: smallest global index among the minima
    cand = jnp.where(bd[:] == best, gidx, _IMAX)
    out_d2[:] = best
    out_i[:] = jnp.min(cand, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nn1_pallas_padded(q, t, interpret: bool = False):
    """q [Qp, 3] (Qp % QT == 0), t [Tp, 3] (Tp % TC == 0), both padded."""
    qp, tp = q.shape[0], t.shape[0]
    cols_q = [q[:, c].reshape(-1, 1) for c in range(3)]
    cols_t = [t[:, c].reshape(1, -1) for c in range(3)]
    q_spec = pl.BlockSpec((_QT, 1), lambda i: (i, 0))
    t_spec = pl.BlockSpec((1, tp), lambda i: (0, 0))   # resident, all steps
    out_spec = pl.BlockSpec((_QT, 1), lambda i: (i, 0))
    best_d2, best_i = pl.pallas_call(
        _nn1_kernel,
        grid=(qp // _QT,),
        in_specs=[q_spec] * 3 + [t_spec] * 3,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((qp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((qp, 1), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((_QT, _TC), jnp.float32),
            pltpu.VMEM((_QT, _TC), jnp.int32),
        ],
        interpret=interpret,
    )(*cols_q, *cols_t)
    return best_i[:, 0], best_d2[:, 0]


def nn1_pallas(queries: jnp.ndarray, targets: jnp.ndarray,
               q_mask: jnp.ndarray | None = None,
               t_mask: jnp.ndarray | None = None,
               interpret: bool | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 1-NN; same contract as ops.nn.nn1 (Euclidean distances,
    masked/padded queries get +inf)."""
    if interpret is None:
        interpret = not _on_tpu()
    qn, tn = queries.shape[0], targets.shape[0]
    qpad = (-qn) % _QT
    tpad = (-tn) % _TC
    q = jnp.pad(queries.astype(jnp.float32), ((0, qpad), (0, 0)))
    t = jnp.pad(targets.astype(jnp.float32), ((0, tpad), (0, 0)),
                constant_values=_BIG)
    if t_mask is not None:
        tm = jnp.pad(t_mask, (0, tpad))
        t = jnp.where(tm[:, None], t, _BIG)
    idx, d2 = _nn1_pallas_padded(q, t, interpret=interpret)
    idx = idx[:qn]
    d = jnp.sqrt(jnp.maximum(d2[:qn], 0.0))
    if q_mask is not None:
        d = jnp.where(q_mask, d, jnp.inf)
    # padded/masked targets produce +inf distances already
    return jnp.clip(idx, 0, max(tn - 1, 0)), d


# ---------------------------------------------------------------------------
# Grid-hash range query: one contiguous candidate slab per query tile.
#
# The cell-sorted target array is x-major (z fastest), so the 27-cell window
# of a query at cell (cx, cy, cz) lies entirely inside the CONTIGUOUS range
#   [ cell_starts[lin(cx-1, cy-1, z0)],  cell_starts[lin(cx+1, cy+1, z1)+1] )
# (the lexicographically smallest / largest of its nine column runs).  For a
# tile of spatially coherent queries the union of these ranges is small —
# about two x-slabs of the cloud — so the kernel DMAs that one contiguous
# slab HBM->VMEM and brute-forces the tile against it on the VPU.  Extra
# candidates inside the slab are real points: the result is exact-or-better
# than the 27-cell window, and a tile whose range exceeds the static slab
# size is reported uncovered (the caller falls back to the brute kernel).
# ---------------------------------------------------------------------------

_RMAX = 8192     # candidate slab (lanes); must be a multiple of _TC


def _range_nn_kernel(lo_ref, qx, qy, qz, tx, ty, tz,
                     out_d2, out_i, sx, sy, sz, bd, bc, sems):
    lo = pl.multiple_of(lo_ref[pl.program_id(0)], 128)

    copies = []
    for src, dst, k in ((tx, sx, 0), (ty, sy, 1), (tz, sz, 2)):
        dma = pltpu.make_async_copy(
            src.at[0, pl.ds(lo, _RMAX)], dst.at[0, :], sems.at[k])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    bd[:] = jnp.full((_QT, _TC), _BIG, dtype=jnp.float32)
    bc[:] = jnp.zeros((_QT, _TC), dtype=jnp.int32)

    def body(c, _):
        sl = pl.ds(c * _TC, _TC)
        dx = qx[:] - sx[:, sl]
        dy = qy[:] - sy[:, sl]
        dz = qz[:] - sz[:, sl]
        d2 = dx * dx + dy * dy + dz * dz
        upd = d2 < bd[:]
        bd[:] = jnp.where(upd, d2, bd[:])
        bc[:] = jnp.where(upd, c, bc[:])
        return 0

    jax.lax.fori_loop(0, _RMAX // _TC, body, 0)

    best = jnp.min(bd[:], axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_QT, _TC), 1)
    gidx = lo + bc[:] * _TC + lane
    cand = jnp.where(bd[:] == best, gidx, _IMAX)
    out_d2[:] = best
    out_i[:] = jnp.min(cand, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _range_nn_padded(q, lo_al, t_rows, interpret: bool = False):
    """q [Qp, 3] (Qp % QT == 0), lo_al [n_tiles] int32 (128-aligned,
    clamped to [0, Tp - RMAX]), t_rows [3, Tp] with Tp % TC == 0."""
    qp = q.shape[0]
    n_tiles = qp // _QT
    cols_q = [q[:, c].reshape(-1, 1) for c in range(3)]
    rows_t = [t_rows[c].reshape(1, -1) for c in range(3)]
    # scalar-prefetched lo array: available to the kernel (and to index
    # maps) before the body runs — the canonical dynamic-DMA pattern
    q_spec = pl.BlockSpec((_QT, 1), lambda i, lo: (i, 0))
    t_spec = pl.BlockSpec(memory_space=pl.ANY)       # stays in HBM
    out_spec = pl.BlockSpec((_QT, 1), lambda i, lo: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[q_spec] * 3 + [t_spec] * 3,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((1, _RMAX), jnp.float32),
            pltpu.VMEM((1, _RMAX), jnp.float32),
            pltpu.VMEM((1, _RMAX), jnp.float32),
            pltpu.VMEM((_QT, _TC), jnp.float32),
            pltpu.VMEM((_QT, _TC), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    best_d2, best_i = pl.pallas_call(
        _range_nn_kernel,
        grid_spec=grid_spec,
        # slab scratch + per-tile temporaries sit near the conservative
        # 16 MB scoped-VMEM default; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        out_shape=(jax.ShapeDtypeStruct((qp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((qp, 1), jnp.int32)),
        interpret=interpret,
    )(lo_al, *cols_q, *rows_t)
    return best_i[:, 0], best_d2[:, 0]


def grid_range_query(queries: jnp.ndarray, q_mask: jnp.ndarray,
                     sorted_pts: jnp.ndarray, cell_starts: jnp.ndarray,
                     origin: jnp.ndarray, dims: jnp.ndarray, h,
                     interpret: bool | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """1-NN of ``queries`` in the cell-sorted targets via contiguous slabs.

    Returns (idx into the SORTED target array, dist, resolved [Q],
    strict []).  ``resolved`` additionally requires the query tile's
    candidate range to fit the slab — uncovered tiles are reported
    unresolved and the caller's existing brute fallback restores
    exactness.  ``strict`` (scalar) is True iff every tile was covered,
    i.e. the classic dichotomy "unresolved => true distance > h" holds
    (required by the percentile order-statistic argument).  Traceable
    (jit-safe): all range computation is on device.
    """
    if interpret is None:
        interpret = not _on_tpu()
    f32 = queries.dtype
    qn = queries.shape[0]
    dx, dy, dz = dims[0], dims[1], dims[2]
    n_cells = jnp.minimum(dx * dy * dz, cell_starts.shape[0] - 1)

    cell = jnp.floor((queries - origin) / h).astype(jnp.int32)
    cx = jnp.clip(cell[:, 0], 0, dx - 1)
    cy = jnp.clip(cell[:, 1], 0, dy - 1)
    cz = jnp.clip(cell[:, 2], 0, dz - 1)
    z0 = jnp.clip(cz - 1, 0, dz - 1)
    z1 = jnp.clip(cz + 1, 0, dz - 1)
    lo_col = ((jnp.clip(cx - 1, 0, dx - 1) * dy
               + jnp.clip(cy - 1, 0, dy - 1)) * dz + z0)
    hi_col = ((jnp.clip(cx + 1, 0, dx - 1) * dy
               + jnp.clip(cy + 1, 0, dy - 1)) * dz + z1)
    lo_q = cell_starts[jnp.clip(lo_col, 0, n_cells)]
    hi_q = cell_starts[jnp.clip(hi_col + 1, 0, n_cells)]
    # masked queries need no resolution -> degenerate range
    lo_q = jnp.where(q_mask, lo_q, 2**30)
    hi_q = jnp.where(q_mask, hi_q, 0)

    qpad = (-qn) % _QT
    qp = jnp.pad(queries, ((0, qpad), (0, 0)))
    # padded queries contribute a degenerate [0, 0) range
    lo_t = jnp.pad(lo_q, (0, qpad), constant_values=2**30)
    hi_t = jnp.pad(hi_q, (0, qpad))
    n_tiles = qp.shape[0] // _QT
    lo_t = jnp.min(lo_t.reshape(n_tiles, _QT), axis=1)
    hi_t = jnp.max(hi_t.reshape(n_tiles, _QT), axis=1)

    tn = sorted_pts.shape[0]
    tpad = (-tn) % _TC + _RMAX        # slack so lo + RMAX never overruns
    t_rows = jnp.pad(sorted_pts.astype(jnp.float32).T,
                     ((0, 0), (0, tpad)), constant_values=_BIG)
    tp = t_rows.shape[1]

    lo_al = jnp.clip((lo_t // 128) * 128, 0, tp - _RMAX).astype(jnp.int32)
    covered = (hi_t - lo_al) <= _RMAX

    idx, d2 = _range_nn_padded(qp.astype(jnp.float32), lo_al, t_rows,
                               interpret=interpret)
    idx = jnp.clip(idx[:qn], 0, max(tn - 1, 0))
    d = jnp.sqrt(jnp.maximum(d2[:qn], 0.0))
    cov_q = jnp.repeat(covered, _QT)[:qn]
    found = jnp.isfinite(d) & (d <= h)
    resolved = (~q_mask) | (cov_q & found)
    d = jnp.where(q_mask, d, jnp.inf)
    # strict: every tile covered -> "unresolved => true distance > h" holds
    # for every query (the order-statistic exactness precondition)
    return idx, d, resolved, jnp.all(covered)


# ---------------------------------------------------------------------------
# Grid k-NN over cell-sorted queries: three-range slabs + min-extraction.
#
# The keystone of DEVICE-side segmentation (the reference's dominant cost is
# the kNN-45 graph + per-point normals, Segmentation.cpp:30-46).  Queries
# are the cell-sorted target points themselves (a self-join) or any query
# set pre-sorted by target cell id.  Geometry: with x-major/z-fastest cell
# ordering, a query's 27-cell window spans THREE x-slabs; the one-contiguous
# -slab trick of grid_range_query must cover all three, over-fetching ~25x
# (measured: whole-tile union ~5600 points vs ~200 true candidates).  Here
# each tile instead DMAs THREE short ranges — the tile's y/z-window inside
# each of the three x-slabs — which keeps the slab at 3*_SEG lanes while
# covering the exact 27-cell window of every query in the tile.
#
# Top-k: distances for all slab candidates are materialised in VMEM once,
# then the k nearest are peeled off by k min-extraction passes (running
# cross-lane min + first-occurrence arg + mask).  Pure VPU work, no sort,
# no gather; k is static (the framework uses k=45, CommonFunc.h:41).
# ---------------------------------------------------------------------------

_KQT = 128      # k-NN query tile (sublanes)
_SEG = 1024     # lanes per x-slab range; slab = 3 segments
_TPB = 32       # query tiles per grid step (super-tile)


def _knn3_kernel(rng_ref, qx, qy, qz, tpack,
                 out_i, out_d2, spack, gid, d2b, sems, *, k: int):
    # rng_ref [n_tiles * 9] FLAT: (lo_aligned[3], lo[3], hi[3]) per tile —
    # one packed 1-D prefetch operand (2-D scalar operands get lane-padded
    # to 128 in SMEM, which alone overflows the 1 MB budget).
    #
    # Super-tiled: each grid step processes _TPB query tiles in an inner
    # fori_loop with DOUBLE-BUFFERED slab DMAs (slabs for tile t+1 are in
    # flight while tile t computes).  The per-grid-step dispatch overhead
    # that dominated the one-tile-per-step formulation (~30 us/step, vs
    # ~1 us of VPU work per tile) is amortised _TPB-fold; the remaining
    # per-tile cost is the extraction arithmetic itself.
    blk = pl.program_id(0)
    base = blk * _TPB

    def dmas(tg, slot):
        # ONE DMA per range: xyz packed as sublane-aligned [8, Tp] rows
        # (9 small copies per tile were DMA-issue-latency-bound)
        out = []
        for r in range(3):
            lo = pl.multiple_of(rng_ref[9 * tg + r], 128)
            out.append(pltpu.make_async_copy(
                tpack.at[:, pl.ds(lo, _SEG)],
                spack.at[slot, :, pl.ds(r * _SEG, _SEG)],
                sems.at[slot, r]))
        return out

    for dma in dmas(base, 0):
        dma.start()

    def body(i, _):
        tg = base + i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < _TPB)
        def _():
            for dma in dmas(tg + 1, jax.lax.rem(i + 1, 2)):
                dma.start()

        for dma in dmas(tg, slot):
            dma.wait()

        # global candidate ids + validity per lane (ranges are disjoint
        # after the caller's monotone clamp: no candidate appears twice)
        local = jax.lax.broadcasted_iota(jnp.int32, (1, _SEG), 1)
        for r in range(3):
            b = pl.multiple_of(rng_ref[9 * tg + r], 128)
            gidx = b + local
            valid = ((gidx >= rng_ref[9 * tg + 3 + r])
                     & (gidx < rng_ref[9 * tg + 6 + r]))
            gid[:, pl.ds(r * _SEG, _SEG)] = jnp.where(valid, gidx, _IMAX)

        # distances of the tile against the slab, masked lanes BIG
        qsl = pl.ds(i * _KQT, _KQT)
        bad = gid[:] == _IMAX
        dx = qx[qsl, :] - spack[slot, 0, :].reshape(1, -1)
        dy = qy[qsl, :] - spack[slot, 1, :].reshape(1, -1)
        dz = qz[qsl, :] - spack[slot, 2, :].reshape(1, -1)
        d2b[:] = jnp.where(bad, _BIG, dx * dx + dy * dy + dz * dz)

        # k min-extraction passes (static unroll: column writes static)
        for j in range(k):
            best = jnp.min(d2b[:], axis=1, keepdims=True)
            cand = jnp.where(d2b[:] == best, gid[:], _IMAX)
            arg = jnp.min(cand, axis=1, keepdims=True)
            out_d2[qsl, j:j + 1] = best
            out_i[qsl, j:j + 1] = arg
            d2b[:] = jnp.where(gid[:] == arg, _BIG, d2b[:])
        return 0

    jax.lax.fori_loop(0, _TPB, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _knn3_padded(q, ranges, t_rows, k: int, interpret: bool = False):
    """q [Qp, 3] (Qp % (KQT*TPB) == 0), ranges [n_tiles * 9] int32 flat-
    packed as (lo_aligned[3], lo[3], hi[3]) per tile with lo_aligned
    128-aligned and clamped to [0, Tp - SEG], t_rows [3, Tp]."""
    qp = q.shape[0]
    n_tiles = qp // _KQT
    cols_q = [q[:, c].reshape(-1, 1) for c in range(3)]
    t_pack = jnp.pad(t_rows, ((0, 8 - t_rows.shape[0]), (0, 0)))
    q_spec = pl.BlockSpec((_TPB * _KQT, 1), lambda i, *_: (i, 0))
    t_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((_TPB * _KQT, k), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // _TPB,),
        in_specs=[q_spec] * 3 + [t_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            # [slot, 8, lanes]: buffer slot as a LEADING untiled axis
            # (Mosaic cannot dynamically slice the tiled sublane dim);
            # rows 0..2 = x, y, z
            pltpu.VMEM((2, 8, 3 * _SEG), jnp.float32),
            pltpu.VMEM((1, 3 * _SEG), jnp.int32),     # global ids per lane
            pltpu.VMEM((_KQT, 3 * _SEG), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out_i, out_d2 = pl.pallas_call(
        functools.partial(_knn3_kernel, k=k),
        grid_spec=grid_spec,
        # slab scratch + per-tile temporaries sit near the conservative
        # 16 MB scoped-VMEM default; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        out_shape=(jax.ShapeDtypeStruct((qp, k), jnp.int32),
                   jax.ShapeDtypeStruct((qp, k), jnp.float32)),
        interpret=interpret,
    )(ranges, *cols_q, t_pack)
    return out_i, out_d2


def tile_ranges3(queries: jnp.ndarray, q_mask: jnp.ndarray,
                 sorted_pts: jnp.ndarray, cell_starts: jnp.ndarray,
                 origin: jnp.ndarray, dims: jnp.ndarray, h,
                 tile_multiple: int = 1, exact_ranges: bool = False):
    """Per-tile three-range slab geometry for cell-sorted queries.

    For every _KQT-query tile, the 27-cell windows of its queries lie in
    three short contiguous ranges of the cell-sorted target array (one per
    x-slab).  Returns (qp padded queries [Qp, 3], ranges [n_tiles * 9]
    flat-packed (lo_aligned[3], lo[3], hi[3]), t_rows [3, Tp] padded
    coordinate rows, covered [n_tiles]).  Shared prelude of the k-NN and
    fused-segmentation kernels.

    ``tile_multiple``: pad the tile count to this multiple (degenerate
    ranges, all-masked queries) — the super-tiled kernels process that
    many tiles per grid step.

    Queries farther than ``h`` outside the grid's bounding box cannot
    have a neighbour within ``h`` (the box is the tight AABB of the
    targets), so they are excluded from the range union like masked
    queries — otherwise a tile mixing far-outside queries (clipped to
    edge cells across the whole y/z face) spans an entire x-slab and
    loses coverage.  Their tiles stay covered and they simply resolve
    as "not found", which preserves the dichotomy unresolved =>
    true distance > h.
    """
    qn = queries.shape[0]
    dx, dy, dz = dims[0], dims[1], dims[2]
    n_cells = jnp.minimum(dx * dy * dz, cell_starts.shape[0] - 1)

    box_hi = origin + jnp.stack([dx, dy, dz]).astype(queries.dtype) * h
    inbox = jnp.all((queries >= origin - h) & (queries <= box_hi + h),
                    axis=1)
    q_eff = q_mask & inbox

    cell = jnp.floor((queries - origin) / h).astype(jnp.int32)
    cx = jnp.clip(cell[:, 0], 0, dx - 1)
    cy = jnp.clip(cell[:, 1], 0, dy - 1)
    cz = jnp.clip(cell[:, 2], 0, dz - 1)

    # Per-TILE cell bounding box, then SIX cell_starts lookups per tile
    # (default).  The per-QUERY formulation (``exact_ranges=True``) looks
    # cell_starts up per query (6 x [N] gathers) and reduces per tile —
    # XLA gathers cost ~26 ns/element on TPU, making that prelude ~12 ms
    # at 142k queries while the kernel runs in ~0.1 ms, so the
    # per-iteration percentile path uses the bbox mode.  The bbox ranges
    # are a superset of the per-query union (cell_starts is monotone in
    # the x-major linear index) so resolved results are identical, but
    # tiles wrapping an x-slab boundary span a full y-range and lose
    # COVERAGE more often (truncated windows -> unresolved queries).
    # Consumers without a per-query fallback — the segmentation kernels,
    # whose orphan handling degrades silently when windows truncate —
    # pay the gathers once per cloud and keep the tight per-query ranges.
    qpad = (-qn) % (_KQT * tile_multiple)
    qp = jnp.pad(queries.astype(jnp.float32), ((0, qpad), (0, 0)))
    n_tiles = qp.shape[0] // _KQT

    if exact_ranges:
        y0q = jnp.clip(cy - 1, 0, dy - 1)
        y1q = jnp.clip(cy + 1, 0, dy - 1)
        z0q = jnp.clip(cz - 1, 0, dz - 1)
        z1q = jnp.clip(cz + 1, 0, dz - 1)
        lo_t, hi_t = [], []
        for r in (-1, 0, 1):
            x = jnp.clip(cx + r, 0, dx - 1)
            lo_col = (x * dy + y0q) * dz + z0q
            hi_col = (x * dy + y1q) * dz + z1q
            lo_q = cell_starts[jnp.clip(lo_col, 0, n_cells)]
            hi_q = cell_starts[jnp.clip(hi_col + 1, 0, n_cells)]
            lo_q = jnp.where(q_eff, lo_q, 2**30)
            hi_q = jnp.where(q_eff, hi_q, 0)
            lo_r = jnp.pad(lo_q, (0, qpad), constant_values=2**30)
            hi_r = jnp.pad(hi_q, (0, qpad))
            lo_t.append(jnp.min(lo_r.reshape(n_tiles, _KQT), axis=1))
            hi_t.append(jnp.max(hi_r.reshape(n_tiles, _KQT), axis=1))
        lo_t = jnp.stack(lo_t, axis=1)        # [T, 3]
        hi_t = jnp.stack(hi_t, axis=1)
        empty = lo_t >= 2**30                 # all-masked tiles
        lo_t = jnp.where(empty, 0, lo_t)
        hi_t = jnp.where(empty, 0, hi_t)
        hi_t = jnp.maximum(hi_t, lo_t)
    else:
        big = jnp.int32(1 << 20)

        def tmin(v):
            vm = jnp.pad(jnp.where(q_eff, v, big), (0, qpad),
                         constant_values=1 << 20)
            return jnp.min(vm.reshape(n_tiles, _KQT), axis=1)

        def tmax(v):
            vm = jnp.pad(jnp.where(q_eff, v, -1), (0, qpad),
                         constant_values=-1)
            return jnp.max(vm.reshape(n_tiles, _KQT), axis=1)

        txn, txx = tmin(cx), tmax(cx)
        tyn, tyx = tmin(cy), tmax(cy)
        tzn, tzx = tmin(cz), tmax(cz)
        has_real = txx >= 0                   # any unmasked in-box query
        y0 = jnp.clip(tyn - 1, 0, dy - 1)
        y1 = jnp.clip(tyx + 1, 0, dy - 1)
        z0 = jnp.clip(tzn - 1, 0, dz - 1)
        z1 = jnp.clip(tzx + 1, 0, dz - 1)

        lo_t, hi_t = [], []
        for r in (-1, 0, 1):
            x_lo = jnp.clip(txn + r, 0, dx - 1)
            x_hi = jnp.clip(txx + r, 0, dx - 1)
            lo_col = (x_lo * dy + y0) * dz + z0
            hi_col = (x_hi * dy + y1) * dz + z1
            lo_r = cell_starts[jnp.clip(lo_col, 0, n_cells)]  # [T] gather
            hi_r = cell_starts[jnp.clip(hi_col + 1, 0, n_cells)]
            lo_t.append(jnp.where(has_real, lo_r, 0))
            hi_t.append(jnp.where(has_real, hi_r, 0))
        lo_t = jnp.stack(lo_t, axis=1)        # [T, 3]
        hi_t = jnp.stack(hi_t, axis=1)
        hi_t = jnp.maximum(hi_t, lo_t)
    # monotone clamp: x-clipping at the cloud edge can collapse adjacent
    # ranges onto the same x-slab; forcing lo_r >= hi_{r-1} makes the three
    # ranges disjoint so no candidate is counted twice
    l0, l1, l2 = lo_t[:, 0], lo_t[:, 1], lo_t[:, 2]
    h0, h1, h2 = hi_t[:, 0], hi_t[:, 1], hi_t[:, 2]
    l1 = jnp.maximum(l1, h0)
    h1 = jnp.maximum(h1, l1)
    l2 = jnp.maximum(l2, h1)
    h2 = jnp.maximum(h2, l2)
    lo_t = jnp.stack([l0, l1, l2], axis=1)
    hi_t = jnp.stack([h0, h1, h2], axis=1)

    tn = sorted_pts.shape[0]
    tpad = (-tn) % 128 + _SEG        # slack so lo_al + SEG never overruns
    t_rows = jnp.pad(sorted_pts.astype(jnp.float32).T,
                     ((0, 0), (0, tpad)), constant_values=_BIG)
    tp = t_rows.shape[1]

    lo_al = jnp.clip((lo_t // 128) * 128, 0, tp - _SEG).astype(jnp.int32)
    covered = jnp.all(hi_t - lo_al <= _SEG, axis=1)

    ranges = jnp.concatenate([lo_al, lo_t.astype(jnp.int32),
                              hi_t.astype(jnp.int32)], axis=1).reshape(-1)
    return qp, ranges, t_rows, covered


def grid_range_query3(queries: jnp.ndarray, q_mask: jnp.ndarray,
                      sorted_pts: jnp.ndarray, cell_starts: jnp.ndarray,
                      origin: jnp.ndarray, dims: jnp.ndarray, h,
                      interpret: bool | None = None,
                      exact_ranges: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """1-NN via the three-range slab kernel — the tight-slab successor of
    :func:`grid_range_query` (same contract: idx into the SORTED target
    order, dist, resolved [Q], strict []).

    Where the one-slab kernel DMAs the whole-tile range union (~_RMAX
    lanes, ~25x over-fetch: the 27-cell window of an x-major-sorted cloud
    spans THREE x-slabs), this one DMAs the tile's y/z-window inside each
    x-slab separately — 3*_SEG candidate lanes, a ~2.7x op reduction and
    ~10x fewer wasted lanes.  Queries should be approximately cell-sorted
    (the pipeline keeps the source cloud in target-grid cell order);
    correctness never depends on it — a tile whose ranges exceed _SEG is
    reported uncovered and its queries unresolved, exactly like the
    one-slab kernel.
    """
    if interpret is None:
        interpret = not _on_tpu()
    qn = queries.shape[0]
    tn = sorted_pts.shape[0]
    qp, ranges, t_rows, covered = tile_ranges3(
        queries, q_mask, sorted_pts, cell_starts, origin, dims, h,
        tile_multiple=_TPB, exact_ranges=exact_ranges)
    idx, d2 = _knn3_padded(qp, ranges, t_rows, 1, interpret=interpret)
    idx = idx[:qn, 0]
    d = jnp.sqrt(jnp.maximum(d2[:qn, 0], 0.0))
    cov_q = jnp.repeat(covered, _KQT)[:qn]
    found = jnp.isfinite(d) & (d <= h)
    resolved = (~q_mask) | (cov_q & found)
    d = jnp.where(q_mask, d, jnp.inf)
    idx = jnp.clip(jnp.where(idx == _IMAX, 0, idx), 0, max(tn - 1, 0))
    # strict: every tile covered -> "unresolved => true distance > h" holds
    # (the percentile order-statistic exactness precondition)
    return idx, d, resolved, jnp.all(covered)


def pad_query_target_rows(queries: jnp.ndarray, sorted_pts: jnp.ndarray,
                          tile_multiple: int = 1):
    """The (qp, t_rows) padding of :func:`tile_ranges3`, standalone — for
    callers that bring HOST-precomputed ranges (grid_nn.
    slab_padded_self_join) and skip the device range pass entirely."""
    qn = queries.shape[0]
    qpad = (-qn) % (_KQT * tile_multiple)
    qp = jnp.pad(queries.astype(jnp.float32), ((0, qpad), (0, 0)))
    tn = sorted_pts.shape[0]
    tpad = (-tn) % 128 + _SEG
    t_rows = jnp.pad(sorted_pts.astype(jnp.float32).T,
                     ((0, 0), (0, tpad)), constant_values=_BIG)
    return qp, t_rows


def grid_knn_sorted(queries: jnp.ndarray, q_mask: jnp.ndarray,
                    sorted_pts: jnp.ndarray, cell_starts: jnp.ndarray,
                    origin: jnp.ndarray, dims: jnp.ndarray, h, k: int,
                    interpret: bool | None = None,
                    host_ranges=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-NN of cell-sorted ``queries`` in the cell-sorted targets.

    Queries MUST be sorted by target cell id (for a self-join they are the
    sorted target array itself) — that is what keeps each tile's three
    ranges short.  Returns (idx [Q, k] into the SORTED target order,
    dist [Q, k] ascending, resolved [Q]).  ``resolved`` queries carry their
    EXACT k nearest (the k-th distance is <= h, so nothing outside the
    27-cell window can beat it); unresolved queries (k-th neighbour beyond
    the window, or an uncovered tile) must be recomputed by the caller.
    Traceable (jit-safe).
    """
    if interpret is None:
        interpret = not _on_tpu()
    qn = queries.shape[0]
    tn = sorted_pts.shape[0]
    if host_ranges is not None:
        ranges, covered = host_ranges
        qp, t_rows = pad_query_target_rows(queries, sorted_pts, _TPB)
    else:
        qp, ranges, t_rows, covered = tile_ranges3(
            queries, q_mask, sorted_pts, cell_starts, origin, dims, h,
            tile_multiple=_TPB)
    idx, d2 = _knn3_padded(qp, ranges, t_rows, k, interpret=interpret)
    idx = idx[:qn]
    d = jnp.sqrt(jnp.maximum(d2[:qn], 0.0))
    cov_q = jnp.repeat(covered, _KQT)[:qn]
    kth_ok = jnp.isfinite(d[:, -1]) & (d[:, -1] <= h)
    resolved = (~q_mask) | (cov_q & kth_ok)
    idx = jnp.where(idx == _IMAX, -1, jnp.minimum(idx, max(tn - 1, 0)))
    d = jnp.where(q_mask[:, None], d, jnp.inf)
    return idx, d, resolved
