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
