"""Fused Pallas segmentation kernels — the gather-free device segmenter.

Measured on the real chip (round-3 probe), the gather-formulated device
segmentation was memory-system-bound: a [N,45] label gather costs ~170 ms
per propagation round and the [N,45,3] neighbour gather ~200 ms — XLA
gathers do not ride the fast path for these shapes.  These kernels remove
EVERY gather from the segmentation phase by exploiting the cell-sorted
point order: all data a query tile needs lives in three short contiguous
ranges (one per x-slab of its 27-cell window, see nn_pallas.tile_ranges3),
which one DMA per range brings into VMEM.  The explicit [N, k] kNN graph
never materialises.

* ``seg_stats`` — per point: the distance threshold t_q of its k-th
  nearest neighbour (3-round, 8-bin histogram refinement of d²; exact to
  h²/512 resolution), neighbour count, and the QUERY-CENTRED first/second
  moments of the neighbours within t_q.  Normals follow by a batched
  closed-form eigensolve — the device equivalent of the reference's
  kNN-45 PCA normals (Segmentation.cpp:30-46) with "exactly 45" relaxed
  to "the ~45 within the histogram bin edge" (the neighbour set feeds
  only the covariance and the VCCS metric, where a tie-edge neighbour
  more or less carries no signal).

* ``propagate_rounds`` — seeded metric label propagation (DESIGN.md §2.1)
  with the per-point state (seed position, seed normal, label) carried in
  an [8, N] row array: each round, every point adopts the state row of
  the in-range candidate whose SEED is closest under the VCCS metric
  (1 − |n_i·n_s| + 0.4‖p_i − p_s‖/res).  The winner's state row is copied
  wholesale — label propagation without a single gather.  A second mode
  (``adopt``) runs the orphan sweep: unlabelled points take the
  Euclidean-nearest labelled candidate, like the host twin
  (pwicp_supervoxel_propagate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn_pallas import _KQT, _SEG, _TPB, _BIG, _IMAX, _on_tpu, tile_ranges3

_NBINS = 8
_NROUNDS = 3
_STATS = 16          # output lanes per query (11 used, padded to 16)


def _slab_dmas(rng_ref, tg, slot, tpack, spack, sems, extra=()):
    """The three-range DMA descriptors for global tile ``tg`` into
    buffer ``slot``.  ``tpack`` [8, Tp] packs x, y, z as sublane rows so
    each range is ONE copy (the per-coordinate formulation issued 9
    small DMAs per tile and was DMA-issue-latency-bound).  ``extra``:
    (src [R, Tp], dst [2, R, 3*SEG], base semaphore index) triples with
    R sublane-aligned.  Caller starts/waits them (double-buffered)."""
    out = []
    for r in range(3):
        lo = pl.multiple_of(rng_ref[9 * tg + r], 128)
        out.append(pltpu.make_async_copy(
            tpack.at[:, pl.ds(lo, _SEG)],
            spack.at[slot, :, pl.ds(r * _SEG, _SEG)],
            sems.at[slot, r]))
        for src, dst, base in extra:
            out.append(pltpu.make_async_copy(
                src.at[:, pl.ds(lo, _SEG)],
                dst.at[slot, :, pl.ds(r * _SEG, _SEG)],
                sems.at[slot, base + r]))
    return out


def _valid_lanes(rng_ref, tg, gid):
    """Fill ``gid`` [1, 3*SEG] with global candidate ids (IMAX on lanes
    outside tile ``tg``'s exact ranges; ranges are disjoint so no
    candidate appears twice)."""
    local = jax.lax.broadcasted_iota(jnp.int32, (1, _SEG), 1)
    for r in range(3):
        base = pl.multiple_of(rng_ref[9 * tg + r], 128)
        gidx = base + local
        valid = ((gidx >= rng_ref[9 * tg + 3 + r])
                 & (gidx < rng_ref[9 * tg + 6 + r]))
        gid[:, pl.ds(r * _SEG, _SEG)] = jnp.where(valid, gidx, _IMAX)


# ---------------------------------------------------------------------------
# Kernel 1: k-th-distance threshold + centred covariance sums
# ---------------------------------------------------------------------------


def _seg_stats_kernel(rng_ref, qx, qy, qz, tpack, out,
                      spack, gid, sems, *, k: int, h2: float):
    # super-tiled: _TPB query tiles per grid step, double-buffered slab
    # DMAs (see nn_pallas._knn3_kernel for the scheme)
    base = pl.program_id(0) * _TPB

    def dmas(tg, slot):
        return _slab_dmas(rng_ref, tg, slot, tpack, spack, sems)

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

        _valid_lanes(rng_ref, tg, gid)
        qsl = pl.ds(i * _KQT, _KQT)
        bad = gid[:] == _IMAX
        dx = qx[qsl, :] - spack[slot, 0, :].reshape(1, -1)
        dy = qy[qsl, :] - spack[slot, 1, :].reshape(1, -1)
        dz = qz[qsl, :] - spack[slot, 2, :].reshape(1, -1)
        d2 = jnp.where(bad, _BIG, dx * dx + dy * dy + dz * dz)

        # histogram refinement of the k-th distance: 3 rounds x 8 bins
        # over [lo, hi], starting at [0, h^2].  After each round the bin
        # containing rank k becomes the new interval; final resolution
        # h^2/512.
        lo = jnp.zeros((_KQT, 1), jnp.float32)
        hi = jnp.full((_KQT, 1), h2, jnp.float32)
        kf = jnp.float32(k)
        for _r in range(_NROUNDS):
            step = (hi - lo) / _NBINS
            edges = [lo + step * b for b in range(1, _NBINS + 1)]
            cums = [jnp.sum((d2 <= e).astype(jnp.float32), axis=1,
                            keepdims=True) for e in edges]
            new_lo, new_hi = lo, hi
            found = jnp.zeros((_KQT, 1), dtype=jnp.bool_)
            prev_edge = lo
            for b in range(_NBINS):
                hit = (~found) & (cums[b] >= kf)
                new_lo = jnp.where(hit, prev_edge, new_lo)
                new_hi = jnp.where(hit, edges[b], new_hi)
                found = found | hit
                prev_edge = edges[b]
            # fewer than k candidates in the window: keep == take all
            lo = jnp.where(found, new_lo, lo)
            hi = jnp.where(found, new_hi, hi)

        t2 = hi
        m = (d2 <= t2) & (~bad)
        mf = m.astype(jnp.float32)
        cnt = jnp.sum(mf, axis=1, keepdims=True)

        def s(v):
            return jnp.sum(jnp.where(m, v, 0.0), axis=1, keepdims=True)

        out[qsl, 0:1] = cnt
        out[qsl, 1:2] = t2
        out[qsl, 2:3] = s(-dx)      # sum of (x_j - qx), dx was qx - x_j
        out[qsl, 3:4] = s(-dy)
        out[qsl, 4:5] = s(-dz)
        out[qsl, 5:6] = s(dx * dx)
        out[qsl, 6:7] = s(dy * dy)
        out[qsl, 7:8] = s(dz * dz)
        out[qsl, 8:9] = s(dx * dy)
        out[qsl, 9:10] = s(dx * dz)
        out[qsl, 10:11] = s(dy * dz)
        out[qsl, 11:] = jnp.zeros((_KQT, _STATS - 11), jnp.float32)
        return 0

    jax.lax.fori_loop(0, _TPB, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "h2", "interpret"))
def _seg_stats_padded(q, ranges, t_rows, k: int, h2: float,
                      interpret: bool = False):
    qp = q.shape[0]
    n_tiles = qp // _KQT
    cols_q = [q[:, c].reshape(-1, 1) for c in range(3)]
    t_pack = jnp.pad(t_rows, ((0, 8 - t_rows.shape[0]), (0, 0)))
    q_spec = pl.BlockSpec((_TPB * _KQT, 1), lambda i, *_: (i, 0))
    t_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((_TPB * _KQT, _STATS), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // _TPB,),
        in_specs=[q_spec] * 3 + [t_spec],
        out_specs=out_spec,
        scratch_shapes=[
            # [slot, 8, lanes]: buffer slot as a LEADING untiled axis
            # (Mosaic cannot dynamically slice the tiled sublane dim);
            # rows 0..2 = x, y, z
            pltpu.VMEM((2, 8, 3 * _SEG), jnp.float32),
            pltpu.VMEM((1, 3 * _SEG), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_seg_stats_kernel, k=k, h2=h2),
        grid_spec=grid_spec,
        # the per-tile [KQT, 3*SEG] temporaries push the scoped-VMEM stack
        # just past the conservative 16 MB default; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((qp, _STATS), jnp.float32),
        interpret=interpret,
    )(ranges, *cols_q, t_pack)


_QBUCKET = 32768     # query-prefix bucket (multiple of _KQT*_TPB)


def _query_prefix(sorted_pts, q_mask, n_queries):
    """Slice the query side of a self-join to a ``_QBUCKET`` bucket of the
    REAL point count: ``build_grid`` pads targets to power-of-two buckets
    (142k -> 262k rows), and running the padding rows as queries nearly
    doubled the segmentation kernels' work and VMEM footprint.  Targets
    keep the full padded array (slab offsets index into it)."""
    qn = sorted_pts.shape[0]
    if n_queries is None:
        return sorted_pts, q_mask, qn
    qb = min(qn, -(-int(n_queries) // _QBUCKET) * _QBUCKET)
    return sorted_pts[:qb], q_mask[:qb], qb


def seg_stats(sorted_pts: jnp.ndarray, q_mask: jnp.ndarray,
              cell_starts: jnp.ndarray, origin: jnp.ndarray,
              dims: jnp.ndarray, h: float, k: int,
              interpret: bool | None = None,
              n_queries: int | None = None,
              host_ranges=None):
    """Per-point neighbourhood statistics of the cell-sorted self-join.

    Returns (t2 [Q] — squared adjacency radius of the ~k nearest within
    the 27-cell window; count [Q]; normals [Q, 3] — smallest eigenvector
    of the neighbourhood covariance; covered [Q]).  With ``n_queries``,
    only the first ``n_queries`` (bucket-padded) rows are processed and
    Q is that padded prefix length.
    """
    from .eigh3 import eigvals3, smallest_eigvec3

    if interpret is None:
        interpret = not _on_tpu()
    queries, qm, qn = _query_prefix(sorted_pts, q_mask, n_queries)
    if host_ranges is not None:
        # host-precomputed exact ranges (grid_nn.slab_padded_self_join):
        # ~40 KB instead of shipping the multi-MB dense CSR to the device
        ranges, covered = host_ranges
        from .nn_pallas import pad_query_target_rows
        qp, t_rows = pad_query_target_rows(queries, sorted_pts, _TPB)
    else:
        qp, ranges, t_rows, covered = tile_ranges3(
            queries, qm, sorted_pts, cell_starts, origin, dims, h,
            tile_multiple=_TPB, exact_ranges=True)
    stats = _seg_stats_padded(qp, ranges, t_rows, k, float(h) * float(h),
                              interpret=interpret)[:qn]
    cnt = jnp.maximum(stats[:, 0], 1.0)
    mean = stats[:, 2:5] / cnt[:, None]           # query-centred mean
    # cov = E[dd^T] - mean mean^T (d = neighbour - query; query-centred
    # sums keep f32 exact at metre scale)
    xx = stats[:, 5] / cnt - mean[:, 0] * mean[:, 0]
    yy = stats[:, 6] / cnt - mean[:, 1] * mean[:, 1]
    zz = stats[:, 7] / cnt - mean[:, 2] * mean[:, 2]
    xy = stats[:, 8] / cnt - mean[:, 0] * mean[:, 1]
    xz = stats[:, 9] / cnt - mean[:, 0] * mean[:, 2]
    yz = stats[:, 10] / cnt - mean[:, 1] * mean[:, 2]
    cov = jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1)], axis=-2)
    vals = eigvals3(cov)
    normals = smallest_eigvec3(cov, vals[..., 2])
    cov_q = jnp.repeat(covered, _KQT)[:qn]
    return stats[:, 1], stats[:, 0], normals, cov_q


# ---------------------------------------------------------------------------
# Kernel 2: one propagation round (state-slab, gather-free)
# ---------------------------------------------------------------------------


def _prop_round_kernel(rng_ref, qall, lab_own, tpack, state,
                       out, spack, sstate, gid, sems,
                       *, inv_res_04: float, adopt: bool, h2: float):
    # super-tiled with double-buffered slab + state DMAs.  ``qall``
    # [Qp, 8] packs (qx, qy, qz, nx, ny, nz, r2, pad) into ONE operand
    # and ``out`` [Qp, 8] packs the seven output fields + changed flag:
    # one operand/result pair keeps the XLA-staged VMEM footprint of the
    # while-loop body small (eight separate [Qp, 1] arrays blew the
    # scoped-vmem stack).
    base = pl.program_id(0) * _TPB

    def dmas(tg, slot):
        return _slab_dmas(rng_ref, tg, slot, tpack, spack, sems,
                          extra=((state, sstate, 3),))

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

        _valid_lanes(rng_ref, tg, gid)
        qsl = pl.ds(i * _KQT, _KQT)
        st = sstate[slot]                            # [8, 3*SEG]
        bad = gid[:] == _IMAX
        dxc = qall[qsl, 0:1] - spack[slot, 0, :].reshape(1, -1)
        dyc = qall[qsl, 1:2] - spack[slot, 1, :].reshape(1, -1)
        dzc = qall[qsl, 2:3] - spack[slot, 2, :].reshape(1, -1)
        d2c = dxc * dxc + dyc * dyc + dzc * dzc      # to the CANDIDATE

        lab_c = st[6:7, :]                           # candidate label (f32)
        labelled = lab_c >= 0.0
        if adopt:
            # orphan sweep reaches the FULL 27-cell window (radius h),
            # not the per-point t_q radius: the host twin's kNN-45 graph
            # connects sparse points to their true neighbours at ANY
            # distance, and radius-capping the sweep orphaned whole
            # sparse regions of deformed epochs into singleton
            # supervoxels (5.3k SV on a 133k cloud vs ~2.1k host)
            mask = (~bad) & labelled & (d2c <= h2)
            m = jnp.sqrt(d2c)
        else:
            dxs = qall[qsl, 0:1] - st[0:1, :]        # to the SEED
            dys = qall[qsl, 1:2] - st[1:2, :]
            dzs = qall[qsl, 2:3] - st[2:3, :]
            ds = jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
            dot = (qall[qsl, 3:4] * st[3:4, :] + qall[qsl, 4:5] * st[4:5, :]
                   + qall[qsl, 5:6] * st[5:6, :])
            m = 1.0 - jnp.abs(dot) + ds * inv_res_04
            mask = (~bad) & labelled & (d2c <= qall[qsl, 6:7])
        m = jnp.where(mask, m, _BIG)

        best = jnp.min(m, axis=1, keepdims=True)
        # tie-break toward the smaller label; all lanes carrying that
        # label share identical seed fields, so a masked min extracts
        # them exactly
        lab_best = jnp.min(jnp.where(m == best, lab_c, _BIG), axis=1,
                           keepdims=True)
        sel = (m == best) & (lab_c == lab_best)

        def pick(row):
            return jnp.min(jnp.where(sel, row, _BIG), axis=1,
                           keepdims=True)

        has = best < _BIG
        if adopt:
            upd = has & (lab_own[qsl, :] < 0.0)
        else:
            upd = has
        out[qsl, 0:1] = jnp.where(upd, pick(st[0:1, :]), 0.0)
        out[qsl, 1:2] = jnp.where(upd, pick(st[1:2, :]), 0.0)
        out[qsl, 2:3] = jnp.where(upd, pick(st[2:3, :]), 0.0)
        out[qsl, 3:4] = jnp.where(upd, pick(st[3:4, :]), 0.0)
        out[qsl, 4:5] = jnp.where(upd, pick(st[4:5, :]), 0.0)
        out[qsl, 5:6] = jnp.where(upd, pick(st[5:6, :]), 0.0)
        new_lab = jnp.where(upd, lab_best, lab_own[qsl, :])
        out[qsl, 6:7] = new_lab
        out[qsl, 7:8] = (new_lab != lab_own[qsl, :]).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, _TPB, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("inv_res_04", "adopt", "h2",
                                    "interpret"))
def _prop_round(qall, state_rows, ranges, t_rows,
                inv_res_04: float, adopt: bool, h2: float,
                interpret: bool = False):
    """One propagation round.  ``qall`` [Qp, 8] packed per-query operand
    (qx, qy, qz, nx, ny, nz, r2, pad); ``state_rows`` [8, Np] (seed xyz,
    seed normal xyz, label, pad) with Np >= Qp; returns (new state_rows,
    changed count)."""
    np_ = state_rows.shape[1]
    qp = qall.shape[0]
    n_tiles = qp // _KQT
    lab_own = state_rows[6, :qp].reshape(-1, 1)
    t_pack = jnp.pad(t_rows, ((0, 8 - t_rows.shape[0]), (0, 0)))
    q_spec = pl.BlockSpec((_TPB * _KQT, 8), lambda i, *_: (i, 0))
    l_spec = pl.BlockSpec((_TPB * _KQT, 1), lambda i, *_: (i, 0))
    t_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((_TPB * _KQT, 8), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // _TPB,),
        in_specs=[q_spec, l_spec] + [t_spec] * 2,
        out_specs=out_spec,
        scratch_shapes=[
            # [slot, 8, lanes]: buffer slot as a LEADING untiled axis
            # (Mosaic cannot dynamically slice the tiled sublane dim);
            # rows 0..2 = x, y, z
            pltpu.VMEM((2, 8, 3 * _SEG), jnp.float32),
            pltpu.VMEM((2, 8, 3 * _SEG), jnp.float32),
            pltpu.VMEM((1, 3 * _SEG), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_prop_round_kernel, inv_res_04=inv_res_04,
                          adopt=adopt, h2=h2),
        grid_spec=grid_spec,
        # the per-tile [KQT, 3*SEG] temporaries push the scoped-VMEM stack
        # past the conservative 16 MB default; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((qp, 8), jnp.float32),
        interpret=interpret,
    )(ranges, qall, lab_own, t_pack, state_rows)
    new_rows = jnp.concatenate(
        [out[:, :7], jnp.zeros((qp, 1), jnp.float32)], axis=1).T
    if np_ > qp:
        new_rows = jnp.pad(new_rows, ((0, 0), (0, np_ - qp)),
                           constant_values=-1.0)
    changed = jnp.sum(out[:, 7])
    return new_rows, changed


def propagate_rounds(sorted_pts: jnp.ndarray, normals: jnp.ndarray,
                     r2: jnp.ndarray, q_mask: jnp.ndarray,
                     seed_idx: jnp.ndarray,
                     cell_starts: jnp.ndarray, origin: jnp.ndarray,
                     dims: jnp.ndarray, h: float, sv_resolution: float,
                     max_rounds: int = 256,
                     interpret: bool | None = None,
                     n_queries: int | None = None,
                     host_ranges=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run seeded metric label propagation to convergence, then the orphan
    sweep.  Returns (labels [Q] int32 in SORTED order, rounds).  With
    ``n_queries``, only the first ``n_queries`` (bucket-padded) rows act
    as queries (``normals``/``r2``/``q_mask`` must cover that prefix);
    every real point must lie in the prefix."""
    if interpret is None:
        interpret = not _on_tpu()
    queries, qm, qn = _query_prefix(sorted_pts, q_mask, n_queries)
    if host_ranges is not None:
        ranges, _covered = host_ranges
        from .nn_pallas import pad_query_target_rows
        qp, t_rows = pad_query_target_rows(queries, sorted_pts, _TPB)
    else:
        qp, ranges, t_rows, _ = tile_ranges3(
            queries, qm, sorted_pts, cell_starts, origin, dims, h,
            tile_multiple=_TPB, exact_ranges=True)
    npad = qp.shape[0] - qn
    nrm = jnp.pad(normals[:qn].astype(jnp.float32), ((0, npad), (0, 0)))
    r2p = jnp.pad(r2[:qn].astype(jnp.float32), (0, npad)).reshape(-1, 1)
    qall = jnp.concatenate(
        [qp, nrm, r2p, jnp.zeros((qp.shape[0], 1), jnp.float32)], axis=1)

    # the state array shares the slab offsets of t_rows AND backs the
    # per-query own-label column, so its width must cover both.  Padded
    # seed slots (seed_idx == -1, from bucket-padding the seed count so
    # epochs share one executable) scatter to a sink row past every real
    # point; the sink's label is reset to -1 afterwards so they never
    # propagate.  Real seed indices are < Tb < tp-1 by construction
    # (t_rows carries >= _SEG rows of slack beyond the point bucket).
    tp = max(t_rows.shape[1], qp.shape[0])
    sink = tp - 1
    sidx = jnp.where(seed_idx >= 0, seed_idx, sink)
    gidx = jnp.clip(sidx, 0, sorted_pts.shape[0] - 1)
    state = jnp.full((8, tp), -1.0, jnp.float32)
    s_pts = sorted_pts[gidx]
    s_nrm = normals[gidx]
    state = state.at[0:3, sidx].set(s_pts.T.astype(jnp.float32))
    state = state.at[3:6, sidx].set(s_nrm.T.astype(jnp.float32))
    state = state.at[6, sidx].set(
        jnp.arange(seed_idx.shape[0], dtype=jnp.float32))
    state = state.at[:, sink].set(-1.0)

    labels, rounds = _propagate_all(
        qall, state, ranges, t_rows,
        float(0.4 / sv_resolution), float(h) * float(h), max_rounds,
        interpret)
    labels = labels[:qn]
    return jnp.where(q_mask[:qn], labels, -1), rounds


@functools.partial(jax.jit, static_argnames=("inv", "h2", "max_rounds",
                                             "interpret"))
def _propagate_all(qall, state, ranges, t_rows,
                   inv: float, h2: float, max_rounds: int,
                   interpret: bool):
    def cond(carry):
        _, chg, it = carry
        return (chg > 0) & (it < max_rounds)

    def body(carry):
        st, _, it = carry
        st2, chg = _prop_round(qall, st, ranges, t_rows,
                               inv, False, h2, interpret)
        return st2, chg, it + 1

    state, _, rounds = jax.lax.while_loop(
        cond, body, (state, jnp.asarray(1.0), jnp.asarray(0, jnp.int32)))

    def body_a(carry):
        st, _, it = carry
        st2, chg = _prop_round(qall, st, ranges, t_rows,
                               inv, True, h2, interpret)
        return st2, chg, it + 1

    state, _, _ = jax.lax.while_loop(
        cond, body_a, (state, jnp.asarray(1.0), jnp.asarray(0, jnp.int32)))

    labels = state[6, :]
    labels = jnp.where(jnp.isfinite(labels) & (labels >= 0),
                       labels, -1.0).astype(jnp.int32)
    return labels, rounds
