"""Pallas TPU kernel for brute-force 1-NN — the hand-scheduled variant.

The XLA brute kernel (ops/nn.py) expresses the streaming running-min as
``lax.map`` over query tiles with an inner ``lax.scan``; this Pallas kernel
expresses the identical computation as a 2-D grid over (query-tile,
target-tile) programs with VMEM-resident accumulators, letting Mosaic
pipeline the target-tile loads against the VPU distance math.

Layout notes (see the TPU tiling constraints): coordinates are passed as
separate ``[Q, 1]`` / ``[1, T]`` arrays so the distance tile
``[QT, TT]`` is built by a sublane-by-lane broadcast — the natural VPU
shape — rather than a lane-dim-3 layout that would waste 42/45 of every
vector register.  Invalid/padded targets are encoded as +1e30 coordinates
(their distances overflow to +inf and never win the min).

Used for the exact-fallback path and as a benchmark reference; the grid
hash (ops/grid_nn.py) remains the default because it does ~100x less
arithmetic.  Falls back to interpret mode automatically off-TPU so tests
exercise the same code path on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_QT = 512   # query tile (sublanes)
_TT = 512   # target tile (lanes)
_BIG = 1e30


def _nn1_kernel(qx, qy, qz, tx, ty, tz, best_d2, best_i):
    j = pl.program_id(1)
    dx = qx[:] - tx[:]          # [QT,1] - [1,TT] -> [QT,TT]
    dy = qy[:] - ty[:]
    dz = qz[:] - tz[:]
    d2 = dx * dx + dy * dy + dz * dz
    tile_min = jnp.min(d2, axis=1, keepdims=True)
    tile_arg = (jnp.argmin(d2, axis=1).astype(jnp.int32)
                + j * d2.shape[1]).reshape(-1, 1)

    @pl.when(j == 0)
    def _():
        best_d2[:] = tile_min
        best_i[:] = tile_arg

    @pl.when(j > 0)
    def _():
        upd = tile_min < best_d2[:]
        best_d2[:] = jnp.where(upd, tile_min, best_d2[:])
        best_i[:] = jnp.where(upd, tile_arg, best_i[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nn1_pallas_padded(q, t, interpret: bool = False):
    """q [Qp, 3], t [Tp, 3] pre-padded to tile multiples."""
    qp, tp = q.shape[0], t.shape[0]
    cols_q = [q[:, c].reshape(-1, 1) for c in range(3)]
    cols_t = [t[:, c].reshape(1, -1) for c in range(3)]
    grid = (qp // _QT, tp // _TT)
    q_spec = pl.BlockSpec((_QT, 1), lambda i, j: (i, 0))
    t_spec = pl.BlockSpec((1, _TT), lambda i, j: (0, j))
    out_spec = pl.BlockSpec((_QT, 1), lambda i, j: (i, 0))
    best_d2, best_i = pl.pallas_call(
        _nn1_kernel,
        grid=grid,
        in_specs=[q_spec] * 3 + [t_spec] * 3,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((qp, 1), q.dtype),
                   jax.ShapeDtypeStruct((qp, 1), jnp.int32)),
        interpret=interpret,
    )(*cols_q, *cols_t)
    return best_i[:, 0], best_d2[:, 0]


def nn1_pallas(queries: jnp.ndarray, targets: jnp.ndarray,
               q_mask: jnp.ndarray | None = None,
               t_mask: jnp.ndarray | None = None,
               interpret: bool | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 1-NN; same contract as ops.nn.nn1."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    qn, tn = queries.shape[0], targets.shape[0]
    qpad = (-qn) % _QT
    tpad = (-tn) % _TT
    q = jnp.pad(queries, ((0, qpad), (0, 0)))
    t = jnp.pad(targets, ((0, tpad), (0, 0)), constant_values=_BIG)
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
