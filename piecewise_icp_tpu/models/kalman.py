"""Kalman-filter smoothing of the transformation time series.

The Piecewise-ICP paper describes Kalman-filter smoothing of the estimated
transformation sequence, but the released reference code stops at VCM
propagation (``calTransToReferenceEpoch`` — ``grep -ri kalman`` in the
reference matches only README.md:35).  This module implements the missing
stage: a forward Kalman filter + Rauch-Tung-Striebel smoother over the
6-parameter transform states (Rx, Ry, Rz [rad], tx, ty, tz [m]) chained to
the reference epoch, using the rigorously propagated per-epoch VCMs as
measurement covariances.

Model:
    state     x_k = x_{k-1} + w_k,   w ~ N(0, Q)       (random-walk dynamics)
    measure   z_k = x_k + v_k,       v ~ N(0, VCM_k)

Host float64 — the sequence is tiny (O(epochs)); the heavy work happened on
the TPU producing the measurements.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.transform import matrix_to_angles, params_to_matrix


@dataclasses.dataclass
class SmoothedTrajectory:
    params: np.ndarray        # [N, 6] smoothed (rad, m)
    covariances: np.ndarray   # [N, 6, 6]
    filtered: np.ndarray      # [N, 6] forward-pass estimates
    trans_mats: List[np.ndarray]  # smoothed 4x4 matrices


def _params_from_matrix(m: np.ndarray) -> np.ndarray:
    ang = matrix_to_angles(m)
    return np.concatenate([ang, np.asarray(m, dtype=np.float64)[:3, 3]])


def kalman_smooth_transforms(trans_mats: Sequence[np.ndarray],
                             vcms: Sequence[np.ndarray],
                             process_noise: float | str | np.ndarray = "auto"
                             ) -> SmoothedTrajectory:
    """RTS-smooth a chained transform sequence.

    ``trans_mats``/``vcms`` are the per-epoch to-reference transforms and
    covariances (the outputs of :func:`chaining.chain_to_reference`).
    ``process_noise`` is the diagonal random-walk intensity (scalar or
    per-component [6]); the default ``"auto"`` matches it to the data by
    variance decomposition: Var(z_k - z_{k-1}) = Q + R_k + R_{k-1}, so
    Q = max(Var(diff z) - 2 mean(diag R), floor).  A fixed tiny Q on a
    sequence with real epoch-to-epoch motion would otherwise flatten the
    trajectory instead of denoising it.
    """
    n = len(trans_mats)
    if n == 0:
        return SmoothedTrajectory(np.zeros((0, 6)), np.zeros((0, 6, 6)),
                                  np.zeros((0, 6)), [])
    z = np.stack([_params_from_matrix(m) for m in trans_mats])
    r = np.stack([np.asarray(v, dtype=np.float64) for v in vcms])
    # guard: degenerate measurement covariances get a tiny floor
    for k in range(n):
        d = np.diag(r[k])
        floor = max(np.max(d) * 1e-12, 1e-18)
        r[k] = r[k] + np.eye(6) * floor
    if isinstance(process_noise, str) and process_noise == "auto":
        mean_r = np.mean([np.diag(rk) for rk in r], axis=0)
        if n >= 3:
            inc_var = np.var(np.diff(z, axis=0), axis=0)
        else:
            inc_var = 4.0 * mean_r  # too short to estimate: track closely
        # Var(diff z) = Q + 2R: the excess over the measurement noise is
        # the detected motion intensity.  When the excess vanishes the
        # series is QUASI-STATIC — the motion signal sits below the noise
        # — and Q shrinks to a small fraction of R so the smoother
        # actually averages (steady-state var ~ sqrt(QR) ~ 0.14 R); a
        # floor of mean_r here (the round-3 rule) capped the static-scene
        # gain at ~1.6x for no benefit on moving scenes.
        q_diag = np.maximum(inc_var - 2.0 * mean_r, 0.02 * mean_r)
        q = np.diag(q_diag)
    elif np.isscalar(process_noise):
        q = np.eye(6) * float(process_noise)
    else:
        q = np.diag(np.asarray(process_noise, dtype=np.float64))

    eye = np.eye(6)
    x_pred = np.zeros((n, 6))
    p_pred = np.zeros((n, 6, 6))
    x_filt = np.zeros((n, 6))
    p_filt = np.zeros((n, 6, 6))

    # forward filter (diffuse prior on the first measurement)
    x_prev, p_prev = z[0], r[0]
    for k in range(n):
        if k == 0:
            x_pred[k], p_pred[k] = z[0], r[0] + q
        else:
            x_pred[k] = x_prev
            p_pred[k] = p_prev + q
        s = p_pred[k] + r[k]
        gain = np.linalg.solve(s.T, p_pred[k].T).T
        x_filt[k] = x_pred[k] + gain @ (z[k] - x_pred[k])
        p_filt[k] = (eye - gain) @ p_pred[k]
        x_prev, p_prev = x_filt[k], p_filt[k]

    # RTS backward smoother
    x_smooth = x_filt.copy()
    p_smooth = p_filt.copy()
    for k in range(n - 2, -1, -1):
        c = np.linalg.solve(p_pred[k + 1].T, p_filt[k].T).T
        x_smooth[k] = x_filt[k] + c @ (x_smooth[k + 1] - x_pred[k + 1])
        p_smooth[k] = (p_filt[k]
                       + c @ (p_smooth[k + 1] - p_pred[k + 1]) @ c.T)

    # exact SE(3) reconstruction: params_to_matrix inverts
    # matrix_to_angles exactly at any angle magnitude (tests/test_ops.py)
    mats = [params_to_matrix(x) for x in x_smooth]
    return SmoothedTrajectory(params=x_smooth, covariances=p_smooth,
                              filtered=x_filt, trans_mats=mats)
