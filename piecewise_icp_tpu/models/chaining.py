"""Transform chaining to the reference epoch with covariance propagation.

Host-side float64 re-implementation of ``calTransToReferenceEpoch``
(Registration.cpp:977-1153): walk the pair graph (adaptive map / fixed
stride / direct), accumulate T_ref = T_new · T_acc, and propagate the VCM —
rigorously via the SE(3) adjoint for adaptive mode
(Sigma ← Sigma_new + Ad · Sigma · Ad^T, Registration.cpp:1056-1090), by
simple addition for fixed-interval mode (:1094-1106).

This stage consumes the durable per-pair results (the framework's
checkpoint grain, like the reference's TransMatrices.txt re-read) and is a
tiny O(epochs) scan — it stays on host by design.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops.transform import adjoint_6x6


def chain_to_reference(trans_mats: Sequence[np.ndarray],
                       vcms: Sequence[np.ndarray],
                       pair_mode: int,
                       reg_pairs: Dict[int, int] | None = None
                       ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Accumulate each epoch's pairwise transform/VCM to the reference epoch.

    ``trans_mats[i]`` / ``vcms[i]`` correspond to source epoch ``i+1``
    (relative indices, startEpoch = 0), exactly the file layout of
    TransMatrices.txt.

    pair_mode semantics (Registration.cpp:1052-1107):
      * 0  — every epoch registered directly to the reference: copy through;
      * >0 — fixed stride: multiply transforms back with stride ``pair_mode``
             and ADD VCMs;
      * <0 — adaptive: walk ``reg_pairs`` (source → target, relative
             indices) to epoch 0, rigorous adjoint propagation.
    """
    n = len(trans_mats)
    out_t: List[np.ndarray] = []
    out_v: List[np.ndarray] = []
    for i in range(n):
        acc_t = np.asarray(trans_mats[i], dtype=np.float64).copy()
        acc_v = np.asarray(vcms[i], dtype=np.float64).copy()
        if pair_mode < 0:
            if reg_pairs is None:
                raise ValueError("adaptive chaining requires reg_pairs")
            target = i + 1
            for _ in range(i + 1):
                target = reg_pairs[target]
                if target == 0:
                    break
                t_new = np.asarray(trans_mats[target - 1], dtype=np.float64)
                acc_t = t_new @ acc_t
                ad = adjoint_6x6(t_new)
                acc_v = (np.asarray(vcms[target - 1], dtype=np.float64)
                         + ad @ acc_v @ ad.T)
        elif pair_mode > 0 and i >= pair_mode:
            # fixed interval (Registration.cpp:1099-1106)
            acc_t = np.eye(4)
            acc_v = np.zeros((6, 6))
            idx = i
            while True:
                acc_t = np.asarray(trans_mats[idx], dtype=np.float64) @ acc_t
                acc_v = np.asarray(vcms[idx], dtype=np.float64) + acc_v
                if idx < pair_mode:
                    break
                idx -= pair_mode
        # pair_mode == 0 or i < pair_mode: direct copy (:1095-1098)
        out_t.append(acc_t)
        out_v.append(acc_v)
    return out_t, out_v


def absolute_errors(estimated: Sequence[np.ndarray],
                    ground_truth: Sequence[np.ndarray]) -> np.ndarray:
    """Per-epoch |estimated - truth| in mgon / mm
    (calAbsErrorOfTransPara, Registration.cpp:1216-1248)."""
    from ..ops.transform import matrix_to_params_gon

    rows = []
    for est, ref in zip(estimated, ground_truth):
        p_est = matrix_to_params_gon(est)
        p_ref = matrix_to_params_gon(ref)
        err = np.abs(p_ref - p_est) * 1000.0  # gon→mgon, m→mm
        rows.append(err)
    return np.array(rows)
