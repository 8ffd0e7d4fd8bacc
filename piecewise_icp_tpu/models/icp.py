"""Point-to-plane ICP on patch centroids + VCM estimation.

Replaces ``P2PICPwithPatchNormal`` (Registration.cpp:1255-1269, PCL
``IterativeClosestPointWithNormals`` with its linearised point-to-plane
estimator) and ``calTransParaVCM`` (Registration.cpp:1273-1343).

The whole ICP runs as ONE jitted ``lax.while_loop`` on device: each step
re-establishes 1-NN correspondences over the (small) centroid clouds,
accumulates the 6x6 point-to-plane normal equations, solves on-device and
composes the exact SE(3) update.  Parameter order is (Rx, Ry, Rz, tx, ty,
tz), the reference's layout (Registration.cpp:1311-1317):

    A_i = [Nz Qy - Ny Qz,  Nx Qz - Nz Qx,  Ny Qx - Nx Qy,  Nx, Ny, Nz]
    L_i = N . (P - Q)

Convergence mirrors PCL's DefaultConvergenceCriteria: transform-epsilon on
the incremental update (transformationEpsilon 1e-8, Registration.cpp:1262),
absolute/relative MSE change (euclideanFitnessEpsilon, :877), max 100
iterations (:1264).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transform import params_to_matrix_jax


def _masked_nn(q: jnp.ndarray, q_mask: jnp.ndarray,
               t: jnp.ndarray, t_mask: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense masked 1-NN for small clouds (patch centroids)."""
    d2 = jnp.zeros((q.shape[0], t.shape[0]), dtype=q.dtype)
    for c in range(3):
        diff = q[:, c][:, None] - t[None, :, c]
        d2 = d2 + diff * diff
    d2 = jnp.where(t_mask[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))
    d = jnp.where(q_mask, d, jnp.inf)
    return idx, d


def _p2pl_rows(src: jnp.ndarray, tgt_pt: jnp.ndarray, tgt_n: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linearised point-to-plane rows (A [N,6], L [N])."""
    qx, qy, qz = src[:, 0], src[:, 1], src[:, 2]
    nx, ny, nz = tgt_n[:, 0], tgt_n[:, 1], tgt_n[:, 2]
    a = jnp.stack([nz * qy - ny * qz,
                   nx * qz - nz * qx,
                   ny * qx - nx * qy,
                   nx, ny, nz], axis=1)
    l = jnp.sum(tgt_n * (tgt_pt - src), axis=1)
    return a, l


@functools.partial(jax.jit,
                   static_argnames=("max_iterations", "symmetric",
                                    "axis_name"))
def point_to_plane_icp(target: jnp.ndarray, target_normals: jnp.ndarray,
                       target_mask: jnp.ndarray,
                       source: jnp.ndarray, source_mask: jnp.ndarray,
                       max_iterations: int = 100,
                       transformation_eps: float = 1e-8,
                       fitness_eps: float = 1e-6,
                       source_normals: jnp.ndarray | None = None,
                       symmetric: bool = False,
                       axis_name: str | None = None,
                       target_var: jnp.ndarray | None = None,
                       source_var: jnp.ndarray | None = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative point-to-plane alignment of ``source`` onto ``target``.

    With ``symmetric=True`` (and ``source_normals``), residuals use the
    sign-aligned bisector of the matched normals — the symmetric
    point-to-plane objective, which cancels first-order curvature bias
    when correspondences are laterally offset (as patch centroids of two
    independent scans always are).

    With ``axis_name`` (inside ``shard_map``) the source rows are this
    chip's shard and the 6x6 normal equations / MSE sums are ``psum``-
    reduced over the mesh axis before the replicated solve — the
    Schur-style block reduction of SURVEY.md §2.4 / BASELINE's north star.

    Returns (4x4 transform f32, iterations executed).
    """
    f32 = target.dtype
    psum = (lambda x: jax.lax.psum(x, axis_name)) if axis_name \
        else (lambda x: x)

    def cond(state):
        it, _, _, _, prev_mse, mse, delta_ok = state
        keep = (it < max_iterations) & jnp.logical_not(delta_ok)
        abs_mse = jnp.abs(mse - prev_mse) > fitness_eps
        rel_mse = jnp.abs(mse - prev_mse) > 1e-5 * jnp.maximum(prev_mse, 1e-30)
        return keep & (abs_mse | rel_mse | (it < 1))

    def body(state):
        it, trans, src, src_n, prev_mse, mse, _ = state
        idx, dist = _masked_nn(src, source_mask, target, target_mask)
        tgt_pt = target[idx]
        tgt_n = target_normals[idx]
        if symmetric:
            sign = jnp.sign(jnp.sum(tgt_n * src_n, axis=1, keepdims=True))
            # UNNORMALISED bisector (Rusinkiewicz 2019): |n1+n2| < 2 when
            # the matched normals disagree, so inconsistent (wrong or
            # cross-patch) correspondences are automatically downweighted
            # in the normal equations.  A normalised bisector gives such
            # rows full weight along a skewed direction, which drags the
            # solve during the early large-DT iterations.
            tgt_n = 0.5 * (tgt_n + jnp.where(sign == 0, 1.0, sign) * src_n)
        a, l = _p2pl_rows(src, tgt_pt, tgt_n)
        w = source_mask.astype(f32)[:, None]
        if target_var is not None and source_var is not None:
            # Gauss-Markov row weights 1/(sigmaCT1^2 + sigmaBP2^2): the
            # linearised solve becomes the weighted LSQ the per-patch
            # plane-fit STDs justify (uniform weights are the reference
            # semantics; this path is the opt-in icp_weighting option).
            # Normalised by the mean weight so the Tikhonov epsilon and
            # convergence thresholds keep their scale.
            iv = 1.0 / jnp.maximum(target_var[idx] + source_var, 1e-14)
            # psum the normaliser too: mesh runs must scale every row by
            # the GLOBAL mean inverse variance, or shard composition
            # leaks into the (otherwise psum-reduced) solve
            n_valid_w = jnp.maximum(psum(jnp.sum(source_mask)),
                                    1).astype(f32)
            iv_mean = (psum(jnp.sum(jnp.where(source_mask, iv, 0.0)))
                       / n_valid_w)
            w = w * jnp.sqrt(iv / jnp.maximum(iv_mean, 1e-30))[:, None]
        a = a * w
        l = l * w[:, 0]
        ata = psum(jnp.matmul(a.T, a, precision="highest"))
        atl = psum(jnp.matmul(a.T, l, precision="highest"))
        # Tikhonov epsilon guards rank-deficient patch layouts
        x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=f32), atl)
        t_delta = params_to_matrix_jax(x)
        new_src = jnp.matmul(src, t_delta[:3, :3].T,
                             precision="highest") + t_delta[:3, 3]
        new_src_n = jnp.matmul(src_n, t_delta[:3, :3].T,
                               precision="highest")
        new_trans = jnp.matmul(t_delta, trans, precision="highest")
        n_valid = jnp.maximum(psum(jnp.sum(source_mask)), 1).astype(f32)
        new_mse = psum(
            jnp.sum(jnp.where(source_mask, dist * dist, 0.0))) / n_valid
        # PCL transform-epsilon: squared translation of the update
        tr_sqr = jnp.sum(t_delta[:3, 3] ** 2)
        cos_angle = (jnp.trace(t_delta[:3, :3]) - 1.0) / 2.0
        delta_ok = (tr_sqr <= transformation_eps) & (cos_angle >= 0.99999)
        return (it + 1, new_trans, new_src, new_src_n, mse, new_mse,
                delta_ok)

    src_n0 = source_normals if source_normals is not None \
        else jnp.zeros_like(source)
    init = (jnp.asarray(0, jnp.int32), jnp.eye(4, dtype=f32), source,
            src_n0, jnp.asarray(jnp.inf, f32), jnp.asarray(jnp.inf, f32),
            jnp.asarray(False))
    it, trans, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return trans, it


@jax.jit
def vcm_normal_equations(target: jnp.ndarray, target_normals: jnp.ndarray,
                         target_mask: jnp.ndarray,
                         source: jnp.ndarray, source_mask: jnp.ndarray):
    """Device part of calTransParaVCM: correspondences + A, L rows.

    Returns (A [N,6], L [N], valid [N]) for the host-side float64 solve.
    """
    idx, _ = _masked_nn(source, source_mask, target, target_mask)
    a, l = _p2pl_rows(source, target[idx], target_normals[idx])
    return a, l, source_mask


def compute_vcm(target: np.ndarray, target_normals: np.ndarray,
                target_mask: np.ndarray, source: np.ndarray,
                source_mask: np.ndarray):
    """Gauss-Markov VCM of the 6 transform parameters
    (calTransParaVCM, Registration.cpp:1273-1343).

    Correspondences + rows on device; the tiny 6x6 algebra runs on host in
    float64: Qxx = (A^T A)^-1, sigma0^2 = v^T v / (N - 6), VCM = sigma0^2 Qxx.

    Returns (VCM, x, sigma0_sq) where x is the float64 least-squares
    parameter update (rx, ry, rz, tx, ty, tz) mapping source onto target —
    the correction the reference computes and discards
    (Registration.cpp:1329) — and sigma0_sq the a-posteriori unit-weight
    variance (m^2), the convergence-quality signal the robustness guard
    consumes.
    """
    a, l, valid = jax.device_get(vcm_normal_equations(
        jnp.asarray(target), jnp.asarray(target_normals),
        jnp.asarray(target_mask), jnp.asarray(source),
        jnp.asarray(source_mask)))
    a = a[valid].astype(np.float64)
    l = l[valid].astype(np.float64)
    n = a.shape[0]
    ata = a.T @ a
    if abs(np.linalg.det(ata)) < 1e-9:
        from ..utils.logging import log
        log.warning("VCM normal matrix is near-singular")
    qxx = np.linalg.inv(ata)
    x = qxx @ (a.T @ l)
    v = a @ x - l
    sigma0_sq = float(v @ v) / max(n - 6, 1)
    return sigma0_sq * qxx, x, sigma0_sq
