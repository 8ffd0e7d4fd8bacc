"""Rigid-transform (SE(3)) utilities.

Host-side (numpy, float64) helpers for transform bookkeeping plus jittable
JAX variants for the device pipeline.  Angle extraction mirrors
``matrix2angle`` (CommonFunc.cpp:385-407): x-y-z intrinsic Euler angles with
the reference's gimbal-lock branches, so parameter reports are comparable
digit-for-digit with the goldens.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ARC_TO_GON


# ----------------------------------------------------------------------
# Host (numpy, float64)
# ----------------------------------------------------------------------

def matrix_to_angles(trans_mat: np.ndarray) -> np.ndarray:
    """Euler angles (ax, ay, az) in radians from a 4x4 (or 3x3) matrix.

    Semantics of CommonFunc.cpp:385-407: ay = -asin(m20);
    ax = atan2(m21/c, m22/c); az = atan2(m10/c, m00/c); special-cased when
    m20 = +-1 (gimbal lock, az fixed to 0).
    """
    m = np.asarray(trans_mat, dtype=np.float64)
    m20 = m[2, 0]
    if m20 == 1.0 or m20 == -1.0:
        az = 0.0
        delta = math.atan2(m[0, 1], m[0, 2])
        if m20 == -1.0:
            ay = math.pi / 2
            ax = az + delta
        else:
            ay = -math.pi / 2
            ax = -az + delta
    else:
        ay = -math.asin(m20)
        c = math.cos(ay)
        ax = math.atan2(m[2, 1] / c, m[2, 2] / c)
        az = math.atan2(m[1, 0] / c, m[0, 0] / c)
    return np.array([ax, ay, az], dtype=np.float64)


def matrix_to_params_gon(trans_mat: np.ndarray) -> np.ndarray:
    """(Rx, Ry, Rz [gon], tx, ty, tz [m]) — the reference's parameter vector
    layout (Registration.cpp:474-480)."""
    ang = matrix_to_angles(trans_mat) * ARC_TO_GON
    t = np.asarray(trans_mat, dtype=np.float64)[:3, 3]
    return np.concatenate([ang, t])


def translation_matrix(shift: np.ndarray) -> np.ndarray:
    """4x4 translation-only matrix (centroid reduction,
    Registration.cpp:285-292)."""
    m = np.eye(4, dtype=np.float64)
    m[:3, 3] = np.asarray(shift, dtype=np.float64)
    return m


def params_to_matrix(x: np.ndarray) -> np.ndarray:
    """Exact SE(3) matrix from parameters (rx, ry, rz [rad], tx, ty, tz).

    Builds R = Rz(rz) @ Ry(ry) @ Rx(rx) — the exact inverse of
    :func:`matrix_to_angles` (x-y-z Euler convention of
    CommonFunc.cpp:385-407) at ANY angle magnitude, not a small-angle
    approximation (round-trip proven in tests/test_ops.py).
    """
    rx, ry, rz, tx, ty, tz = [float(v) for v in np.asarray(x).ravel()]
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = Rz @ Ry @ Rx
    m[:3, 3] = [tx, ty, tz]
    return m


def apply_transform_np(points: np.ndarray, trans_mat: np.ndarray) -> np.ndarray:
    pts = np.asarray(points)
    m = np.asarray(trans_mat, dtype=pts.dtype)
    return pts @ m[:3, :3].T + m[:3, 3]


def skew(v: np.ndarray) -> np.ndarray:
    """[v]x cross-product matrix, sign convention of the adjoint VCM
    propagation (Registration.cpp:1076-1078)."""
    x, y, z = [float(a) for a in np.asarray(v).ravel()]
    return np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])


def adjoint_6x6(trans_mat: np.ndarray) -> np.ndarray:
    """SE(3) adjoint in the (rot, trans) parameter order used for rigorous
    VCM chaining: Ad = [[R, 0], [[t]x R, R]] (Registration.cpp:1074-1082)."""
    m = np.asarray(trans_mat, dtype=np.float64)
    R = m[:3, :3]
    t = m[:3, 3]
    ad = np.zeros((6, 6), dtype=np.float64)
    ad[:3, :3] = R
    ad[3:, 3:] = R
    ad[3:, :3] = skew(t) @ R
    return ad


# ----------------------------------------------------------------------
# Device (JAX, jittable)
# ----------------------------------------------------------------------

def apply_transform(points: jnp.ndarray, trans_mat: jnp.ndarray) -> jnp.ndarray:
    """Transform ``[N, 3]`` points by a 4x4 matrix on device."""
    m = trans_mat.astype(points.dtype)
    return jnp.matmul(points, m[:3, :3].T, precision="highest") + m[:3, 3]


def params_to_matrix_jax(x: jnp.ndarray) -> jnp.ndarray:
    """Jittable twin of :func:`params_to_matrix`."""
    rx, ry, rz = x[0], x[1], x[2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones((), x.dtype)
    zero = jnp.zeros((), x.dtype)
    Rx = jnp.stack([jnp.stack([one, zero, zero]),
                    jnp.stack([zero, cx, -sx]),
                    jnp.stack([zero, sx, cx])])
    Ry = jnp.stack([jnp.stack([cy, zero, sy]),
                    jnp.stack([zero, one, zero]),
                    jnp.stack([-sy, zero, cy])])
    Rz = jnp.stack([jnp.stack([cz, -sz, zero]),
                    jnp.stack([sz, cz, zero]),
                    jnp.stack([zero, zero, one])])
    R = jnp.matmul(jnp.matmul(Rz, Ry, precision="highest"), Rx,
                   precision="highest")
    top = jnp.concatenate([R, x[3:6][:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=x.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def bounding_box_corner_change(bb_min: jnp.ndarray, bb_max: jnp.ndarray,
                               trans_mat: jnp.ndarray) -> jnp.ndarray:
    """Max displacement of the two AABB corners under a transform — the
    Piecewise-ICP convergence metric (CommonFunc.cpp:410-419)."""
    R = trans_mat[:3, :3]
    c1 = jnp.matmul(R, bb_min, precision="highest") + trans_mat[:3, 3]
    c2 = jnp.matmul(R, bb_max, precision="highest") + trans_mat[:3, 3]
    d1 = jnp.linalg.norm(c1 - bb_min)
    d2 = jnp.linalg.norm(c2 - bb_max)
    return jnp.maximum(d1, d2)


def masked_aabb(points: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB (min, max corners) over valid points of a padded cloud."""
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    return pmin, pmax
