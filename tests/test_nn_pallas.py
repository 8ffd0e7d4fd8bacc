"""Pallas 1-NN kernel vs exact brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from piecewise_icp_tpu.ops.nn import nn1
from piecewise_icp_tpu.ops.nn_pallas import nn1_pallas


def _brute(q, t):
    d2 = ((q[:, None, :].astype(np.float64)
           - t[None, :, :].astype(np.float64)) ** 2).sum(-1)
    return d2.argmin(1), np.sqrt(d2.min(1))


class TestPallasNN:
    def test_matches_brute(self, rng):
        q = rng.normal(size=(700, 3)).astype(np.float32)
        t = rng.normal(size=(900, 3)).astype(np.float32)
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(t))
        ridx, rdist = _brute(q, t)
        np.testing.assert_allclose(np.asarray(dist), rdist, atol=1e-5)
        d_got = np.linalg.norm(q - t[np.asarray(idx)], axis=1)
        np.testing.assert_allclose(d_got, rdist, atol=1e-5)

    def test_matches_xla_kernel(self, rng):
        q = rng.normal(size=(513, 3)).astype(np.float32)   # odd sizes
        t = rng.normal(size=(1025, 3)).astype(np.float32)
        pi, pd = nn1_pallas(jnp.asarray(q), jnp.asarray(t))
        xi, xd = nn1(jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(pd), np.asarray(xd), atol=1e-5)

    def test_masks(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        t = rng.normal(size=(300, 3)).astype(np.float32)
        tm = np.zeros(300, dtype=bool)
        tm[:120] = True
        qm = np.ones(100, dtype=bool)
        qm[5:15] = False
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(t),
                               q_mask=jnp.asarray(qm), t_mask=jnp.asarray(tm))
        ridx, rdist = _brute(q, t[:120])
        valid = qm
        np.testing.assert_allclose(np.asarray(dist)[valid], rdist[valid],
                                   atol=1e-5)
        assert (np.asarray(idx)[valid] < 120).all()
        assert np.isinf(np.asarray(dist)[~valid]).all()

    def test_mm_scale_precision(self, rng):
        base = rng.normal(scale=30.0, size=(600, 3)).astype(np.float32)
        q = base + rng.normal(scale=0.002, size=(600, 3)).astype(np.float32)
        idx, dist = nn1_pallas(jnp.asarray(q), jnp.asarray(base))
        d_exact = np.linalg.norm(
            q.astype(np.float64) - base[np.asarray(idx)], axis=1)
        np.testing.assert_allclose(np.asarray(dist), d_exact,
                                   rtol=1e-3, atol=2e-6)
