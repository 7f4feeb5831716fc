"""Golden tests for Chamfer nn_distance vs a nested-loop numpy reference.

Mirrors the reference's only golden-value check (net_utils/nn_distance.py:63-94).
"""

import numpy as np
import jax.numpy as jnp

from pose2room_tpu.ops import nn_distance, huber_loss


def _ref_pairwise(pc1, pc2, mode="sq"):
    B, N, C = pc1.shape
    M = pc2.shape[1]
    dist = np.zeros((B, N, M))
    for b in range(B):
        for i in range(N):
            for j in range(M):
                diff = pc1[b, i] - pc2[b, j]
                if mode == "sq":
                    dist[b, i, j] = np.sum(diff ** 2)
                elif mode == "l1":
                    dist[b, i, j] = np.sum(np.abs(diff))
                else:  # huber
                    e = np.abs(diff)
                    q = np.minimum(e, 1.0)
                    dist[b, i, j] = np.sum(0.5 * q ** 2 + (e - q))
    return dist


def test_nn_distance_sq(rng):
    pc1 = rng.rand(2, 5, 3).astype(np.float32)
    pc2 = rng.rand(2, 6, 3).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
    ref = _ref_pairwise(pc1, pc2, "sq")
    np.testing.assert_allclose(np.asarray(d1), ref.min(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), ref.argmin(2))
    np.testing.assert_array_equal(np.asarray(i2), ref.argmin(1))


def test_nn_distance_huber_l1(rng):
    pc1 = rng.rand(1, 4, 3).astype(np.float32)
    pc2 = rng.rand(1, 7, 3).astype(np.float32)
    d1, _, _, _ = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2), l1smooth=True)
    ref = _ref_pairwise(pc1, pc2, "huber")
    np.testing.assert_allclose(np.asarray(d1), ref.min(2), atol=1e-5)
    d1, _, _, _ = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2), l1=True)
    ref = _ref_pairwise(pc1, pc2, "l1")
    np.testing.assert_allclose(np.asarray(d1), ref.min(2), atol=1e-5)


def test_huber_loss():
    x = jnp.asarray([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 3.0])
    out = np.asarray(huber_loss(x, delta=1.0))
    expect = np.array([1.5, 0.5, 0.125, 0.0, 0.125, 0.5, 2.5])
    np.testing.assert_allclose(out, expect, atol=1e-6)
