"""three_nn / three_interpolate golden tests vs nested-loop numpy."""

import numpy as np
import jax
import jax.numpy as jnp

from pose2room_tpu.ops import three_nn, three_interpolate, interpolate_features


def test_three_nn_matches_bruteforce(rng):
    unknown = rng.rand(2, 12, 3).astype(np.float32)
    known = rng.rand(2, 7, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for b in range(2):
        for n in range(12):
            d = np.linalg.norm(unknown[b, n] - known[b], axis=1)
            order = np.argsort(d)[:3]
            np.testing.assert_array_equal(np.sort(idx[b, n]), np.sort(order))
            np.testing.assert_allclose(dist[b, n], np.sort(d)[:3], atol=1e-5)


def test_three_interpolate(rng):
    feats = rng.rand(1, 5, 4).astype(np.float32)
    idx = np.array([[[0, 2, 4], [1, 1, 3]]], dtype=np.int32)
    w = np.array([[[0.5, 0.3, 0.2], [0.2, 0.3, 0.5]]], dtype=np.float32)
    out = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    expect0 = 0.5 * feats[0, 0] + 0.3 * feats[0, 2] + 0.2 * feats[0, 4]
    expect1 = 0.5 * feats[0, 1] + 0.5 * feats[0, 3]  # 0.2+0.3 on idx 1
    np.testing.assert_allclose(out[0, 0], expect0, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], expect1, atol=1e-6)


def test_interpolate_identity(rng):
    """Query at a known point recovers that point's features."""
    known = rng.rand(1, 6, 3).astype(np.float32) * 5
    feats = rng.rand(1, 6, 8).astype(np.float32)
    out = np.asarray(
        interpolate_features(jnp.asarray(known[:, :3]), jnp.asarray(known), jnp.asarray(feats))
    )
    np.testing.assert_allclose(out, feats[:, :3], atol=1e-4)


def test_three_interpolate_grad():
    """Backward scatter-adds into known features (matches CUDA atomicAdd)."""
    feats = jnp.ones((1, 4, 2))
    idx = jnp.asarray(np.array([[[0, 1, 1]]], dtype=np.int32))
    w = jnp.asarray(np.array([[[0.5, 0.25, 0.25]]], dtype=np.float32))
    grad = jax.grad(lambda f: three_interpolate(f, idx, w).sum())(feats)
    np.testing.assert_allclose(np.asarray(grad)[0, :, 0], [0.5, 0.5, 0.0, 0.0], atol=1e-6)
