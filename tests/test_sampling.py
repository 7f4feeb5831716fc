"""FPS / ball-query golden tests vs nested-loop numpy ports of the CUDA kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose2room_tpu.ops import furthest_point_sample, ball_query, gather_points, group_points
from pose2room_tpu.ops.sampling import _fps_xla


def ref_fps(xyz, npoint):
    """Sequential port of sampling_gpu.cu:69-229 semantics."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full(N, 1e10)
        mag = np.sum(xyz[b] ** 2, axis=1)
        old = 0
        out[b, 0] = 0
        for j in range(1, npoint):
            best, besti = -1.0, 0
            for k in range(N):
                if mag[k] <= 1e-3:
                    continue
                d = np.sum((xyz[b, k] - xyz[b, old]) ** 2)
                d2 = min(d, temp[k])
                temp[k] = d2
                if d2 > best:
                    best, besti = d2, k
            old = besti
            out[b, j] = old
    return out


def ref_ball_query(radius, new_xyz, xyz, nsample):
    """Sequential port of ball_query_gpu.cu:9-54."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                if cnt >= nsample:
                    break
                d2 = np.sum((new_xyz[b, j] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[b, j, :] = k
                    idx[b, j, cnt] = k
                    cnt += 1
    return idx


def test_fps_matches_reference(rng):
    xyz = rng.rand(2, 64, 3).astype(np.float32) * 4 - 2
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    expect = ref_fps(xyz, 16)
    np.testing.assert_array_equal(got, expect)


def test_fps_near_origin_guard(rng):
    xyz = rng.rand(1, 32, 3).astype(np.float32) + 1.0
    xyz[0, 5] = 0.0  # exactly at origin: mag < 1e-3 -> never picked
    xyz[0, 11] = 0.02  # mag = 3*4e-4 ~ 1.2e-3 > 1e-3 -> eligible
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 20))
    expect = ref_fps(xyz, 20)
    np.testing.assert_array_equal(got, expect)
    assert 5 not in got[0, 1:]


def test_fps_pallas_interpret_matches_xla(rng):
    """Pallas kernel (interpret mode on CPU) == XLA scan path.

    Interpret mode checks kernel *semantics* only; on-hardware agreement
    (where Mosaic lowering bugs live — an early kernel was wrong only at
    B>8) is asserted by scripts/bench_fps.py on the real chip."""
    from pose2room_tpu.ops import sampling as S

    for B, N, m in [(2, 48, 12), (32, 64, 16)]:
        xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 3 - 1.5)
        want = np.asarray(_fps_xla(xyz, m))
        got = S._fps_pallas(xyz, m, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_ball_query_matches_reference(rng):
    xyz = rng.rand(2, 50, 3).astype(np.float32)
    centers = rng.rand(2, 9, 3).astype(np.float32)
    got = np.asarray(ball_query(0.3, jnp.asarray(centers), jnp.asarray(xyz), 8))
    expect = ref_ball_query(0.3, centers, xyz, 8)
    np.testing.assert_array_equal(got, expect)


def test_ball_query_backfill_and_empty(rng):
    xyz = np.ones((1, 10, 3), dtype=np.float32) * 100  # all far away
    centers = np.zeros((1, 2, 3), dtype=np.float32)
    xyz[0, 7] = [0.05, 0, 0]  # single hit for center 0? both centers same
    got = np.asarray(ball_query(0.2, jnp.asarray(centers), jnp.asarray(xyz), 4))
    expect = ref_ball_query(0.2, centers, xyz, 4)
    np.testing.assert_array_equal(got, expect)
    assert (got[0, 0] == 7).all()  # single hit backfills all slots

    xyz[0, 7] = [50, 50, 50]  # now nothing in range -> all-zero indices
    got = np.asarray(ball_query(0.2, jnp.asarray(centers), jnp.asarray(xyz), 4))
    assert (got == 0).all()


def test_gather_group(rng):
    pts = rng.rand(2, 20, 5).astype(np.float32)
    idx = rng.randint(0, 20, size=(2, 6)).astype(np.int32)
    out = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b, idx[b]])

    gidx = rng.randint(0, 20, size=(2, 6, 4)).astype(np.int32)
    out = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b][gidx[b]])


def test_gather_group_custom_vjp_matches_autodiff(rng):
    """One-hot-matmul backward == take_along_axis autodiff backward."""
    import jax

    pts = jnp.asarray(rng.rand(2, 12, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 12, size=(2, 4)).astype(np.int32))
    gidx = jnp.asarray(rng.randint(0, 12, size=(2, 4, 3)).astype(np.int32))

    def plain_gather(p):
        return jnp.take_along_axis(p, idx[:, :, None], axis=1).sum()

    def plain_group(p):
        B, M, S = gidx.shape
        flat = gidx.reshape(B, M * S)
        return jnp.take_along_axis(p, flat[:, :, None], axis=1).sum()

    g1 = jax.grad(lambda p: gather_points(p, idx).sum())(pts)
    g2 = jax.grad(plain_gather)(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    g1 = jax.grad(lambda p: group_points(p, gidx).sum())(pts)
    g2 = jax.grad(plain_group)(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    # weighted sums too (nontrivial cotangents)
    def plain_group_arr(p):
        B, M, S = gidx.shape
        flat = gidx.reshape(B, M * S)
        out = jnp.take_along_axis(p, flat[:, :, None], axis=1)
        return out.reshape(B, M, S, p.shape[-1])

    w = jnp.asarray(rng.rand(2, 4, 3, 5).astype(np.float32))
    g1 = jax.grad(lambda p: (group_points(p, gidx) * w).sum())(pts)
    g2 = jax.grad(lambda p: (plain_group_arr(p) * w).sum())(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
