"""Point-sampling ops: furthest-point sampling, ball query, grouping.

TPU-native replacements for the reference CUDA extension
``external/pointnet2_ops_lib`` (semantics documented in SURVEY.md §2.7):

* ``furthest_point_sample`` — reference ``_ext-src/src/sampling_gpu.cu:69-229``:
  deterministic (first pick is always index 0), iteratively picks the argmax
  of the running min-distance, and points with ‖p‖² <= 1e-3 are never
  candidates (near-origin guard).  Implemented as a single Pallas kernel per
  batch element keeping the running min-distance vector in VMEM (the scan is
  inherently sequential over picks, but each step is one fused vector op over
  N lanes), with an identical pure-XLA ``lax.scan`` path used off-TPU.

* ``ball_query`` — reference ``_ext-src/src/ball_query_gpu.cu:9-54``: for each
  center, the first ``nsample`` points in scan order with d² < r²; slots
  beyond the hit count repeat the FIRST hit; centers with no hits return
  index 0.  The scan-order semantics are reproduced without a loop: a top-k
  over ``where(hit, k, N)`` yields hit indices in ascending scan order.

* ``group_points`` / ``gather_points`` — plain ``take_along_axis`` (XLA gathers);
  features are channel-LAST here (TPU layout), unlike the reference's (B,C,N).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEAR_ORIGIN_SQ = 1e-3
_INIT_DIST = 1e10


def _fps_xla(xyz, npoint):
    """Reference-semantics FPS in pure XLA. xyz: (B,N,3) -> (B,npoint) int32."""
    B, N, _ = xyz.shape
    valid = jnp.sum(xyz * xyz, axis=-1) > _NEAR_ORIGIN_SQ  # (B,N)
    mindist0 = jnp.full((B, N), _INIT_DIST, dtype=jnp.float32)
    old0 = jnp.zeros((B,), dtype=jnp.int32)

    def step(carry, _):
        mindist, old = carry
        p_old = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - p_old) ** 2, axis=-1)  # (B,N)
        mindist = jnp.where(valid, jnp.minimum(mindist, d), mindist)
        cand = jnp.where(valid, mindist, -1.0)
        new = jnp.argmax(cand, axis=1).astype(jnp.int32)
        return (mindist, new), new

    (_, _), picks = lax.scan(step, (mindist0, old0), None, length=npoint - 1)
    # picks: (npoint-1, B) -> (B, npoint-1); prepend the fixed first pick 0.
    return jnp.concatenate([old0[:, None], picks.T], axis=1)


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, npoint):
    """Batch-vectorized FPS: batch in sublanes, points in lanes.

    All per-pick work is a handful of (B, N) VPU ops — the f32 (8, 128) tile
    maps batch onto sublanes so every row advances in lockstep through the
    inherently sequential pick loop.  Every loop-carried value is a native
    2-D (sublane, lane) tile — (B, 1) scalars-per-row, never (B,) vectors —
    which is what makes the Mosaic lowering fast (1-D carries forced a
    relayout per iteration), and the pick's coordinates are extracted with
    the same masked reductions that compute the argmax (tie-break = lowest
    lane, identical to argmax and to the CUDA scan order).
    """
    x, y, z = x_ref[...], y_ref[...], z_ref[...]  # (B, N) each
    B, N = x.shape
    valid = (x * x + y * y + z * z) > _NEAR_ORIGIN_SQ
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = jnp.zeros_like(out_ref)
    prev0 = jnp.zeros((B, 1), dtype=jnp.int32)  # first pick is always index 0
    mind0 = jnp.full((B, N), _INIT_DIST, dtype=jnp.float32)

    def body(j, carry):
        prev, mind = carry  # (B, 1) i32, (B, N) f32
        sel = lane == prev
        px = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.where(valid, jnp.minimum(mind, d), mind)
        cand = jnp.where(valid, mind, -1.0)
        m = jnp.max(cand, axis=1, keepdims=True)
        new = jnp.min(jnp.where(cand == m, lane, N), axis=1, keepdims=True)
        out_ref[...] = jnp.where(out_lane == j, new, out_ref[...])
        return (new, mind)

    lax.fori_loop(1, npoint, body, (prev0, mind0))


def _fps_pallas(xyz, npoint, interpret=False):
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]  # (B, N) each
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    spec = pl.BlockSpec((B, N), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((B, npoint), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        interpret=interpret,
    )(x, y, z)


def furthest_point_sample(xyz, npoint, use_pallas=None):
    """FPS with reference CUDA semantics.

    Args:
        xyz: (B, N, 3) float32.
        npoint: number of samples.
        use_pallas: force kernel choice; both paths have identical semantics
            (see test_sampling.py).  Default: the Pallas kernel on TPU — it
            beats the XLA scan at every model shape (measured table in
            BENCH_NOTES.md §"FPS kernel"; reproduce with
            scripts/bench_fps.py) — and the XLA scan elsewhere (CPU tests,
            interpret-free portability).
    Returns:
        (B, npoint) int32 indices; idx[:, 0] == 0 always.
    """
    if use_pallas is None:
        # Resolve per lowering platform, not per default backend: param init
        # and tests trace the model on the CPU backend even when a TPU is
        # attached, and a Pallas TPU kernel cannot lower there.  FPS is
        # non-differentiable (int indices; reference kernel likewise) — stop
        # gradients BEFORE the platform cond so autodiff never tries to
        # linearize through the Pallas call.
        return lax.platform_dependent(
            lax.stop_gradient(xyz),
            tpu=functools.partial(_fps_pallas, npoint=npoint),
            default=functools.partial(_fps_xla, npoint=npoint),
        )
    impl = _fps_pallas if use_pallas else _fps_xla
    return impl(xyz, npoint)


@functools.partial(jax.jit, static_argnums=(3,))
def ball_query(radius, new_xyz, xyz, nsample):
    """First-`nsample`-in-scan-order ball query with first-hit backfill.

    Args:
        radius: float ball radius (d² < radius² is a hit — strict).
        new_xyz: (B, M, 3) query centers.
        xyz: (B, N, 3) points searched in scan order k = 0..N-1.
        nsample: max points per ball.
    Returns:
        (B, M, nsample) int32 indices into xyz.  Semantics match
        ball_query_gpu.cu:27-41: short balls repeat the first hit; empty
        balls return all-zero indices.
    """
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    d2 = (
        jnp.sum(new_xyz * new_xyz, axis=-1)[:, :, None]
        + jnp.sum(xyz * xyz, axis=-1)[:, None, :]
        - 2.0
        * jnp.einsum(
            "bmc,bnc->bmn",
            new_xyz,
            xyz,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
    )
    hit = d2 < radius * radius  # (B,M,N)
    scan_key = jnp.where(hit, jnp.arange(N, dtype=jnp.int32)[None, None, :], N)
    # top_k of the negated key returns the nsample smallest keys, i.e. the
    # first hits in scan order (padded with N when there are fewer hits).
    neg_topk, _ = lax.top_k(-scan_key, nsample)  # (B,M,nsample) descending
    slots = -neg_topk  # ascending scan-order hit indices, N-padded
    first = slots[:, :, :1]
    slots = jnp.where(slots == N, first, slots)  # backfill with first hit
    slots = jnp.where(slots == N, 0, slots)  # no hits at all -> index 0
    return slots.astype(jnp.int32)


@jax.custom_vjp
def gather_points(points, idx):
    """points: (B, N, C); idx: (B, M) -> (B, M, C).

    Custom VJP: the adjoint of a gather is a scatter-add, which XLA
    serializes on TPU; a one-hot matmul form keeps it on the MXU.
    """
    return jnp.take_along_axis(points, idx[:, :, None], axis=1)


def _gather_points_fwd(points, idx):
    return gather_points(points, idx), (idx, points.shape)


def _gather_points_bwd(res, g):
    idx, (B, N, C) = res
    onehot = jax.nn.one_hot(idx, N, dtype=g.dtype)  # (B, M, N)
    dpoints = jnp.einsum("bmn,bmc->bnc", onehot, g)
    return dpoints, None


gather_points.defvjp(_gather_points_fwd, _gather_points_bwd)


@jax.custom_vjp
def group_points(points, idx):
    """points: (B, N, C); idx: (B, M, S) -> (B, M, S, C).

    Custom VJP via one-hot matmul (see gather_points) — the grouping
    backward is the hottest scatter in the proposal module's gradient.
    """
    B, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(points, flat[:, :, None], axis=1)
    return out.reshape(B, M, S, points.shape[-1])


def _group_points_fwd(points, idx):
    return group_points(points, idx), (idx, points.shape)


def _group_points_bwd(res, g):
    idx, (B, N, C) = res
    M, S = idx.shape[1], idx.shape[2]
    onehot = jax.nn.one_hot(idx.reshape(B, M * S), N, dtype=g.dtype)  # (B,MS,N)
    dpoints = jnp.einsum("bkn,bkc->bnc", onehot, g.reshape(B, M * S, C))
    return dpoints, None


group_points.defvjp(_group_points_fwd, _group_points_bwd)
