"""Three-NN feature interpolation (PointNet++ feature propagation).

Completes the pointnet2 op surface (reference
external/pointnet2_ops_lib/_ext-src/src/interpolate_gpu.cu +
pointnet2_utils.py:104-191): for each query point, find its 3 nearest
neighbours among the known points and interpolate their features with
inverse-distance weights.  P2RNet itself never instantiates the FP module,
but the ops are part of the library surface (PointnetFPModule equivalents).

Differentiable w.r.t. ``known_feats`` (take_along_axis gathers have exact
scatter-add adjoints under autodiff, matching the CUDA backward's atomicAdd).
"""

import jax
import jax.numpy as jnp
from jax import lax


def three_nn(unknown, known):
    """For each unknown point, the 3 nearest known points.

    Args:
        unknown: (B, N, 3); known: (B, M, 3), M >= 3.
    Returns:
        dist: (B, N, 3) EUCLIDEAN distances (ascending);
        idx: (B, N, 3) int32 indices into known.
    """
    d2 = (
        jnp.sum(unknown * unknown, axis=-1)[:, :, None]
        + jnp.sum(known * known, axis=-1)[:, None, :]
        - 2.0
        * jnp.einsum(
            "bnc,bmc->bnm",
            unknown,
            known,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
    )
    d2 = jnp.maximum(d2, 0.0)
    neg_top, idx = lax.top_k(-d2, 3)  # 3 smallest distances
    return jnp.sqrt(-neg_top), idx.astype(jnp.int32)


def three_interpolate(known_feats, idx, weight):
    """Weighted interpolation of features at 3-NN indices.

    Args:
        known_feats: (B, M, C) channel-last features;
        idx: (B, N, 3); weight: (B, N, 3).
    Returns:
        (B, N, C).
    """
    B, N, K = idx.shape
    gathered = jnp.take_along_axis(
        known_feats, idx.reshape(B, N * K)[:, :, None], axis=1
    ).reshape(B, N, K, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolate_features(unknown, known, known_feats, eps=1e-8):
    """Full FP interpolation: 3-NN + inverse-distance weights + interpolate.

    Mirrors PointnetFPModule's weighting (pointnet2_modules.py): w_i =
    (1/d_i) / sum_j (1/d_j) with distances clamped away from zero.
    """
    dist, idx = three_nn(unknown, known)
    recip = 1.0 / jnp.maximum(dist, eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(known_feats, idx, weight)
