"""Center-voting module: each seed casts a vote for an object center.

Parity with reference models/p2rnet/modules/vote_center.py:11-59: a 3-layer
1x1 conv over seed features produces a 3-d xyz offset from the seed's hip
joint plus a residual feature; vote features = seed features + residual.
vote_factor votes per seed (default 1).
"""

import flax.linen as nn
import jax.numpy as jnp

from pose2room_tpu.models.layers import MLP1x1


class CenterVote(nn.Module):
    origin_joint_id: int = 0
    vote_factor: int = 1
    feature_dim: int = 256
    dtype: object = None
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, seed_skeleton, seed_features, train: bool = False):
        """
        Args:
            seed_skeleton: (B, S, V, 3); seed_features: (B, S, C).
        Returns:
            vote_xyz (B, S*vote_factor, 3), vote_features (B, S*vote_factor, C).
        """
        seed_xyz = seed_skeleton[:, :, self.origin_joint_id]  # (B,S,3)
        B, S, C = seed_features.shape
        out = MLP1x1(
            [256, 256, (3 + self.feature_dim) * self.vote_factor],
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            name="conv_input",
        )(seed_features, train=train)
        out = out.astype(jnp.float32)
        out = out.reshape(B, S, self.vote_factor, 3 + self.feature_dim)
        offset = out[..., :3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(B, S * self.vote_factor, 3)
        residual = out[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            B, S * self.vote_factor, self.feature_dim
        )
        return vote_xyz, vote_features
