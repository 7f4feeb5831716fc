"""Proposal network: vote aggregation (FPS + ball query) + box/cls heads.

Parity with reference models/p2rnet/modules/proposal_net.py:37-252 and the
PointnetSAModuleVotes config it instantiates (npoint=128, radius=0.3,
nsample=16, mlp [256,256,256], use_xyz=False, normalize_xyz=True, bn=False,
max pooling):

* 'vote_fps' sampling: FPS over votes, proposals SORTED by FPS index, xyz and
  features gathered accordingly (proposal_net.py:162-165);
* 'seed_fps' alternative: arc-length resampling of the seed-hip trajectory;
* QueryAndGroup: ball query around each proposal, grouped coordinates are
  center-relative and divided by the radius; features-only (use_xyz=False);
* shared 1x1x1 MLP (no BN) + max-pool over the ball;
* four head conv stacks (center/size/heading -> 128-d GMM features,
  sem_obj -> 2+num_class logits) and three 100-gaussian MDN heads;
* ``decode_scores``: center = aggregated_vote_xyz + delta, size is log-space,
  heading is (sin, cos).

TPU notes: grouping/gather are take_along_axis; the shared MLP runs on
(B, P, S, C) channels-last tensors (MXU matmuls); FPS/ball-query come from
pose2room_tpu.ops (Pallas/XLA kernels).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from pose2room_tpu.models.layers import MLP1x1
from pose2room_tpu.models.mdn import MDNHead, center_mu_init, size_mu_init, heading_mu_init
from pose2room_tpu.models.stgcn import arc_length_seed_inds
from pose2room_tpu.ops import furthest_point_sample, ball_query, gather_points, group_points


class ProposalNet(nn.Module):
    num_class: int = 22
    num_proposals: int = 128
    sampling: str = "vote_fps"
    radius: float = 0.3
    nsample: int = 16
    feature_dim: int = 256
    num_gaussian: int = 100
    gmm_dim: int = 128
    dtype: object = None
    bn_momentum: float = 0.9

    def setup(self):
        bnm = self.bn_momentum
        # reference mlp spec [256,256,256] INCLUDES the input dim -> 2 layers
        # (pointnet2_modules.py:build_shared_mlp iterates transitions)
        self.sa_mlp = MLP1x1(
            [256, self.feature_dim], use_bn=False, final_plain=False,
            dtype=self.dtype, name="sa_mlp"
        )
        self.conv_center = MLP1x1([128, self.gmm_dim], final_plain=False, dtype=self.dtype, bn_momentum=bnm, name="conv_center")
        self.conv_heading = MLP1x1([128, self.gmm_dim], final_plain=False, dtype=self.dtype, bn_momentum=bnm, name="conv_heading")
        self.conv_size = MLP1x1([128, self.gmm_dim], final_plain=False, dtype=self.dtype, bn_momentum=bnm, name="conv_size")
        self.conv_sem_obj = MLP1x1(
            [128, 128, 2 + self.num_class], final_plain=True,
            dtype=self.dtype, bn_momentum=bnm, name="conv_sem_obj"
        )
        self.gmm_center = MDNHead(
            num_gaussian=self.num_gaussian,
            out_dim=3,
            mu_init=center_mu_init(self.num_gaussian),
            bn_momentum=bnm,
            name="gmm_center",
        )
        self.gmm_size = MDNHead(
            num_gaussian=self.num_gaussian,
            out_dim=3,
            mu_init=size_mu_init(self.num_gaussian),
            bn_momentum=bnm,
            name="gmm_size",
        )
        self.gmm_heading = MDNHead(
            num_gaussian=self.num_gaussian,
            out_dim=2,
            mu_init=heading_mu_init(self.num_gaussian),
            bn_momentum=bnm,
            name="gmm_heading",
        )

    def _aggregate(self, xyz, features, end_points, train):
        """Vote aggregation -> (new_xyz (B,P,3), new_features (B,P,C), inds)."""
        if self.sampling == "vote_fps":
            inds = furthest_point_sample(xyz, self.num_proposals)  # (B,P)
            inds = jnp.sort(inds, axis=1)  # proposals sorted by vote index
        elif self.sampling == "seed_fps":
            seed_xyz = end_points["seed_skeleton"][:, :, 0]
            inds = arc_length_seed_inds(seed_xyz, self.num_proposals)
        else:
            raise NotImplementedError(self.sampling)
        new_xyz = gather_points(xyz, inds)  # (B,P,3)
        ball_idx = ball_query(self.radius, new_xyz, xyz, self.nsample)  # (B,P,S)
        grouped_xyz = group_points(xyz, ball_idx)  # (B,P,S,3)
        grouped_xyz = (grouped_xyz - new_xyz[:, :, None, :]) / self.radius
        grouped_feat = group_points(features, ball_idx)  # (B,P,S,C) use_xyz=False
        h = self.sa_mlp(grouped_feat, train=train)
        new_features = jnp.max(h, axis=2).astype(jnp.float32)  # max-pool over the ball
        return new_xyz, new_features, inds

    def __call__(
        self,
        xyz,
        features,
        end_points,
        train: bool = False,
        generate: bool = False,
        multi_mode: bool = False,
        n_samples: int = 1,
        rng=None,
    ):
        """xyz: (B,N,3) votes; features: (B,N,C) vote features."""
        agg_xyz, agg_feat, inds = self._aggregate(xyz, features, end_points, train)
        end_points["aggregated_vote_xyz"] = agg_xyz
        end_points["aggregated_vote_inds"] = inds.astype(jnp.int32)

        center_feature = self.conv_center(agg_feat, train=train)
        size_feature = self.conv_size(agg_feat, train=train)
        heading_feature = self.conv_heading(agg_feat, train=train)
        sem_obj = self.conv_sem_obj(agg_feat, train=train)  # (B,P,2+num_class)

        if generate:
            if multi_mode:
                k1, k2, k3 = jax.random.split(rng, 3)
                pred_center, pi_center = self.gmm_center.generate_multi(
                    center_feature, k1, n_samples, train=train
                )
                pred_size, pi_size = self.gmm_size.generate_multi(
                    size_feature, k2, n_samples, train=train
                )
                pred_heading, pi_heading = self.gmm_heading.generate_multi(
                    heading_feature, k3, n_samples, train=train
                )
            else:
                pred_center, pi_center = self.gmm_center.get_mean(center_feature, train=train)
                pred_size, pi_size = self.gmm_size.get_mean(size_feature, train=train)
                pred_heading, pi_heading = self.gmm_heading.get_mean(
                    heading_feature, train=train
                )
            end_points["pi"] = {
                "center": pi_center,
                "size": pi_size,
                "heading": pi_heading,
            }
        else:
            k1, k2, k3 = jax.random.split(rng, 3)
            pred_center = self.gmm_center.predict(center_feature, k1, train=train)
            pred_size = self.gmm_size.predict(size_feature, k2, train=train)
            pred_heading = self.gmm_heading.predict(heading_feature, k3, train=train)

        end_points["center"] = agg_xyz + pred_center
        end_points["size"] = pred_size  # log-space
        end_points["heading"] = pred_heading  # (sin, cos)
        end_points["objectness_scores"] = sem_obj[..., 0:2]
        end_points["sem_cls_scores"] = sem_obj[..., 2:]
        return end_points
