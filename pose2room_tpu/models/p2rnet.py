"""P2RNet: backbone -> center votes -> proposals, as a pure flax module.

Parity with reference models/p2rnet/modules/network.py:11-106:
* ``__call__`` (train forward): STGCN backbone, center voting, L2-normalized
  vote features (network.py:56-58), ProposalNet with sampled MDN predictions;
* ``generate`` (eval): same trunk but deterministic MDN ``get_mean`` (or
  Bernoulli multi-mode sampling) and mixture weights exported in ``pi``.

Unlike the reference there is no nn.DataParallel wrapping or ``net.module``
indirection: the model is a pure function of (params, batch, rng) and is
sharded with jax.sharding at the call site (see pose2room_tpu/parallel).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from pose2room_tpu.models.stgcn import STGCN
from pose2room_tpu.models.vote import CenterVote
from pose2room_tpu.models.proposal import ProposalNet
from pose2room_tpu.registry import METHODS


@dataclasses.dataclass(frozen=True)
class P2RNetConfig:
    num_frames: int = 768
    num_seeds: int = 512
    seed_sampling: str = "uniform"
    num_proposals: int = 128
    vote_factor: int = 1
    cluster_sampling: str = "vote_fps"
    num_gaussian: int = 100
    num_class: int = 22
    num_joints: int = 53
    origin_joint_id: int = 0
    compute_dtype: str = "float32"  # 'bfloat16' doubles MXU throughput
    # fused Pallas ST-GCN eval chain (bf16-only; ops/stgcn_fused.py); the
    # flag exists for A/B measurement and equivalence tests
    fused_eval: bool = True
    # block-sparse folded graph matmul for the fused eval chain
    # (ops/stgcn_sparse.py): skip the zero 128x128 tiles of the folded
    # matrix under a joint permutation (279/729 tiles).  Default OFF —
    # the on-chip A/B measured it 0.815x the dense form (the K=128 tap
    # matmuls cannot fill the MXU pipeline; BENCH_NOTES.md round-4).
    # Kept as a measured negative result + correctness-tested kernel;
    # model.sparse_eval: true enables it
    sparse_eval: bool = False
    # fused Pallas ST-GCN TRAIN chain with a custom VJP through live BN
    # statistics (ops/stgcn_train.py); both compute dtypes since round 4.
    # On bf16, inter-block activations are bf16 on this path (the module
    # path keeps f32); default ON since the 30-epoch convergence A/B at
    # production shapes tracked the module path (BENCH_NOTES.md).  On f32
    # the chain is a pure reassociation of the module math (384-wide
    # tiles).  model.fused_train: false restores the module path
    fused_train: bool = True
    # BatchNorm EMA keep-rate, flax convention (= 1 - torch momentum).
    # Schedulable per epoch when a ``bnscheduler`` config section exists —
    # the reference's dormant BNMomentumScheduler (optimizers.py:54-58,
    # 121-149); see train/state.py:bnm_momentum + train/engine.py
    bn_momentum: float = 0.9

    @classmethod
    def from_cfg(cls, cfg):
        """Build from a reference-format YAML config dict."""
        data = cfg.config.get("data", {})
        model_cfg = cfg.config.get("model", {}) or {}
        return cls(
            compute_dtype=model_cfg.get("compute_dtype", "float32"),
            bn_momentum=float(model_cfg.get("bn_momentum", 0.9)),
            fused_eval=model_cfg.get("fused_eval", True),
            sparse_eval=model_cfg.get("sparse_eval", False),
            fused_train=model_cfg.get("fused_train", True),
            num_frames=data.get("num_frames", 768),
            num_seeds=data.get("num_seeds", 512),
            seed_sampling=data.get("seed_sampling", "uniform"),
            num_proposals=data.get("num_target", 128),
            vote_factor=data.get("vote_factor", 1),
            cluster_sampling=data.get("cluster_sampling", "vote_fps"),
            num_gaussian=data.get("num_gaussian", 100),
            num_class=cfg.dataset_config.num_class,
            num_joints=cfg.dataset_config.joint_num,
            origin_joint_id=cfg.dataset_config.origin_joint_id,
        )


@METHODS.register
class P2RNet(nn.Module):
    config: P2RNetConfig = P2RNetConfig()

    def setup(self):
        c = self.config
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.backbone = STGCN(
            n_seeds=c.num_seeds,
            num_frames=c.num_frames,
            origin_joint_id=c.origin_joint_id,
            num_joints=c.num_joints,
            seed_sampling=c.seed_sampling,
            dtype=dtype,
            fused_eval=c.fused_eval,
            sparse_eval=c.sparse_eval,
            fused_train=c.fused_train,
            bn_momentum=c.bn_momentum,
            name="backbone",
        )
        self.centervoting = CenterVote(
            origin_joint_id=c.origin_joint_id,
            vote_factor=c.vote_factor,
            dtype=dtype,
            bn_momentum=c.bn_momentum,
            name="centervoting",
        )
        self.detection = ProposalNet(
            num_class=c.num_class,
            num_proposals=c.num_proposals,
            sampling=c.cluster_sampling,
            num_gaussian=c.num_gaussian,
            dtype=dtype,
            bn_momentum=c.bn_momentum,
            name="detection",
        )

    def _trunk(self, input_joints, train, folded=None):
        end_points = self.backbone(input_joints, train=train, folded=folded)
        xyz, features = self.centervoting(
            end_points["seed_skeleton"], end_points["seed_features"], train=train
        )
        norm = jnp.linalg.norm(features, axis=2, keepdims=True)
        features = features / jnp.maximum(norm, 1e-12)
        end_points["vote_xyz"] = xyz
        end_points["vote_features"] = features
        return end_points, xyz, features

    def __call__(self, input_joints, train: bool = False):
        """Training forward pass. input_joints: (B, T, V, 3)."""
        end_points, xyz, features = self._trunk(input_joints, train)
        rng = self.make_rng("mdn")
        return self.detection(
            xyz, features, end_points, train=train, generate=False, rng=rng
        )

    def fold_eval(self):
        """Weight-only folded operands for the fused eval path (see
        STGCN.fold_eval_operands): jit once per weight load, pass the
        result to ``generate(folded=...)`` so per-call generate never
        re-folds the six graph matrices (~0.54 ms device time — 39% of
        the batch-1 step).  Empty tuple when the fused path is off."""
        return self.backbone.fold_eval_operands()

    def generate(
        self,
        input_joints,
        multi_mode: bool = False,
        n_samples: int = 1,
        folded=None,
    ):
        """Deterministic (or multi-mode sampled) eval forward pass.

        ``folded``: optional precomputed ``fold_eval`` operands (a pure
        function of the weights, jitted once per weight load — see
        train/step.py:make_fold_fn).  They carry no association with the
        variables used here: callers must re-fold after any weight change,
        or stale graph/BN operands will silently mix with fresh weights.
        """
        end_points, xyz, features = self._trunk(
            input_joints, train=False, folded=folded
        )
        rng = self.make_rng("mdn") if multi_mode else None
        return self.detection(
            xyz,
            features,
            end_points,
            train=False,
            generate=True,
            multi_mode=multi_mode,
            n_samples=n_samples,
            rng=rng,
        )
