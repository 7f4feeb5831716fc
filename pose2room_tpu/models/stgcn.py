"""ST-GCN pose backbone: encode a (B,T,53,3) skeleton clip into seed features.

Capability parity with reference models/p2rnet/modules/stgcn.py:12-152:
* seed selection — fixed linspace when n_seeds >= n_frames, else 'random'
  sort-sample or 'uniform' arc-length resampling of the hip trajectory
  (stgcn.py:90-103), expressed as fixed-shape vectorized ops;
* hip-relative joint features through a 3-layer 1x1 conv (sk_feat);
* temporal-window (knn=20) relative-position embedding of the hip trajectory
  through a 3-layer 1x1 conv, mean-pooled over the window (stgcn.py:109-121);
* 6 ST-GCN blocks with per-layer learnable edge-importance multipliers;
* joint-flatten 1x1 conv to 256-d per-frame features, gathered at seeds.

TPU notes: everything is channels-last; the window gather uses a static
(T, knn) index table folded into the jit; the graph conv contraction is an
einsum onto the MXU with the (K,V,V) adjacency baked as a constant.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pose2room_tpu.models.graph import SPARSE_JOINT_ORDER, build_spatial_graph
from pose2room_tpu.models.layers import MLP1x1, STGCNBlock, _DenseParams
from pose2room_tpu.ops.sampling import gather_points
from pose2room_tpu.ops.stgcn_sparse import sparse_tile_lists


def arc_length_seed_inds(origin_traj, n_seeds):
    """Uniform-arc-length resampling of a trajectory.

    origin_traj: (B, T, 3) hip positions.  Returns (B, n_seeds) int32 frame
    indices such that cumulative movement distance is evenly covered
    (reference stgcn.py:96-101: argmin |cum_dist - target| per target).
    """
    movement = jnp.linalg.norm(jnp.diff(origin_traj, axis=1), axis=2)  # (B,T-1)
    zeros = jnp.zeros((origin_traj.shape[0], 1), dtype=movement.dtype)
    cum = jnp.cumsum(jnp.concatenate([zeros, movement], axis=1), axis=1)  # (B,T)
    step = cum[:, -1] / (n_seeds - 1)
    target = step[:, None] * jnp.arange(n_seeds, dtype=cum.dtype)  # (B,S)
    return jnp.argmin(
        jnp.abs(cum[:, :, None] - target[:, None, :]), axis=1
    ).astype(jnp.int32)


def window_index_table(n_frames, knn):
    """Static (T, knn) clamped temporal-window indices (stgcn.py:109-114)."""
    idx = np.arange(n_frames)[:, None] + np.arange(-(knn // 2), knn // 2)[None, :]
    return np.clip(idx, 0, n_frames - 1).astype(np.int32)


class STGCN(nn.Module):
    n_seeds: int = 512
    num_frames: int = 768
    origin_joint_id: int = 0
    num_joints: int = 53
    seed_sampling: str = "uniform"
    knn: int = 20
    in_channels: int = 64
    out_joint_channels: int = 64
    out_channels: int = 256
    max_hop: int = 5
    dtype: object = None
    # fused Pallas block chain for bf16 eval (ops/stgcn_fused.py); off ->
    # always run the per-block module path (used by equivalence tests)
    fused_eval: bool = True
    # block-sparse folded matmul inside the fused eval chain
    # (ops/stgcn_sparse.py): only the nonzero 128x128 tiles of the
    # joint-permuted folded matrix are multiplied (279/729 for the default
    # skeleton); off -> dense XLA matmul (the round-3 form).  Default OFF
    # until the on-chip A/B lands (BENCH_NOTES.md)
    sparse_eval: bool = False
    # fused Pallas TRAIN chain: custom VJP through live BN statistics
    # (ops/stgcn_train.py); both compute dtypes since round 4 (on bf16 the
    # inter-block activations are bf16 vs the module path's f32 —
    # convergence A/B in BENCH_NOTES.md; on f32 the chain is a pure
    # reassociation of the module math)
    fused_train: bool = True
    # flax-convention EMA keep-rate; schedulable per epoch via the
    # reference's BNMomentumScheduler equivalent (train/state.py:bnm_momentum)
    bn_momentum: float = 0.9

    def setup(self):
        self.A = jnp.asarray(
            build_spatial_graph(self.num_joints, max_hop=self.max_hop)
        )  # (K, V, V)
        K = self.A.shape[0]
        self.pos_embed = MLP1x1(
            [64, 64, self.in_channels], dtype=self.dtype,
            bn_momentum=self.bn_momentum, name="pos_embed",
        )
        self.sk_feat = MLP1x1(
            [64, 64, self.in_channels], dtype=self.dtype,
            bn_momentum=self.bn_momentum, name="sk_feat",
        )
        blocks = []
        channels = [64, 64, 64, 64, 64, self.out_joint_channels]
        in_ch = self.in_channels
        for i, ch in enumerate(channels):
            blocks.append(
                STGCNBlock(
                    out_channels=ch,
                    spatial_kernel_size=K,
                    in_channels=in_ch,
                    num_joints=self.num_joints,
                    residual=(i != 0),
                    dtype=self.dtype,
                    bn_momentum=self.bn_momentum,
                    name=f"gcn{i}",
                )
            )
            in_ch = ch
        self.blocks = blocks
        self.edge_importance = [
            self.param(f"edge_importance{i}", nn.initializers.ones, self.A.shape)
            for i in range(len(blocks))
        ]
        # Dense-compatible parameter holder ('conv_joint/{kernel,bias}',
        # same shapes/init as nn.Dense) so the sparse eval path can fold
        # the joint permutation into the kernel rows instead of paying an
        # un-permute pass over the activations.
        self.conv_joint = _DenseParams(
            self.num_joints * self.out_joint_channels,
            self.out_channels,
            name="conv_joint",
        )
        self._window_idx = jnp.asarray(window_index_table(self.num_frames, self.knn))
        # static block-sparsity data for the eval matmul: joint permutation
        # (optimized pairing for the default 53-joint skeleton, natural
        # order otherwise) + CSR tile lists over the support of A
        V = self.num_joints
        Vp = V + (V % 2)
        if V == 53:
            order = SPARSE_JOINT_ORDER
        else:
            order = np.arange(Vp, dtype=np.int32)
        # pure-numpy support (self.A may be traced under jit): the baked
        # adjacency's nonzero pattern — edge-importance multiplies A
        # elementwise, so the runtime support is always a subset
        support = (
            build_spatial_graph(self.num_joints, max_hop=self.max_hop) != 0
        ).any(0)
        self._sparse_order = order
        self._sparse_col_off, self._sparse_vlist = sparse_tile_lists(
            support, order
        )
        self._sparse_wlist = np.repeat(
            np.arange(Vp // 2, dtype=np.int32),
            np.diff(self._sparse_col_off).astype(np.int64),
        )

    def _fold_dense(self):
        """Folded (M, vecs, KB) operands for every block, dense eval path."""
        ops = []
        for blk, imp in zip(self.blocks, self.edge_importance):
            ops.extend(blk.fold_eval_arrays(self.A * imp))
        return tuple(ops)

    def _fold_sparse(self):
        """Folded (tiles, vecs, KB) operands, block-sparse eval path."""
        ops = []
        for blk, imp in zip(self.blocks, self.edge_importance):
            ops.extend(
                blk.fold_eval_arrays_sparse(
                    self.A * imp,
                    self._sparse_order,
                    self._sparse_vlist,
                    self._sparse_wlist,
                )
            )
        return tuple(ops)

    def fold_eval_operands(self):
        """Eval-path folded operands as a flat tuple — a function of params
        only.  Re-folding the six (3392, 3392) graph matrices inside every
        generate call costs ~0.54 ms of device time (einsum + a 23 MB
        non-bitcastable reshape per block — 39% of the batch-1 step,
        profiled in BENCH_NOTES.md round-4); weights are fixed at serving
        time, so runners jit THIS once per weight load and pass the result
        back through ``__call__(folded=...)``.  Empty tuple when the fused
        eval path is off/unfusable (callers pass folded=None then)."""
        if not (self.fused_eval and all(b.fusable for b in self.blocks)):
            return ()
        if self.sparse_eval and self.in_channels == 64:
            return self._fold_sparse()
        return self._fold_dense()

    def __call__(self, input_joints, train: bool = False, folded=None):
        """input_joints: (B, T, V, 3) -> dict of seed tensors.

        folded: optional precomputed ``fold_eval_operands()`` tuple (eval
        only); when given, the per-block graph-matrix folding is skipped.
        """
        B, T, V, _ = input_joints.shape
        origin = input_joints[:, :, self.origin_joint_id, :3]  # (B,T,3)

        # ---- seed indices ----
        if self.n_seeds >= T:
            seed_inds = jnp.broadcast_to(
                jnp.round(jnp.linspace(0, T - 1, self.n_seeds)).astype(jnp.int32),
                (B, self.n_seeds),
            )
        elif self.seed_sampling == "uniform":
            seed_inds = arc_length_seed_inds(origin, self.n_seeds)
        elif self.seed_sampling == "random":
            rng = self.make_rng("sampling")
            scores = jax.random.uniform(rng, (B, T))
            seed_inds = jnp.sort(
                jnp.argsort(scores, axis=1)[:, : self.n_seeds], axis=1
            ).astype(jnp.int32)
        else:
            raise NotImplementedError(self.seed_sampling)

        # ---- hip-relative joint features ----
        x = input_joints - input_joints[:, :, self.origin_joint_id : self.origin_joint_id + 1]

        # temporal-window relative-position embedding of the hip trajectory
        widx = self._window_idx  # (T, knn)
        neigh = origin[:, widx, :]  # (B,T,knn,3)
        rel = neigh - origin[:, :, None, :]
        pos = self.pos_embed(rel, train=train)  # (B,T,knn,C)
        pos = jnp.mean(pos, axis=2)  # (B,T,C)

        feat = self.sk_feat(x, train=train)  # (B,T,V,C)
        h = feat + pos[:, :, None, :]

        # Eval in bf16 takes the fused block chain: all six blocks run as
        # Pallas kernels over a lane-padded merged (B,T,V*C) layout — no
        # per-block (V,C)<->(V*C) relayout copies, BN/residual epilogues
        # fused in-VMEM (ops/stgcn_fused.py; ~36% of generate time measured
        # as pure overhead on the unfused path, BENCH_NOTES.md).  Off-TPU
        # the same folded operands run through the bit-equivalent jnp form.
        # the fused chain serves BOTH eval dtypes since round 3: bf16 (the
        # official bench config) and f32 (the strict-parity config — same
        # kernels, f32 tiles/MXU passes; reassociation-level numerics only)
        use_fused = (
            self.fused_eval
            and not train
            and all(b.fusable for b in self.blocks)
        )
        use_fused_train = (
            self.fused_train
            and train
            and all(b.fusable for b in self.blocks)
        )
        if use_fused_train:
            # Merged-layout train chain: graph matmuls in XLA, tconv/BN
            # epilogues (and their VJP) as Pallas kernels, BatchNorm on live
            # batch statistics with hand-written backward
            # (ops/stgcn_train.py).  Serves both compute dtypes since round
            # 4 (f32: 384-wide tiles, every rounding cast a no-op).  Same
            # no-entry-pad trick as eval: block 0 has no residual, so it
            # contracts the unpadded merged input.
            C = h.shape[-1]
            hm = h.astype(self.dtype or jnp.float32).reshape(B, T, V * C)
            for blk, imp in zip(self.blocks, self.edge_importance):
                hm = blk.apply_fused_train(hm, self.A * imp, T)
            h = hm[..., : V * C]
        use_sparse = (
            use_fused and self.sparse_eval and h.shape[-1] == 64
        )
        cj_rows = None  # set on the sparse path: permuted conv_joint rows
        if use_sparse:
            # Block-sparse chain: activations live in the JOINT-PERMUTED
            # padded merged layout end-to-end (entry gather below); the
            # graph matmul multiplies only the nonzero 128x128 tiles of
            # the permuted folded matrix (ops/stgcn_sparse.py), and the
            # permutation is folded into conv_joint's kernel rows on exit
            # (zero runtime cost).
            from pose2room_tpu.ops.stgcn_fused import (
                fused_epilogue,
                stgcn_layer_merged_ref,
            )
            from pose2room_tpu.ops.stgcn_sparse import (
                sparse_graph_matmul_bn_relu,
            )

            order = self._sparse_order
            Vp = len(order)
            C = h.shape[-1]
            Wp = Vp * C
            dt = self.dtype or jnp.float32
            hp = h
            if Vp > V:
                hp = jnp.concatenate(
                    [h, jnp.zeros_like(h[:, :, : Vp - V])], axis=2
                )
            hm = hp[:, :, order, :].reshape(B, T, Wp).astype(dt)
            col_off = jnp.asarray(self._sparse_col_off)
            vlist = jnp.asarray(self._sparse_vlist)
            operands = [hm, col_off, vlist]
            operands.extend(folded if folded else self._fold_sparse())
            residuals = tuple(blk.residual for blk in self.blocks)
            vl_np, wl_np = self._sparse_vlist, self._sparse_wlist

            def run_tpu(hm, col_off, vlist, *flat):
                for i, res in enumerate(residuals):
                    tiles, vecs, KB = flat[3 * i : 3 * i + 3]
                    t1 = sparse_graph_matmul_bn_relu(
                        hm, tiles, vecs, col_off, vlist
                    )
                    hm = fused_epilogue(
                        t1, hm if res else None, vecs, KB, residual=res
                    )
                return hm

            def run_ref(hm, col_off, vlist, *flat):
                from pose2room_tpu.ops.stgcn_sparse import densify_tiles

                for i, res in enumerate(residuals):
                    tiles, vecs, KB = flat[3 * i : 3 * i + 3]
                    dense = densify_tiles(tiles, vl_np, wl_np, Wp // 128)
                    hm = stgcn_layer_merged_ref(
                        hm, dense, vecs, KB, residual=res
                    )
                return hm

            h = jax.lax.platform_dependent(
                *operands, tpu=run_tpu, default=run_ref
            )
            # conv_joint kernel rows follow the permutation; pad slots get
            # a zero row so pad columns contribute nothing
            cj_rows = np.where(
                np.asarray(order)[:, None] < V,
                np.asarray(order)[:, None].astype(np.int64) * C
                + np.arange(C)[None],
                V * C,
            ).reshape(-1)
        elif use_fused:
            from pose2room_tpu.ops.stgcn_fused import (
                fused_stgcn_layer,
                stgcn_layer_merged_ref,
            )

            C = h.shape[-1]
            W0 = V * C
            # no entry pad: block 0 has no residual, so fused_stgcn_layer
            # contracts the unpadded merged input against M's first W0 rows
            # and the padded width first materializes as its OUTPUT
            hm = h.astype(self.dtype or jnp.float32).reshape(B, T, W0)
            operands = [hm]
            operands.extend(folded if folded else self._fold_dense())
            residuals = tuple(blk.residual for blk in self.blocks)

            def _chain(layer_fn):
                def run(hm, *flat):
                    for i, res in enumerate(residuals):
                        M, vecs, KB = flat[3 * i : 3 * i + 3]
                        hm = layer_fn(hm, M, vecs, KB, residual=res)
                    return hm

                return run

            hm = jax.lax.platform_dependent(
                *operands,
                tpu=_chain(fused_stgcn_layer),
                default=_chain(stgcn_layer_merged_ref),
            )
            h = hm[..., :W0]
        elif not use_fused_train:
            for block, importance in zip(self.blocks, self.edge_importance):
                h = block(h, self.A * importance, train=train)
            # flatten joints -> per-frame features. NOTE channel order is
            # (v, c) here vs the reference's (c, v) (stgcn.py:137-138) — a
            # weight converter must permute conv_joint accordingly.
            h = h.reshape(B, T, V * h.shape[-1])
        # conv_joint with nn.Dense's exact promotion semantics (params are
        # a Dense-shaped holder so the sparse path can permute the rows)
        cj_kernel, cj_bias = self.conv_joint()
        if cj_rows is not None:
            cj_kernel = jnp.concatenate(
                [cj_kernel, jnp.zeros((1, cj_kernel.shape[1]), cj_kernel.dtype)]
            )[cj_rows]
        cj_dt = self.dtype or jnp.promote_types(h.dtype, cj_kernel.dtype)
        frame_feat = (
            jnp.dot(h.astype(cj_dt), cj_kernel.astype(cj_dt))
            + cj_bias.astype(cj_dt)
        ).astype(jnp.float32)  # (B,T,256)

        seed_skeleton = jnp.take_along_axis(
            input_joints[..., :3], seed_inds[:, :, None, None], axis=1
        )  # (B,S,V,3) — input gather, no grad path
        # gather_points carries a one-hot-matmul VJP (TPU scatter avoidance)
        seed_features = gather_points(frame_feat, seed_inds)  # (B,S,256)

        return {
            "seed_inds": seed_inds,
            "seed_skeleton": seed_skeleton,
            "seed_features": seed_features,
        }
