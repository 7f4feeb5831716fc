"""Shared flax building blocks: pointwise conv stacks and ST-GCN blocks.

TPU layout convention throughout the model: channels-LAST, i.e. pose tensors
are (B, T, V, C) and point features are (B, N, C).  1x1 convolutions are
``nn.Dense`` (they lower to MXU matmuls); temporal convs use ``nn.Conv`` with
a (3, 1) kernel over the (T, V) spatial dims.

Reference counterparts: SingleConv order-'cbr'/'c' factories
(models/p2rnet/modules/sub_modules.py:27-113), st_gcn_block and
ConvTemporalGraphical (models/p2rnet/modules/stgcn_layers.py:10-67, 362-439).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP1x1(nn.Module):
    """Stack of Dense(+BatchNorm+ReLU) layers — the 'cbr' SingleConv chain.

    ``final_plain`` makes the last layer a bare Dense ('c' order, with bias).
    With batch norm, the Dense before it carries no bias (torch convention).
    ``dtype`` is the computation dtype (params stay f32; bf16 here doubles
    MXU throughput); BatchNorm statistics are always computed in f32.
    """

    features: Sequence[int]
    use_bn: bool = True
    final_plain: bool = True
    dtype: Any = None
    # flax convention (EMA keep-rate); the torch-convention momentum the
    # reference's BNMomentumScheduler sets is 1 - this (optimizers.py:54-58)
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            plain = last and self.final_plain
            use_bias = plain or not self.use_bn
            x = nn.Dense(f, use_bias=use_bias, dtype=self.dtype, name=f"dense{i}")(x)
            if not plain:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=self.bn_momentum,
                        dtype=jnp.float32,
                        name=f"bn{i}",
                    )(x)
                x = nn.relu(x)
        return x


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's layout/init ('kernel', 'bias') —
    lets the graph conv own Dense-compatible weights while computing the
    folded form (keeps checkpoint/converter compatibility)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.out_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return kernel, bias


class BatchNormCompat(nn.Module):
    """BatchNorm with flax.linen.BatchNorm's exact semantics AND an
    ``affine()`` accessor for eval-mode folding.

    Same variable names/shapes as nn.BatchNorm ('scale'/'bias' params,
    'mean'/'var' batch_stats) so checkpoints and the torch converter
    (convert.py:31) are unaffected.  Setup-style (not compact) so the fused
    eval path (ops/stgcn_fused.py) can read the affine without running the
    normalization: eval BN is y = x * s + b with s = scale/sqrt(var+eps),
    b = bias - mean * s.
    """

    num_features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.num_features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.num_features,)
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.num_features,), jnp.float32),
        )
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.num_features,), jnp.float32),
        )

    def affine(self):
        """(scale, shift) of the eval-mode normalization, float32."""
        s = self.scale.astype(jnp.float32) * jax.lax.rsqrt(
            self.ra_var.value + self.epsilon
        )
        return s, self.bias.astype(jnp.float32) - self.ra_mean.value * s

    def __call__(self, x, train: bool = False):
        x32 = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x32.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            mean2 = jnp.mean(jnp.square(x32), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
                self.ra_var.value = m * self.ra_var.value + (1 - m) * var
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        # same association as flax.linen.BatchNorm: one fused multiplier
        mul = self.scale.astype(jnp.float32) * jax.lax.rsqrt(
            var + self.epsilon
        )
        return (x32 - mean) * mul + self.bias.astype(jnp.float32)


class TemporalConv(nn.Module):
    """(k, 1) temporal convolution over (B, T, V, C) with nn.Conv's
    parameter names/layout ('kernel' (k,1,in,out), 'bias'), exposed as
    attributes so the fused eval path can fold the taps."""

    in_features: int
    out_features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.in_features, self.out_features),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.out_features,)
        )

    def __call__(self, x):
        dt = self.dtype or x.dtype
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            self.kernel.astype(dt),
            window_strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.bias.astype(dt)


class STGCNBlock(nn.Module):
    """Spatial graph conv + temporal conv with residual.

    Input x: (B, T, V, C_in); A: (K, V, V) adjacency stack (already scaled by
    the caller's per-layer edge-importance weights).

    Setup-style (param names unchanged vs the earlier compact form:
    gcn_dense/tcn_bn1/tcn_conv/tcn_bn2[/res_conv/res_bn]) so the fused TPU
    eval path can fold BN affines and conv taps without running the module
    (``fold_eval_arrays``).
    """

    out_channels: int
    spatial_kernel_size: int  # K
    in_channels: int = 64
    num_joints: int = 53
    temporal_kernel_size: int = 3
    stride: int = 1
    residual: bool = True
    dtype: Any = None
    bn_momentum: float = 0.9

    def setup(self):
        K = self.spatial_kernel_size
        self.gcn_dense = _DenseParams(
            self.in_channels, self.out_channels * K, name="gcn_dense"
        )
        self.tcn_bn1 = BatchNormCompat(
            self.out_channels, momentum=self.bn_momentum, name="tcn_bn1"
        )
        self.tcn_conv = TemporalConv(
            self.out_channels,
            self.out_channels,
            kernel_size=self.temporal_kernel_size,
            stride=self.stride,
            dtype=self.dtype,
            name="tcn_conv",
        )
        self.tcn_bn2 = BatchNormCompat(
            self.out_channels, momentum=self.bn_momentum, name="tcn_bn2"
        )
        self._identity_res = (
            self.residual
            and self.in_channels == self.out_channels
            and self.stride == 1
        )
        if self.residual and not self._identity_res:
            self.res_conv = nn.Conv(
                self.out_channels,
                kernel_size=(1, 1),
                strides=(self.stride, 1),
                dtype=self.dtype,
                name="res_conv",
            )
            self.res_bn = BatchNormCompat(
                self.out_channels, momentum=self.bn_momentum, name="res_bn"
            )

    def _folded_graph_matrix(self, A, dt):
        """(V*C_in, V*C_out) folded matrix + (V, C_out) bias term.

        The reference materializes the K-expanded (B,T,V,K,C) tensor and
        contracts with A (stgcn_layers.py:61-65) — ~1 GB of HBM traffic per
        block at full size.  Algebraically
          out[btwc] = sum_{v,i,k} x[btvi] W[i,kc] A[kvw]
        so A folds into the weights once per step:
          M[viwc] = sum_k W[i,kc] A[kvw]
        and the graph conv becomes ONE dense matmul — identical math.
        """
        kernel, bias = self.gcn_dense()
        K, C, V = self.spatial_kernel_size, self.out_channels, self.num_joints
        Wk = kernel.reshape(self.in_channels, K, C)
        M = jnp.einsum("ikc,kvw->viwc", Wk.astype(dt), A.astype(dt))
        M = M.reshape(V * self.in_channels, V * C)
        # bias enters before the A-contraction: out += sum_k b[kc] sum_v A[kvw]
        bias_out = jnp.einsum(
            "kc,kw->wc", bias.reshape(K, C), jnp.sum(A, axis=1)
        )
        return M, bias_out

    def __call__(self, x, A, train: bool = False):
        B, T, V, _ = x.shape
        C = self.out_channels

        if not self.residual:
            res = 0.0
        elif self._identity_res:
            res = x
        else:
            res = self.res_bn(self.res_conv(x), train=train)

        dt = self.dtype or x.dtype
        M, bias_out = self._folded_graph_matrix(A, dt)
        y = jnp.einsum(
            "bti,io->bto",
            x.reshape(B, T, V * self.in_channels).astype(dt),
            M,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, V, C)
        y = y + bias_out[None, None, :, :]

        # temporal conv chain: BN - ReLU - Conv(t,1) - BN (dropout=0 in ref)
        y = self.tcn_bn1(y, train=train)
        y = nn.relu(y)
        y = self.tcn_conv(y)
        y = self.tcn_bn2(y, train=train)

        return nn.relu(y + res)

    @property
    def fusable(self):
        """True when the fused eval kernel covers this block's config:
        identity/no residual, stride 1, and channels dividing a lane tile."""
        return (
            (self._identity_res or not self.residual)
            and self.stride == 1
            and self.in_channels == self.out_channels
            and 128 % self.out_channels == 0
            and self.temporal_kernel_size == 3
        )

    def fold_eval_arrays(self, A):
        """Operands for ops/stgcn_fused.py: (M_padded, vecs f32, KB), with
        M/KB in the chain compute dtype (bf16 default; f32 for the
        strict-parity eval config).

        Merged layout (v-major, c-minor) padded to a lane multiple; padded
        rows/cols of M are zero and padded affine entries are zero so padded
        activations stay zero through the whole chain (see stgcn_fused.py).
        """
        from pose2room_tpu.ops.stgcn_fused import pad_merged

        cd = self.dtype or jnp.float32
        C, V = self.out_channels, self.num_joints
        W0 = V * C
        Wp = pad_merged(W0)
        M, bias_out = self._folded_graph_matrix(A, jnp.float32)
        M = jnp.pad(M, ((0, Wp - W0), (0, Wp - W0))).astype(cd)

        s1, b1 = self.tcn_bn1.affine()
        s2, b2 = self.tcn_bn2.affine()
        # fold the gcn bias into the first BN shift — BN1(y + bias_out) =
        # y*s1 + (bias_out*s1 + b1) — and the conv bias into the second:
        # BN2(y2 + cb) = y2*s2 + (b2 + cb*s2)
        b1p = bias_out.reshape(W0) * jnp.tile(s1, V) + jnp.tile(b1, V)
        cb = self.tcn_conv.bias.astype(jnp.float32)
        b2p = jnp.tile(b2 + cb * s2, V)
        vecs = jnp.zeros((8, Wp), jnp.float32)
        rows = [jnp.tile(s1, V), b1p, jnp.tile(s2, V), b2p]
        for i, r in enumerate(rows):
            vecs = vecs.at[i, :W0].set(r.astype(jnp.float32))

        return M, vecs, self._block_diag_taps().astype(cd)

    def _block_diag_taps(self):
        """Temporal taps as (3, 128, 128) block-diagonal matrices: a 128-wide
        column tile holds 128/C joints' channels, each mixed by the same
        (C, C) tap; tap s applies to row t+s-1 ('SAME' padding).  Shared by
        the dense and block-sparse eval folds (the taps are invariant to the
        joint permutation — they never mix joints)."""
        taps = self.tcn_conv.kernel[:, 0]  # (3, C, C)
        reps = 128 // self.out_channels
        eye = jnp.eye(reps, dtype=taps.dtype)
        return jnp.einsum("sio,pq->spiqo", taps, eye).reshape(3, 128, 128)

    def fold_eval_arrays_sparse(self, A, order, vlist, wlist):
        """Operands for the block-sparse eval matmul (ops/stgcn_sparse.py):
        packed nonzero 128x128 tiles of the JOINT-PERMUTED folded matrix +
        permuted per-column vectors + the (permutation-invariant) temporal
        taps.

        order: (Vp,) static numpy joint permutation (slots >= num_joints
            are pad joints); vlist/wlist: static numpy int32 tile
            coordinates from sparse_tile_lists (CSR-by-output-column).

        The tiles are built directly from the (2, 2) joint sub-blocks —
        tile[(a,i),(b,o)] = sum_k A_k[va, wb] W_k[i, o] — so the dense
        (Wp, Wp) matrix never materializes on this path.
        """
        import numpy as np

        cd = self.dtype or jnp.float32
        C, V = self.out_channels, self.num_joints
        K = self.spatial_kernel_size
        kernel, bias = self.gcn_dense()
        Wk = kernel.reshape(self.in_channels, K, C)  # (i, k, o)
        order = np.asarray(order)
        Vp = len(order)
        Ap = jnp.zeros((K, Vp, Vp), A.dtype).at[:, :V, :V].set(A)
        Ap = Ap[:, order][:, :, order]
        vj = np.stack([2 * vlist, 2 * vlist + 1], axis=1)  # (nnz, 2)
        wj = np.stack([2 * wlist, 2 * wlist + 1], axis=1)
        Asub = Ap[:, vj[:, :, None], wj[:, None, :]]  # (K, nnz, 2, 2)
        tiles = jnp.einsum(
            "knab,iko->naibo",
            Asub.astype(jnp.float32),
            Wk.astype(jnp.float32),
        ).reshape(len(vlist), 2 * C, 2 * C)

        # per-column vectors in permuted layout; pad slots exactly zero so
        # pad columns stay zero through the chain (incl. mid-order pads)
        mask = (order < V).astype(np.float32)[:, None]  # (Vp, 1) static
        bias_out = jnp.einsum(
            "kc,kw->wc", bias.reshape(K, C), jnp.sum(Ap, axis=1)
        )  # (Vp, C), pad cols of Ap are zero
        s1, b1 = self.tcn_bn1.affine()
        s2, b2 = self.tcn_bn2.affine()
        cb = self.tcn_conv.bias.astype(jnp.float32)
        Wp = Vp * C

        def per_joint(row_c):
            return (mask * row_c[None, :]).reshape(Wp)

        s1t = per_joint(s1)
        rows = [
            s1t,
            bias_out.reshape(Wp) * s1t + per_joint(b1),
            per_joint(s2),
            per_joint(b2 + cb * s2),
        ]
        vecs = jnp.zeros((8, Wp), jnp.float32)
        for i, r in enumerate(rows):
            vecs = vecs.at[i].set(r.astype(jnp.float32))

        return tiles.astype(cd), vecs, self._block_diag_taps().astype(cd)

    def fold_train_arrays(self, A):
        """Operands for the fused TRAIN layer (ops/stgcn_train.py): padded
        folded graph matrix + merged bias column + raw per-channel BN/conv
        parameters (BN folding happens inside the layer each step, from the
        LIVE batch statistics)."""
        from pose2room_tpu.ops.stgcn_fused import pad_merged

        C, V = self.out_channels, self.num_joints
        W0 = V * C
        Wp = pad_merged(W0)
        M, bias_out = self._folded_graph_matrix(A, jnp.float32)
        M = jnp.pad(M, ((0, Wp - W0), (0, Wp - W0))).astype(
            self.dtype or jnp.float32
        )
        bias_col = jnp.pad(bias_out.reshape(W0), (0, Wp - W0)).astype(
            jnp.float32
        )
        return (
            M,
            bias_col,
            self.tcn_bn1.scale.astype(jnp.float32),
            self.tcn_bn1.bias.astype(jnp.float32),
            self.tcn_conv.kernel[:, 0].astype(jnp.float32),  # (3, C, C)
            self.tcn_conv.bias.astype(jnp.float32),
            self.tcn_bn2.scale.astype(jnp.float32),
            self.tcn_bn2.bias.astype(jnp.float32),
        )

    def apply_fused_train(self, hm, A, T):
        """Run the block on merged (B, T, W) chain-dtype activations in
        TRAIN mode through the custom-VJP fused layer, updating BN running
        statistics exactly as BatchNormCompat would (momentum EMA of the
        live batch moments)."""
        from pose2room_tpu.ops.stgcn_train import make_train_layer

        layer = make_train_layer(
            bool(self.residual), self.num_joints, self.out_channels, int(T),
            dtype=jnp.dtype(self.dtype or jnp.float32).name,
        )
        args = self.fold_train_arrays(A)
        Wp = args[0].shape[1]
        if self.residual and hm.shape[-1] < Wp:
            # residual blocks add x to the padded-width output; in the
            # backbone chain only block 0 (no residual) sees unpadded input
            hm = jnp.pad(hm, ((0, 0), (0, 0), (0, Wp - hm.shape[-1])))
        out, m1, v1, m2, v2 = layer(hm, *args)
        if not self.is_initializing():
            for bn, m, v in (
                (self.tcn_bn1, m1, v1),
                (self.tcn_bn2, m2, v2),
            ):
                mom = bn.momentum
                bn.ra_mean.value = mom * bn.ra_mean.value + (
                    1 - mom
                ) * jax.lax.stop_gradient(m)
                bn.ra_var.value = mom * bn.ra_var.value + (
                    1 - mom
                ) * jax.lax.stop_gradient(v)
        return out
