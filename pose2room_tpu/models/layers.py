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
                        momentum=0.9,
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


class STGCNBlock(nn.Module):
    """Spatial graph conv + temporal conv with residual.

    Input x: (B, T, V, C_in); A: (K, V, V) adjacency stack (already scaled by
    the caller's per-layer edge-importance weights).
    """

    out_channels: int
    spatial_kernel_size: int  # K
    temporal_kernel_size: int = 3
    stride: int = 1
    residual: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        in_channels = x.shape[-1]
        K = self.spatial_kernel_size

        if not self.residual:
            res = 0.0
        elif in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.out_channels,
                kernel_size=(1, 1),
                strides=(self.stride, 1),
                dtype=self.dtype,
                name="res_conv",
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=jnp.float32,
                name="res_bn",
            )(res)

        # Graph conv, reassociated: the reference materializes the K-expanded
        # (B,T,V,K,C) tensor and contracts with A (stgcn_layers.py:61-65) —
        # ~1 GB of HBM traffic per block at full size.  Algebraically
        #   out[btwc] = sum_{v,i,k} x[btvi] W[i,kc] A[kvw]
        # so we fold A into the weights once per step:
        #   M[viwc] = sum_k W[i,kc] A[kvw]   (a (V*C_in, V*C_out) matrix)
        # and the block becomes ONE dense matmul — identical math, ~5x less
        # memory traffic. Same parameter layout as an nn.Dense('gcn_dense').
        kernel, bias = _DenseParams(
            in_channels, self.out_channels * K, name="gcn_dense"
        )()
        B, T, V, _ = x.shape
        C = self.out_channels
        Wk = kernel.reshape(in_channels, K, C)
        dt = self.dtype or x.dtype
        M = jnp.einsum("ikc,kvw->viwc", Wk.astype(dt), A.astype(dt))
        M = M.reshape(V * in_channels, V * C)
        y = jnp.einsum(
            "bti,io->bto",
            x.reshape(B, T, V * in_channels).astype(dt),
            M,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, V, C)
        # bias enters before the A-contraction: out += sum_k b[kc] sum_v A[kvw]
        bias_out = jnp.einsum("kc,kw->wc", bias.reshape(K, C), jnp.sum(A, axis=1))
        y = y + bias_out[None, None, :, :]

        # temporal conv chain: BN - ReLU - Conv(t,1) - BN (dropout=0 in ref)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="tcn_bn1"
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.out_channels,
            kernel_size=(self.temporal_kernel_size, 1),
            strides=(self.stride, 1),
            padding=((self.temporal_kernel_size // 2,) * 2, (0, 0)),
            dtype=self.dtype,
            name="tcn_conv",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="tcn_bn2"
        )(y)

        return nn.relu(y + res)
