"""Shared flax building blocks: pointwise conv stacks and ST-GCN blocks.

TPU layout convention throughout the model: channels-LAST, i.e. pose tensors
are (B, T, V, C) and point features are (B, N, C).  1x1 convolutions are
``nn.Dense`` (they lower to MXU matmuls); temporal convs use ``nn.Conv`` with
a (3, 1) kernel over the (T, V) spatial dims.

Reference counterparts: SingleConv order-'cbr'/'c' factories
(models/p2rnet/modules/sub_modules.py:27-113), st_gcn_block and
ConvTemporalGraphical (models/p2rnet/modules/stgcn_layers.py:10-67, 362-439).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP1x1(nn.Module):
    """Stack of Dense(+BatchNorm+ReLU) layers — the 'cbr' SingleConv chain.

    ``final_plain`` makes the last layer a bare Dense ('c' order, with bias).
    With batch norm, the Dense before it carries no bias (torch convention).
    """

    features: Sequence[int]
    use_bn: bool = True
    final_plain: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            plain = last and self.final_plain
            use_bias = plain or not self.use_bn
            x = nn.Dense(f, use_bias=use_bias, name=f"dense{i}")(x)
            if not plain:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, name=f"bn{i}"
                    )(x)
                x = nn.relu(x)
        return x


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
                name="res_conv",
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="res_bn"
            )(res)

        # graph conv: pointwise expand to K*C then contract with A over joints
        y = nn.Dense(self.out_channels * K, name="gcn_dense")(x)  # (B,T,V,K*C)
        B, T, V, _ = y.shape
        y = y.reshape(B, T, V, K, self.out_channels)
        y = jnp.einsum("btvkc,kvw->btwc", y, A)

        # temporal conv chain: BN - ReLU - Conv(t,1) - BN (dropout=0 in ref)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="tcn_bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.out_channels,
            kernel_size=(self.temporal_kernel_size, 1),
            strides=(self.stride, 1),
            padding=((self.temporal_kernel_size // 2,) * 2, (0, 0)),
            name="tcn_conv",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="tcn_bn2")(y)

        return nn.relu(y + res)
